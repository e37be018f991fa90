"""Shared neural blocks (flax.linen, channels-last).

The reference's 1x1 Conv1d/Conv2d + BatchNorm + ReLU stacks become Dense +
BatchNorm over the trailing channel axis — identical math, and channels-last
puts C on TPU lanes so every pointwise MLP is an MXU matmul.

Parity notes:
* BatchNorm matches torch defaults: eps=1e-5, momentum 0.1 (flax
  ``momentum=0.9``), batch statistics over all non-channel axes — the same
  reduction as BatchNorm1d/2d on (B, C, N[, K]) because the reference never
  pads point budgets (SURVEY.md §7 hard-part 5).
* ``TransformerEncoderLayerPreNorm`` mirrors
  ``PointFormer.TransformerEncoderLayerPreNorm`` (PointFormer.py:7-39)
  including its quirk: the residual is added to the *normalized* input.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


from dataclasses import dataclass


@dataclass(frozen=True)
class TrainEvalDtype:
    """Marker: apply ``dtype`` during training too (mixed-precision train).

    Params and optimizer state stay f32; only the layer compute runs in
    ``dtype``.  Normalization statistics (BN batch mean/var, LN) remain
    f32 during training — see the ``bn_dtype`` handling below.

    Measured on v5e at PDA-SSD channel widths (16-512): bf16 train is
    SLOWER than f32 (41 -> 59 ms/step at b2 KITTI shapes) — the tiny
    matmuls are conversion-bound, not MXU-bound.  The switch ships for
    wider model variants; the default stays f32."""

    dtype: Any


def _infer_dtype(dtype, train):
    """Compute dtype policy: a plain dtype is inference-only (training
    always runs f32 — reference numerics); wrap in ``TrainEvalDtype`` to
    opt a model into bf16 train compute (``BACKBONE_3D.TRAIN_COMPUTE_DTYPE``).
    Params stay f32 either way; the matmuls run on the MXU's bf16 path."""
    if isinstance(dtype, TrainEvalDtype):
        return dtype.dtype
    return None if train else dtype


def _norm_dtype(dtype, train):
    """Normalization layers keep f32 statistics during bf16 TRAINING
    (batch mean/var in bf16 loses too much precision for stable BN);
    at eval the running stats are fixed, so bf16 is safe."""
    if train and isinstance(dtype, TrainEvalDtype):
        return None
    return _infer_dtype(dtype, train)


class DenseBNReLU(nn.Module):
    """Dense -> BatchNorm -> ReLU over the trailing axis (a 1x1 conv)."""

    features: int
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        dt = _infer_dtype(self.dtype, train)
        x = nn.Dense(
            self.features, use_bias=self.use_bias, dtype=dt, name="dense"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=_norm_dtype(self.dtype, train), name="bn",
        )(x)
        return nn.relu(x)


class MLPStack(nn.Module):
    """A stack of Dense+BN+ReLU layers (reference shared_mlps pattern)."""

    features: Sequence[int]
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        for i, f in enumerate(self.features):
            x = DenseBNReLU(f, dtype=self.dtype, name=f"layer{i}")(x, train)
        return x


class DensityNet(nn.Module):
    """MLP(1->16->8->1) over group densities (pointnet2_modules.py:956-979).

    Faithful to the reference *as executed*: the ``if i == len(...)`` branch
    there never fires, so every layer (including the last) is BN + ReLU —
    no sigmoid.
    """

    hidden: Sequence[int] = (16, 8)

    @nn.compact
    def __call__(self, x, train: bool):
        for i, f in enumerate(tuple(self.hidden) + (1,)):
            x = nn.Dense(f, use_bias=True, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class TransformerEncoderLayerPreNorm(nn.Module):
    """Pre-norm self-attention over the K neighbors of each center.

    Token axis = K (<=64), batch = (B, npoint) — attention stays tiny and
    batched, exactly the reference's (nsample, B*npoint, C) layout but
    without the host-visible reshapes (PointFormer.py:30-39).

    Quirk preserved: ``src = norm1(src); src = src + attn(src)`` — the
    residual base is the *normalized* tensor.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        dt = _infer_dtype(self.dtype, train)
        ln_dt = _norm_dtype(self.dtype, train)
        # x: (B, M, K, D)
        x = nn.LayerNorm(epsilon=1e-5, dtype=ln_dt, name="norm1")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            out_features=self.d_model,
            use_bias=True,
            dtype=dt,
            name="self_attn",
        )(x, x)
        x = x + attn
        x = nn.LayerNorm(epsilon=1e-5, dtype=ln_dt, name="norm2")(x)
        h = nn.Dense(self.dim_feedforward, dtype=dt, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=dt, name="linear2")(h)
        return x + h
