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
from .norm import BatchNorm
import jax
import jax.numpy as jnp


from dataclasses import dataclass


@dataclass(frozen=True)
class TrainEvalDtype:
    """Marker: apply ``dtype`` during training too (mixed-precision train).

    Params and optimizer state stay f32; only the layer compute runs in
    ``dtype``.  Normalization statistics (BN batch mean/var, LN) remain
    f32 during training — see the ``bn_dtype`` handling below.

    Measured on v5e, b2 KITTI shapes: round-2 code measured bf16 train
    SLOWER than f32 (41 -> 59 ms/step — conversion-bound); after the
    round-3 flat-gather rewrite the sign FLIPPED (scan harness: f32 26.3
    -> bf16 21.4 ms/step; with the Pallas attention train dispatch 20.4).
    r5 CORRECTION to the r4 analysis: the "19.8 ms layout-copy family"
    was a profiler misattribution — xplane event names carry the full
    HLO text, so fusions whose OPERANDS were copies were bucketed as
    copies; the opcode-exact split (tools/probes/copy_decomp_probe.py)
    shows true copies are ~2.2 ms and the dominant cost was the flax
    einsum attention's fwd+bwd (~12 ms f32).  Two restructuring attempts
    remain recorded as negatives in DenseBNReLU /
    TransformerEncoderLayerPreNorm below.  Since r5 the shipped PDA-SSD
    yamls default TRAIN_COMPUTE_DTYPE: bf16 (f32 reference numerics one
    config-line away; semantics guarded by tests/test_train.py::
    test_bf16_train_compute and ::test_bf16_loss_trajectory)."""

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
        # NOTE (r4 measured negative): flattening leading dims to run the
        # dot as a 2-D GEMM made the b2 train step WORSE (30.4 -> 33.6
        # ms/step): the M-minor layouts are demanded by the 4-branch
        # channel concat downstream, and local reshapes only add
        # conversion points.  (r5: the "copy family" motivating this
        # attempt was a profiler misattribution — see TrainEvalDtype —
        # but the negative result stands on its own.)
        x = nn.Dense(
            self.features, use_bias=self.use_bias, dtype=dt, name="dense"
        )(x)
        x = BatchNorm(
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
            x = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class _DenseGeneralParams(nn.Module):
    """Parameter-only twin of one flax ``DenseGeneral`` inside
    ``nn.MultiHeadDotProductAttention`` — same names ("kernel"/"bias"),
    same shapes, and the same initialization (flax draws the kernel on the
    FLAT (fan_in, fan_out) shape and reshapes, linear.py kernel_init_wrap),
    so checkpoints and init streams are interchangeable with the flax
    module.  The consumer reshapes the kernel flat itself — the point is
    to run the projection as a 2-D matmul (see NeighborMHAPallas)."""

    kshape: Sequence[int]
    bshape: Sequence[int]
    fan_in: int

    @nn.compact
    def __call__(self):
        import numpy as np

        fan_out = int(np.prod(self.kshape)) // self.fan_in

        def kinit(rng, shape, dtype=jnp.float32):
            flat = nn.initializers.lecun_normal()(
                rng, (self.fan_in, fan_out), dtype
            )
            return flat.reshape(shape)

        kern = self.param("kernel", kinit, tuple(self.kshape))
        bias = self.param(
            "bias", nn.initializers.zeros_init(), tuple(self.bshape)
        )
        return kern, bias


class NeighborMHAPallas(nn.Module):
    """Self-attention over K neighbors with the fused Pallas core.

    Drop-in for ``nn.MultiHeadDotProductAttention(x, x)`` with an IDENTICAL
    parameter tree, but every tensor between the input and the output stays
    in the flat (rows, lanes) layout: q/k/v projections are plain 2-D
    matmuls into (R, H*hd), the Pallas kernel consumes/produces that layout
    directly, and the out projection is another 2-D matmul.  flax's version
    materializes (..., K, H, hd) tensors whose trailing (H, hd) dims XLA
    tiles to (8, 128) — with hd=64 that is 4x padding and ~0.1 ms of copy
    per tensor at KITTI shapes (device trace, 2026-08-18)."""

    num_heads: int
    qkv_features: int
    dtype: Optional[Any] = None
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas.attention import neighbor_attention_flat_trainable

        B, M, K, D = x.shape
        H = self.num_heads
        hd = self.qkv_features // H
        dt = self.dtype or x.dtype
        x2 = x.reshape(-1, D).astype(dt)
        qkv = []
        for nm in ("query", "key", "value"):
            kern, bias = _DenseGeneralParams(
                (D, H, hd), (H, hd), fan_in=D, name=nm
            )()
            qkv.append(
                x2 @ kern.reshape(D, H * hd).astype(dt)
                + bias.reshape(H * hd).astype(dt)
            )
        # positional: custom_vjp (fused Pallas backward) rejects kwargs
        core = neighbor_attention_flat_trainable(
            *qkv, K, H, hd, self.interpret
        )
        kern, bias = _DenseGeneralParams(
            (H, hd, D), (D,), fan_in=H * hd, name="out"
        )()
        out = core @ kern.reshape(H * hd, D).astype(dt) + bias.astype(dt)
        return out.reshape(B, M, K, D)


class CBAM(nn.Module):
    """Spatial attention block of the Proposal_Aware SA ablation
    (pointnet2_modules.py:1010-1046).

    As executed there, only the spatial half is live (the channel half is
    commented out): per point, max- and mean-pool over the CHANNEL axis,
    concat to 2 channels, a bias-free 2->1 conv, sigmoid, and scale the
    input.  Channels-last here: input (B, N, C) — the reference's
    (B, C, N) with its transposes folded away.
    """

    @nn.compact
    def __call__(self, x):
        mp = jnp.max(x, axis=-1, keepdims=True)   # (B, N, 1)
        ap = jnp.mean(x, axis=-1, keepdims=True)  # (B, N, 1)
        w = nn.Dense(1, use_bias=False, name="conv_layer")(
            jnp.concatenate([mp, ap], axis=-1)
        )
        return x * jax.nn.sigmoid(w)


class EncoderLayer(nn.Module):
    """The FullAttention encoder-layer ablation
    (pointnet2_modules.py:1325-1414).

    Differences from ``TransformerEncoderLayerPreNorm``: bias-free q/k/v/
    merge projections, a bias-free d->2d->d feed-forward, and the
    CONVENTIONAL pre-norm residual (the un-normalized input is the
    residual base — unlike PointFormer's quirk), with softmax temperature
    1/sqrt(hd) applied to the logits exactly as FullAttention does.
    Never instantiated in the reference (dead ablation code); selectable
    here via ``SA_CONFIG.POINTFORMER_IMPL: encoder_layer``.
    """

    d_model: int
    nhead: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        dt = _infer_dtype(self.dtype, train)
        ln_dt = _norm_dtype(self.dtype, train)
        hd = self.d_model // self.nhead
        *batch, K, D = x.shape
        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=ln_dt, name="norm1",
                         use_fast_variance=False)(x)
        q = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="q_proj")(h)
        k = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="k_proj")(h)
        v = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="v_proj")(h)
        shp = tuple(batch) + (K, self.nhead, hd)
        att = nn.dot_product_attention(
            q.reshape(shp), k.reshape(shp), v.reshape(shp)
        ).reshape(tuple(batch) + (K, self.d_model))
        message = nn.Dense(self.d_model, use_bias=False, dtype=dt,
                           name="merge")(att)
        message = message + residual
        residual = message
        h = nn.LayerNorm(epsilon=1e-5, dtype=ln_dt, name="norm2",
                         use_fast_variance=False)(message)
        h = nn.Dense(2 * self.d_model, use_bias=False, dtype=dt,
                     name="mlp_0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="mlp_1")(h)
        return residual + h


class TransformerEncoderLayerPreNorm(nn.Module):
    """Pre-norm self-attention over the K neighbors of each center.

    Token axis = K (<=64), batch = (B, npoint) — attention stays tiny and
    batched, exactly the reference's (nsample, B*npoint, C) layout but
    without the host-visible reshapes (PointFormer.py:30-39).

    Quirk preserved: ``src = norm1(src); src = src + attn(src)`` — the
    residual base is the *normalized* tensor.

    At eval on TPU the attention runs ``NeighborMHAPallas`` (same params,
    fused Pallas core, everything flat); training and other backends keep
    flax's differentiable einsum path.  ``attention_impl`` (or env
    ``PDANET_ATTENTION_IMPL``) forces a path: "flax", "pallas_interpret"
    (CPU oracle tests), or None = auto.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Optional[Any] = None
    attention_impl: Optional[str] = None

    def _pallas_impl(self, train: bool, K: int):
        """Returns None (use flax) or an interpret flag for the kernel.

        Train-time dispatch (re-measured r5, v5e b2 KITTI, 20-step scan
        harness): in f32 the fused kernel+VJP is a net LOSS at train
        (27.4 vs 26.3 ms/step — the backward's extra softmax recompute
        outweighs the saved relayouts), but under bf16 train compute it
        flips to a win (21.0 vs 21.4 ms/step), consistent with the eval
        policy.  So: eval always eligible; train eligible only when the
        module runs bf16 train compute (``TrainEvalDtype``)."""
        import os

        from ..ops.pallas import attention as pallas_attn

        impl = self.attention_impl or os.environ.get("PDANET_ATTENTION_IMPL")
        if impl == "flax" or self.d_model % self.nhead:
            return None
        if not pallas_attn.supported_shape(
            K, self.nhead, self.d_model // self.nhead
        ):
            return None
        if impl == "pallas_interpret":
            return {"interpret": True}
        if impl == "pallas":  # force (perf probes), bypasses profitability
            return {"interpret": False}
        if (
            (not train or isinstance(self.dtype, TrainEvalDtype))
            and jax.default_backend() == "tpu"
            and pallas_attn.profitable_shape(
                K, self.nhead, self.d_model // self.nhead
            )
        ):
            return {"interpret": False}
        return None

    @nn.compact
    def __call__(self, x, train: bool):
        dt = _infer_dtype(self.dtype, train)
        ln_dt = _norm_dtype(self.dtype, train)
        # NOTE (r5 measured near-negative): the two-pass variance
        # materializes f32 converts of the (B, M, K, D) activations under
        # bf16 compute (~5 ms attributed on the ONCE b2 forward,
        # copy_decomp_probe).  Switching eval to fast single-pass
        # variance recovered only 1.0 ms ONCE / 0.03 ms KITTI e2e (the
        # converts fuse better than the attribution suggested) while
        # perturbing decoded boxes through discrete bin flips — keep the
        # torch-parity two-pass form everywhere.
        # x: (B, M, K, D)
        pallas = self._pallas_impl(train, x.shape[-2])
        x = nn.LayerNorm(epsilon=1e-5, dtype=ln_dt, name="norm1",
                 use_fast_variance=False)(x)  # torch two-pass var
        if pallas is not None:
            attn = NeighborMHAPallas(
                num_heads=self.nhead,
                qkv_features=self.d_model,
                dtype=dt,
                name="self_attn",
                **pallas,
            )(x)
        else:
            # NOTE (r4 measured negative): flattening (B, M) into one
            # batch dim before this einsum attention made the b2 train
            # step WORSE (30.4 -> 35.3 ms/step;
            # tools/probes/train_profile_probe.py); keep the 4-D form.
            # (The bf16 train path dispatches the Pallas kernel instead
            # — see _pallas_impl.)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead,
                qkv_features=self.d_model,
                out_features=self.d_model,
                use_bias=True,
                dtype=dt,
                name="self_attn",
            )(x, x)
        x = x + attn
        x = nn.LayerNorm(epsilon=1e-5, dtype=ln_dt, name="norm2",
                 use_fast_variance=False)(x)  # torch two-pass var
        h = nn.Dense(self.dim_feedforward, dtype=dt, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=dt, name="linear2")(h)
        return x + h
