"""Voxel 3D backbone — counterpart of
``pcdet/models/backbones_3d/spconv_backbone.py`` (VoxelBackBone8x,
:15-118, and VoxelResBackBone8x, :121-293).

TPU-first divergence: the reference runs submanifold/sparse 3D convs
(spconv).  XLA has no sparse conv primitive and the MXU wants dense
batched contractions, so the rebuild scatters the (B, V, C) voxel
features into a dense channels-last ``(B, Z, Y, X, C)`` grid once and
runs ordinary ``nn.Conv`` 3D stacks — the same stage layout (x1, x2
stride-2, x3 stride-2, x4 stride-2, z-compressing conv_out), the same
channel ladder (16-16-32-64-64-128).  At KITTI/ONCE grid sizes the
dense grid is MXU-tileable and XLA fuses the BN+ReLU chains; the
gather-matmul submanifold formulation (sparse_backbone.py) covers very
large grids.

Geometry matches the reference checkpoint contract exactly: the grid
carries the reference's empty top z plane (sparse_shape =
``grid_size[::-1] + [1, 0, 0]``, spconv_backbone.py:75), stride-2 convs
use explicit torch pad-1 alignment (flax SAME splits even-dim padding
as (0, 1), shifting every window by one), conv4's z axis uses the
reference's ``padding=(0, 1, 1)`` (:105) and conv_out its ``last_pad=0``
(:110-115) — so the KITTI z chain is 41→21→11→5→2 and the BEV map is
``2*128 = 256`` channels, as a converted reference checkpoint expects.
"""

from typing import Any

import flax.linen as nn
from ..norm import BatchNorm
import jax
import jax.numpy as jnp

from ...utils.easydict import EasyDict


def scatter_to_dense(voxel_features, voxel_coords, grid_size, z_pad=1):
    """(B, V, C) + (B, V, 3) zyx coords (-1 pads) -> (B, Z+z_pad, Y, X, C).

    ``z_pad=1`` reproduces the reference's sparse_shape =
    ``grid_size[::-1] + [1, 0, 0]`` (spconv_backbone.py:75): one empty
    top z plane, which shifts the downsample chain (41→21→11→5→2 on
    KITTI) and thereby the BEV channel count."""
    B, V, C = voxel_features.shape
    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    nz = nz + int(z_pad)
    valid = voxel_coords[..., 0] >= 0
    zs = jnp.where(valid, voxel_coords[..., 0], nz)  # oob -> dropped
    ys = jnp.where(valid, voxel_coords[..., 1], ny)
    xs = jnp.where(valid, voxel_coords[..., 2], nx)
    feats = jnp.where(valid[..., None], voxel_features, 0.0)
    canvas = jnp.zeros((B, nz, ny, nx, C), dtype=voxel_features.dtype)
    batch_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))
    return canvas.at[batch_idx, zs, ys, xs].set(feats, mode="drop")


def pad_top_z(x):
    """Append the reference's empty top z plane to a pre-scattered dense
    grid (dynamic-VFE path, which scatters to the raw (nz, ny, nx))."""
    return jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))


def down_z_pad(z):
    """z padding for conv4/conv_out: the reference uses z padding 0
    there (``padding=(0, 1, 1)`` spconv_backbone.py:105 and
    ``last_pad=0`` :110).  Degenerate tiny test grids where pad-0 would
    collapse z below one plane (shapes the reference itself cannot run)
    fall back to pad 1."""
    return (0, 0) if int(z) >= 3 else (1, 1)


def occupancy_levels(occ0):
    """Active-site masks for the 4 stages + conv_out from the stride-1
    occupancy (B, Z0, Y0, X0).

    spconv semantics: a downsample output site is active iff its tap
    window contains an active input — a k3/s2 max-pool with the stage's
    padding (z rules mirror ``down_z_pad``: conv4 z pad 0, last_pad 0).
    These masks make the dense ladder SUBMANIFOLD-EXACT: zeroing
    inactive cells after every block removes the ``relu(BN(0))`` ghost
    activations a plain dense conv would inject into active sites'
    neighborhoods, so dense values match spconv's at active sites."""
    occs = [occ0]
    cur = occ0.astype(jnp.float32)
    for lvl in (1, 2, 3):
        zp = (1, 1) if lvl < 3 else down_z_pad(cur.shape[1])
        cur = jax.lax.reduce_window(
            cur, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 3), window_strides=(1, 2, 2, 2),
            padding=((0, 0), zp, (1, 1), (1, 1)))
        occs.append(cur > 0)
    out = jax.lax.reduce_window(
        cur, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 1, 1), window_strides=(1, 2, 1, 1),
        padding=((0, 0), down_z_pad(cur.shape[1]), (0, 0), (0, 0)))
    occs.append(out > 0)
    return occs


def grid_occupancies(x, voxel_coords, model_cfg):
    """Stage occupancies for submanifold masking (config key
    ``SUBMANIFOLD_MASKING``, default on); ``[None] * 5`` when disabled.
    The stride-1 set comes from the voxel coords, or — on the
    dynamic-VFE pre-scattered path — from nonzero cells of the grid."""
    if not bool(EasyDict(model_cfg or {}).get("SUBMANIFOLD_MASKING", True)):
        return [None] * 5
    if voxel_coords is None:
        occ0 = jnp.any(x != 0, axis=-1)
    else:
        B, Z, Y, X, _ = x.shape
        ones = jnp.ones(voxel_coords.shape[:2] + (1,), jnp.float32)
        occ0 = scatter_to_dense(
            ones, voxel_coords, (X, Y, Z - 1))[..., 0] > 0
    return occupancy_levels(occ0)


class DenseMaskedBatchNorm(nn.Module):
    """BatchNorm over ACTIVE grid cells only (spconv's BatchNorm1d runs
    on the active-site list), zeroing inactive cells.  Parameter/stat
    leaf names match ``nn.BatchNorm`` (scale/bias + mean/var), so the
    checkpoint converter's tree layout is unchanged."""

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, occ, train=False):
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if train:
            w = occ.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=(0, 1, 2, 3)) / n
            var = jnp.sum(w * (x - mean) ** 2, axis=(0, 1, 2, 3)) / n
            if not self.is_initializing():
                m = self.momentum
                # torch stores the unbiased (n-1) variance in running_var
                # (see models/norm.py); n = active-site count here
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(occ[..., None], y, 0.0)


class Conv3DBNReLU(nn.Module):
    features: int
    kernel: Any = (3, 3, 3)
    stride: Any = (1, 1, 1)
    #: None -> torch pad k//2 per axis (1 for k=3, 0 for k=1).  Explicit
    #: (lo, hi) pairs override (conv4's z pad 0, conv_out's last_pad 0).
    #: flax SAME is NOT equivalent at stride 2 on even dims (it splits
    #: the single pad as (0, 1), shifting every window by one vs torch).
    padding: Any = None
    # flax 0.99 == spconv's torch momentum 0.01 (spconv_backbone.py:73):
    # running stats converge over ~500 steps.  BN_MOMENTUM in the backbone
    # config overrides (fixture-scale runs need faster-settling stats).
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train=False, occ=None):
        pad = self.padding
        if pad is None:
            pad = tuple((int(k) // 2, int(k) // 2) for k in self.kernel)
        x = nn.Conv(
            self.features, kernel_size=tuple(self.kernel),
            strides=tuple(self.stride), padding=pad, use_bias=False,
        )(x)
        if occ is None:
            x = BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                epsilon=1e-3, name="BatchNorm_0",
            )(x)
        else:
            x = DenseMaskedBatchNorm(
                momentum=self.bn_momentum, name="BatchNorm_0",
            )(x, occ, train)
        return nn.relu(x)


class VoxelBackBone8x(nn.Module):
    """Stage layout of spconv_backbone.py:15-118 on a dense grid.

    Returns the z-compressed BEV map ``(B, Y/8, X/8, Z_out * C_out)``
    directly (HeightCompression folded in — on a dense layout it is a
    pure reshape, map_to_bev/height_compression.py:8-26 of the
    reference).
    """

    model_cfg: Any
    input_channels: int
    grid_size: Any  # (nx, ny, nz)

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, train=False):
        cfg = EasyDict(self.model_cfg)
        widths = list(cfg.get("NUM_FILTERS", [16, 16, 32, 64, 64]))
        c_out = int(cfg.get("NUM_OUTPUT_FEATURES", 128))
        bn_m = float(cfg.get("BN_MOMENTUM", 0.99))

        # voxel_coords None => voxel_features is already the dense grid
        # (dynamic VFEs scatter on-device, without the top z plane)
        if voxel_coords is None:
            x = pad_top_z(voxel_features)
        else:
            x = scatter_to_dense(voxel_features, voxel_coords, self.grid_size)
        occs = grid_occupancies(x, voxel_coords, self.model_cfg)
        x = Conv3DBNReLU(widths[0], name="conv_input", bn_momentum=bn_m)(
            x, train, occs[0])
        x1 = Conv3DBNReLU(widths[1], name="conv1", bn_momentum=bn_m)(
            x, train, occs[0])
        # each level: down conv + BOTH subm blocks (spconv_backbone.py:84-98)
        x = Conv3DBNReLU(widths[2], stride=(2, 2, 2), name="conv2_down", bn_momentum=bn_m)(
            x1, train, occs[1])
        x = Conv3DBNReLU(widths[2], name="conv2_a", bn_momentum=bn_m)(x, train, occs[1])
        x2 = Conv3DBNReLU(widths[2], name="conv2_b", bn_momentum=bn_m)(x, train, occs[1])
        x = Conv3DBNReLU(widths[3], stride=(2, 2, 2), name="conv3_down", bn_momentum=bn_m)(
            x2, train, occs[2])
        x = Conv3DBNReLU(widths[3], name="conv3_a", bn_momentum=bn_m)(x, train, occs[2])
        x3 = Conv3DBNReLU(widths[3], name="conv3_b", bn_momentum=bn_m)(x, train, occs[2])
        # conv4: reference z padding 0 (spconv_backbone.py:105)
        x = Conv3DBNReLU(
            widths[4], stride=(2, 2, 2),
            padding=(down_z_pad(x3.shape[1]), (1, 1), (1, 1)),
            name="conv4_down", bn_momentum=bn_m)(x3, train, occs[3])
        x = Conv3DBNReLU(widths[4], name="conv4_a", bn_momentum=bn_m)(x, train, occs[3])
        x4 = Conv3DBNReLU(widths[4], name="conv4_b", bn_momentum=bn_m)(x, train, occs[3])
        # conv_out: z-compressing (2,1,1)-stride (3,1,1) conv with
        # last_pad=0 (ref :100-115)
        x = Conv3DBNReLU(
            c_out, kernel=(3, 1, 1), stride=(2, 1, 1),
            padding=(down_z_pad(x4.shape[1]), (0, 0), (0, 0)),
            name="conv_out",
        )(x4, train, occs[4])
        # height compression: (B, Z', Y', X', C) -> (B, Y', X', Z'*C)
        B, Z, Y, X, C = x.shape
        bev = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, Y, X, Z * C)
        # multi_scale_3d_features (spconv_backbone.py:165-178), strides
        # 1/2/4/8 — consumed by VoxelRCNN/VSA-style pooling stages
        multi_scale = {
            "x_conv1": x1, "x_conv2": x2, "x_conv3": x3, "x_conv4": x4,
        }
        return bev, multi_scale


class ResBlock3D(nn.Module):
    """Dense analogue of ``SparseBasicBlock`` (spconv_backbone.py:~1-60 in
    the reference's partA2 sibling): conv-bn-relu-conv-bn + identity,
    post-add ReLU."""

    features: int
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train=False, occ=None):
        def bn(name, h):
            if occ is None:
                return BatchNorm(use_running_average=not train,
                                    momentum=self.bn_momentum,
                                    epsilon=1e-3, name=name)(h)
            return DenseMaskedBatchNorm(
                momentum=self.bn_momentum, name=name)(h, occ, train)

        h = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                    use_bias=False, name="conv1")(x)
        h = nn.relu(bn("bn1", h))
        h = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                    use_bias=False, name="conv2")(h)
        h = bn("bn2", h)
        return nn.relu(x + h)


class VoxelResBackBone8x(nn.Module):
    """Dense analogue of ``VoxelResBackBone8x`` (spconv_backbone.py:183-293):
    conv_input(16) -> 2xres(16) -> down(32)+2xres -> down(64)+2xres ->
    down(128)+2xres -> z-compressing conv_out(128).

    Returns (bev, multi_scale) where bev is the height-compressed
    ``(B, Y/8, X/8, Z_out*128)`` map and multi_scale is the
    ``multi_scale_3d_features`` dict (x_conv1..x_conv4 dense tensors,
    strides 1/2/4/8) consumed by VoxelSetAbstraction / UNet decoders.
    """

    model_cfg: Any
    input_channels: int
    grid_size: Any  # (nx, ny, nz)

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, train=False):
        bn_m = float(EasyDict(self.model_cfg).get("BN_MOMENTUM", 0.99))
        if voxel_coords is None:  # dynamic VFE: pre-scattered dense grid
            x = pad_top_z(voxel_features)
        else:
            x = scatter_to_dense(voxel_features, voxel_coords, self.grid_size)
        occs = grid_occupancies(x, voxel_coords, self.model_cfg)
        x = Conv3DBNReLU(16, name="conv_input", bn_momentum=bn_m)(
            x, train, occs[0])
        x1 = ResBlock3D(16, name="res1_b", bn_momentum=bn_m)(
            ResBlock3D(16, name="res1_a", bn_momentum=bn_m)(
                x, train, occs[0]), train, occs[0])
        x = Conv3DBNReLU(32, stride=(2, 2, 2), name="conv2_down", bn_momentum=bn_m)(
            x1, train, occs[1])
        x2 = ResBlock3D(32, name="res2_b", bn_momentum=bn_m)(
            ResBlock3D(32, name="res2_a", bn_momentum=bn_m)(
                x, train, occs[1]), train, occs[1])
        x = Conv3DBNReLU(64, stride=(2, 2, 2), name="conv3_down", bn_momentum=bn_m)(
            x2, train, occs[2])
        x3 = ResBlock3D(64, name="res3_b", bn_momentum=bn_m)(
            ResBlock3D(64, name="res3_a", bn_momentum=bn_m)(
                x, train, occs[2]), train, occs[2])
        # conv4 z pad 0 (spconv_backbone.py:219 padding=(0, 1, 1))
        x = Conv3DBNReLU(
            128, stride=(2, 2, 2),
            padding=(down_z_pad(x3.shape[1]), (1, 1), (1, 1)),
            name="conv4_down", bn_momentum=bn_m)(x3, train, occs[3])
        x4 = ResBlock3D(128, name="res4_b", bn_momentum=bn_m)(
            ResBlock3D(128, name="res4_a", bn_momentum=bn_m)(
                x, train, occs[3]), train, occs[3])
        out = Conv3DBNReLU(128, kernel=(3, 1, 1), stride=(2, 1, 1),
                           padding=(down_z_pad(x4.shape[1]), (0, 0), (0, 0)),
                           name="conv_out", bn_momentum=bn_m)(
            x4, train, occs[4])
        B, Z, Y, X, C = out.shape
        bev = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(B, Y, X, Z * C)
        multi_scale = {
            "x_conv1": x1, "x_conv2": x2, "x_conv3": x3, "x_conv4": x4,
        }
        return bev, multi_scale
