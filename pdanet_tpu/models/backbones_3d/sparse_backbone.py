"""SparseVoxelBackBone8x — the gather-matmul submanifold formulation of
``spconv_backbone.VoxelBackBone8x`` (:15-118) for FULL-RESOLUTION grids
(0.05 m KITTI: 41 x 1600 x 1408), where the dense-grid analogue
(`voxel_backbone.py`) cannot fit.

Structure mirrors the reference ladder (conv_input/conv1 subm 16,
conv2 down 32 + 2 subm, conv3 down 64 + 2 subm, conv4 down 64 + 2 subm,
z-compressing conv_out 128) with:

* one sorted-key neighbor table per level shared by ALL submanifold
  convs of that level (the rulebook analogue — built on device),
* static per-level active-site budgets (V, and V/2^k defaults),
* masked BatchNorm (padding rows touch neither statistics nor running
  averages),
* a dense scatter only at the final level (2 x Y/8 x X/8 — small) for
  the BEV map.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sparse_conv import (
    build_neighbor_table,
    downsample_coords,
    gather_matmul_conv,
    stage_grids,
)
from ...utils.easydict import EasyDict


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid sparse rows only (spconv BatchNorm1d runs on
    the active-site list; padding rows here must not pollute it)."""

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, valid, train=False):
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if train:
            w = valid.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=(0, 1)) / n
            var = jnp.sum(w * (x - mean) ** 2, axis=(0, 1)) / n
            if not self.is_initializing():
                m = self.momentum
                # torch stores the unbiased (n-1) variance in running_var
                # (see models/norm.py); n = valid-row count
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(valid[..., None], y, 0.0)


class SubMConvBlock(nn.Module):
    """Submanifold conv + masked BN + ReLU (post_act_block 'subm')."""

    features: int
    kernel: Sequence[int] = (3, 3, 3)

    @nn.compact
    def __call__(self, feats, nbr_idx, valid, train=False):
        K = int(np.prod(self.kernel))
        C = feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (K, C, self.features),
        )
        h = gather_matmul_conv(feats, nbr_idx, w)
        h = MaskedBatchNorm(name="bn")(h, valid, train)
        return nn.relu(h)


class SparseResBlock(nn.Module):
    """SparseBasicBlock (spconv_unet.py / spconv_backbone.py:121-160):
    two submanifold convs, identity residual, post-residual ReLU.  The
    reference's in-block conv biases are folded into the BN running
    means by the checkpoint converter (convert_res_block3d)."""

    features: int
    kernel: Sequence[int] = (3, 3, 3)

    @nn.compact
    def __call__(self, feats, nbr_idx, valid, train=False):
        K = int(np.prod(self.kernel))
        h = feats
        for i in (1, 2):
            w = self.param(
                f"kernel{i}",
                nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
                (K, h.shape[-1], self.features),
            )
            h = gather_matmul_conv(h, nbr_idx, w)
            h = MaskedBatchNorm(name=f"bn{i}")(h, valid, train)
            if i == 1:
                h = nn.relu(h)
        out = nn.relu(h + feats)
        return jnp.where(valid[..., None], out, 0.0)


class SparseVoxelBackBone8x(nn.Module):
    """model_cfg keys: NUM_FILTERS (default [16, 16, 32, 64, 64]),
    NUM_OUTPUT_FEATURES (128), ACTIVE_BUDGETS (per-level V caps; default
    [V, V, V, V] from the input budget — downsampling only shrinks)."""

    model_cfg: Any
    input_channels: int
    grid_size: Any  # (nx, ny, nz)

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, train=False):
        """(B, V, C) + (B, V, 3) zyx -> (bev, multi_scale) like the dense
        backbone; multi_scale holds sparse (coords, feats, valid) tuples."""
        cfg = EasyDict(self.model_cfg)
        widths = list(cfg.get("NUM_FILTERS", [16, 16, 32, 64, 64]))
        c_out = int(cfg.get("NUM_OUTPUT_FEATURES", 128))
        V = voxel_coords.shape[1]
        budgets = list(cfg.get("ACTIVE_BUDGETS", [V, V, V, V]))

        # reference stage geometry (+1 top z plane, conv4 z pad 0 —
        # see ops/sparse_conv.stage_grids); SPCONV_ACTIVE_SETS (default
        # on) dilates downsample outputs to spconv's exact active sets
        grids, conv4_pad = stage_grids(self.grid_size)
        dilate = bool(cfg.get("SPCONV_ACTIVE_SETS", True))

        def level_grid(g):  # zyx ordering for the key builder
            return (g[0], g[1], g[2])

        coords = voxel_coords
        valid = jnp.all(coords >= 0, axis=-1)
        feats = jnp.where(valid[..., None], voxel_features, 0.0)

        # level 1 (stride 1): conv_input + conv1 share one table
        tab1 = build_neighbor_table(coords, level_grid(grids[0]))
        feats = SubMConvBlock(widths[0], name="conv_input")(
            feats, tab1, valid, train)
        feats = SubMConvBlock(widths[1], name="conv1")(
            feats, tab1, valid, train)
        multi_scale = {"x_conv1": (coords, feats, valid)}

        # levels 2..4: strided down conv + 2 subm convs
        names = [("conv2_down", "conv2_a", "conv2_b", widths[2]),
                 ("conv3_down", "conv3_a", "conv3_b", widths[3]),
                 ("conv4_down", "conv4_a", "conv4_b", widths[4])]
        for lvl, (dn, sa, sb, width) in enumerate(names, start=1):
            gx, gy, gz = grids[lvl]
            out_coords = downsample_coords(
                coords, int(budgets[lvl]), out_grid=(gz, gy, gx),
                dilate=dilate,
                padding=(conv4_pad or (1, 1, 1)) if lvl == 3 else (1, 1, 1),
            )
            out_valid = jnp.all(out_coords >= 0, axis=-1)
            dtab = build_neighbor_table(
                coords, level_grid(grids[lvl - 1]),
                query_coords=out_coords, stride=(2, 2, 2),
                padding=conv4_pad if lvl == 3 else None,
            )
            K = 27
            C = feats.shape[-1]
            w = self.param(
                f"{dn}_kernel",
                nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
                (K, C, width),
            )
            h = gather_matmul_conv(feats, dtab, w)
            h = MaskedBatchNorm(name=f"{dn}_bn")(h, out_valid, train)
            feats = nn.relu(h)
            coords, valid = out_coords, out_valid
            tab = build_neighbor_table(coords, level_grid(grids[lvl]))
            feats = SubMConvBlock(width, name=sa)(feats, tab, valid, train)
            feats = SubMConvBlock(width, name=sb)(feats, tab, valid, train)
            multi_scale[f"x_conv{lvl + 1}"] = (coords, feats, valid)

        # conv_out: z-compressing (3,1,1) stride (2,1,1) conv with the
        # reference's last_pad=0 (spconv_backbone.py:110-115)
        X4, Y4, Z4 = grids[3]
        zo_ref = Z4 >= 3
        Zo = max((Z4 - 1) // 2 if zo_ref else (Z4 + 1) // 2, 1)
        out_coords = downsample_coords(
            coords, int(budgets[3]), stride=(2, 1, 1),
            out_grid=(Zo, Y4, X4), dilate=dilate, kernel=(3, 1, 1),
            padding=(0, 0, 0) if zo_ref else (1, 0, 0),
        )
        out_valid = jnp.all(out_coords >= 0, axis=-1)
        otab = build_neighbor_table(
            coords, level_grid(grids[3]), query_coords=out_coords,
            stride=(2, 1, 1), kernel=(3, 1, 1),
            padding=(0, 0, 0) if zo_ref else None,
        )
        w = self.param(
            "conv_out_kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (3, feats.shape[-1], c_out),
        )
        h = gather_matmul_conv(feats, otab, w)
        h = MaskedBatchNorm(name="conv_out_bn")(h, out_valid, train)
        h = nn.relu(h)

        # dense scatter of the FINAL level only: (Zo, Y4, X4) is small
        B = h.shape[0]
        canvas = jnp.zeros((B, Zo, Y4, X4, c_out), h.dtype)
        zs = jnp.where(out_valid, out_coords[..., 0], Zo)
        ys = jnp.where(out_valid, out_coords[..., 1], Y4)
        xs = jnp.where(out_valid, out_coords[..., 2], X4)
        bidx = jnp.broadcast_to(
            jnp.arange(B)[:, None], out_coords.shape[:2]
        )
        canvas = canvas.at[bidx, zs, ys, xs].set(
            jnp.where(out_valid[..., None], h, 0.0), mode="drop"
        )
        bev = jnp.transpose(canvas, (0, 2, 3, 1, 4)).reshape(
            B, Y4, X4, Zo * c_out
        )
        return bev, multi_scale


class SparseVoxelResBackBone8x(nn.Module):
    """Gather-matmul ``VoxelResBackBone8x`` (spconv_backbone.py:183-293)
    for FULL-RESOLUTION grids — the reference CenterPoint backbone at
    the 0.05 m KITTI grid, where the dense analogue's level-1 tensor
    alone is ~6 GB.  conv_input SubM(16) -> 2x SparseResBlock per level
    with strided downs (32/64/128) -> z-compressing conv_out(128).
    Same reference-exact stage geometry (stage_grids) and spconv active
    sets (dilate) as SparseVoxelBackBone8x; model_cfg keys NUM_FILTERS
    (default [16, 16, 32, 64, 128]), NUM_OUTPUT_FEATURES (128),
    ACTIVE_BUDGETS, SPCONV_ACTIVE_SETS."""

    model_cfg: Any
    input_channels: int
    grid_size: Any  # (nx, ny, nz)

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, train=False):
        cfg = EasyDict(self.model_cfg)
        widths = list(cfg.get("NUM_FILTERS", [16, 16, 32, 64, 128]))
        c_out = int(cfg.get("NUM_OUTPUT_FEATURES", 128))
        V = voxel_coords.shape[1]
        budgets = list(cfg.get("ACTIVE_BUDGETS", [V, V, V, V]))
        grids, conv4_pad = stage_grids(self.grid_size)
        dilate = bool(cfg.get("SPCONV_ACTIVE_SETS", True))

        coords = voxel_coords
        valid = jnp.all(coords >= 0, axis=-1)
        feats = jnp.where(valid[..., None], voxel_features, 0.0)

        tab = build_neighbor_table(coords, grids[0])
        feats = SubMConvBlock(widths[0], name="conv_input")(
            feats, tab, valid, train)
        feats = SparseResBlock(widths[1], name="res1_a")(
            feats, tab, valid, train)
        feats = SparseResBlock(widths[1], name="res1_b")(
            feats, tab, valid, train)
        multi_scale = {"x_conv1": (coords, feats, valid)}

        for lvl, width in ((1, widths[2]), (2, widths[3]), (3, widths[4])):
            gx, gy, gz = grids[lvl]
            out_coords = downsample_coords(
                coords, int(budgets[lvl]), out_grid=(gz, gy, gx),
                dilate=dilate,
                padding=(conv4_pad or (1, 1, 1)) if lvl == 3 else (1, 1, 1),
            )
            out_valid = jnp.all(out_coords >= 0, axis=-1)
            dtab = build_neighbor_table(
                coords, grids[lvl - 1], query_coords=out_coords,
                stride=(2, 2, 2),
                padding=conv4_pad if lvl == 3 else None,
            )
            w = self.param(
                f"conv{lvl + 1}_down_kernel",
                nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
                (27, feats.shape[-1], width),
            )
            h = gather_matmul_conv(feats, dtab, w)
            h = MaskedBatchNorm(name=f"conv{lvl + 1}_down_bn")(
                h, out_valid, train)
            feats = nn.relu(h)
            coords, valid = out_coords, out_valid
            tab = build_neighbor_table(coords, grids[lvl])
            feats = SparseResBlock(width, name=f"res{lvl + 1}_a")(
                feats, tab, valid, train)
            feats = SparseResBlock(width, name=f"res{lvl + 1}_b")(
                feats, tab, valid, train)
            multi_scale[f"x_conv{lvl + 1}"] = (coords, feats, valid)

        # conv_out with the reference's last_pad=0
        X4, Y4, Z4 = grids[3]
        zo_ref = Z4 >= 3
        Zo = max((Z4 - 1) // 2 if zo_ref else (Z4 + 1) // 2, 1)
        out_coords = downsample_coords(
            coords, int(budgets[3]), stride=(2, 1, 1),
            out_grid=(Zo, Y4, X4), dilate=dilate, kernel=(3, 1, 1),
            padding=(0, 0, 0) if zo_ref else (1, 0, 0),
        )
        out_valid = jnp.all(out_coords >= 0, axis=-1)
        otab = build_neighbor_table(
            coords, grids[3], query_coords=out_coords,
            stride=(2, 1, 1), kernel=(3, 1, 1),
            padding=(0, 0, 0) if zo_ref else None,
        )
        w = self.param(
            "conv_out_kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (3, feats.shape[-1], c_out),
        )
        h = gather_matmul_conv(feats, otab, w)
        h = MaskedBatchNorm(name="conv_out_bn")(h, out_valid, train)
        h = nn.relu(h)

        B = h.shape[0]
        canvas = jnp.zeros((B, Zo, Y4, X4, c_out), h.dtype)
        zs = jnp.where(out_valid, out_coords[..., 0], Zo)
        ys = jnp.where(out_valid, out_coords[..., 1], Y4)
        xs = jnp.where(out_valid, out_coords[..., 2], X4)
        bidx = jnp.broadcast_to(
            jnp.arange(B)[:, None], out_coords.shape[:2])
        canvas = canvas.at[bidx, zs, ys, xs].set(
            jnp.where(out_valid[..., None], h, 0.0), mode="drop")
        bev = jnp.transpose(canvas, (0, 2, 3, 1, 4)).reshape(
            B, Y4, X4, Zo * c_out)
        return bev, multi_scale
