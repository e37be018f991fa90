"""SparseUNetV2 — the gather-matmul sparse formulation of
``pcdet/models/backbones_3d/spconv_unet.py`` (:1-212, the Part-A2
encoder-decoder) for FULL-RESOLUTION grids where the dense analogue
(`voxel_unet.py`) cannot fit (0.05 m KITTI: 41 x 1600 x 1408).

Encoder = the SparseVoxelBackBone8x ladder (shared blocks).  Decoder =
UR blocks on each level's ACTIVE SET with SparseInverseConv upsampling:
the inverse conv's output sites are exactly the pre-downsample active
set saved during encoding (spconv SparseInverseConv3d semantics), so the
level-1 decoder output aligns row-for-row with the input voxel list —
``point_features`` needs no gather at all.

Same output contract as UNetV2: ``(bev, aux)`` with
``aux = {point_features (B, V, 16), point_valid (B, V)}``.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...ops.sparse_conv import (
    build_inverse_neighbor_table,
    build_neighbor_table,
    downsample_coords,
    gather_matmul_conv,
    stage_grids,
)
from ...utils.easydict import EasyDict
from .sparse_backbone import MaskedBatchNorm, SparseResBlock, SubMConvBlock
from .voxel_unet import channel_reduction


class SparseInverseConv(nn.Module):
    """SparseInverseConv3d analogue: transposed 3x3x3 stride-2 conv whose
    output sites are the pre-downsample active set, + masked BN + ReLU."""

    features: int

    @nn.compact
    def __call__(self, coarse_feats, inv_tab, fine_valid, train=False):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (inv_tab.shape[-1], coarse_feats.shape[-1], self.features),
        )
        h = gather_matmul_conv(coarse_feats, inv_tab, w)
        h = MaskedBatchNorm(name="bn")(h, fine_valid, train)
        return nn.relu(h)


class SparseURBlock(nn.Module):
    """UR_block_forward (spconv_unet.py:135-144) on one active set:
    conv_up_t residual block on the lateral, concat with the bottom-up
    stream, conv_up_m merge + pairwise channel-reduction residual."""

    c_mid: int

    @nn.compact
    def __call__(self, lateral, bottom, nbr_idx, valid, train=False):
        x_trans = SparseResBlock(lateral.shape[-1], name="conv_up_t")(
            lateral, nbr_idx, valid, train)
        x = jnp.concatenate([bottom, x_trans], axis=-1)
        x_m = SubMConvBlock(self.c_mid, name="conv_up_m")(
            x, nbr_idx, valid, train)
        return x_m + channel_reduction(x, self.c_mid)


class SparseUNetV2(nn.Module):
    """model_cfg keys: NUM_FILTERS (default [16, 16, 32, 64, 64]),
    NUM_OUTPUT_FEATURES (128), RETURN_ENCODED_TENSOR (True),
    ACTIVE_BUDGETS (per-level V caps, default all V)."""

    model_cfg: Any
    input_channels: int
    grid_size: Any  # (nx, ny, nz)

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, train=False):
        cfg = EasyDict(self.model_cfg)
        widths = list(cfg.get("NUM_FILTERS", [16, 16, 32, 64, 64]))
        c_out = int(cfg.get("NUM_OUTPUT_FEATURES", 128))
        V = voxel_coords.shape[1]
        budgets = list(cfg.get("ACTIVE_BUDGETS", [V, V, V, V]))

        # reference stage geometry (+1 top z plane, conv4 z pad 0 as in
        # spconv_unet.py:92 — see ops/sparse_conv.stage_grids);
        # SPCONV_ACTIVE_SETS dilates downsample outputs to spconv's sets
        grids, conv4_pad = stage_grids(self.grid_size)
        dilate = bool(cfg.get("SPCONV_ACTIVE_SETS", True))

        coords = voxel_coords
        valid = jnp.all(coords >= 0, axis=-1)
        feats = jnp.where(valid[..., None], voxel_features, 0.0)

        # ---- encoder (VoxelBackBone8x ladder, spconv_unet.py:60-106) ----
        tabs, laterals = [], []
        tab = build_neighbor_table(coords, grids[0])
        feats = SubMConvBlock(widths[0], name="conv_input")(
            feats, tab, valid, train)
        feats = SubMConvBlock(widths[1], name="conv1")(
            feats, tab, valid, train)
        tabs.append(tab)
        laterals.append((coords, feats, valid))

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
                coords, grids[lvl - 1], query_coords=out_coords,
                stride=(2, 2, 2),
                padding=conv4_pad if lvl == 3 else None,
            )
            w = self.param(
                f"{dn}_kernel",
                nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
                (27, feats.shape[-1], width),
            )
            h = gather_matmul_conv(feats, dtab, w)
            h = MaskedBatchNorm(name=f"{dn}_bn")(h, out_valid, train)
            feats = nn.relu(h)
            coords, valid = out_coords, out_valid
            tab = build_neighbor_table(coords, grids[lvl])
            feats = SubMConvBlock(width, name=sa)(feats, tab, valid, train)
            feats = SubMConvBlock(width, name=sb)(feats, tab, valid, train)
            tabs.append(tab)
            laterals.append((coords, feats, valid))

        # ---- encoder output for the RPN head (spconv_unet.py:97-106) ----
        if cfg.get("RETURN_ENCODED_TENSOR", True):
            X4, Y4, Z4 = grids[3]
            zo_ref = Z4 >= 3
            Zo = max((Z4 - 1) // 2 if zo_ref else (Z4 + 1) // 2, 1)
            out_coords = downsample_coords(
                coords, int(budgets[3]), stride=(2, 1, 1),
                out_grid=(Zo, Y4, X4), dilate=dilate, kernel=(3, 1, 1),
                padding=(0, 0, 0) if zo_ref else (1, 0, 0))
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
        else:
            bev = None

        # ---- decoder (spconv_unet.py:195-203) ----
        # ur4 feeds the encoder top both ways (lateral == bottom == x4)
        c4, f4, v4 = laterals[3]
        u = SparseURBlock(widths[4], name="ur4")(f4, f4, tabs[3], v4, train)
        up_widths = [widths[4], widths[2], widths[1]]  # 64, 32, 16
        ur_widths = [widths[3], widths[2], widths[1]]  # 64, 32, 16
        src = (c4, u)
        for i, lvl in enumerate((2, 1, 0)):
            c_coarse, u_coarse = src
            c_fine, f_fine, v_fine = laterals[lvl]
            inv_tab = build_inverse_neighbor_table(
                c_coarse, grids[lvl + 1], query_coords=c_fine,
                padding=conv4_pad if lvl == 2 else None)
            u = SparseInverseConv(up_widths[i], name=f"inv_conv{lvl + 2}")(
                u_coarse, inv_tab, v_fine, train)
            u = SparseURBlock(ur_widths[i], name=f"ur{lvl + 1}")(
                f_fine, u, tabs[lvl], v_fine, train)
            src = (c_fine, u)
        u = SubMConvBlock(widths[1], name="conv5")(
            u, tabs[0], laterals[0][2], train)

        aux = {
            "point_features": u,
            "point_valid": laterals[0][2],
        }
        return bev, aux
