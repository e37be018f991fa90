"""Part-A2 RoI head — counterpart of
``pcdet/models/roi_heads/partA2_head.py`` (:1-230): RoIAware pooling of
[part-offset | seg-score] (avg) and UNet seg features (max) into
POOL_SIZE^3 grids, parallel part/rpn conv stacks, merged shared/cls/reg
FCs.

Dense re-design: the sparse 14^3 conv stacks become dense 3x3x3 convs
whose outputs re-mask to the pooled occupancy pattern each block (the
submanifold active set — zero-feature empty cells contribute nothing to
the gathers, matching spconv up to BN statistics).
"""

from typing import Any

import flax.linen as nn
from ..norm import BatchNorm
import jax
import jax.numpy as jnp

from ...ops.roi_pool import roiaware_pool3d
from ...utils.easydict import EasyDict


class MaskedConvBlock(nn.Module):
    """conv3x3x3 + BN(eps 1e-3) + ReLU, re-masked to the active set
    (post_act_block 'subm', partA2_head.py:82-90)."""

    features: int

    @nn.compact
    def __call__(self, x, occ, train=False):
        x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                    use_bias=False)(x)
        x = BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        return nn.relu(x) * occ[..., None]


class PartA2HeadNet(nn.Module):
    """(partA2_head.py:10-58, 163-230)."""

    model_cfg: Any
    code_size: int
    num_class: int = 1

    @nn.compact
    def __call__(self, point_coords, seg_features, part_offsets, seg_scores,
                 point_valid, rois, train=False):
        """Args:
            point_coords: (B, V, 3) voxel centers; seg_features: (B, V, C);
            part_offsets: (B, V, 3) sigmoided; seg_scores: (B, V);
            point_valid: (B, V) bool; rois: (B, R, 7).
        Returns:
            rcnn_cls (B, R, num_class), rcnn_reg (B, R, code*num_class).
        """
        cfg = EasyDict(self.model_cfg)
        pool_cfg = EasyDict(cfg.ROI_AWARE_POOL)
        g = int(pool_cfg.POOL_SIZE)
        c0 = int(pool_cfg.NUM_FEATURES) // 2
        B, R = rois.shape[:2]

        # part features: offsets zeroed below the seg-score threshold
        # (partA2_head.py:121-126); DISABLE_PART (PartA2-free) swaps the
        # learned offsets for the raw point coords
        part_src = (
            point_coords if cfg.get("DISABLE_PART", False) else part_offsets
        )
        thresh = float(cfg.get("SEG_MASK_SCORE_THRESH", 0.3))
        masked_off = jnp.where(
            seg_scores[..., None] < thresh, 0.0, part_src
        )
        part_feats = jnp.concatenate(
            [masked_off, seg_scores[..., None]], axis=-1
        )  # (B, V, 4)

        pooled_part = jax.vmap(
            lambda r, p, f, v: roiaware_pool3d(
                r, p, f, (g, g, g), pool_method="avg", point_valid=v
            )
        )(rois, point_coords, part_feats, point_valid)
        pooled_rpn = jax.vmap(
            lambda r, p, f, v: roiaware_pool3d(
                r, p, f, (g, g, g), pool_method="max", point_valid=v
            )
        )(rois, point_coords, seg_features, point_valid)
        # (B, R, g, g, g, C) -> fold rois into the batch axis
        pooled_part = pooled_part.reshape(B * R, g, g, g, -1)
        pooled_rpn = pooled_rpn.reshape(B * R, g, g, g, -1)

        occ = jnp.any(pooled_part != 0, axis=-1).astype(
            pooled_part.dtype
        )  # sparse_idx (partA2_head.py:186)

        x_part = MaskedConvBlock(64, name="conv_part_a")(
            pooled_part, occ, train)
        x_part = MaskedConvBlock(c0, name="conv_part_b")(x_part, occ, train)
        x_rpn = MaskedConvBlock(64, name="conv_rpn_a")(
            pooled_rpn, occ, train)
        x_rpn = MaskedConvBlock(c0, name="conv_rpn_b")(x_rpn, occ, train)

        merged = jnp.concatenate([x_rpn, x_part], axis=-1)
        x = merged.reshape(B, R, -1)

        dp = float(cfg.get("DP_RATIO", 0.0))

        def fc_stack(x, widths, prefix, mode):
            """mode 'between': dropout between layers (the shared stack,
            partA2_head.py:39-40); mode 'first': dropout after layer 0
            (cls/reg via make_fc_layers, roi_head_template.py:39-40)."""
            for k, f in enumerate(widths):
                x = nn.Dense(f, use_bias=False, name=f"{prefix}_fc{k}")(x)
                x = BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, name=f"{prefix}_bn{k}",
                )(x)
                x = nn.relu(x)
                drop = (
                    k != len(widths) - 1 if mode == "between" else k == 0
                )
                if drop and dp > 0:
                    x = nn.Dropout(dp, deterministic=not train)(x)
            return x

        shared = fc_stack(x, list(cfg.SHARED_FC), "shared", "between")
        cls_h = fc_stack(shared, list(cfg.CLS_FC), "cls", "first")
        rcnn_cls = nn.Dense(self.num_class, use_bias=True,
                            name="cls_pred")(cls_h)
        reg_h = fc_stack(shared, list(cfg.REG_FC), "reg", "first")
        rcnn_reg = nn.Dense(
            self.code_size * self.num_class, use_bias=True, name="reg_pred",
            kernel_init=nn.initializers.normal(0.001),
        )(reg_h)
        return rcnn_cls, rcnn_reg
