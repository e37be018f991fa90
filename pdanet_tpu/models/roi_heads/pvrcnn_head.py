"""PV-RCNN RoI head — counterpart of
``pcdet/models/roi_heads/pvrcnn_head.py`` (:1-180): RoI 6x6x6 grid points
ball-query the VSA keypoints (StackSAModuleMSG aggregation), flattened
grid features feed shared/cls/reg FC stacks.

Dense re-design: grid points are (B, R*g^3, 3) batched centers, so the
pooling is the same ``MaskedSAModuleMSG`` the PFE uses — no stacked-batch
offset bookkeeping.
"""

from typing import Any

import flax.linen as nn
from ..norm import BatchNorm
import jax.numpy as jnp

from ...utils.easydict import EasyDict
from ..backbones_3d.pfe.voxel_set_abstraction import MaskedSAModuleMSG
from .voxelrcnn_head import get_dense_grid_points


class PVRCNNHeadNet(nn.Module):
    """RoI grid pooling + refinement FCs (pvrcnn_head.py:66-180)."""

    model_cfg: Any
    code_size: int
    num_class: int = 1

    @nn.compact
    def __call__(self, point_coords, point_features, rois, train=False):
        """Args:
            point_coords: (B, K, 3) keypoints;
            point_features: (B, K, C) keypoint features (already weighted
                by the point-head foreground scores, pvrcnn_head.py:85);
            rois: (B, R, 7).
        Returns:
            rcnn_cls (B, R, num_class), rcnn_reg (B, R, code*num_class).
        """
        cfg = EasyDict(self.model_cfg)
        pool_cfg = EasyDict(cfg.ROI_GRID_POOL)
        g = int(pool_cfg.GRID_SIZE)
        B, R = rois.shape[:2]
        grid_xyz = get_dense_grid_points(rois, g).reshape(B, R * g**3, 3)

        if pool_cfg.get("NAME") == "VectorPoolAggregationModuleMSG":
            # PV-RCNN++ grid pooling (pv_rcnn_plusplus ROI_GRID_POOL)
            from ..backbones_3d.pfe.vector_pool import (
                VectorPoolAggregationModuleMSG,
            )

            pooled = VectorPoolAggregationModuleMSG(
                input_channels=int(point_features.shape[-1]),
                config=pool_cfg, name="roi_grid_pool",
            )(point_coords, point_features, grid_xyz, train)
        else:
            pooled = MaskedSAModuleMSG(
                radii=tuple(pool_cfg.POOL_RADIUS),
                nsamples=tuple(pool_cfg.NSAMPLE),
                mlps=tuple(tuple(m) for m in pool_cfg.MLPS),
                name="roi_grid_pool",
            )(point_coords, point_features, grid_xyz, train)  # (B, R*g^3, C)
        x = pooled.reshape(B, R, -1)

        dp = float(cfg.get("DP_RATIO", 0.0))

        def fc_stack(x, widths, prefix, mode):
            """mode 'between': dropout between layers (the shared stack,
            pvrcnn_head.py:29-30); mode 'first': dropout after layer 0
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
        rcnn_cls = nn.Dense(
            self.num_class, use_bias=True, name="cls_pred",
        )(cls_h)
        reg_h = fc_stack(shared, list(cfg.REG_FC), "reg", "first")
        rcnn_reg = nn.Dense(
            self.code_size * self.num_class, use_bias=True, name="reg_pred",
            kernel_init=nn.initializers.normal(0.001),
        )(reg_h)
        return rcnn_cls, rcnn_reg
