"""SECOND detector — counterpart of ``pcdet/models/detectors/second_net.py``
over MeanVFE -> 3D voxel backbone (+ folded height compression) -> BEV
backbone -> anchor head.

Shares the anchor pipeline with PointPillar (``dense_heads/anchor_head``);
only the feature extractor differs (dense 3D conv stack instead of the
pillar scatter)."""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...utils.box_coder_utils import build_box_coder
from ...utils.easydict import EasyDict
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_3d.vfe.mean_vfe import MeanVFE
from ..backbones_3d.voxel_backbone import VoxelBackBone8x, VoxelResBackBone8x
from ..backbones_3d.sparse_backbone import (
    SparseVoxelBackBone8x,
    SparseVoxelResBackBone8x,
)
from ..backbones_3d.sparse_unet import SparseUNetV2
from ..backbones_3d.voxel_unet import UNetV2
from ..dense_heads import anchor_head as AH

#: 3D backbone registry; each returns (bev_map, aux) where aux is the
#: multi-scale tap dict (conv backbones) or decoder outputs (UNetV2)
_BACKBONES_3D = {
    "VoxelBackBone8x": VoxelBackBone8x,
    "VoxelResBackBone8x": VoxelResBackBone8x,
    "UNetV2": UNetV2,
    "SparseVoxelBackBone8x": SparseVoxelBackBone8x,
    "SparseVoxelResBackBone8x": SparseVoxelResBackBone8x,
    "SparseUNetV2": SparseUNetV2,
}


class SECOND(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int = 4
    grid_size: Any = None  # (nx, ny, nz)
    voxel_size: Any = None
    point_cloud_range: Any = None
    class_names: Any = None

    @property
    def DEVICE_BATCH_KEYS(self):
        """Dynamic VFEs consume the raw fixed-budget cloud instead of the
        voxel triplet (resolved from the config — flax setup state is not
        visible outside apply)."""
        vfe = dict(self.model_cfg.get("VFE", {}) or {})
        if vfe.get("NAME", "MeanVFE").startswith("Dynamic"):
            return ("points", "gt_boxes")
        return ("voxels", "voxel_coords", "voxel_num_points", "gt_boxes")

    def setup(self):
        cfg = EasyDict(self.model_cfg)
        object.__setattr__(self, "cfg", cfg)
        vfe_cfg = cfg.get("VFE", {})
        vfe_name = vfe_cfg.get("NAME", "MeanVFE") if vfe_cfg else "MeanVFE"
        object.__setattr__(self, "dynamic_vfe", vfe_name == "DynamicMeanVFE")
        if self.dynamic_vfe:
            from ..backbones_3d.vfe.dynamic_mean_vfe import DynamicMeanVFE

            self.vfe = DynamicMeanVFE(
                model_cfg=vfe_cfg,
                num_point_features=self.input_channels,
                grid_size=self.grid_size,
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                name="vfe",
            )
        else:
            self.vfe = MeanVFE(
                model_cfg=vfe_cfg,
                num_point_features=self.input_channels,
                name="vfe",
            )
        b3d_cfg = cfg.get("BACKBONE_3D", {})
        self.backbone_3d = _BACKBONES_3D[b3d_cfg.get("NAME", "VoxelBackBone8x")](
            model_cfg=b3d_cfg,
            input_channels=self.input_channels,
            grid_size=self.grid_size,
            name="backbone_3d",
        )
        self.backbone_2d = BaseBEVBackbone(
            model_cfg=cfg.BACKBONE_2D,
            input_channels=cfg.MAP_TO_BEV.NUM_BEV_FEATURES,
            name="backbone_2d",
        )
        head_cfg = cfg.DENSE_HEAD
        anchors, num_per_loc = AH.generate_anchors(
            head_cfg.ANCHOR_GENERATOR_CONFIG,
            self.grid_size,
            self.point_cloud_range,
        )
        flat, per_class = AH.flat_anchors_per_class(anchors)
        object.__setattr__(self, "anchors_flat", jnp.asarray(flat))
        object.__setattr__(
            self, "per_class_anchors", [jnp.asarray(a) for a in per_class]
        )
        object.__setattr__(self, "num_anchors_per_location", sum(num_per_loc))
        self.box_coder = build_box_coder(
            head_cfg.TARGET_ASSIGNER_CONFIG.BOX_CODER, {}
        )
        if head_cfg.get("NAME", "AnchorHeadSingle") == "AnchorHeadMulti":
            from ..dense_heads import anchor_head_multi as AHM

            names = [
                c["class_name"] for c in head_cfg.ANCHOR_GENERATOR_CONFIG
            ]
            groups = AHM.build_head_groups(head_cfg.RPN_HEAD_CFGS, names)
            flat_mh, counts = AHM.multihead_flat_anchors(per_class, groups)
            object.__setattr__(self, "anchors_flat", flat_mh)
            object.__setattr__(self, "head_groups", groups)
            object.__setattr__(self, "head_anchor_counts", counts)
            self.dense_head = AHM.AnchorHeadMultiNet(
                model_cfg=head_cfg,
                head_groups=tuple(tuple(g) for g in groups),
                num_anchors_per_loc_per_class=tuple(num_per_loc),
                code_size=self.box_coder.code_size,
                num_class=self.num_class,
                name="dense_head",
            )
        else:
            object.__setattr__(self, "head_groups", None)
            self.dense_head = AH.AnchorHeadSingleNet(
                num_class=self.num_class,
                num_anchors_per_location=self.num_anchors_per_location,
                code_size=self.box_coder.code_size,
                use_direction_classifier=head_cfg.get(
                    "USE_DIRECTION_CLASSIFIER", True
                ),
                num_dir_bins=head_cfg.get("NUM_DIR_BINS", 2),
                name="dense_head",
            )

    def __call__(self, voxels, voxel_coords, voxel_num_points, train=False):
        if self.dynamic_vfe:
            # 'voxels' carries the raw (B, N, 3+C) cloud; the VFE scatters
            # the dense grid on-device (voxel_coords/num_points unused)
            dense_grid = self.vfe(voxels, train=train)
            voxel_features, voxel_coords = dense_grid, None
        else:
            voxel_features = self.vfe(voxels, voxel_num_points, train=train)
        spatial, multi_scale = self.backbone_3d(
            voxel_features, voxel_coords, train=train
        )
        spatial_2d = self.backbone_2d(spatial, train=train)
        if self.head_groups is not None:
            from ..dense_heads import anchor_head_multi as AHM

            head_cfg = self.cfg.DENSE_HEAD
            head_outs = self.dense_head(spatial_2d, train=train)
            cls_preds, box_preds, dir_preds = AHM.concat_head_preds(
                head_outs, self.head_groups, self.num_class,
                self.box_coder.code_size, head_cfg.get("NUM_DIR_BINS", 2),
                head_cfg.get("SEPARATE_MULTIHEAD", False),
            )
        else:
            head_outs = None
            cls_preds, box_preds, dir_preds = self.dense_head(spatial_2d)
        batch_cls, batch_boxes = AH.generate_predicted_boxes(
            cls_preds, box_preds, dir_preds, self.anchors_flat,
            self.box_coder, self.num_class,
            dir_offset=self.cfg.DENSE_HEAD.get("DIR_OFFSET", 0.78539),
            dir_limit_offset=self.cfg.DENSE_HEAD.get("DIR_LIMIT_OFFSET", 0.0),
            num_dir_bins=self.cfg.DENSE_HEAD.get("NUM_DIR_BINS", 2),
        )
        return {
            "cls_preds": cls_preds,
            "box_preds": box_preds,
            "dir_cls_preds": dir_preds,
            "head_outs": head_outs,
            "batch_cls_preds": batch_cls,
            "batch_box_preds": batch_boxes,
            "spatial_features": spatial,  # pre-2D BEV map (VSA interpolates)
            "spatial_features_2d": spatial_2d,  # RoI stages pool from this
            "multi_scale_3d_features": multi_scale,
        }

    def loss(self, forward_out, gt_boxes, class_names):
        head_cfg = self.cfg.DENSE_HEAD
        class_ids = [
            class_names.index(c["class_name"]) + 1
            for c in head_cfg.ANCHOR_GENERATOR_CONFIG
        ]
        thresholds = [
            (c["matched_threshold"], c["unmatched_threshold"])
            for c in head_cfg.ANCHOR_GENERATOR_CONFIG
        ]
        if self.head_groups is not None:
            from ..dense_heads import anchor_head_multi as AHM

            targets = AHM.assign_targets_multi(
                self.per_class_anchors, self.head_groups, gt_boxes,
                class_ids, thresholds, self.box_coder,
            )
            return AHM.anchor_head_multi_loss(
                forward_out["head_outs"], self.head_groups,
                self.head_anchor_counts, targets, self.anchors_flat,
                self.num_class, dict(head_cfg.LOSS_CONFIG.LOSS_WEIGHTS),
                self.box_coder.code_size,
                dir_offset=head_cfg.get("DIR_OFFSET", 0.78539),
                num_dir_bins=head_cfg.get("NUM_DIR_BINS", 2),
                separate=head_cfg.get("SEPARATE_MULTIHEAD", False),
            )
        ta_cfg = head_cfg.TARGET_ASSIGNER_CONFIG
        if ta_cfg.get("NAME", "AxisAlignedTargetAssigner") == "ATSS":
            from ..dense_heads.atss_assigner import atss_assign_targets

            targets = atss_assign_targets(
                self.anchors_flat, gt_boxes, int(ta_cfg.TOPK),
                self.box_coder,
                match_height=ta_cfg.get("MATCH_HEIGHT", False),
            )
        else:
            targets = AH.assign_targets(
                self.per_class_anchors, gt_boxes, class_ids, thresholds,
                self.box_coder,
            )
        return AH.anchor_head_loss(
            forward_out["cls_preds"],
            forward_out["box_preds"],
            forward_out["dir_cls_preds"],
            targets,
            self.anchors_flat,
            self.num_class,
            dict(head_cfg.LOSS_CONFIG.LOSS_WEIGHTS),
            dir_offset=head_cfg.get("DIR_OFFSET", 0.78539),
            num_dir_bins=head_cfg.get("NUM_DIR_BINS", 2),
        )

    # --- detector-agnostic batch interface (train/eval runtimes) ---

    def forward_batch(self, batch, train=False):
        if self.dynamic_vfe:
            return self(batch["points"], None, None, train=train)
        return self(
            batch["voxels"], batch["voxel_coords"], batch["voxel_num_points"],
            train=train,
        )

    def loss_batch(self, forward_out, batch):
        return self.loss(
            forward_out, batch["gt_boxes"], list(self.class_names)
        )
