"""PointPillar detector — counterpart of
``pcdet/models/detectors/pointpillar.py`` over the VFE -> scatter -> BEV
backbone -> anchor-head pipeline (all dense, channels-last).

The pillar budget is static (MAX_NUMBER_OF_VOXELS padding from the host
voxelizer), so every tensor through the network is fixed-shape."""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...utils.box_coder_utils import build_box_coder
from ...utils.easydict import EasyDict
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_2d.map_to_bev.pointpillar_scatter import pointpillar_scatter
from ..backbones_3d.vfe.pillar_vfe import PillarVFE
from ..dense_heads import anchor_head as AH


class PointPillar(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int = 4
    grid_size: Any = None  # (nx, ny, nz)
    voxel_size: Any = None
    point_cloud_range: Any = None
    class_names: Any = None

    @property
    def DEVICE_BATCH_KEYS(self):
        """DynamicPillarVFE consumes the raw cloud instead of the pillar
        triplet (resolved from the config — flax setup state is not
        visible outside apply)."""
        vfe = dict(self.model_cfg.get("VFE", {}) or {})
        if vfe.get("NAME", "PillarVFE").startswith("Dynamic"):
            return ("points", "gt_boxes")
        return ("voxels", "voxel_coords", "voxel_num_points", "gt_boxes")

    def setup(self):
        cfg = EasyDict(self.model_cfg)
        object.__setattr__(self, "cfg", cfg)
        dynamic = cfg.VFE.get("NAME", "PillarVFE") == "DynamicPillarVFE"
        object.__setattr__(self, "dynamic_vfe", dynamic)
        if dynamic:
            from ..backbones_3d.vfe.dynamic_pillar_vfe import DynamicPillarVFE

            self.vfe = DynamicPillarVFE(
                model_cfg=cfg.VFE,
                num_point_features=self.input_channels,
                grid_size=self.grid_size,
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                name="vfe",
            )
        else:
            self.vfe = PillarVFE(
                model_cfg=cfg.VFE,
                num_point_features=self.input_channels,
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                name="vfe",
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
            # 'voxels' carries the raw cloud; the VFE scatters the BEV
            # canvas on-device (no pillar triplet, no per-pillar cap)
            spatial = self.vfe(voxels, train=train)
        else:
            pillar_features = self.vfe(
                voxels, voxel_coords, voxel_num_points, train=train
            )
            spatial = pointpillar_scatter(
                pillar_features, voxel_coords, self.grid_size,
                self.cfg.MAP_TO_BEV.NUM_BEV_FEATURES,
            )
        stride = self.cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG[0].get(
            "feature_map_stride", 2
        )
        spatial_2d = self.backbone_2d(spatial, train=train)
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
            "batch_cls_preds": batch_cls,
            "batch_box_preds": batch_boxes,
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
