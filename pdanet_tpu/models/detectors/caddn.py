"""CaDDN detector — counterpart of
``pcdet/models/detectors/caddn.py`` (:1-46): camera-only 3D detection.
ImageVFE (DDN depth distributions -> frustum features -> voxel grid) ->
Conv2DCollapse BEV -> BaseBEVBackbone -> AnchorHeadSingle, with the DDN
focal depth loss added to the anchor losses."""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...utils.box_coder_utils import build_box_coder
from ...utils.easydict import EasyDict
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_2d.map_to_bev.conv2d_collapse import Conv2DCollapse
from ..backbones_3d.vfe.image_vfe import ImageVFE, ddn_loss
from ..dense_heads import anchor_head as AH


class CaDDN(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int = 3
    grid_size: Any = None  # (nx, ny, nz)
    voxel_size: Any = None
    point_cloud_range: Any = None
    class_names: Any = None
    depth_downsample_factor: int = 4

    DEVICE_BATCH_KEYS = (
        "images", "trans_lidar_to_cam", "trans_cam_to_img", "depth_maps",
        "gt_boxes2d", "gt_boxes",
    )

    def setup(self):
        cfg = EasyDict(self.model_cfg)
        object.__setattr__(self, "cfg", cfg)
        self.vfe = ImageVFE(
            model_cfg=cfg.VFE,
            grid_size=self.grid_size,
            point_cloud_range=self.point_cloud_range,
            depth_downsample_factor=self.depth_downsample_factor,
            name="vfe",
        )
        self.map_to_bev = Conv2DCollapse(
            model_cfg=cfg.MAP_TO_BEV, name="map_to_bev"
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

    def __call__(self, images, lidar_to_cam, cam_to_img, train=False):
        vfe_out = self.vfe(images, lidar_to_cam, cam_to_img, train=train)
        bev = self.map_to_bev(vfe_out["voxel_features"], train=train)
        spatial_2d = self.backbone_2d(bev, train=train)
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
            "depth_logits": vfe_out["depth_logits"],
            "batch_cls_preds": batch_cls,
            "batch_box_preds": batch_boxes,
            "spatial_features_2d": spatial_2d,
        }

    def loss(self, forward_out, gt_boxes, class_names, depth_maps=None,
             gt_boxes2d=None):
        head_cfg = self.cfg.DENSE_HEAD
        class_ids = [
            class_names.index(c["class_name"]) + 1
            for c in head_cfg.ANCHOR_GENERATOR_CONFIG
        ]
        thresholds = [
            (c["matched_threshold"], c["unmatched_threshold"])
            for c in head_cfg.ANCHOR_GENERATOR_CONFIG
        ]
        targets = AH.assign_targets(
            self.per_class_anchors, gt_boxes, class_ids, thresholds,
            self.box_coder,
        )
        rpn_loss, tb = AH.anchor_head_loss(
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
        tb = dict(tb)
        ffn_cfg = EasyDict(self.cfg.VFE).FFN
        depth_loss, tb_d = ddn_loss(
            forward_out["depth_logits"], depth_maps, gt_boxes2d,
            dict(ffn_cfg.DISCRETIZE), ffn_cfg.LOSS,
            downsample_factor=self.depth_downsample_factor,
        )
        tb.update(tb_d)
        total = rpn_loss + depth_loss
        tb["loss"] = total
        return total, tb

    # --- detector-agnostic batch interface ---

    def forward_batch(self, batch, train=False):
        return self(
            batch["images"], batch["trans_lidar_to_cam"],
            batch["trans_cam_to_img"], train=train,
        )

    def loss_batch(self, forward_out, batch):
        return self.loss(
            forward_out, batch["gt_boxes"], list(self.class_names),
            depth_maps=batch.get("depth_maps"),
            gt_boxes2d=batch.get("gt_boxes2d"),
        )
