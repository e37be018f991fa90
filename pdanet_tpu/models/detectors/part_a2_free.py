"""Part-A2-free (anchor-free) detector — the reference's
``PartA2_free.yaml`` wiring of the PointRCNN detector class
(``pcdet/models/detectors/point_rcnn.py``) over voxel components:
MeanVFE -> UNetV2 (no encoder BEV) -> PointIntraPartOffsetHead with a
per-voxel box branch (the proposal stage) -> PartA2FCHead refinement
with DISABLE_PART."""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.box_coder_utils import build_box_coder
from ...utils.easydict import EasyDict
from ..backbones_3d.vfe.mean_vfe import MeanVFE
from ..backbones_3d.sparse_unet import SparseUNetV2
from ..backbones_3d.voxel_unet import UNetV2
from ..dense_heads import point_head_box as PHB
from ..dense_heads.point_intra_part_head import (
    PointIntraPartOffsetHeadNet,
    point_intra_part_loss,
)
from ..roi_heads import roi_head_template as RHT
from ..roi_heads.partA2_head import PartA2HeadNet


class PartA2Free(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int = 4
    grid_size: Any = None
    voxel_size: Any = None
    point_cloud_range: Any = None
    class_names: Any = None

    def setup(self):
        cfg = EasyDict(self.model_cfg)
        object.__setattr__(self, "cfg", cfg)
        self.vfe = MeanVFE(
            model_cfg=cfg.get("VFE", {}),
            num_point_features=self.input_channels,
            name="vfe",
        )
        b3d_cfg = cfg.get("BACKBONE_3D", {})
        unet_cls = (
            SparseUNetV2
            if b3d_cfg.get("NAME", "UNetV2") == "SparseUNetV2"
            else UNetV2
        )
        self.backbone_3d = unet_cls(
            model_cfg=b3d_cfg,
            input_channels=self.input_channels,
            grid_size=self.grid_size,
            name="backbone_3d",
        )
        head_cfg = cfg.POINT_HEAD
        object.__setattr__(self, "point_cfg", head_cfg)
        coder = build_box_coder(
            head_cfg.TARGET_CONFIG.BOX_CODER,
            head_cfg.TARGET_CONFIG.get("BOX_CODER_CONFIG", {}),
        )
        object.__setattr__(self, "point_box_coder", coder)
        self.point_head = PointIntraPartOffsetHeadNet(
            model_cfg=head_cfg, num_class=self.num_class,
            code_size=coder.code_size, name="point_head",
        )
        roi_cfg = cfg.ROI_HEAD
        object.__setattr__(self, "roi_cfg", roi_cfg)
        roi_coder = build_box_coder(
            roi_cfg.TARGET_CONFIG.BOX_CODER,
            roi_cfg.TARGET_CONFIG.get("BOX_CODER_CONFIG", {}),
        )
        object.__setattr__(self, "roi_box_coder", roi_coder)
        n_cls = 1 if roi_cfg.get("CLASS_AGNOSTIC", True) else self.num_class
        self.roi_head = PartA2HeadNet(
            model_cfg=roi_cfg, code_size=roi_coder.code_size,
            num_class=n_cls, name="roi_head",
        )

    def _voxel_centers(self, voxel_coords):
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        origin = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        xyz_idx = voxel_coords[..., ::-1].astype(jnp.float32)
        return (xyz_idx + 0.5) * vs + origin

    def __call__(self, voxels, voxel_coords, voxel_num_points, gt_boxes=None,
                 train=False):
        voxel_features = self.vfe(voxels, voxel_num_points, train=train)
        _, aux = self.backbone_3d(voxel_features, voxel_coords, train=train)
        seg_features = aux["point_features"]
        point_valid = aux["point_valid"]
        point_coords = self._voxel_centers(voxel_coords)

        point_cls_preds, point_part_preds, point_box_preds = self.point_head(
            seg_features, train=train
        )
        point_cls_scores = jnp.max(jax.nn.sigmoid(point_cls_preds), axis=-1)
        part_offsets = jax.nn.sigmoid(point_part_preds)
        _, batch_box_preds = PHB.generate_predicted_boxes(
            point_coords, point_cls_preds, point_box_preds,
            self.point_box_coder,
        )
        # padded rows can't propose
        masked_cls = jnp.where(
            point_valid[..., None], point_cls_preds, -1e9
        )

        out = {
            "point_coords": point_coords,
            "point_valid": point_valid,
            "point_cls_preds": point_cls_preds,
            "point_part_preds": point_part_preds,
            "point_box_preds": point_box_preds,
            "point_cls_scores": point_cls_scores,
            "batch_cls_preds": masked_cls,
            "batch_box_preds": batch_box_preds,
        }

        nms_cfg = self.roi_cfg.NMS_CONFIG["TRAIN" if train else "TEST"]
        proposals = RHT.proposal_layer(
            jax.lax.stop_gradient(masked_cls),
            jax.lax.stop_gradient(batch_box_preds),
            nms_cfg,
        )
        if train:
            assert gt_boxes is not None
            rng = self.make_rng("proposal")
            targets = RHT.assign_targets(
                rng, proposals, gt_boxes, self.roi_cfg.TARGET_CONFIG
            )
            rois = targets["rois"]
            out["roi_targets"] = targets
        else:
            rois = proposals["rois"]
            out["rois"] = rois
            out["roi_labels"] = proposals["roi_labels"]
            out["roi_valid"] = proposals["roi_valid"]

        rcnn_cls, rcnn_reg = self.roi_head(
            point_coords, seg_features,
            jax.lax.stop_gradient(part_offsets),
            jax.lax.stop_gradient(point_cls_scores),
            point_valid, jax.lax.stop_gradient(rois), train=train,
        )
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg
        if not train:
            out["batch_box_preds"] = RHT.decode_roi_boxes(
                rois, rcnn_reg, self.roi_box_coder
            )
            out["batch_cls_preds"] = rcnn_cls
        return out

    def loss(self, forward_out, gt_boxes, class_names):
        point_loss, tb = point_intra_part_loss(
            forward_out["point_cls_preds"], forward_out["point_part_preds"],
            forward_out["point_coords"], forward_out["point_valid"],
            gt_boxes, self.point_cfg,
            point_box_preds=forward_out["point_box_preds"],
            box_coder=self.point_box_coder,
        )
        tb = dict(tb)
        targets = dict(forward_out["roi_targets"])
        targets["rcnn_cls"] = forward_out["rcnn_cls"]
        targets["rcnn_reg"] = forward_out["rcnn_reg"]
        cls_loss, tb_c = RHT.roi_box_cls_loss(
            forward_out["rcnn_cls"], targets["rcnn_cls_labels"],
            self.roi_cfg.LOSS_CONFIG,
        )
        reg_loss, tb_r = RHT.roi_box_reg_loss(
            targets, self.roi_box_coder, self.roi_cfg.LOSS_CONFIG
        )
        tb.update(tb_c)
        tb.update(tb_r)
        rcnn_loss = cls_loss + reg_loss
        tb["rcnn_loss"] = rcnn_loss
        return point_loss + rcnn_loss, tb

    # --- detector-agnostic batch interface ---

    def forward_batch(self, batch, train=False):
        return self(
            batch["voxels"], batch["voxel_coords"], batch["voxel_num_points"],
            gt_boxes=batch.get("gt_boxes"), train=train,
        )

    def loss_batch(self, forward_out, batch):
        return self.loss(
            forward_out, batch["gt_boxes"], list(self.class_names)
        )
