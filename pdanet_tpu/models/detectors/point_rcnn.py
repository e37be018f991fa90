"""PointRCNN detector — counterpart of
``pcdet/models/detectors/point_rcnn.py`` (:1-48): PointNet2MSG per-point
backbone + PointHeadBox proposal stage (per-point box decode,
``predict_boxes_when_training=True``) + PointRCNNHead RoI refinement
over RoIPoint-pooled canonical clouds."""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.box_coder_utils import build_box_coder
from ...utils.easydict import EasyDict
from ..backbones_3d.pointnet2_backbone import PointNet2MSG
from ..dense_heads import point_head_box as PHB
from ..roi_heads import roi_head_template as RHT
from ..roi_heads.pointrcnn_head import PointRCNNHeadNet


class PointRCNN(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int = 4
    class_names: Any = None

    def setup(self):
        cfg = EasyDict(self.model_cfg)
        object.__setattr__(self, "cfg", cfg)
        self.backbone_3d = PointNet2MSG(
            model_cfg=cfg.BACKBONE_3D,
            input_channels=self.input_channels,
            name="backbone_3d",
        )
        head_cfg = cfg.POINT_HEAD
        object.__setattr__(self, "point_cfg", head_cfg)
        coder = build_box_coder(
            head_cfg.TARGET_CONFIG.BOX_CODER,
            head_cfg.TARGET_CONFIG.get("BOX_CODER_CONFIG", {}),
        )
        object.__setattr__(self, "point_box_coder", coder)
        self.point_head = PHB.PointHeadBoxNet(
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
        self.roi_head = PointRCNNHeadNet(
            model_cfg=roi_cfg, code_size=roi_coder.code_size,
            num_class=n_cls, name="roi_head",
        )

    def __call__(self, points, gt_boxes=None, train=False):
        """points: (B, N, 3 + C) dense fixed-budget cloud."""
        bb = self.backbone_3d(points, train=train)
        point_coords = bb["point_coords"]  # (B, N, 3)
        point_features = bb["point_features"]  # (B, N, C)

        point_cls_preds, point_box_preds = self.point_head(
            point_features, train=train
        )
        point_cls_scores = jax.nn.sigmoid(
            jnp.max(point_cls_preds, axis=-1)
        )  # (B, N)
        _, batch_box_preds = PHB.generate_predicted_boxes(
            point_coords, point_cls_preds, point_box_preds,
            self.point_box_coder,
        )

        out = {
            "point_coords": point_coords,
            "point_features": point_features,
            "point_cls_preds": point_cls_preds,
            "point_box_preds": point_box_preds,
            "point_cls_scores": point_cls_scores,
            "batch_cls_preds": point_cls_preds,
            "batch_box_preds": batch_box_preds,
        }

        nms_cfg = self.roi_cfg.NMS_CONFIG["TRAIN" if train else "TEST"]
        proposals = RHT.proposal_layer(
            jax.lax.stop_gradient(point_cls_preds),
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
            point_coords, point_features,
            jax.lax.stop_gradient(point_cls_scores),
            jax.lax.stop_gradient(rois), train=train,
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
        point_loss, tb = PHB.point_head_box_loss(
            forward_out["point_cls_preds"], forward_out["point_box_preds"],
            forward_out["point_coords"], gt_boxes, self.point_box_coder,
            self.point_cfg, self.num_class,
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
            batch["points"], gt_boxes=batch.get("gt_boxes"), train=train
        )

    def loss_batch(self, forward_out, batch):
        return self.loss(
            forward_out, batch["gt_boxes"], list(self.class_names or ())
        )
