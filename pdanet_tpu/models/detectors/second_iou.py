"""SECOND-IoU detector — counterpart of
``pcdet/models/detectors/second_net_iou.py`` (:1-165): the SECOND first
stage plus a SECONDHead RoI stage that re-scores proposals with an
IoU-quality logit (boxes are not refined).

Two-stage flow (fixed shapes):
  train: anchor head -> proposal NMS -> fg/bg RoI sampling (rng via the
  'proposal' flax collection) -> rotated BEV grid pool -> IoU logit;
  loss = RPN loss + IoU BCE (second_head.py:143-165).
  eval: proposals -> pooled IoU logits; post-processing scores by
  SCORE_TYPE (iou | cls | weighted_iou_cls, second_net_iou.py:113-147).
"""

from typing import Any

import jax
import jax.numpy as jnp

from ...utils.easydict import EasyDict
from ..model_utils.model_nms_utils import batched_nms_candidates
from ..roi_heads import roi_head_template as RHT
from ..roi_heads.second_head import SECONDHeadNet, second_head_iou_loss
from .second import SECOND


class SECONDNetIoU(SECOND):
    def setup(self):
        super().setup()
        roi_cfg = EasyDict(self.model_cfg).ROI_HEAD
        object.__setattr__(self, "roi_cfg", roi_cfg)
        self.roi_head = SECONDHeadNet(model_cfg=roi_cfg, name="roi_head")

    def __call__(self, voxels, voxel_coords, voxel_num_points, gt_boxes=None,
                 train=False):
        out = SECOND.__call__(
            self, voxels, voxel_coords, voxel_num_points, train=train
        )
        nms_cfg = self.roi_cfg.NMS_CONFIG["TRAIN" if train else "TEST"]
        proposals = RHT.proposal_layer(
            jax.lax.stop_gradient(out["batch_cls_preds"]),
            jax.lax.stop_gradient(out["batch_box_preds"]),
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
            out["roi_scores"] = proposals["roi_scores"]
            out["roi_labels"] = proposals["roi_labels"]
            out["roi_valid"] = proposals["roi_valid"]

        pooled = RHT.roi_grid_pool_bev(
            jax.lax.stop_gradient(out["spatial_features_2d"]),
            jax.lax.stop_gradient(rois),
            grid_size=int(self.roi_cfg.ROI_GRID_POOL.GRID_SIZE),
            pc_range=self.point_cloud_range,
            voxel_size=self.voxel_size,
            downsample_ratio=int(self.roi_cfg.ROI_GRID_POOL.DOWNSAMPLE_RATIO),
        )
        rcnn_iou = self.roi_head(pooled, train=train)  # (B, R, 1)
        out["rcnn_iou"] = rcnn_iou
        if not train:
            # eval contract (second_net_iou.py:133-135): boxes = rois,
            # cls preds = iou logits
            out["batch_box_preds"] = rois
            out["batch_cls_preds"] = rcnn_iou
        return out

    def loss(self, forward_out, gt_boxes, class_names):
        rpn_loss, tb = SECOND.loss(self, forward_out, gt_boxes, class_names)
        rcnn_loss, tb_rcnn = second_head_iou_loss(
            forward_out["rcnn_iou"],
            forward_out["roi_targets"]["rcnn_cls_labels"],
            self.roi_cfg.LOSS_CONFIG,
        )
        tb = dict(tb)
        tb.update(tb_rcnn)
        tb["rcnn_loss"] = rcnn_loss
        return rpn_loss + rcnn_loss, tb

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


def post_processing(forward_out, model_cfg):
    """Eval scoring + final NMS (second_net_iou.py:74-160).

    SCORE_TYPE: 'iou' (default) | 'cls' | 'weighted_iou_cls'.  The
    reference's 'score_by_class' / 'num_pts_iou_cls' modes are not on any
    shipped config (second_iou.yaml uses the default) and raise here,
    like the reference's own MULTI_CLASSES_NMS branch (:113-114)."""
    post_cfg = EasyDict(model_cfg).POST_PROCESSING
    nms_cfg = post_cfg.NMS_CONFIG
    iou_preds = jax.nn.sigmoid(
        jnp.max(forward_out["rcnn_iou"], axis=-1)
    )  # (B, R)
    cls_preds = jax.nn.sigmoid(forward_out["roi_scores"])
    labels = forward_out["roi_labels"]
    score_type = nms_cfg.get("SCORE_TYPE", "iou")
    if score_type == "iou":
        scores = iou_preds
    elif score_type == "cls":
        scores = cls_preds
    elif score_type == "weighted_iou_cls":
        w = nms_cfg.SCORE_WEIGHTS
        scores = w["iou"] * iou_preds + w["cls"] * cls_preds
    else:
        raise NotImplementedError(score_type)
    return batched_nms_candidates(
        forward_out["batch_box_preds"],
        scores,
        labels,
        forward_out["roi_valid"],
        nms_cfg,
        score_thresh=post_cfg.get("SCORE_THRESH", None),
    )
