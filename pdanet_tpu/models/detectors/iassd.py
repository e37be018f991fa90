"""IASSD detector: backbone + point head + post-processing.

Rebuilds ``pcdet/models/detectors/IASSD.py`` + the relevant parts of
``detector3d_template.py`` (post_processing :179-285, recall record
:287-329) as a flax module plus pure jitted functions.

The module topology honors the reference's 8-slot builder contract
(detector3d_template.py:23-26); PDA-SSD only populates backbone_3d and
point_head, the rest are None.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.rotated_iou import boxes_iou3d
from ...utils.box_coder_utils import build_box_coder
from ...utils.easydict import EasyDict
from ..backbones_3d.iassd_backbone import IASSDBackbone
from ..dense_heads import iassd_head


class IASSD(nn.Module):
    """PDA-SSD / IA-SSD detector (MODEL.NAME: IASSD)."""

    model_cfg: Any
    num_class: int
    input_channels: int = 4

    def setup(self):
        # linen freezes dict attributes into FrozenDicts; restore EasyDict
        # attribute access for the config tree.
        object.__setattr__(self, "cfg", EasyDict(self.model_cfg))
        self.backbone_3d = IASSDBackbone(
            model_cfg=self.cfg.BACKBONE_3D,
            num_class=self.num_class,
            input_channels=self.input_channels,
            name="backbone_3d",
        )
        head_cfg = self.cfg.POINT_HEAD
        self.box_coder = build_box_coder(
            head_cfg.TARGET_CONFIG.BOX_CODER, head_cfg.TARGET_CONFIG.BOX_CODER_CONFIG
        )
        self.point_head = iassd_head.IASSDHeadNet(
            cls_fc=tuple(head_cfg.CLS_FC),
            reg_fc=tuple(head_cfg.REG_FC),
            num_class=self.num_class,
            code_size=self.box_coder.code_size,
            iou_fc=tuple(head_cfg.IOU_FC) if head_cfg.get("IOU_FC") else None,
            name="point_head",
        )

    def __call__(self, points, train=False):
        """points: (B, N, 3 + C) dense. Returns the forward dict."""
        out = self.backbone_3d(points, train=train)
        cls_preds, box_preds, iou_preds = self.point_head(
            out["centers_features"], train=train
        )
        out["center_cls_preds"] = cls_preds
        out["center_box_preds"] = box_preds
        out["box_iou3d_preds"] = iou_preds
        _, decoded = iassd_head.generate_predicted_boxes(
            out["centers"], cls_preds, box_preds, self.box_coder
        )
        out["point_box_preds"] = decoded
        out["batch_cls_preds"] = cls_preds
        out["batch_box_preds"] = decoded
        return out

    def loss(self, forward_out, gt_boxes):
        """Training loss: target assignment + §2.6 loss stack."""
        head_cfg = self.cfg.POINT_HEAD
        targets = iassd_head.assign_targets(
            forward_out, gt_boxes, head_cfg.TARGET_CONFIG, self.box_coder,
            self.num_class,
        )
        ret = dict(forward_out)
        ret.update(targets)
        return iassd_head.get_loss(
            ret, head_cfg, self.box_coder, self.num_class, gt_boxes.shape[1]
        )

    # --- detector-agnostic batch interface (train/eval runtimes) ---

    def forward_batch(self, batch, train=False):
        return self(batch["points"], train=train)

    def loss_batch(self, forward_out, batch):
        return self.loss(forward_out, batch["gt_boxes"])


def compute_loss(forward_out, gt_boxes, model_cfg, box_coder, num_class):
    """Pure training loss (target assignment + §2.6 stack) — usable inside
    a jitted train step without re-entering the flax module."""
    head_cfg = model_cfg.POINT_HEAD
    targets = iassd_head.assign_targets(
        forward_out, gt_boxes, head_cfg.TARGET_CONFIG, box_coder, num_class
    )
    ret = dict(forward_out)
    ret.update(targets)
    return iassd_head.get_loss(ret, head_cfg, box_coder, num_class, gt_boxes.shape[1])


def post_processing(batch_cls_preds, batch_box_preds, post_cfg):
    """Per-frame NMS (detector3d_template.py:179-285), batched via vmap.

    Args:
        batch_cls_preds: (B, N, C) raw logits; batch_box_preds: (B, N, 7).
    Returns dict of fixed-size per-frame outputs:
        boxes (B, POST, 7), scores (B, POST), labels (B, POST) in 1..C,
        count (B,).
    """
    from ...ops.nms import greedy_nms_mask_batched
    from ...ops.rotated_iou import boxes_iou_bev_batched_self

    scores_all = jax.nn.sigmoid(batch_cls_preds)
    cls_scores = jnp.max(scores_all, axis=-1)
    labels = jnp.argmax(scores_all, axis=-1) + 1

    nms_cfg = post_cfg.NMS_CONFIG
    if nms_cfg.get("MULTI_CLASSES_NMS", False):
        from ..model_utils.model_nms_utils import batched_multi_classes_nms

        out = batched_multi_classes_nms(
            scores_all, batch_box_preds,
            jnp.ones(scores_all.shape[:2], bool), nms_cfg,
            score_thresh=float(post_cfg.SCORE_THRESH),
        )
        return out
    N = batch_box_preds.shape[1]
    pre = min(int(nms_cfg.NMS_PRE_MAXSIZE), N)
    post = min(int(nms_cfg.NMS_POST_MAXSIZE), pre)

    def prep(scores, boxes):
        valid = jnp.isfinite(scores) & (scores >= post_cfg.SCORE_THRESH)
        masked = jnp.where(valid, scores, -jnp.inf)
        order = jnp.argsort(-masked, stable=True)[:pre]
        return order.astype(jnp.int32), valid[order], boxes[order]

    order, cand_valid, cand_boxes = jax.vmap(prep)(
        cls_scores, batch_box_preds)
    # batched outside vmap: dispatches to the VMEM-tiled Pallas IoU at
    # NMS scale on TPU (Pallas calls cannot run under vmap)
    iou = boxes_iou_bev_batched_self(cand_boxes)
    # batched greedy walk outside vmap (Pallas kernel on TPU)
    keep = greedy_nms_mask_batched(
        iou, cand_valid, float(nms_cfg.NMS_THRESH)
    )

    def compact(keep, order, scores, boxes, lab):
        rank = jnp.cumsum(keep) - 1
        sel = jnp.full((post,), -1, dtype=jnp.int32)
        src = jnp.where(keep & (rank < post), rank, post)
        sel = sel.at[src].set(order, mode="drop")
        count = jnp.minimum(jnp.sum(keep), post).astype(jnp.int32)
        safe = jnp.maximum(sel, 0)
        out_boxes = jnp.where((sel >= 0)[:, None], boxes[safe], 0.0)
        out_scores = jnp.where(sel >= 0, scores[safe], 0.0)
        out_labels = jnp.where(sel >= 0, lab[safe], 0)
        return out_boxes, out_scores, out_labels, count

    boxes, scores, labs, counts = jax.vmap(compact)(
        keep, order, cls_scores, batch_box_preds, labels
    )
    return {
        "pred_boxes": boxes,
        "pred_scores": scores,
        "pred_labels": labs,
        "pred_counts": counts,
    }


def generate_recall_record(pred_boxes, pred_valid, gt_boxes, thresh_list,
                           rois=None, roi_valid=None):
    """Recall-vs-gt at IoU thresholds (detector3d_template.py:287-329).

    Args:
        pred_boxes: (P, 7); pred_valid: (P,) bool; gt_boxes: (M, 8) padded.
        rois / roi_valid: optional (R, 7) first-stage proposals — the
            reference records `roi_%s` recall from them when
            `data_dict['rois']` exists (:293,:316-320) and leaves the roi
            counters at 0 for single-stage models.
    Returns:
        dict: gt count and recalled counts per threshold.
    """
    gt_valid = jnp.any(gt_boxes[:, 0:7] != 0, axis=-1)
    iou = boxes_iou3d(pred_boxes, gt_boxes[:, 0:7])  # (P, M)
    iou = jnp.where(pred_valid[:, None] & gt_valid[None, :], iou, 0.0)
    best_per_gt = jnp.max(iou, axis=0)
    if rois is not None:
        iou_roi = boxes_iou3d(rois[:, 0:7], gt_boxes[:, 0:7])
        iou_roi = jnp.where(
            roi_valid[:, None] & gt_valid[None, :], iou_roi, 0.0
        )
        best_roi_per_gt = jnp.max(iou_roi, axis=0)
    out = {"gt": jnp.sum(gt_valid.astype(jnp.int32))}
    for t in thresh_list:
        out[f"rcnn_{t}"] = jnp.sum((best_per_gt > t).astype(jnp.int32))
        out[f"roi_{t}"] = (
            jnp.sum((best_roi_per_gt > t).astype(jnp.int32))
            if rois is not None
            else jnp.zeros((), jnp.int32)
        )
    return out
