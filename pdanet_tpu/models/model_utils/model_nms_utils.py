"""Post-processing NMS helpers (model_utils/model_nms_utils.py:6-66).

``class_agnostic_nms``: score threshold -> topk(NMS_PRE_MAXSIZE) -> rotated
greedy NMS -> first NMS_POST_MAXSIZE survivors, fixed-size outputs.

``batched_nms_candidates``: the batched fixed-shape form every detector's
post-processing uses — takes per-frame candidate (boxes, scores, labels,
valid) and returns (B, POST) compacted outputs + counts.
"""

import jax
import jax.numpy as jnp

from ...ops.nms import greedy_nms_mask_batched, nms_rotated
from ...ops.rotated_iou import boxes_iou_bev_batched_self


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """Args:
        box_scores: (N,) sigmoid scores; box_preds: (N, 7).
    Returns:
        selected: (POST,) int32 indices (-1 padded), count, scores.

    NOTE: on TPU the greedy walk is a Pallas kernel that cannot run under
    vmap; for batched frames use ``detectors.iassd.post_processing`` (it
    batches the walk on the leading axis).
    """
    return nms_rotated(
        box_preds,
        box_scores,
        thresh=float(nms_config.NMS_THRESH),
        pre_maxsize=int(nms_config.NMS_PRE_MAXSIZE),
        post_maxsize=int(nms_config.NMS_POST_MAXSIZE),
        score_thresh=score_thresh,
    )


def batched_nms_candidates(boxes, scores, labels, valid, nms_cfg,
                           score_thresh=None):
    """Batched class-agnostic rotated NMS over fixed-size candidates.

    Args:
        boxes: (B, N, 7+); scores: (B, N); labels: (B, N) int;
        valid: (B, N) bool (pre-filters, e.g. decode range mask).
    Returns dict:
        pred_boxes (B, POST, 7+), pred_scores, pred_labels, pred_counts.
    """
    N = boxes.shape[1]
    pre = min(int(nms_cfg.NMS_PRE_MAXSIZE), N)
    post = min(int(nms_cfg.NMS_POST_MAXSIZE), pre)

    def prep(scores_f, boxes_f, valid_f):
        ok = valid_f & jnp.isfinite(scores_f)
        if score_thresh is not None:
            ok &= scores_f >= score_thresh
        masked = jnp.where(ok, scores_f, -jnp.inf)
        order = jnp.argsort(-masked, stable=True)[:pre]
        return order.astype(jnp.int32), ok[order], boxes_f[order][:, :7]

    order, cand_valid, cand_boxes = jax.vmap(prep)(scores, boxes, valid)
    # batched outside vmap: VMEM-tiled Pallas IoU at NMS scale on TPU
    iou = boxes_iou_bev_batched_self(cand_boxes)
    keep = greedy_nms_mask_batched(iou, cand_valid, float(nms_cfg.NMS_THRESH))

    def compact(keep_f, order_f, scores_f, boxes_f, labels_f):
        rank = jnp.cumsum(keep_f) - 1
        sel = jnp.full((post,), -1, dtype=jnp.int32)
        src = jnp.where(keep_f & (rank < post), rank, post)
        sel = sel.at[src].set(order_f, mode="drop")
        count = jnp.minimum(jnp.sum(keep_f), post).astype(jnp.int32)
        safe = jnp.maximum(sel, 0)
        out_boxes = jnp.where((sel >= 0)[:, None], boxes_f[safe], 0.0)
        out_scores = jnp.where(sel >= 0, scores_f[safe], 0.0)
        out_labels = jnp.where(sel >= 0, labels_f[safe], 0)
        return out_boxes, out_scores, out_labels, count

    b, s, l, c = jax.vmap(compact)(keep, order, scores, boxes, labels)
    return {
        "pred_boxes": b,
        "pred_scores": s,
        "pred_labels": l,
        "pred_counts": c,
    }


def batched_multi_classes_nms(cls_scores, boxes, valid, nms_cfg,
                              score_thresh=None):
    """Per-class rotated NMS (``multi_classes_nms``,
    model_nms_utils.py:28-66): each class runs an independent NMS over all
    boxes with its own score column; no cross-class suppression.

    Fixed-shape form: per-class outputs concatenate along the candidate
    axis -> (B, num_class * POST) slots with per-class counts folded into
    one total.

    Args:
        cls_scores: (B, N, C) sigmoid scores; boxes: (B, N, 7+);
        valid: (B, N) bool.
        nms_cfg.NMS_THRESH may be a scalar or a per-class list.
    Returns dict:
        pred_boxes (B, C*POST, 7+), pred_scores, pred_labels, pred_counts.
    """
    from ...utils.easydict import EasyDict

    C = cls_scores.shape[-1]
    thresh = nms_cfg.NMS_THRESH
    threshes = (
        [float(t) for t in thresh]
        if isinstance(thresh, (list, tuple))
        else [float(thresh)] * C
    )
    outs = []
    for k in range(C):
        cfg_k = EasyDict({
            "NMS_THRESH": threshes[k],
            "NMS_PRE_MAXSIZE": nms_cfg.NMS_PRE_MAXSIZE,
            "NMS_POST_MAXSIZE": nms_cfg.NMS_POST_MAXSIZE,
        })
        labels_k = jnp.full(cls_scores.shape[:2], k + 1, jnp.int32)
        outs.append(
            batched_nms_candidates(
                boxes, cls_scores[..., k], labels_k, valid, cfg_k,
                score_thresh=score_thresh,
            )
        )
    post = min(int(nms_cfg.NMS_POST_MAXSIZE), boxes.shape[1])
    slot = jnp.arange(post, dtype=jnp.int32)
    cat_boxes = jnp.concatenate([o["pred_boxes"] for o in outs], 1)
    cat_scores = jnp.concatenate([o["pred_scores"] for o in outs], 1)
    cat_labels = jnp.concatenate([o["pred_labels"] for o in outs], 1)
    cat_valid = jnp.concatenate(
        [slot[None, :] < o["pred_counts"][:, None] for o in outs], 1
    )

    # compact the per-class segments into leading slots (the eval driver
    # slices [:count])
    def compact(v, bx, sc, lb):
        n = v.shape[0]
        rank = jnp.cumsum(v) - 1
        src = jnp.where(v, rank, n)
        out_b = jnp.zeros_like(bx).at[src].set(bx, mode="drop")
        out_s = jnp.zeros_like(sc).at[src].set(sc, mode="drop")
        out_l = jnp.zeros_like(lb).at[src].set(lb, mode="drop")
        return out_b, out_s, out_l, jnp.sum(v).astype(jnp.int32)

    b, s, l, c = jax.vmap(compact)(cat_valid, cat_boxes, cat_scores,
                                   cat_labels)
    return {
        "pred_boxes": b,
        "pred_scores": s,
        "pred_labels": l,
        "pred_counts": c,
    }
