"""ATSS anchor target assigner — counterpart of
``pcdet/models/dense_heads/target_assigner/atss_target_assigner.py:1-141``
(https://arxiv.org/abs/1912.02424), config-reachable via
``TARGET_ASSIGNER_CONFIG.NAME: ATSS`` (anchor_head_template.py:55) though
no shipped reference config uses it.

Fixed-shape JAX formulation over the padded (B, M, 8) gt tensor: the
reference's per-frame python slicing becomes validity masks, its scatter
loops become ``.at[]`` updates.  Reference quirks preserved:

* candidate IoU std uses the UNBIASED (K-1) estimator (torch.std default);
* the in-box BEV check compares x_local against dy/2 and y_local against
  dx/2 — the reference swaps the extents (``lw = gt[:, 3:5][:, [1, 0]]``,
  atss_target_assigner.py:110 with a "bugfixed" comment); replicated
  verbatim for parity;
* every valid gt force-claims its raw-max-IoU anchor even below the
  adaptive threshold (:127-130).

Tie semantics: when two gts force-claim the same anchor the reference's
sequential index_put lets the later gt win; the vectorized scatter here
keeps one winner per anchor (the highest gt index, enforced by applying
updates in ascending order), matching torch for the shipped case.
"""

import jax
import jax.numpy as jnp

from ...ops.rotated_iou import boxes_iou3d, boxes_iou_bev

import numpy as np

# numpy scalar: module import must not initialize the JAX backend
_INF = np.float32(2.0**31)


def atss_assign_single(anchors, gt_boxes, gt_valid, topk, box_coder,
                       match_height=False):
    """One frame: anchors (A, 7), gt_boxes (M, 8) padded, gt_valid (M,).

    Returns labels (A,) int32 (0 bg, -1 never occurs for ATSS),
    reg_targets (A, code_size), reg_weights (A,).
    """
    A = anchors.shape[0]
    M = gt_boxes.shape[0]
    K = min(topk, A)

    iou_fn = boxes_iou3d if match_height else boxes_iou_bev
    iou = iou_fn(anchors, gt_boxes[:, :7])  # (A, M)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)

    dist = jnp.linalg.norm(
        anchors[:, None, 0:3] - gt_boxes[None, :, 0:3], axis=-1
    )  # (A, M)
    # top-K CLOSEST anchors per gt
    _, topk_idxs = jax.lax.top_k(-dist.T, K)  # (M, K)
    cand_iou = jnp.take_along_axis(iou.T, topk_idxs, axis=1)  # (M, K)
    mean = jnp.mean(cand_iou, axis=1)
    # torch.std default: unbiased (K-1) denominator
    var = jnp.sum((cand_iou - mean[:, None]) ** 2, axis=1) / max(K - 1, 1)
    thresh = mean + jnp.sqrt(var) + 1e-6
    is_pos = cand_iou >= thresh[:, None]  # (M, K)

    # BEV in-box check on the candidate anchors' centers (extent-swap quirk)
    cand_centers = jnp.take(anchors[:, 0:3], topk_idxs, axis=0)  # (M, K, 3)
    d = cand_centers - gt_boxes[:, None, 0:3]
    c = jnp.cos(-gt_boxes[:, 6])[:, None]
    s = jnp.sin(-gt_boxes[:, 6])[:, None]
    x_local = d[..., 0] * c - d[..., 1] * s
    y_local = d[..., 0] * s + d[..., 1] * c
    half_swap_x = gt_boxes[:, 4][:, None] / 2.0  # dy bounds x_local (quirk)
    half_swap_y = gt_boxes[:, 3][:, None] / 2.0  # dx bounds y_local
    in_gt = (
        (x_local <= half_swap_x) & (x_local >= -half_swap_x)
        & (y_local <= half_swap_y) & (y_local >= -half_swap_y)
    )
    is_pos = is_pos & in_gt & gt_valid[:, None]  # (M, K)

    # candidate positivity per (anchor, gt): scatter into the (A, M) grid
    gt_cols = jnp.broadcast_to(jnp.arange(M)[:, None], (M, K))
    pos_grid = jnp.zeros((A, M), bool).at[
        topk_idxs.reshape(-1), gt_cols.reshape(-1)
    ].max(is_pos.reshape(-1))
    ious_inf = jnp.where(pos_grid, iou, -_INF)

    a2g_val = jnp.max(ious_inf, axis=1)  # (A,)
    a2g_idx = jnp.argmax(ious_inf, axis=1)

    # force-match: each valid gt claims its raw-max-IoU anchor
    g2a_max = jnp.max(iou, axis=0)  # (M,)
    g2a_arg = jnp.argmax(iou, axis=0)
    rows = jnp.where(gt_valid, g2a_arg, A)  # padded gts scatter out of range
    a2g_idx = a2g_idx.at[rows].set(jnp.arange(M), mode="drop")
    a2g_val = a2g_val.at[rows].set(g2a_max, mode="drop")

    gt_cls = gt_boxes[:, 7].astype(jnp.int32)
    labels = jnp.take(gt_cls, a2g_idx)
    labels = jnp.where(a2g_val <= -_INF, 0, labels)

    fg = labels > 0
    matched = jnp.take(gt_boxes, a2g_idx, axis=0)
    enc = box_coder.encode(matched[:, :7], anchors)
    reg_targets = jnp.where(fg[:, None], enc, 0.0)
    reg_weights = fg.astype(jnp.float32)
    return labels, reg_targets, reg_weights


def atss_assign_targets(anchors_flat, gt_boxes, topk, box_coder,
                        match_height=False):
    """Batch form (reference assign_targets :16-74, single anchor set).

    Args:
        anchors_flat: (A, 7) — the full per-location-interleaved anchor
            tensor (ATSS assigns across classes jointly);
        gt_boxes: (B, M, 8) zero-padded.
    Returns the axis-aligned assigner's dict contract.
    """

    def one_frame(gt):
        valid = jnp.any(gt[:, :7] != 0, axis=-1)
        return atss_assign_single(
            anchors_flat, gt, valid, topk, box_coder, match_height
        )

    labels, targets, weights = jax.vmap(one_frame)(gt_boxes)
    return {
        "box_cls_labels": labels,
        "box_reg_targets": targets,
        "reg_weights": weights,
    }
