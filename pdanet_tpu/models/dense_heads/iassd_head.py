"""IA-SSD / PDA-SSD point head: network, target assignment, loss stack.

Behavior parity with ``pcdet/models/dense_heads/IASSD_head.py`` (the
PDA-SSD loss stack, SURVEY.md §2.6), re-expressed as fixed-shape masked
reductions:

* network                         — IASSD_head.py:19-48 (make_fc_layers
                                    point_head_template.py:36-47)
* ``assign_stack_targets_IASSD``  — IASSD_head.py:132-277, vectorized over
                                    the batch (no per-sample python loop)
* ``assign_targets``              — IASSD_head.py:279-468
* loss stack                      — IASSD_head.py:470-521 and helpers
* ``generate_predicted_boxes``    — point_head_template.py:193-207

Dense layout: every per-point tensor is (B, N, ...); the reference's flat
(B*N,) tensors with a batch-index column are never materialized.
"""

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.geometry import enlarge_box3d, points_in_boxes, rotate_points_along_z
from ...utils import loss_utils
from ..blocks import MLPStack


class IASSDHeadNet(nn.Module):
    """Prediction MLPs (IASSD_head.py:28-43)."""

    cls_fc: tuple
    reg_fc: tuple
    num_class: int
    code_size: int
    iou_fc: Optional[tuple] = None

    @nn.compact
    def __call__(self, center_features, train=False):
        h = MLPStack(self.cls_fc, name="cls_center_layers")(center_features, train)
        cls_preds = nn.Dense(self.num_class, use_bias=True, name="cls_center_out")(h)
        h = MLPStack(self.reg_fc, name="box_center_layers")(center_features, train)
        box_preds = nn.Dense(self.code_size, use_bias=True, name="box_center_out")(h)
        iou_preds = None
        if self.iou_fc is not None:
            h = MLPStack(self.iou_fc, name="box_iou3d_layers")(center_features, train)
            iou_preds = nn.Dense(1, use_bias=True, name="box_iou3d_out")(h)
        return cls_preds, box_preds, iou_preds


# ---------------------------------------------------------------------------
# Target assignment (vectorized IASSD_head.py:132-277)
# ---------------------------------------------------------------------------


def assign_stack_targets(
    points,
    gt_boxes,
    extend_gt_boxes=None,
    *,
    box_coder=None,
    ret_box_labels=False,
    set_ignore_flag=True,
    use_ex_gt_assign=False,
    num_class=3,
):
    """Dense target assignment.

    Args:
        points: (B, N, 3); gt_boxes: (B, M, 8) zero-padded;
        extend_gt_boxes: (B, M, 8) or None.
    Returns dict of dense tensors:
        point_cls_labels: (B, N) int32 (0 bg, -1 ignore, 1..C fg)
        point_box_labels: (B, N, 8) or None
        box_idxs_labels:  (B, N) int32 (-1 bg; note the reference stores -1
            too and gathers row -1 = last padded row for bg, which is never
            read — here bg rows gather row 0, equally never read)
        gt_box_of_points: (B, N, 8) gathered gt rows (garbage on bg rows)
        pos_mask:         (B, N) bool — fg points with class > 0
    """
    box_idx = points_in_boxes(points, gt_boxes[..., 0:7])  # (B, N)
    box_fg = box_idx >= 0

    if use_ex_gt_assign:
        ext_idx = points_in_boxes(points, extend_gt_boxes[..., 0:7])
        ext_fg = ext_idx >= 0
        # instance points keep their tight-box assignment (IASSD_head.py:204)
        box_idx = jnp.where(box_fg, box_idx, ext_idx)
        fg_flag = ext_fg
        ignore = jnp.zeros_like(fg_flag)
    elif set_ignore_flag:
        ext_idx = points_in_boxes(points, extend_gt_boxes[..., 0:7])
        fg_flag = box_fg
        ignore = fg_flag ^ (ext_idx >= 0)
    else:
        raise NotImplementedError

    safe_idx = jnp.maximum(box_idx, 0)
    gt_of_points = jnp.take_along_axis(
        gt_boxes, safe_idx[..., None], axis=1
    )  # (B, N, 8)
    cls_of_points = gt_of_points[..., 7].astype(jnp.int32)

    labels = jnp.where(fg_flag, cls_of_points, 0)
    labels = jnp.where(ignore & ~fg_flag, -1, labels)
    # padded gt rows carry class 0: drop them from fg (IASSD_head.py:245-247)
    pos_mask = fg_flag & (labels > 0)

    out = {
        "point_cls_labels": labels,
        "box_idxs_labels": jnp.where(fg_flag, box_idx, -1),
        "gt_box_of_points": gt_of_points,
        "pos_mask": pos_mask,
    }
    if ret_box_labels:
        enc = box_coder.encode(
            gt_of_points[..., :7], points, gt_classes=cls_of_points
        )  # (B, N, 8)
        out["point_box_labels"] = jnp.where(pos_mask[..., None], enc, 0.0)
    return out


def assign_targets(batch_out, gt_boxes, target_cfg, box_coder, num_class):
    """Full training-target assembly (IASSD_head.py:279-468).

    The reference DETACHES every coordinate tensor before assignment
    (``input_dict['centers'].detach()`` etc., IASSD_head.py:313,
    400-457): targets — including the continuous box-label residuals
    the coder encodes against the centers — are CONSTANTS, never a
    gradient path into the votes.  r5 fixed this here (previously the
    flax box labels were live in ``centers``; see the companion
    centerness note at generate_center_ness_mask).

    Args:
        batch_out: backbone output dict (dense tensors).
        gt_boxes: (B, M, 8).
    """
    batch_out = dict(batch_out)
    for key in ("centers", "centers_origin"):
        if batch_out.get(key) is not None:
            batch_out[key] = jax.lax.stop_gradient(batch_out[key])
    if batch_out.get("encoder_coords") is not None:
        batch_out["encoder_coords"] = [
            None if c is None else jax.lax.stop_gradient(c)
            for c in batch_out["encoder_coords"]
        ]
    B = gt_boxes.shape[0]
    ext = enlarge_box3d(
        gt_boxes.reshape(-1, gt_boxes.shape[-1]), target_cfg.GT_EXTRA_WIDTH
    ).reshape(B, -1, gt_boxes.shape[-1])

    targets = {}
    center_t = assign_stack_targets(
        batch_out["centers"],
        gt_boxes,
        ext,
        box_coder=box_coder,
        set_ignore_flag=True,
        ret_box_labels=True,
        num_class=num_class,
    )
    targets["center_cls_labels"] = center_t["point_cls_labels"]
    targets["center_box_labels"] = center_t["point_box_labels"]
    targets["center_gt_box_of_points"] = center_t["gt_box_of_points"]
    targets["center_pos_mask"] = center_t["pos_mask"]

    if target_cfg.get("INS_AWARE_ASSIGN", False):
        ext_05 = enlarge_box3d(
            gt_boxes.reshape(-1, gt_boxes.shape[-1]), [0.5, 0.5, 0.5]
        ).reshape(B, -1, gt_boxes.shape[-1])
        sa_labels, sa_gt_of_points, sa_pos_masks, sa_box_idxs = [], [], [], []
        coords = batch_out["encoder_coords"]
        # layers 1..len-2: coords[1..5] = [L0, L1, L2, L3, centers_origin]
        # (IASSD_head.py:348-383: i==1 ignore-ring assign, i>=2 extended-gt)
        for i in range(1, len(batch_out["sa_ins_preds"])):
            sa_xyz = coords[i]
            if i == 1:
                t = assign_stack_targets(
                    sa_xyz, gt_boxes, ext_05,
                    set_ignore_flag=True, num_class=num_class,
                )
            else:
                t = assign_stack_targets(
                    sa_xyz, gt_boxes, ext_05,
                    set_ignore_flag=False, use_ex_gt_assign=True,
                    num_class=num_class,
                )
            sa_labels.append(t["point_cls_labels"])
            sa_gt_of_points.append(t["gt_box_of_points"])
            sa_pos_masks.append(t["pos_mask"])
            sa_box_idxs.append(t["box_idxs_labels"])
        targets["sa_ins_labels"] = sa_labels
        targets["sa_gt_box_of_points"] = sa_gt_of_points
        targets["sa_pos_masks"] = sa_pos_masks
        targets["sa_box_idxs_labels"] = sa_box_idxs

    extra = target_cfg.get("ASSIGN_METHOD", None)
    if extra is not None and extra.NAME == "extend_gt":
        ext_w = enlarge_box3d(
            gt_boxes.reshape(-1, gt_boxes.shape[-1]), extra.EXTRA_WIDTH
        ).reshape(B, -1, gt_boxes.shape[-1])
        pts = (
            batch_out["centers_origin"]
            if extra.get("ASSIGN_TYPE", "centers") == "centers_origin"
            else batch_out["centers"]
        )
        t = assign_stack_targets(
            pts, gt_boxes, ext_w,
            box_coder=box_coder, ret_box_labels=True,
            set_ignore_flag=False, use_ex_gt_assign=True, num_class=num_class,
        )
        targets["center_origin_cls_labels"] = t["point_cls_labels"]
        targets["center_origin_box_idxs_of_pts"] = t["box_idxs_labels"]
        targets["gt_box_of_center_origin"] = t["gt_box_of_points"]
        targets["center_origin_pos_mask"] = t["pos_mask"]
    return targets


# ---------------------------------------------------------------------------
# Losses (IASSD_head.py:470-521 + helpers) — masked fixed-shape reductions
# ---------------------------------------------------------------------------


def _one_hot_fg(labels, num_class):
    """One-hot over classes 1..C; bg/ignore rows are all-zero
    (the reference scatters into C+1 then drops column 0)."""
    clipped = jnp.where(labels >= 0, labels, 0)
    oh = jax.nn.one_hot(clipped, num_class + 1, dtype=jnp.float32)
    return oh[..., 1:]


def _cls_weights(labels):
    """(pos | neg) / clamp(num_pos, 1); ignore rows get 0."""
    positives = labels > 0
    weights = (positives | (labels == 0)).astype(jnp.float32)
    pos_norm = jnp.maximum(jnp.sum(positives), 1.0)
    return weights / pos_norm, jnp.sum(positives.astype(jnp.float32))


def contextual_vote_loss(forward_ret, num_class, weight):
    """LOSS_VOTE_TYPE 'none' (IASSD_head.py:525-548): per-class smooth-L1 of
    (centers_origin + ctr_offsets) vs gt centers, averaged over classes
    present in the batch."""
    labels = forward_ret["center_origin_cls_labels"]  # (B, N)
    gt_ctr = forward_ret["gt_box_of_center_origin"][..., 0:3]
    pred = forward_ret["centers_origin"] + forward_ret["ctr_offsets"]

    per_elem = loss_utils.smooth_l1(pred - gt_ctr, beta=1.0)  # (B, N, 3)
    losses, present = [], []
    for k in range(1, num_class + 1):
        m = (labels == k).astype(jnp.float32)
        cnt = jnp.sum(m)
        loss_k = jnp.sum(per_elem * m[..., None]) / jnp.maximum(cnt * 3.0, 1.0)
        losses.append(loss_k)
        present.append((cnt > 0).astype(jnp.float32))
    losses = jnp.stack(losses)
    present = jnp.stack(present)
    loss = jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)
    return loss * weight


def contextual_vote_loss_ver1(forward_ret, num_boxes, weight):
    """LOSS_VOTE_TYPE 'ver1' (IASSD_head.py:551-576): per-instance
    sum-normalized smooth-L1 averaged over instances (the ver2 form
    without the spread-to-mean term)."""
    box_idx = forward_ret["center_origin_box_idxs_of_pts"]  # (B, N)
    gt_ctr = forward_ret["gt_box_of_center_origin"][..., 0:3]
    pred = forward_ret["centers_origin"] + forward_ret["ctr_offsets"]
    B, N = box_idx.shape
    valid = box_idx >= 0
    seg = (jnp.arange(B)[:, None] * num_boxes + jnp.maximum(box_idx, 0)).reshape(-1)
    seg = jnp.where(valid.reshape(-1), seg, B * num_boxes)
    num_seg = B * num_boxes + 1
    ones = valid.reshape(-1).astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, seg, num_segments=num_seg)
    l1 = jnp.sum(loss_utils.smooth_l1(pred - gt_ctr, beta=1.0), axis=-1).reshape(-1)
    ins_loss = jax.ops.segment_sum(l1 * ones, seg, num_segments=num_seg)
    has_pts = (counts[:-1] > 0).astype(jnp.float32)
    per_ins = ins_loss[:-1] / jnp.maximum(counts[:-1], 1.0)
    loss = jnp.sum(per_ins * has_pts) / jnp.maximum(jnp.sum(has_pts), 1.0)
    return loss * weight


def contextual_vote_loss_ver2(forward_ret, num_boxes, weight):
    """LOSS_VOTE_TYPE 'ver2' (IASSD_head.py:583-625): per-instance
    normalized vote loss + 0.5 x spread-to-instance-mean, averaged over
    instances.  Segment-sums over (B*M) instance bins replace the
    reference's per-instance python loop."""
    box_idx = forward_ret["center_origin_box_idxs_of_pts"]  # (B, N)
    gt_ctr = forward_ret["gt_box_of_center_origin"][..., 0:3]
    pred = forward_ret["centers_origin"] + forward_ret["ctr_offsets"]
    B, N = box_idx.shape
    valid = box_idx >= 0
    seg = (jnp.arange(B)[:, None] * num_boxes + jnp.maximum(box_idx, 0)).reshape(-1)
    seg = jnp.where(valid.reshape(-1), seg, B * num_boxes)  # overflow bin

    num_seg = B * num_boxes + 1
    ones = valid.reshape(-1).astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, seg, num_segments=num_seg)

    l1 = jnp.sum(loss_utils.smooth_l1(pred - gt_ctr, beta=1.0), axis=-1).reshape(-1)
    ins_loss = jax.ops.segment_sum(l1 * ones, seg, num_segments=num_seg)

    # per-instance mean of predicted centers
    pred_flat = pred.reshape(-1, 3)
    sums = jax.ops.segment_sum(pred_flat * ones[:, None], seg, num_segments=num_seg)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    spread = jnp.sum(
        loss_utils.smooth_l1(pred_flat - means[seg], beta=1.0), axis=-1
    )
    ins_mean_loss = jax.ops.segment_sum(spread * ones, seg, num_segments=num_seg)

    has_pts = (counts[:-1] > 0).astype(jnp.float32)
    per_ins = (ins_loss[:-1] + 0.5 * ins_mean_loss[:-1]) / jnp.maximum(counts[:-1], 1.0)
    loss = jnp.sum(per_ins * has_pts) / jnp.maximum(jnp.sum(has_pts), 1.0)
    return loss * weight


def generate_center_ness_mask(forward_ret):
    """Box-geometry centerness (min/max)^(1/3) (IASSD_head.py:795-818).

    The reference DETACHES the centers here
    (``centers[pos_mask].clone().detach()``, IASSD_head.py:799) — the
    centerness enters the cls loss as a constant TARGET, never as a
    gradient path into the vote offsets.  r5 found this the hard way:
    without the detach, early training (cls preds still ~0) has
    dCE/dtarget = log((1-p)/p) > 0, i.e. the loss REWARDS pushing votes
    AWAY from box centers to shrink the target — a metastable
    "centerness suppression" basin the AP-parity capstone's torch twin
    fell into on every run (positives 9-14 -> 0 by the LR peak, scores
    pinned at ~1e-3) while the flax side happened to escape it."""
    pos = forward_ret["center_pos_mask"]
    gt = forward_ret["center_gt_box_of_points"]
    centers = jax.lax.stop_gradient(forward_ret["centers"])
    off = centers - gt[..., 0:3]
    off_canon = rotate_points_along_z(off[..., None, :], -gt[..., 6])[..., 0, :]
    half = gt[..., 3:6] / 2.0
    dist_pos = half - off_canon  # distance to +face
    dist_neg = half + off_canon  # distance to -face
    dmin = jnp.minimum(dist_pos, dist_neg)
    dmax = jnp.maximum(dist_pos, dist_neg)
    centerness = dmin / jnp.where(dmax == 0, 1e-6, dmax)
    centerness = jnp.clip(
        centerness[..., 0] * centerness[..., 1] * centerness[..., 2], 1e-6, None
    ) ** (1.0 / 3.0)
    return jnp.where(pos, centerness, 0.0)


# Per-class covariance multipliers of the live gauss heatmap
# (gauss_fun_once_topk_GT_add_same_size, IASSD_head.py:922-940 — the ONCE
# x4/x6/x5 variant is what both shipped configs execute).
_GAUSS_CLASS_MULT = np.array([1.0, 4.0, 6.0, 5.0], dtype=np.float32)


def gauss_centerness_mask(xyz, pos_mask, gt_of_points):
    """Gaussian-heatmap centerness for one SA layer (IASSD_head.py:889-942).

    Args:
        xyz: (B, N, 3); pos_mask: (B, N); gt_of_points: (B, N, 8).
    Returns:
        (B, N) float mask, 0 on background.
    """
    gt = gt_of_points
    off = xyz - gt[..., 0:3]
    off_canon = rotate_points_along_z(off[..., None, :], -gt[..., 6])[..., 0, :]
    w, l, h = gt[..., 3], gt[..., 4], gt[..., 5]
    eps = 1e-8
    cov1 = 4.0 / (w**2 + l**2 + eps)
    cov2 = 4.0 / (w**2 + h**2 + eps)
    cov3 = 4.0 / (h**2 + l**2 + eps)
    mult = jnp.asarray(_GAUSS_CLASS_MULT)[
        jnp.clip(gt[..., 7].astype(jnp.int32), 0, 3)
    ]
    scaled = jnp.stack(
        [off_canon[..., 0] * cov1 * mult,
         off_canon[..., 1] * cov2 * mult,
         off_canon[..., 2] * cov3 * mult],
        axis=-1,
    )
    hm = jnp.exp(-0.5 * jnp.sum(scaled * scaled, axis=-1))
    return jnp.where(pos_mask, hm, 0.0)


def sa_ins_layer_loss(forward_ret, loss_cfg, num_class):
    """Per-SA-layer semantic loss (IASSD_head.py:668-736)."""
    sa_labels = forward_ret["sa_ins_labels"]
    sa_preds = forward_ret["sa_ins_preds"]
    weights_list = loss_cfg.LOSS_WEIGHTS.get(
        "ins_aware_weight", [1.0] * len(sa_labels)
    )
    total, ignored = 0.0, 0
    tb = {}
    for i in range(len(sa_labels)):
        if sa_preds[i] is None:
            ignored += 1
            continue
        logits = sa_preds[i]  # (B, Ni, C)
        labels = sa_labels[i]
        cls_w, pos_num = _cls_weights(labels)
        one_hot = _one_hot_fg(labels, num_class)
        method = loss_cfg.SAMPLE_METHOD_LIST[i + 1]
        if method and ("ctr" in method[0]):
            # sa_ins_labels[i] / sa_gt_box_of_points[i] were assigned on
            # encoder_coords[i+1] (IASSD_head.py:348-383 loop offset).
            mask = gauss_centerness_mask(
                forward_ret["encoder_coords"][i + 1],
                forward_ret["sa_pos_masks"][i],
                forward_ret["sa_gt_box_of_points"][i],
            )
            one_hot = one_hot * mask[..., None]
        loss = jnp.sum(
            jnp.mean(
                loss_utils.weighted_classification_loss(logits, one_hot, cls_w),
                axis=-1,
            )
        )
        loss = loss * weights_list[i]
        total = total + loss
        tb[f"sa{i}_loss_ins"] = loss
        tb[f"sa{i}_pos_num"] = pos_num
    total = total / max(len(sa_labels) - ignored, 1)
    tb["sa_loss_ins"] = total
    return total, tb


def center_cls_layer_loss(forward_ret, loss_cfg, num_class):
    """Center classification with centerness targets (IASSD_head.py:637-664)."""
    labels = forward_ret["center_cls_labels"]
    logits = forward_ret["center_cls_preds"]
    cls_w, pos_num = _cls_weights(labels)
    one_hot = _one_hot_fg(labels, num_class)
    if loss_cfg.CENTERNESS_REGULARIZATION:
        mask = generate_center_ness_mask(forward_ret)
        one_hot = one_hot * mask[..., None]
    loss = jnp.sum(
        jnp.mean(loss_utils.weighted_classification_loss(logits, one_hot, cls_w), axis=-1)
    )
    loss = loss * loss_cfg.LOSS_WEIGHTS["point_cls_weight"]
    return loss, {"center_loss_cls": loss, "center_pos_num": pos_num}


def center_box_binori_layer_loss(forward_ret, loss_cfg, box_coder):
    """Box regression: smooth-L1 xyzwhl + bin-CE + in-bin residual
    (IASSD_head.py:1239-1282).

    Reference quirks preserved: the in-bin residual term is the *global
    mean* over all points (background included) times sum(reg_weights)
    (:1266-1268), and the bin CE is weighted per-point.
    """
    pos = forward_ret["center_pos_mask"]
    labels = forward_ret["center_box_labels"]  # (B, N, 8)
    preds = forward_ret["center_box_preds"]  # (B, N, 30)
    bin_size = box_coder.bin_size

    reg_w = pos.astype(jnp.float32)
    pos_norm = jnp.maximum(jnp.sum(reg_w), 1.0)
    reg_w = reg_w / pos_norm

    xyzwhl = loss_utils.weighted_smooth_l1_loss(
        preds[..., :6], labels[..., :6], weights=reg_w,
        code_weights=loss_cfg.LOSS_WEIGHTS.get("code_weights", None),
    )
    loss_xyzwhl = jnp.sum(xyzwhl)

    bin_logits = preds[..., 6 : 6 + bin_size]
    bin_res_pred = preds[..., 6 + bin_size :]
    bin_id = labels[..., 6].astype(jnp.int32)
    bin_res = labels[..., 7]
    loss_ori_cls = jnp.sum(
        loss_utils.softmax_cross_entropy(bin_logits, bin_id) * reg_w
    )
    picked = jnp.take_along_axis(bin_res_pred, bin_id[..., None], axis=-1)[..., 0]
    # scalar mean over ALL points, then x sum(reg_w) — replicates :1267-1268
    loss_ori_reg = jnp.mean(loss_utils.smooth_l1(picked - bin_res, beta=1.0))
    loss_ori_reg = loss_ori_reg * jnp.sum(reg_w)

    lw = loss_cfg.LOSS_WEIGHTS
    loss_ori_cls = loss_ori_cls * lw.get("dir_weight", 1.0)
    loss_box = (loss_xyzwhl + loss_ori_reg + loss_ori_cls) * lw["point_box_weight"]
    return loss_box, {
        "center_loss_box": loss_box,
        "center_loss_box_xyzwhl": loss_xyzwhl,
        "center_loss_box_ori_bin": loss_ori_cls,
        "center_loss_box_ori_res": loss_ori_reg,
    }


def corner_layer_loss(forward_ret, loss_cfg):
    """8-corner loss over fg centers (IASSD_head.py:1309-1323)."""
    pos = forward_ret["center_pos_mask"]
    gt = forward_ret["center_gt_box_of_points"]
    pred = forward_ret["point_box_preds"]  # decoded (B, N, 7)
    B, N = pos.shape
    per_box = loss_utils.get_corner_loss_lidar(
        pred.reshape(B * N, 7), gt[..., 0:7].reshape(B * N, 7)
    ).reshape(B, N)
    m = pos.astype(jnp.float32)
    loss = jnp.sum(per_box * m) / jnp.maximum(jnp.sum(m), 1.0)
    loss = loss * loss_cfg.LOSS_WEIGHTS["corner_weight"]
    return loss, {"corner_loss_reg": loss}


def iou3d_layer_loss(forward_ret, loss_cfg):
    """IoU3D-quality regression (IASSD_head.py:1324-1340), config-gated by
    ``IOU_FC`` (absent in both shipped configs).

    Targets are the actual IoU3D between the (detached) decoded boxes and
    each fg point's gt box; smooth-L1 against the iou head output, meaned
    over fg points (torch F.smooth_l1_loss 'mean' over the pos gather)."""
    from ...ops.rotated_iou import paired_boxes_iou3d

    pos = forward_ret["center_pos_mask"]
    gt = forward_ret["center_gt_box_of_points"][..., 0:7]
    pred = jax.lax.stop_gradient(forward_ret["point_box_preds"])
    B, N = pos.shape
    targets = paired_boxes_iou3d(
        pred.reshape(B * N, 7), gt.reshape(B * N, 7)
    ).reshape(B, N)
    targets = jax.lax.stop_gradient(targets)
    preds = forward_ret["box_iou3d_preds"][..., 0]
    m = pos.astype(jnp.float32)
    per = loss_utils.smooth_l1(preds - targets, beta=1.0)
    loss = jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
    loss = loss * forward_ret.get(
        "iou3d_weight", loss_cfg.LOSS_WEIGHTS.get("iou3d_weight", 1.0)
    )
    return loss, {"iou3d_loss_reg": loss}


def cd_loss_metric(forward_ret, loss_cfg):
    """The reference's ``CD_loss`` tb scalar (IASSD_head.py:700-731 +
    gauss_fun_once_topk_GT_add_same_size :943-1034): for every SA layer
    whose own sampling method is ctr-aware, the L1 chamfer distance between
    that layer's coordinates and a same-size reference set built from the
    previous layer — its points ordered by Gaussian centerness (all
    foreground first), topped up with the background points nearest to the
    foreground gt centers.  Logged every step, weighted OUT of the total
    (:730) — behavior preserved.

    Fixed-shape form: the reference's python topk + concat becomes one
    composite-key ``top_k`` (fg keyed above any bg; bg keyed by -dist2);
    chamfer is order-invariant, so set equality gives the same value."""
    method_list = loss_cfg.SAMPLE_METHOD_LIST
    coords = forward_ret["encoder_coords"]
    masks = forward_ret["sa_pos_masks"]
    gts = forward_ret["sa_gt_box_of_points"]
    from ...ops.chamfer import cd_loss_l1

    cds = []
    for i in range(1, len(masks)):
        if not (method_list[i] and "ctr" in method_list[i][0]):
            continue
        prev_xyz = coords[i]  # list index i-1 <-> ref sa_xyz_coords[i-1]
        cur_xyz = coords[i + 1]
        hm = gauss_centerness_mask(prev_xyz, masks[i - 1], gts[i - 1])
        ctrs = gts[i - 1][..., 0:3]
        # bg ranking: min dist2 to any fg point's gt center
        dx = prev_xyz[:, :, 0:1] - ctrs[:, None, :, 0]
        dy = prev_xyz[:, :, 1:2] - ctrs[:, None, :, 1]
        dz = prev_xyz[:, :, 2:3] - ctrs[:, None, :, 2]
        d2 = dx * dx + dy * dy + dz * dz  # (B, Np, Np)
        d2 = jnp.where(masks[i - 1][:, None, :], d2, jnp.inf)
        d2min = jnp.min(d2, axis=-1)  # (B, Np)
        d2min = jnp.where(jnp.isfinite(d2min), d2min, 1e9)
        key = jnp.where(hm > 0, 1e6 + hm, -d2min)
        _, idx = jax.lax.top_k(key, cur_xyz.shape[1])
        sel = jnp.take_along_axis(prev_xyz, idx[..., None], axis=1)
        cds.append(cd_loss_l1(cur_xyz, jax.lax.stop_gradient(sel)))
    if not cds:
        return None
    return jax.lax.stop_gradient(sum(cds) / len(cds))


def get_loss(forward_ret, model_cfg, box_coder, num_class, num_boxes):
    """Total head loss (IASSD_head.py:470-521)."""
    loss_cfg = model_cfg.LOSS_CONFIG
    target_cfg = model_cfg.TARGET_CONFIG
    tb: Dict[str, jnp.ndarray] = {}

    vote_type = loss_cfg.get("LOSS_VOTE_TYPE", "none")
    assign = target_cfg.get("ASSIGN_METHOD", None)
    vote_w = loss_cfg.LOSS_WEIGHTS["vote_weight"]
    if assign is not None and assign.get("ASSIGN_TYPE") == "centers_origin":
        if vote_type == "ver2":
            vote_loss = contextual_vote_loss_ver2(forward_ret, num_boxes, vote_w)
        elif vote_type == "ver1":
            vote_loss = contextual_vote_loss_ver1(forward_ret, num_boxes, vote_w)
        else:
            vote_loss = contextual_vote_loss(forward_ret, num_class, vote_w)
    else:
        # center-assign variant (IASSD_head.py:628-634)
        pos = forward_ret["center_pos_mask"]
        gt_ctr = forward_ret["center_gt_box_of_points"][..., 0:3]
        pred = forward_ret["centers_origin"] + forward_ret["ctr_offsets"]
        vote_loss = loss_utils.smooth_l1_mean(pred, gt_ctr, mask=pos)
    tb["vote_loss"] = vote_loss

    if loss_cfg.get("LOSS_INS", None) is not None:
        sa_loss, tb_sa = sa_ins_layer_loss(forward_ret, loss_cfg, num_class)
        tb.update(tb_sa)
        if "sa_pos_masks" in forward_ret and loss_cfg.get("LOG_CD_METRIC", True):
            cd = cd_loss_metric(forward_ret, loss_cfg)
            if cd is not None:
                tb["CD_loss"] = cd  # logged, excluded (IASSD_head.py:727,730)
    else:
        sa_loss = 0.0

    cls_loss, tb_cls = center_cls_layer_loss(forward_ret, loss_cfg, num_class)
    tb.update(tb_cls)

    box_loss, tb_box = center_box_binori_layer_loss(forward_ret, loss_cfg, box_coder)
    tb.update(tb_box)

    corner_loss = 0.0
    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        corner_loss, tb_c = corner_layer_loss(forward_ret, loss_cfg)
        tb.update(tb_c)

    iou3d_loss = 0.0
    if model_cfg.get("IOU_FC", None) is not None and forward_ret.get(
        "box_iou3d_preds"
    ) is not None:
        iou3d_loss, tb_iou = iou3d_layer_loss(forward_ret, loss_cfg)
        tb.update(tb_iou)

    total = vote_loss + sa_loss + cls_loss + box_loss + corner_loss + iou3d_loss
    tb["point_loss"] = total
    return total, tb


def generate_predicted_boxes(points, cls_preds, box_preds, box_coder):
    """Decode per-point boxes (point_head_template.py:193-207).

    Args:
        points: (B, N, 3); cls_preds: (B, N, C); box_preds: (B, N, code).
    Returns:
        cls_preds unchanged, boxes (B, N, 7).
    """
    pred_classes = jnp.argmax(cls_preds, axis=-1)
    boxes = box_coder.decode(box_preds, points, pred_classes + 1)
    return cls_preds, boxes
