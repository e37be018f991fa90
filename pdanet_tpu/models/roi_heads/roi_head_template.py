"""Shared two-stage (RoI) machinery — counterpart of
``pcdet/models/roi_heads/roi_head_template.py`` (:1-261) and
``target_assigner/proposal_target_layer.py`` (:1-228).

TPU re-design: every stage is fixed-shape.

* ``proposal_layer``: the reference's per-frame NMS loop becomes one
  batched rotated NMS (``batched_nms_candidates``); rois arrive as
  (B, NMS_POST, 7) + validity counts.
* ``sample_rois_for_rcnn``: the reference's boolean-indexing + python
  branching sampler (proposal_target_layer.py:113-196) becomes masked
  rank/argsort selection with ``jax.random``: foreground rois are sampled
  WITHOUT replacement via a random ranking, background rois WITH
  replacement from the hard/easy pools (randint), exactly the reference's
  distribution; the fg/bg slot split point is a traced count, not python
  control flow.
* losses / decode mirror roi_head_template.py:140-261 as masked
  fixed-shape reductions.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
from ..norm import BatchNorm
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.geometry import rotate_points_along_z
from ...ops.rotated_iou import boxes_iou3d
from ...utils import loss_utils
from ...utils.easydict import EasyDict
from ..model_utils.model_nms_utils import batched_nms_candidates


def proposal_layer(batch_cls_preds, batch_box_preds, nms_cfg):
    """First-stage proposals (roi_head_template.py:45-104).

    Args:
        batch_cls_preds: (B, N, C) RAW logits (the reference feeds raw
        scores to the proposal NMS too — ordering is monotonic in them).
    Returns dict:
        rois (B, POST, 7), roi_scores (B, POST) raw logits,
        roi_labels (B, POST) in 1..C, roi_valid (B, POST) bool.
    """
    scores = jnp.max(batch_cls_preds, axis=-1)
    labels = jnp.argmax(batch_cls_preds, axis=-1).astype(jnp.int32) + 1
    valid = jnp.ones(scores.shape, bool)
    out = batched_nms_candidates(
        batch_box_preds, scores, labels, valid, EasyDict(nms_cfg)
    )
    P = out["pred_boxes"].shape[1]
    roi_valid = (
        jnp.arange(P, dtype=jnp.int32)[None, :] < out["pred_counts"][:, None]
    )
    return {
        "rois": out["pred_boxes"][..., :7],
        "roi_scores": out["pred_scores"],
        "roi_labels": out["pred_labels"],
        "roi_valid": roi_valid,
    }


def _pool_sorted(mask, rng_key):
    """Indices of True entries first.  ``randomize`` ranks True entries by
    a uniform draw (random permutation of the pool)."""
    n = mask.shape[0]
    if rng_key is not None:
        key = jnp.where(mask, jax.random.uniform(rng_key, (n,)), jnp.inf)
    else:
        key = jnp.where(mask, jnp.arange(n, dtype=jnp.float32), jnp.inf)
    return jnp.argsort(key).astype(jnp.int32)


def subsample_rois(rng, max_overlaps, sampler_cfg):
    """Fixed-shape fg/bg subsampling (proposal_target_layer.py:113-196).

    Returns:
        sampled_inds (R,) int32 into the roi axis.
    """
    cfg = EasyDict(sampler_cfg)
    R = int(cfg.ROI_PER_IMAGE)
    fg_cap = int(np.round(cfg.FG_RATIO * R))
    fg_thresh = min(float(cfg.REG_FG_THRESH), float(cfg.CLS_FG_THRESH))

    n = max_overlaps.shape[0]
    fg_mask = max_overlaps >= fg_thresh
    easy_mask = max_overlaps < cfg.CLS_BG_THRESH_LO
    hard_mask = (max_overlaps < cfg.REG_FG_THRESH) & (
        max_overlaps >= cfg.CLS_BG_THRESH_LO
    )
    n_fg = jnp.sum(fg_mask.astype(jnp.int32))
    n_easy = jnp.sum(easy_mask.astype(jnp.int32))
    n_hard = jnp.sum(hard_mask.astype(jnp.int32))
    n_bg = n_easy + n_hard

    k_fgperm, k_fgrep, k_hard, k_easy = jax.random.split(rng, 4)
    fg_sorted = _pool_sorted(fg_mask, k_fgperm)  # random fg permutation
    hard_pool = _pool_sorted(hard_mask, None)
    easy_pool = _pool_sorted(easy_mask, None)

    # fg/bg slot split (reference: all-R fg when no bg exists)
    fg_this = jnp.where(
        n_bg > 0, jnp.minimum(fg_cap, n_fg), jnp.where(n_fg > 0, R, 0)
    )
    bg_this = R - fg_this
    hard_num = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((bg_this * cfg.HARD_BG_RATIO).astype(jnp.int32), n_hard),
        jnp.where(n_hard > 0, bg_this, 0),
    )

    s = jnp.arange(R, dtype=jnp.int32)
    # fg: without replacement when bg exists (slots < fg_this <= n_fg);
    # with replacement otherwise (floor(rand * n_fg), :152-155)
    fg_wo = fg_sorted[jnp.minimum(s, n - 1)]
    fg_rep = fg_sorted[
        (jax.random.uniform(k_fgrep, (R,)) * n_fg.astype(jnp.float32))
        .astype(jnp.int32)
        .clip(0, jnp.maximum(n_fg - 1, 0))
    ]
    fg_idx = jnp.where(n_bg > 0, fg_wo, fg_rep)

    hard_idx = hard_pool[
        jax.random.randint(k_hard, (R,), 0, jnp.maximum(n_hard, 1))
    ]
    easy_idx = easy_pool[
        jax.random.randint(k_easy, (R,), 0, jnp.maximum(n_easy, 1))
    ]
    bg_idx = jnp.where(s - fg_this < hard_num, hard_idx, easy_idx)
    idx = jnp.where(s < fg_this, fg_idx, bg_idx)
    # fully-degenerate frame (no rois at all): fall back to index 0 rows
    idx = jnp.where((n_fg + n_bg) > 0, idx, 0)
    return idx


def sample_rois_for_rcnn(rng, proposals, gt_boxes, sampler_cfg):
    """Batched RoI sampling + gt matching
    (proposal_target_layer.py:13-111), vmapped per frame."""
    cfg = EasyDict(sampler_cfg)

    def per_frame(rng, rois, roi_scores, roi_labels, roi_valid, gt):
        gt_valid = jnp.any(gt[:, 0:7] != 0, axis=-1)
        iou = boxes_iou3d(rois[:, 0:7], gt[:, 0:7])  # (N, M)
        ok = gt_valid[None, :]
        if cfg.get("SAMPLE_ROI_BY_EACH_CLASS", False):
            ok = ok & (roi_labels[:, None] == gt[None, :, 7].astype(jnp.int32))
        iou = jnp.where(ok, iou, -1.0)
        gt_assignment = jnp.argmax(iou, axis=1)
        max_overlaps = jnp.maximum(jnp.max(iou, axis=1), 0.0)
        # rois with no candidate keep assignment 0 / overlap 0 (:216-218)
        max_overlaps = jnp.where(roi_valid, max_overlaps, 0.0)

        inds = subsample_rois(rng, max_overlaps, cfg)
        gt_of = gt[gt_assignment[inds]]
        return (
            rois[inds], gt_of, max_overlaps[inds], roi_scores[inds],
            roi_labels[inds],
        )

    B = gt_boxes.shape[0]
    keys = jax.random.split(rng, B)
    rois, gt_of_rois, roi_ious, roi_scores, roi_labels = jax.vmap(per_frame)(
        keys, proposals["rois"], proposals["roi_scores"],
        proposals["roi_labels"], proposals["roi_valid"], gt_boxes,
    )

    reg_valid_mask = (roi_ious > cfg.REG_FG_THRESH).astype(jnp.int32)
    if cfg.CLS_SCORE_TYPE == "cls":
        labels = (roi_ious > cfg.CLS_FG_THRESH).astype(jnp.float32)
        ignore = (roi_ious > cfg.CLS_BG_THRESH) & (roi_ious < cfg.CLS_FG_THRESH)
        cls_labels = jnp.where(ignore, -1.0, labels)
    elif cfg.CLS_SCORE_TYPE == "roi_iou":
        fg = roi_ious > cfg.CLS_FG_THRESH
        bg = roi_ious < cfg.CLS_BG_THRESH
        interval = (~fg) & (~bg)
        soft = (roi_ious - cfg.CLS_BG_THRESH) / (
            cfg.CLS_FG_THRESH - cfg.CLS_BG_THRESH
        )
        cls_labels = jnp.where(interval, soft, fg.astype(jnp.float32))
    else:
        raise NotImplementedError(cfg.CLS_SCORE_TYPE)

    return {
        "rois": rois,
        "gt_of_rois": gt_of_rois,
        "gt_iou_of_rois": roi_ious,
        "roi_scores": roi_scores,
        "roi_labels": roi_labels,
        "reg_valid_mask": reg_valid_mask,
        "rcnn_cls_labels": cls_labels,
    }


def canonicalize_gt_of_rois(rois, gt_of_rois):
    """Canonical roi-frame transform + heading flip/clamp
    (roi_head_template.py:108-139).

    Args:
        rois: (B, R, 7); gt_of_rois: (B, R, 8).
    Returns:
        (B, R, 8) transformed targets (class column preserved).
    """
    B, R = rois.shape[:2]
    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % (2 * np.pi)
    shifted = jnp.concatenate(
        [gt_of_rois[..., 0:3] - roi_center, gt_of_rois[..., 3:]], axis=-1
    )
    rotated = rotate_points_along_z(
        shifted.reshape(B * R, 1, -1), -roi_ry.reshape(B * R)
    ).reshape(B, R, -1)
    heading = (gt_of_rois[..., 6] - roi_ry) % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    return jnp.concatenate(
        [rotated[..., 0:6], heading[..., None], gt_of_rois[..., 7:]], axis=-1
    )


def assign_targets(rng, proposals, gt_boxes, sampler_cfg):
    """proposal sampling + canonical targets (roi_head_template.py:106-139)."""
    t = sample_rois_for_rcnn(rng, proposals, gt_boxes, sampler_cfg)
    t["gt_of_rois_src"] = t["gt_of_rois"]
    t["gt_of_rois"] = canonicalize_gt_of_rois(t["rois"], t["gt_of_rois"])
    return t


def roi_box_cls_loss(rcnn_cls, rcnn_cls_labels, loss_cfg):
    """(roi_head_template.py:209-227); BCE flavor (both shipped heads)."""
    flat = rcnn_cls.reshape(-1)
    labels = rcnn_cls_labels.reshape(-1)
    per = loss_utils.sigmoid_cross_entropy_with_logits(
        flat, jnp.maximum(labels, 0.0)
    )
    valid = (labels >= 0).astype(jnp.float32)
    loss = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    loss = loss * loss_cfg.LOSS_WEIGHTS["rcnn_cls_weight"]
    return loss, {"rcnn_loss_cls": loss}


def roi_box_reg_loss(forward_ret, box_coder, loss_cfg):
    """smooth-L1 on encoded residuals + fg corner loss
    (roi_head_template.py:140-207), masked fixed-shape."""
    code_size = box_coder.code_size
    B, R = forward_ret["reg_valid_mask"].shape
    fg_mask = (forward_ret["reg_valid_mask"] > 0).reshape(-1)
    fg_sum = jnp.sum(fg_mask.astype(jnp.float32))
    gt_ct = forward_ret["gt_of_rois"][..., 0:code_size].reshape(-1, code_size)
    rois = forward_ret["rois"].reshape(-1, code_size)
    rcnn_reg = forward_ret["rcnn_reg"].reshape(-1, code_size)

    rois_anchor = jnp.concatenate(
        [jnp.zeros_like(rois[:, 0:3]), rois[:, 3:6],
         jnp.zeros_like(rois[:, 6:7])], axis=-1,
    )
    reg_targets = box_coder.encode(gt_ct, rois_anchor)
    per = loss_utils.weighted_smooth_l1_loss(
        rcnn_reg[None], reg_targets[None],
        code_weights=loss_cfg.LOSS_WEIGHTS.get("code_weights", None),
    )[0]
    loss_reg = jnp.sum(
        jnp.sum(per, axis=-1) * fg_mask.astype(jnp.float32)
    ) / jnp.maximum(fg_sum, 1.0)
    loss_reg = loss_reg * loss_cfg.LOSS_WEIGHTS["rcnn_reg_weight"]
    tb = {"rcnn_loss_reg": loss_reg}

    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        decoded = decode_roi_boxes(
            forward_ret["rois"], forward_ret["rcnn_reg"], box_coder
        ).reshape(-1, code_size)
        src = forward_ret["gt_of_rois_src"][..., 0:code_size].reshape(
            -1, code_size
        )
        per_corner = loss_utils.get_corner_loss_lidar(
            decoded[:, 0:7], src[:, 0:7]
        )
        loss_corner = jnp.sum(
            per_corner * fg_mask.astype(jnp.float32)
        ) / jnp.maximum(fg_sum, 1.0)
        loss_corner = jnp.where(fg_sum > 0, loss_corner, 0.0)
        loss_corner = loss_corner * loss_cfg.LOSS_WEIGHTS["rcnn_corner_weight"]
        loss_reg = loss_reg + loss_corner
        tb["rcnn_loss_corner"] = loss_corner
    tb["rcnn_loss_reg"] = loss_reg
    return loss_reg, tb


def decode_roi_boxes(rois, rcnn_reg, box_coder):
    """Local decode + rotate/translate back to lidar frame
    (roi_head_template.py:232-261).

    Args:
        rois: (B, R, 7); rcnn_reg: (B, R, code).
    Returns:
        (B, R, 7) refined boxes.
    """
    B, R = rois.shape[:2]
    code_size = box_coder.code_size
    roi_ry = rois[..., 6].reshape(-1)
    roi_xyz = rois[..., 0:3].reshape(-1, 3)
    local_rois = jnp.concatenate(
        [jnp.zeros_like(rois[..., 0:3]), rois[..., 3:]], axis=-1
    )
    decoded = box_coder.decode(
        rcnn_reg.reshape(-1, code_size), local_rois.reshape(-1, code_size)
    )
    rotated = rotate_points_along_z(decoded[:, None, :], roi_ry)[:, 0, :]
    out = jnp.concatenate([rotated[:, 0:3] + roi_xyz, rotated[:, 3:]], axis=-1)
    return out.reshape(B, R, code_size)


class FCStack(nn.Module):
    """Dense+BN+ReLU stack with a linear output layer
    (roi_head_template.make_fc_layers, :29-43).  Dropout after the first
    layer when dp_ratio > 0 (train only)."""

    fc_list: Sequence[int]
    out_features: Optional[int] = None
    dp_ratio: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        for k, f in enumerate(self.fc_list):
            x = nn.Dense(f, use_bias=False, name=f"fc{k}")(x)
            x = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{k}",
            )(x)
            x = nn.relu(x)
            if self.dp_ratio > 0 and k == 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        if self.out_features is not None:
            x = nn.Dense(self.out_features, use_bias=True, name="out")(x)
        return x


def bilinear_grid_sample_2d(feat, gx, gy):
    """``F.grid_sample(..., align_corners=False, padding_mode='zeros')``
    on a channels-last feature map.

    Args:
        feat: (H, W, C); gx/gy: (...,) normalized [-1, 1] sample coords.
    Returns:
        (..., C).
    """
    H, W, C = feat.shape
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xs = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        ys = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        v = feat[ys, xs]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def roi_grid_pool_bev(spatial_features_2d, rois, grid_size, pc_range,
                      voxel_size, downsample_ratio):
    """Rotated RoI grid pooling from the BEV map (second_head.py:53-113):
    the reference builds an affine_grid per roi and grid_samples the BEV
    features; identical math, channels-last and batched.

    Args:
        spatial_features_2d: (B, H, W, C); rois: (B, R, 7).
    Returns:
        (B, R, grid_size, grid_size, C).
    """
    B, H, W, C = spatial_features_2d.shape
    g = int(grid_size)

    x1 = (rois[..., 0] - rois[..., 3] / 2 - pc_range[0]) / (
        voxel_size[0] * downsample_ratio
    )
    x2 = (rois[..., 0] + rois[..., 3] / 2 - pc_range[0]) / (
        voxel_size[0] * downsample_ratio
    )
    y1 = (rois[..., 1] - rois[..., 4] / 2 - pc_range[1]) / (
        voxel_size[1] * downsample_ratio
    )
    y2 = (rois[..., 1] + rois[..., 4] / 2 - pc_range[1]) / (
        voxel_size[1] * downsample_ratio
    )
    cosa = jnp.cos(rois[..., 6])
    sina = jnp.sin(rois[..., 6])

    # affine_grid base coords for a (g, g) output, align_corners=False
    base = (2.0 * jnp.arange(g, dtype=jnp.float32) + 1.0) / g - 1.0
    bx = jnp.broadcast_to(base[None, :], (g, g))  # x varies along axis 1
    by = jnp.broadcast_to(base[:, None], (g, g))

    def one(x1, x2, y1, y2, cosa, sina):
        # theta rows (second_head.py:88-93)
        gx = (
            (x2 - x1) / (W - 1) * cosa * bx
            + (x2 - x1) / (W - 1) * (-sina) * by
            + (x1 + x2 - W + 1) / (W - 1)
        )
        gy = (
            (y2 - y1) / (H - 1) * sina * bx
            + (y2 - y1) / (H - 1) * cosa * by
            + (y1 + y2 - H + 1) / (H - 1)
        )
        return gx, gy

    gx, gy = jax.vmap(jax.vmap(one))(x1, x2, y1, y2, cosa, sina)  # (B,R,g,g)
    sample = jax.vmap(bilinear_grid_sample_2d)  # over batch
    return sample(
        spatial_features_2d, gx.reshape(B, -1), gy.reshape(B, -1)
    ).reshape(B, rois.shape[1], g, g, C)
