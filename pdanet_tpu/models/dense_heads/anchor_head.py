"""Anchor head family — counterpart of
``pcdet/models/dense_heads/{anchor_head_template,anchor_head_single}.py``
plus ``target_assigner/{anchor_generator,axis_aligned_target_assigner}.py``.

TPU re-design notes:
* anchors are generated once as numpy constants (grid is static);
* the axis-aligned target assigner's per-sample / per-class python loops
  become masked (A, M) matrix ops vmapped over the batch — padded gt rows
  are masked to IoU -1 so the reference's empty-gt and force-match
  semantics survive;
* heads are 1x1 convs on channels-last BEV maps.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import loss_utils
from ...utils.box_coder_utils import ResidualCoder


def generate_anchors(anchor_generator_cfg, grid_size, point_cloud_range,
                     anchor_ndim=7):
    """Counterpart of AnchorGenerator.generate_anchors (reference :17-61).

    Returns (list of (nz, ny, nx, S, R, 7) float32 arrays,
             list of anchors-per-location).
    """
    all_anchors, num_per_loc = [], []
    for cfg in anchor_generator_cfg:
        stride = cfg.get("feature_map_stride", 2)
        gx = int(grid_size[0]) // stride
        gy = int(grid_size[1]) // stride
        sizes = np.array(cfg["anchor_sizes"], dtype=np.float32)
        rotations = np.array(cfg["anchor_rotations"], dtype=np.float32)
        heights = np.array(cfg["anchor_bottom_heights"], dtype=np.float32)
        align_center = cfg.get("align_center", False)

        if align_center:
            x_stride = (point_cloud_range[3] - point_cloud_range[0]) / gx
            y_stride = (point_cloud_range[4] - point_cloud_range[1]) / gy
            x_offset, y_offset = x_stride / 2, y_stride / 2
        else:
            x_stride = (point_cloud_range[3] - point_cloud_range[0]) / (gx - 1)
            y_stride = (point_cloud_range[4] - point_cloud_range[1]) / (gy - 1)
            x_offset = y_offset = 0.0

        x_shifts = np.arange(
            point_cloud_range[0] + x_offset, point_cloud_range[3] + 1e-5,
            x_stride, dtype=np.float32,
        )[:gx]
        y_shifts = np.arange(
            point_cloud_range[1] + y_offset, point_cloud_range[4] + 1e-5,
            y_stride, dtype=np.float32,
        )[:gy]
        z_shifts = heights

        num_per_loc.append(len(rotations) * len(sizes) * len(z_shifts))
        xg, yg, zg = np.meshgrid(x_shifts, y_shifts, z_shifts, indexing="ij")
        anchors = np.stack([xg, yg, zg], axis=-1)  # (gx, gy, nz, 3)
        S, R = len(sizes), len(rotations)
        anchors = np.tile(anchors[:, :, :, None, :], (1, 1, 1, S, 1))
        size_t = np.broadcast_to(
            sizes.reshape(1, 1, 1, S, 3), anchors.shape[:4] + (3,)
        )
        anchors = np.concatenate([anchors, size_t], axis=-1)
        anchors = np.tile(anchors[:, :, :, :, None, :], (1, 1, 1, 1, R, 1))
        rot_t = np.broadcast_to(
            rotations.reshape(1, 1, 1, 1, R, 1), anchors.shape[:5] + (1,)
        )
        anchors = np.concatenate([anchors, rot_t], axis=-1)
        anchors = anchors.transpose(2, 1, 0, 3, 4, 5)  # (nz, ny, nx, S, R, 7)
        anchors[..., 2] += anchors[..., 5] / 2  # bottom -> center z
        all_anchors.append(anchors.astype(np.float32))
    return all_anchors, num_per_loc


def flat_anchors_per_class(all_anchors):
    """Per-class (A_c, 7) flats in the head's per-location interleave order
    (class-major along the anchor axis, reference cat dim=-3)."""
    nz, ny, nx = all_anchors[0].shape[:3]
    cat = np.concatenate(all_anchors, axis=-3)  # (nz, ny, nx, sum_S, R, 7)
    flat = cat.reshape(-1, cat.shape[-1])
    per_class = [a.reshape(nz, ny, nx, -1, 7) for a in all_anchors]
    return flat, per_class


def nearest_bev_iou(boxes_a, boxes_b):
    """``box_utils.boxes3d_nearest_bev_iou`` (reference box_utils.py:271-282):
    snap rotated boxes to their nearest axis-aligned BEV footprint, then
    plain aligned IoU."""

    def aligned(boxes):
        rot = jnp.abs(
            boxes[..., 6]
            - jnp.floor(boxes[..., 6] / np.pi + 0.5) * np.pi
        )
        choose = rot[..., None] < np.pi / 4
        dims = jnp.where(
            choose, boxes[..., [3, 4]], boxes[..., [4, 3]]
        )
        return jnp.concatenate(
            [boxes[..., 0:2] - dims / 2, boxes[..., 0:2] + dims / 2], axis=-1
        )

    a = aligned(boxes_a)  # (A, 4)
    b = aligned(boxes_b)  # (M, 4)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def assign_targets_single(anchors, gt_boxes, gt_mask, box_coder,
                          matched_threshold, unmatched_threshold):
    """Vectorized AxisAlignedTargetAssigner.assign_targets_single
    (reference :133-210) for one class on one frame.

    Args:
        anchors: (A, 7); gt_boxes: (M, 8) padded; gt_mask: (M,) bool —
        valid rows of THIS class.
    Returns labels (A,) int32, reg targets (A, code_size).
    """
    A = anchors.shape[0]
    iou = nearest_bev_iou(anchors, gt_boxes[:, :7])  # (A, M)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)

    a2g_max = jnp.max(iou, axis=1)
    a2g_arg = jnp.argmax(iou, axis=1)
    g2a_max = jnp.max(iou, axis=0)  # (M,)
    g2a_max = jnp.where(g2a_max == 0, -1.0, g2a_max)  # empty gt never forces
    force = (iou == g2a_max[None, :]) & gt_mask[None, :] & (iou > 0)
    force_any = jnp.any(force, axis=1)

    gt_cls = gt_boxes[:, 7].astype(jnp.int32)
    cls_at_arg = jnp.take(gt_cls, a2g_arg)

    labels = jnp.full((A,), -1, dtype=jnp.int32)
    labels = jnp.where(a2g_max < unmatched_threshold, 0, labels)
    labels = jnp.where(a2g_max >= matched_threshold, cls_at_arg, labels)
    labels = jnp.where(force_any, cls_at_arg, labels)

    fg = labels > 0
    tgt_boxes = jnp.take(gt_boxes, a2g_arg, axis=0)
    enc = box_coder.encode(tgt_boxes[:, :7], anchors)
    reg_targets = jnp.where(fg[:, None], enc, 0.0)
    return labels, reg_targets


def assign_targets(per_class_anchors, gt_boxes, class_ids, thresholds,
                   box_coder):
    """Batch anchor target assignment (reference :36-131).

    Args:
        per_class_anchors: list of (nz, ny, nx, A_loc_c, 7);
        gt_boxes: (B, M, 8); class_ids: per anchor-class the 1-based gt
        class id; thresholds: list of (matched, unmatched).
    Returns dict with (B, A_total) labels, (B, A_total, code) targets,
    (B, A_total) reg weights — A_total in per-location interleave order.
    """
    nz, ny, nx = per_class_anchors[0].shape[:3]

    def one_frame(gt):
        valid = jnp.any(gt[:, :7] != 0, axis=-1)
        labels_list, targets_list = [], []
        for anchors_c, cid, (mt, ut) in zip(
            per_class_anchors, class_ids, thresholds
        ):
            flat = anchors_c.reshape(-1, 7)
            mask = valid & (gt[:, 7].astype(jnp.int32) == cid)
            lab, tgt = assign_targets_single(flat, gt, mask, box_coder, mt, ut)
            labels_list.append(lab.reshape(nz, ny, nx, -1))
            targets_list.append(
                tgt.reshape(nz, ny, nx, -1, box_coder.code_size)
            )
        labels = jnp.concatenate(labels_list, axis=-1).reshape(-1)
        targets = jnp.concatenate(targets_list, axis=-2).reshape(
            -1, box_coder.code_size
        )
        return labels, targets

    labels, targets = jax.vmap(one_frame)(gt_boxes)
    reg_weights = (labels > 0).astype(jnp.float32)
    return {
        "box_cls_labels": labels,
        "box_reg_targets": targets,
        "reg_weights": reg_weights,
    }


class AnchorHeadSingleNet(nn.Module):
    """1x1 conv heads (anchor_head_single.py:10-60)."""

    num_class: int
    num_anchors_per_location: int
    code_size: int
    use_direction_classifier: bool = True
    num_dir_bins: int = 2

    @nn.compact
    def __call__(self, spatial_features_2d):
        a = self.num_anchors_per_location
        cls_preds = nn.Conv(a * self.num_class, (1, 1), name="conv_cls")(
            spatial_features_2d
        )
        box_preds = nn.Conv(a * self.code_size, (1, 1), name="conv_box")(
            spatial_features_2d
        )
        dir_preds = None
        if self.use_direction_classifier:
            dir_preds = nn.Conv(
                a * self.num_dir_bins, (1, 1), name="conv_dir_cls"
            )(spatial_features_2d)
        return cls_preds, box_preds, dir_preds


def add_sin_difference(boxes1, boxes2, dim=6):
    """reference anchor_head_template.py:123-129."""
    rad_pred = jnp.sin(boxes1[..., dim : dim + 1]) * jnp.cos(
        boxes2[..., dim : dim + 1]
    )
    rad_tg = jnp.cos(boxes1[..., dim : dim + 1]) * jnp.sin(
        boxes2[..., dim : dim + 1]
    )
    b1 = jnp.concatenate(
        [boxes1[..., :dim], rad_pred, boxes1[..., dim + 1 :]], axis=-1
    )
    b2 = jnp.concatenate(
        [boxes2[..., :dim], rad_tg, boxes2[..., dim + 1 :]], axis=-1
    )
    return b1, b2


def get_direction_target(anchors, reg_targets, dir_offset, num_bins):
    """reference anchor_head_template.py:131-142 (one-hot handled by the
    caller)."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = rot_gt - dir_offset
    offset_rot = offset_rot - jnp.floor(offset_rot / (2 * np.pi)) * 2 * np.pi
    dir_cls = jnp.clip(
        jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32),
        0, num_bins - 1,
    )
    return dir_cls


def anchor_head_loss(cls_preds, box_preds, dir_preds, targets, anchors_flat,
                     num_class, loss_weights, dir_offset=0.78539,
                     num_dir_bins=2):
    """Cls focal + sin-diff smooth-L1 + direction CE
    (anchor_head_template.py:80-180)."""
    B = cls_preds.shape[0]
    labels = targets["box_cls_labels"]  # (B, A)
    reg_targets = targets["box_reg_targets"]

    cls_preds = cls_preds.reshape(B, -1, num_class)
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives.astype(jnp.float32) + positives.astype(jnp.float32))
    reg_weights = positives.astype(jnp.float32)
    pos_norm = jnp.clip(
        jnp.sum(positives, axis=1, keepdims=True).astype(jnp.float32), 1.0
    )
    cls_weights = cls_weights / pos_norm
    reg_weights = reg_weights / pos_norm

    one_hot = jax.nn.one_hot(
        jnp.where(labels >= 0, labels, 0), num_class + 1, dtype=jnp.float32
    )[..., 1:]
    cls_loss = jnp.sum(
        loss_utils.sigmoid_focal_loss(cls_preds, one_hot, cls_weights)
    ) / B * loss_weights["cls_weight"]

    code = reg_targets.shape[-1]
    box_preds = box_preds.reshape(B, -1, code)
    anchors_b = jnp.broadcast_to(
        anchors_flat[None], (B,) + anchors_flat.shape
    )
    bp_sin, rt_sin = add_sin_difference(box_preds, reg_targets)
    loc_loss = jnp.sum(
        loss_utils.weighted_smooth_l1_loss(
            bp_sin, rt_sin, weights=reg_weights,
            code_weights=loss_weights.get("code_weights"),
        )
    ) / B * loss_weights["loc_weight"]

    tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
    total = cls_loss + loc_loss
    if dir_preds is not None:
        dir_preds = dir_preds.reshape(B, -1, num_dir_bins)
        dir_targets = get_direction_target(
            anchors_b, reg_targets, dir_offset, num_dir_bins
        )
        dir_one_hot = jax.nn.one_hot(dir_targets, num_dir_bins)
        logp = jax.nn.log_softmax(dir_preds, axis=-1)
        dir_loss = -jnp.sum(dir_one_hot * logp, axis=-1) * reg_weights
        dir_loss = jnp.sum(dir_loss) / B * loss_weights["dir_weight"]
        tb["rpn_loss_dir"] = dir_loss
        total = total + dir_loss
    tb["rpn_loss"] = total
    return total, tb


def generate_predicted_boxes(cls_preds, box_preds, dir_preds, anchors_flat,
                             box_coder, num_class, dir_offset=0.78539,
                             dir_limit_offset=0.0, num_dir_bins=2):
    """reference anchor_head_template.py:182-219."""
    B = cls_preds.shape[0]
    cls_preds = cls_preds.reshape(B, -1, num_class)
    box_preds = box_preds.reshape(B, -1, box_coder.code_size)
    batch_boxes = box_coder.decode(box_preds, anchors_flat[None])
    if dir_preds is not None:
        dir_preds = dir_preds.reshape(B, -1, num_dir_bins)
        dir_labels = jnp.argmax(dir_preds, axis=-1)
        period = 2 * np.pi / num_dir_bins
        val = batch_boxes[..., 6] - dir_offset
        dir_rot = val - jnp.floor(val / period + dir_limit_offset) * period
        heading = dir_rot + dir_offset + period * dir_labels.astype(
            batch_boxes.dtype
        )
        batch_boxes = jnp.concatenate(
            [batch_boxes[..., :6], heading[..., None], batch_boxes[..., 7:]],
            axis=-1,
        )
    return cls_preds, batch_boxes
