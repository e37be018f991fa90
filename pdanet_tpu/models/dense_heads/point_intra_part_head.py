"""PointIntraPartOffsetHead — counterpart of
``pcdet/models/dense_heads/point_intra_part_head.py`` (:1-120): Part-A2's
per-voxel foreground segmentation + intra-object part-location
regression (canonical in-box offsets in [0, 1]^3, BCE loss).

Dense re-design: operates on the UNet decoder's (B, V, C) padded voxel
rows with a validity mask (padding rows get weight 0 like background).
"""

from typing import Any

import flax.linen as nn
from ..norm import BatchNorm
import jax
import jax.numpy as jnp

from ...ops.geometry import enlarge_box3d, rotate_points_along_z
from ...utils import loss_utils
from ...utils.easydict import EasyDict
from .iassd_head import assign_stack_targets


class PointIntraPartOffsetHeadNet(nn.Module):
    """CLS_FC / PART_FC stacks (empty lists = single linear layers in the
    shipped Part-A2 config); an optional REG_FC box branch exists when the
    target config names a BOX_CODER (PartA2-free,
    point_intra_part_head.py:26-37)."""

    model_cfg: Any
    num_class: int
    code_size: int = 0  # >0 enables the box branch

    @nn.compact
    def __call__(self, point_features, train=False):
        cfg = EasyDict(self.model_cfg)

        def stack(x, widths, n_out, prefix):
            for k, f in enumerate(widths):
                x = nn.Dense(f, use_bias=False, name=f"{prefix}_fc{k}")(x)
                x = BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, name=f"{prefix}_bn{k}",
                )(x)
                x = nn.relu(x)
            return nn.Dense(n_out, use_bias=True, name=f"{prefix}_out")(x)

        n_cls = 1 if cfg.get("CLASS_AGNOSTIC", False) else self.num_class
        point_cls_preds = stack(
            point_features, list(cfg.get("CLS_FC", [])), n_cls, "cls"
        )
        point_part_preds = stack(
            point_features, list(cfg.get("PART_FC", [])), 3, "part"
        )
        if self.code_size > 0:
            point_box_preds = stack(
                point_features, list(cfg.get("REG_FC", [])),
                self.code_size, "box",
            )
            return point_cls_preds, point_part_preds, point_box_preds
        return point_cls_preds, point_part_preds


def intra_part_labels(point_coords, gt_of_points, pos_mask):
    """Canonical intra-box offsets (point_head_template.py:117-125):
    rotate fg points into the box frame, normalize by dims, +0.5."""
    B, N = pos_mask.shape
    shifted = point_coords - gt_of_points[..., 0:3]
    local = rotate_points_along_z(
        shifted.reshape(B * N, 1, 3), -gt_of_points[..., 6].reshape(B * N)
    ).reshape(B, N, 3)
    dims = jnp.maximum(gt_of_points[..., 3:6], 1e-5)
    labels = local / dims + 0.5
    return jnp.where(pos_mask[..., None], labels, 0.0)


def point_intra_part_loss(point_cls_preds, point_part_preds, point_coords,
                          point_valid, gt_boxes, model_cfg,
                          point_box_preds=None, box_coder=None):
    """Focal seg loss + part BCE loss (point_head_template.py:105-158),
    plus the weighted smooth-L1 box loss when the box branch exists
    (PartA2-free, point_intra_part_head.py:70-78).

    Args:
        point_cls_preds: (B, V, C'); point_part_preds: (B, V, 3);
        point_coords: (B, V, 3); point_valid: (B, V) bool (padded rows).
    Returns:
        (loss, tb_dict).
    """
    cfg = EasyDict(model_cfg)
    B = gt_boxes.shape[0]
    ext = enlarge_box3d(
        gt_boxes.reshape(-1, gt_boxes.shape[-1]),
        cfg.TARGET_CONFIG.GT_EXTRA_WIDTH,
    ).reshape(B, -1, gt_boxes.shape[-1])
    t = assign_stack_targets(
        point_coords, gt_boxes, ext, set_ignore_flag=True,
        ret_box_labels=point_box_preds is not None, box_coder=box_coder,
    )
    labels = t["point_cls_labels"]
    labels = jnp.where(point_valid, labels, 0)  # padding rows = background
    n_out = point_cls_preds.shape[-1]
    if cfg.get("CLASS_AGNOSTIC", False):
        labels = jnp.where(labels > 0, 1, labels)

    positives = (labels > 0) & point_valid
    pos_norm = jnp.sum(positives.astype(jnp.float32))
    cls_weights = ((labels >= 0) & point_valid).astype(jnp.float32)
    cls_weights = cls_weights / jnp.maximum(pos_norm, 1.0)
    one_hot = jax.nn.one_hot(
        jnp.maximum(labels, 0), n_out + 1, dtype=point_cls_preds.dtype
    )[..., 1:]
    w = EasyDict(cfg.LOSS_CONFIG).LOSS_WEIGHTS
    cls_loss = jnp.sum(
        loss_utils.sigmoid_focal_loss(point_cls_preds, one_hot, cls_weights)
    ) * w.get("point_cls_weight", 1.0)

    part_labels = intra_part_labels(
        point_coords, t["gt_box_of_points"], positives
    )
    part_pred = jax.nn.sigmoid(point_part_preds)
    eps = 1e-7
    bce = -(
        part_labels * jnp.log(jnp.clip(part_pred, eps, 1.0))
        + (1 - part_labels) * jnp.log(jnp.clip(1 - part_pred, eps, 1.0))
    ).sum(-1)
    # reference normalizes by 3 * pos count (point_head_template.py
    # get_part_layer_loss: ``/ (3 * pos_normalizer)``)
    part_loss = jnp.sum(
        bce * positives.astype(jnp.float32)
    ) / (3.0 * jnp.maximum(pos_norm, 1.0)) * w.get("point_part_weight", 1.0)

    loss = cls_loss + part_loss
    tb = {
        "point_loss_cls": cls_loss,
        "point_loss_part": part_loss,
        "point_pos_num": pos_norm,
    }
    if point_box_preds is not None:
        reg_weights = positives.astype(jnp.float32) / jnp.maximum(
            pos_norm, 1.0
        )
        per = loss_utils.weighted_smooth_l1_loss(
            point_box_preds, t["point_box_labels"],
            code_weights=w.get("code_weights", None),
        )
        box_loss = jnp.sum(
            jnp.sum(per, axis=-1) * reg_weights
        ) * w.get("point_box_weight", 1.0)
        tb["point_loss_box"] = box_loss
        loss = loss + box_loss
    return loss, tb
