"""PointHeadBox — counterpart of
``pcdet/models/dense_heads/point_head_box.py`` (:1-120): PointRCNN's
first stage.  Per-point classification + box regression
(PointResidualCoder) over the PointNet2 per-point features; predicted
boxes decode at every forward (``predict_boxes_when_training`` is True
for PointRCNN) to feed the proposal layer.

Dense re-design: points are (B, N, 3) so target assignment reuses the
vectorized ``assign_stack_targets`` (iassd_head).
"""

from typing import Any

import flax.linen as nn
from ..norm import BatchNorm
import jax
import jax.numpy as jnp

from ...ops.geometry import enlarge_box3d
from ...utils import loss_utils
from ...utils.easydict import EasyDict
from .iassd_head import assign_stack_targets


class PointHeadBoxNet(nn.Module):
    """CLS_FC + REG_FC stacks (point_head_template.make_fc_layers)."""

    model_cfg: Any
    num_class: int
    code_size: int

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
        point_cls_preds = stack(point_features, cfg.CLS_FC, n_cls, "cls")
        point_box_preds = stack(
            point_features, cfg.REG_FC, self.code_size, "box"
        )
        return point_cls_preds, point_box_preds


def generate_predicted_boxes(points, point_cls_preds, point_box_preds,
                             box_coder):
    """Per-point box decode (point_head_template.py:193-210).

    Args:
        points: (B, N, 3); point_cls_preds: (B, N, C);
        point_box_preds: (B, N, code).
    Returns:
        (B, N, C) cls preds (unchanged), (B, N, 7) decoded boxes.
    """
    pred_classes = jnp.argmax(point_cls_preds, axis=-1) + 1
    boxes = box_coder.decode(point_box_preds, points, pred_classes)
    return point_cls_preds, boxes


def point_head_box_loss(point_cls_preds, point_box_preds, point_coords,
                        gt_boxes, box_coder, model_cfg, num_class):
    """Focal cls + weighted smooth-L1 box loss
    (point_head_template.py:105-191).

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
        ret_box_labels=True, box_coder=box_coder,
    )
    labels = t["point_cls_labels"]  # (B, N)
    n_out = point_cls_preds.shape[-1]
    if cfg.get("CLASS_AGNOSTIC", False):
        labels = jnp.where(labels > 0, 1, labels)

    positives = labels > 0
    pos_norm = jnp.sum(positives.astype(jnp.float32))
    cls_weights = (labels >= 0).astype(jnp.float32) / jnp.maximum(pos_norm, 1.0)
    one_hot = jax.nn.one_hot(
        jnp.maximum(labels, 0), n_out + 1, dtype=point_cls_preds.dtype
    )[..., 1:]
    w = EasyDict(cfg.LOSS_CONFIG).LOSS_WEIGHTS
    cls_loss = jnp.sum(
        loss_utils.sigmoid_focal_loss(point_cls_preds, one_hot, cls_weights)
    ) * w.get("point_cls_weight", 1.0)

    reg_weights = positives.astype(jnp.float32) / jnp.maximum(pos_norm, 1.0)
    per = loss_utils.weighted_smooth_l1_loss(
        point_box_preds, t["point_box_labels"],
        code_weights=w.get("code_weights", None),
    )
    box_loss = jnp.sum(
        jnp.sum(per, axis=-1) * reg_weights
    ) * w.get("point_box_weight", 1.0)

    loss = cls_loss + box_loss
    return loss, {
        "point_loss_cls": cls_loss,
        "point_loss_box": box_loss,
        "point_pos_num": pos_norm,
    }
