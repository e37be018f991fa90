"""PointHeadSimple — counterpart of
``pcdet/models/dense_heads/point_head_simple.py`` (:1-100): the PV-RCNN
keypoint segmentation head.  Class-agnostic FC stack over the (pre- or
post-fusion) keypoint features; focal cls loss against points-in-gt-box
labels with the 0.2 m ignore ring (point_head_template.py:49-131).

Dense re-design: keypoints are (B, K, 3) so target assignment reuses the
vectorized ``assign_stack_targets`` (iassd_head) instead of the
reference's per-frame boolean indexing.
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


class PointHeadSimpleNet(nn.Module):
    """``make_fc_layers`` CLS_FC stack + linear cls output
    (point_head_template.py:36-47)."""

    model_cfg: Any
    num_class: int = 1

    @nn.compact
    def __call__(self, point_features, train=False):
        cfg = EasyDict(self.model_cfg)
        x = point_features
        for k, f in enumerate(cfg.CLS_FC):
            x = nn.Dense(f, use_bias=False, name=f"cls_fc{k}")(x)
            x = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"cls_bn{k}",
            )(x)
            x = nn.relu(x)
        n_out = 1 if cfg.get("CLASS_AGNOSTIC", False) else self.num_class
        return nn.Dense(n_out, use_bias=True, name="cls_out")(x)


def point_head_simple_loss(point_cls_preds, point_coords, gt_boxes,
                           model_cfg):
    """Focal segmentation loss (point_head_template.get_cls_layer_loss,
    :105-131): weights 1 on fg+bg, 0 on the ignore ring, normalized by the
    positive count.

    Args:
        point_cls_preds: (B, K, C'); point_coords: (B, K, 3);
        gt_boxes: (B, M, 8).
    Returns:
        (loss, tb_dict).
    """
    cfg = EasyDict(model_cfg)
    B, K, n_out = point_cls_preds.shape
    ext = enlarge_box3d(
        gt_boxes.reshape(-1, gt_boxes.shape[-1]),
        cfg.TARGET_CONFIG.GT_EXTRA_WIDTH,
    ).reshape(B, -1, gt_boxes.shape[-1])
    t = assign_stack_targets(
        point_coords, gt_boxes, ext, set_ignore_flag=True,
    )
    labels = t["point_cls_labels"]  # (B, K) in {-1, 0, 1..C}
    if cfg.get("CLASS_AGNOSTIC", False):
        labels = jnp.where(labels > 0, 1, labels)

    positives = labels > 0
    cls_weights = ((labels >= 0).astype(jnp.float32))
    pos_norm = jnp.sum(positives.astype(jnp.float32))
    cls_weights = cls_weights / jnp.maximum(pos_norm, 1.0)
    one_hot = jax.nn.one_hot(
        jnp.maximum(labels, 0), n_out + 1, dtype=point_cls_preds.dtype
    )[..., 1:]
    loss = jnp.sum(
        loss_utils.sigmoid_focal_loss(point_cls_preds, one_hot, cls_weights)
    )
    w = EasyDict(cfg.LOSS_CONFIG).LOSS_WEIGHTS.get("point_cls_weight", 1.0)
    loss = loss * w
    return loss, {"point_loss_cls": loss, "point_pos_num": pos_norm}
