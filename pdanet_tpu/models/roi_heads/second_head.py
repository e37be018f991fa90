"""SECOND-IoU RoI head — counterpart of
``pcdet/models/roi_heads/second_head.py`` (:1-165).

Pools rotated BEV patches per RoI (affine grid + bilinear sample), runs a
shared FC stack and predicts one IoU-quality logit per RoI; the box is NOT
refined (batch_box_preds stays the roi, second_head.py:133-135)."""

from typing import Any

import flax.linen as nn
from ..norm import BatchNorm
import jax.numpy as jnp

from ...utils import loss_utils
from ...utils.easydict import EasyDict


class SECONDHeadNet(nn.Module):
    """SHARED_FC (dropout after each non-final layer, second_head.py:16-27)
    -> IOU_FC (dropout after first, make_fc_layers) -> 1 logit."""

    model_cfg: Any

    @nn.compact
    def __call__(self, pooled, train=False):
        cfg = EasyDict(self.model_cfg)
        B, R = pooled.shape[0], pooled.shape[1]
        x = pooled.reshape(B, R, -1)
        dp = float(cfg.get("DP_RATIO", 0.0))
        shared = list(cfg.SHARED_FC)
        for k, f in enumerate(shared):
            x = nn.Dense(f, use_bias=False, name=f"shared_fc{k}")(x)
            x = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"shared_bn{k}",
            )(x)
            x = nn.relu(x)
            if k != len(shared) - 1 and dp > 0:
                x = nn.Dropout(dp, deterministic=not train)(x)
        for k, f in enumerate(cfg.IOU_FC):
            x = nn.Dense(f, use_bias=False, name=f"iou_fc{k}")(x)
            x = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"iou_bn{k}",
            )(x)
            x = nn.relu(x)
            if dp >= 0 and k == 0:
                x = nn.Dropout(dp, deterministic=not train)(x)
        return nn.Dense(1, use_bias=True, name="iou_out")(x)  # (B, R, 1)


def second_head_iou_loss(rcnn_iou, rcnn_cls_labels, loss_cfg):
    """IoU-quality loss (second_head.py:143-165); BCE-with-logits flavor
    over all (no-ignore) slots — CLS_SCORE_TYPE roi_iou yields soft labels
    in [0, 1], so every slot is valid."""
    loss_cfg = EasyDict(loss_cfg)
    flat = rcnn_iou.reshape(-1)
    labels = rcnn_cls_labels.reshape(-1)
    if loss_cfg.IOU_LOSS == "BinaryCrossEntropy":
        per = loss_utils.sigmoid_cross_entropy_with_logits(flat, labels)
        loss = jnp.mean(per)
    elif loss_cfg.IOU_LOSS == "L2":
        loss = jnp.mean(jnp.square(flat - labels))
    elif loss_cfg.IOU_LOSS == "smoothL1":
        loss = jnp.mean(loss_utils.smooth_l1(flat - labels, beta=1.0 / 9.0))
    else:
        raise NotImplementedError(loss_cfg.IOU_LOSS)
    loss = loss * loss_cfg.LOSS_WEIGHTS.get("rcnn_iou_weight", 1.0)
    return loss, {"rcnn_loss_iou": loss}
