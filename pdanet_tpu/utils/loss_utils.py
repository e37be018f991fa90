"""Loss primitives (JAX, masked fixed-shape reductions).

Behavior parity with ``pcdet/utils/loss_utils.py``; the reference's
boolean-indexing style becomes masked arithmetic so every loss is a static
shape under jit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import boxes_to_corners_3d


def sigmoid_cross_entropy_with_logits(logits, targets):
    """tf-style sigmoid CE: max(x,0) - x*z + log1p(exp(-|x|)).

    Reference ``WeightedClassificationLoss.sigmoid_cross_entropy_with_logits``
    (loss_utils.py:80-97).
    """
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def weighted_classification_loss(logits, one_hot_targets, weights):
    """Per-element sigmoid CE scaled by per-point weights.

    Reference ``WeightedClassificationLoss.forward`` (loss_utils.py:99-132)
    with reduction='none': returns (..., C).
    """
    ce = sigmoid_cross_entropy_with_logits(logits, one_hot_targets)
    return ce * weights[..., None]


def sigmoid_focal_loss(logits, one_hot_targets, weights, gamma=2.0, alpha=0.25):
    """Reference ``SigmoidFocalClassificationLoss`` (loss_utils.py:9-72)."""
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = one_hot_targets * alpha + (1 - one_hot_targets) * (1 - alpha)
    pt = one_hot_targets * (1.0 - pred_sigmoid) + (1.0 - one_hot_targets) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    ce = sigmoid_cross_entropy_with_logits(logits, one_hot_targets)
    return focal_weight * ce * weights[..., None]


def smooth_l1(diff, beta):
    """fvcore-style smooth L1 (reference loss_utils.py:157-165)."""
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def weighted_smooth_l1_loss(preds, targets, weights=None, beta=1.0 / 9.0, code_weights=None):
    """Reference ``WeightedSmoothL1Loss.forward`` (loss_utils.py:167-194).

    NaN targets are replaced by the prediction (zero loss) like the
    reference's isnan guard.
    """
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = smooth_l1(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def smooth_l1_mean(pred, target, mask=None, beta=1.0):
    """torch.nn.functional.smooth_l1_loss(reduction='mean') over masked rows.

    The reference calls F.smooth_l1_loss on boolean-gathered rows; the mask
    formulation divides by (#selected elements), matching exactly.
    """
    loss = smooth_l1(pred - target, beta)
    if mask is None:
        return jnp.mean(loss)
    # `mask` selects rows; a selected row contributes prod(tail dims) elements
    # to the mean's denominator, exactly like mean() over gathered rows.
    tail = int(np.prod(loss.shape[mask.ndim :])) if loss.ndim > mask.ndim else 1
    m = mask.astype(loss.dtype)
    mb = m.reshape(m.shape + (1,) * (loss.ndim - m.ndim))
    denom = jnp.maximum(jnp.sum(m) * tail, 1.0)
    return jnp.sum(loss * mb) / denom


def softmax_cross_entropy(logits, labels):
    """torch.nn.CrossEntropyLoss(reduction='none'): (..., C) x (...,) int."""
    logz = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logz, labels[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]


def get_corner_loss_lidar(pred_boxes, gt_boxes):
    """8-corner L1 loss with flipped-heading min (loss_utils.py:340-364).

    Args:
        pred_boxes, gt_boxes: (N, 7).
    Returns:
        (N,) per-box corner loss.
    """
    pred_corners = boxes_to_corners_3d(pred_boxes)
    gt_corners = boxes_to_corners_3d(gt_boxes)
    gt_flip = jnp.concatenate([gt_boxes[:, :6], gt_boxes[:, 6:7] + np.pi], axis=1)
    gt_corners_flip = boxes_to_corners_3d(gt_flip)
    dist = jnp.minimum(
        jnp.linalg.norm(pred_corners - gt_corners, axis=2),
        jnp.linalg.norm(pred_corners - gt_corners_flip, axis=2),
    )
    return jnp.mean(smooth_l1(dist, beta=1.0), axis=1)


def focal_loss_centernet(pred, gt):
    """CornerNet-style modified focal loss over dense heatmaps
    (``neg_loss_cornernet``, loss_utils.py:395-430).  ``pred`` must already
    be sigmoided and clamped; any layout (the reduction is global).

    The num_pos == 0 branch (only the negative term, unnormalized) is
    reproduced with a jnp.where instead of python control flow.
    """
    pos_inds = (gt == 1.0).astype(jnp.float32)
    neg_inds = (gt < 1.0).astype(jnp.float32)
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.square(1.0 - pred) * pos_inds
    neg_loss = jnp.log(1.0 - pred) * jnp.square(pred) * neg_weights * neg_inds
    num_pos = jnp.sum(pos_inds)
    pos_sum = jnp.sum(pos_loss)
    neg_sum = jnp.sum(neg_loss)
    return jnp.where(
        num_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0)
    )


def reg_loss_centernet(pred, mask, target):
    """Per-dim L1 over gathered object slots (``_reg_loss``,
    loss_utils.py:445-474): sum |pred - gt| over (batch, objects) per dim,
    normalized by the total positive count.

    Args:
        pred / target: (B, M, D); mask: (B, M).
    Returns:
        (D,) per-dim loss (the caller applies code_weights and sums).
    """
    num = jnp.sum(mask.astype(jnp.float32))
    m = mask.astype(jnp.float32)[..., None] * jnp.isfinite(target).astype(
        jnp.float32
    )
    diff = jnp.abs(pred * m - jnp.where(m > 0, target, 0.0) * m)
    return jnp.sum(diff, axis=(0, 1)) / jnp.maximum(num, 1.0)
