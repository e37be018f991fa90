"""CenterNet/CenterPoint utilities — counterpart of
``pcdet/models/model_utils/centernet_utils.py`` (:1-216).

TPU-first divergences:
  * the reference draws per-box gaussian patches into the heatmap with
    python loops + dynamic slices (:47-70); here the full-grid gaussian of
    every (padded) gt box is evaluated at once and max-reduced — identical
    values, fixed shapes,
  * ``decode_bbox_from_heatmap`` (:156-216) returns ragged per-frame
    tensors; here the decode keeps the fixed top-K layout plus a validity
    mask (the NMS + compaction happens in the detector's batched
    post-processing).
"""

from functools import partial

import jax
import jax.numpy as jnp


def gaussian_radius(height, width, min_overlap=0.5):
    """CornerNet radius rule (centernet_utils.py:9-35); element-wise."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians_dense(centers_int, radii, valid, size_xy):
    """Vectorized ``draw_gaussian_to_heatmap`` (centernet_utils.py:47-70).

    The reference evaluates ``gaussian2D`` at integer offsets from the
    integer center with sigma = diameter / 6 and max-combines patches of
    half-width ``radius`` (grid-clipped).  The full-grid evaluation with an
    explicit |dx|,|dy| <= r mask reproduces that exactly.

    Args:
        centers_int: (..., M, 2) int32 [x, y]; radii: (..., M) int32;
        valid: (..., M) bool; size_xy: (W, H) static.
    Returns:
        (..., H, W) float32 heatmap (max over boxes).
    """
    W, H = int(size_xy[0]), int(size_xy[1])
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    dx = xs[None, :] - centers_int[..., 0:1].astype(jnp.float32)  # (...,M,W)
    dy = ys[None, :] - centers_int[..., 1:2].astype(jnp.float32)  # (...,M,H)
    r = radii[..., None].astype(jnp.float32)
    sigma = (2.0 * r + 1.0) / 6.0
    gx = jnp.exp(-(dx * dx) / (2.0 * sigma * sigma))  # separable gaussian
    gy = jnp.exp(-(dy * dy) / (2.0 * sigma * sigma))
    gx = jnp.where((jnp.abs(dx) <= r) & valid[..., None], gx, 0.0)
    gy = jnp.where(jnp.abs(dy) <= r, gy, 0.0)
    # (..., M, H, W) patch values; max over the box axis
    g = gy[..., :, :, None] * gx[..., :, None, :]
    return jnp.max(g, axis=-3)


def topk_heatmap(scores, K):
    """Two-stage top-K (centernet_utils.py:139-154): per-class top-K over
    the spatial plane, then top-K across (class, k) — kept two-stage so tie
    ordering matches the reference decode.

    Args:
        scores: (B, H, W, C) heatmap (already sigmoided).
    Returns:
        score (B, K), inds (B, K) flat spatial index, class_ids (B, K),
        ys (B, K), xs (B, K).
    """
    B, H, W, C = scores.shape
    flat = jnp.transpose(scores, (0, 3, 1, 2)).reshape(B, C, H * W)
    cls_scores, cls_inds = jax.lax.top_k(flat, K)  # (B, C, K)
    topk_score, topk_ind = jax.lax.top_k(cls_scores.reshape(B, C * K), K)
    class_ids = (topk_ind // K).astype(jnp.int32)
    inds = jnp.take_along_axis(cls_inds.reshape(B, C * K), topk_ind, axis=1)
    ys = (inds // W).astype(jnp.float32)
    xs = (inds % W).astype(jnp.float32)
    return topk_score, inds.astype(jnp.int32), class_ids, ys, xs


def gather_feat_2d(feat, inds):
    """(B, H, W, D) + (B, K) flat spatial index -> (B, K, D)
    (``_transpose_and_gather_feat``, centernet_utils.py:122-135; the
    channels-last layout makes the permute a no-op)."""
    B, H, W, D = feat.shape
    flat = feat.reshape(B, H * W, D)
    return jnp.take_along_axis(flat, inds[..., None], axis=1)


def decode_bbox_from_heatmap(
    heatmap, rot_cos, rot_sin, center, center_z, dim,
    point_cloud_range, voxel_size, feature_map_stride, vel=None, K=100,
    score_thresh=None, post_center_limit_range=None,
):
    """Fixed-shape decode (centernet_utils.py:156-216).

    Args (all channels-last): heatmap (B, H, W, C) sigmoided; rot_cos /
    rot_sin / center_z (B, H, W, 1); center (B, H, W, 2); dim (B, H, W, 3)
    already exp'd; vel (B, H, W, 2) or None.
    Returns:
        boxes (B, K, 7(+2)), scores (B, K), labels (B, K) 0-based,
        valid (B, K) — in decode (descending-score) order.
    """
    scores, inds, class_ids, ys, xs = topk_heatmap(heatmap, K)
    center = gather_feat_2d(center, inds)
    rot_sin = gather_feat_2d(rot_sin, inds)
    rot_cos = gather_feat_2d(rot_cos, inds)
    center_z = gather_feat_2d(center_z, inds)
    dim = gather_feat_2d(dim, inds)

    angle = jnp.arctan2(rot_sin, rot_cos)
    xs = xs[..., None] + center[..., 0:1]
    ys = ys[..., None] + center[..., 1:2]
    xs = xs * feature_map_stride * voxel_size[0] + point_cloud_range[0]
    ys = ys * feature_map_stride * voxel_size[1] + point_cloud_range[1]

    parts = [xs, ys, center_z, dim, angle]
    if vel is not None:
        parts.append(gather_feat_2d(vel, inds))
    boxes = jnp.concatenate(parts, axis=-1)

    valid = jnp.ones(scores.shape, bool)
    if post_center_limit_range is not None:
        lim = jnp.asarray(post_center_limit_range, jnp.float32)
        valid &= jnp.all(boxes[..., :3] >= lim[:3], axis=-1)
        valid &= jnp.all(boxes[..., :3] <= lim[3:], axis=-1)
    if score_thresh is not None:
        valid &= scores > score_thresh
    return boxes, scores, class_ids, valid
