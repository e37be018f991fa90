"""Rotated BEV overlap / IoU as a branch-free vectorized XLA kernel.

Replaces the CUDA polygon-clip kernels
(``pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:15-265``).  The reference
enumerates up to 16 edge-pair intersections + 8 contained corners per box
pair, sorts them around the polygon centroid, and sums a triangle fan.
Here the same 24-candidate enumeration is carried out for all (N, M) pairs
at once with masks instead of branches — the TPU-native formulation — and
the angular sort becomes a masked stable argsort.

Numerics match the CUDA code (float32, EPS = 1e-8, corner-containment
margin 1e-2, strict/inclusive comparisons preserved), so per-pair results
agree with the reference to float rounding.
"""

from functools import partial

import jax
import jax.numpy as jnp

EPS = 1e-8


def box_corners_bev(boxes):
    """(K, 7) -> (K, 4, 2) BEV corners, reference ordering.

    Corner order before rotation: (x1,y1), (x2,y1), (x2,y2), (x1,y2)
    (iou3d_nms_kernel.cu:124-134), then rotated around the box center by
    the heading angle (rotate_around_center, :94-98).
    """
    cx = boxes[..., 0]
    cy = boxes[..., 1]
    hx = boxes[..., 3] / 2.0
    hy = boxes[..., 4] / 2.0
    sx = jnp.stack([-hx, hx, hx, -hx], axis=-1)
    sy = jnp.stack([-hy, -hy, hy, hy], axis=-1)
    c = jnp.cos(boxes[..., 6])[..., None]
    s = jnp.sin(boxes[..., 6])[..., None]
    px = sx * c - sy * s + cx[..., None]
    py = sx * s + sy * c + cy[..., None]
    return jnp.stack([px, py], axis=-1)


def _cross3(p1, p2, p0):
    """cross(p1, p2, p0) = (p1-p0) x (p2-p0), reference sign convention."""
    return (p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1]) - (
        p2[..., 0] - p0[..., 0]
    ) * (p1[..., 1] - p0[..., 1])


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _segment_intersections(ca, cb):
    """All 16 edge-pair intersections between two quads.

    Args:
        ca: (..., 4, 2) corners of box a; cb: (..., 4, 2) corners of box b.
    Returns:
        pts (..., 16, 2), valid (..., 16) — flattened in the reference's
        (i-major, j-minor) loop order (iou3d_nms_kernel.cu:160-174).
    """
    # Edge i of a: p0 = ca[i], p1 = ca[i+1 mod 4]; same for b.
    a0 = ca  # (..., 4, 2)
    a1 = jnp.roll(ca, shift=-1, axis=-2)
    b0 = cb
    b1 = jnp.roll(cb, shift=-1, axis=-2)

    # Broadcast to (..., 4a, 4b, 2)
    p0 = a0[..., :, None, :]
    p1 = a1[..., :, None, :]
    q0 = b0[..., None, :, :]
    q1 = b1[..., None, :, :]

    # Fast bounding-rect exclusion (check_rect_cross, :43-49).
    rect = (
        (jnp.minimum(p0[..., 0], p1[..., 0]) <= jnp.maximum(q0[..., 0], q1[..., 0]))
        & (jnp.minimum(q0[..., 0], q1[..., 0]) <= jnp.maximum(p0[..., 0], p1[..., 0]))
        & (jnp.minimum(p0[..., 1], p1[..., 1]) <= jnp.maximum(q0[..., 1], q1[..., 1]))
        & (jnp.minimum(q0[..., 1], q1[..., 1]) <= jnp.maximum(p0[..., 1], p1[..., 1]))
    )

    s1 = _cross3(q0, p1, p0)
    s2 = _cross3(p1, q1, p0)
    s3 = _cross3(p0, q1, q0)
    s4 = _cross3(q1, p1, q0)
    valid = rect & (s1 * s2 > 0) & (s3 * s4 > 0)

    s5 = _cross3(q1, p1, p0)
    use_fast = jnp.abs(s5 - s1) > EPS
    denom_fast = jnp.where(use_fast, s5 - s1, 1.0)
    fast = (s5[..., None] * q0 - s1[..., None] * q1) / denom_fast[..., None]

    # Degenerate branch: solve the two line equations directly (:83-88).
    a0c = p0[..., 1] - p1[..., 1]
    b0c = p1[..., 0] - p0[..., 0]
    c0c = p0[..., 0] * p1[..., 1] - p1[..., 0] * p0[..., 1]
    a1c = q0[..., 1] - q1[..., 1]
    b1c = q1[..., 0] - q0[..., 0]
    c1c = q0[..., 0] * q1[..., 1] - q1[..., 0] * q0[..., 1]
    D = a0c * b1c - a1c * b0c
    D_safe = jnp.where(jnp.abs(D) > 0, D, 1.0)
    slow_x = (b0c * c1c - b1c * c0c) / D_safe
    slow_y = (a1c * c0c - a0c * c1c) / D_safe
    slow = jnp.stack([slow_x, slow_y], axis=-1)

    pts = jnp.where(use_fast[..., None], fast, slow)
    pts = jnp.where(valid[..., None], pts, 0.0)

    shp = pts.shape[:-3]
    return pts.reshape(shp + (16, 2)), valid.reshape(shp + (16,))


def _corners_in_box(boxes, corners):
    """check_in_box2d (:51-61) for each of 4 corners, margin 1e-2."""
    MARGIN = 1e-2
    cx = boxes[..., None, 0]
    cy = boxes[..., None, 1]
    cosr = jnp.cos(-boxes[..., None, 6])
    sinr = jnp.sin(-boxes[..., None, 6])
    dx = corners[..., 0] - cx
    dy = corners[..., 1] - cy
    rot_x = dx * cosr - dy * sinr
    rot_y = dx * sinr + dy * cosr
    return (jnp.abs(rot_x) < boxes[..., None, 3] / 2.0 + MARGIN) & (
        jnp.abs(rot_y) < boxes[..., None, 4] / 2.0 + MARGIN
    )


def _pair_overlap(box_a, box_b, ca, cb):
    """BEV overlap area for broadcast pairs.

    Args:
        box_a, box_b: (..., 7); ca, cb: (..., 4, 2) their corners.
    Returns:
        (...,) float32 overlap area.
    """
    inter_pts, inter_valid = _segment_intersections(ca, cb)

    b_in_a = _corners_in_box(box_a, cb)  # (..., 4)
    a_in_b = _corners_in_box(box_b, ca)

    # Candidate order parity with the reference: 16 intersections, then per
    # corner k: b_k (if inside a) then a_k (if inside b)
    # (iou3d_nms_kernel.cu:176-194).
    shape = jnp.broadcast_shapes(ca.shape, cb.shape)
    ca = jnp.broadcast_to(ca, shape)
    cb = jnp.broadcast_to(cb, shape)
    corner_pts = jnp.stack([cb, ca], axis=-3)  # (..., 2, 4, 2)
    corner_pts = jnp.swapaxes(corner_pts, -3, -2)  # (..., 4, 2, 2) k-major
    corner_valid = jnp.stack([b_in_a, a_in_b], axis=-1)  # (..., 4, 2) k-major
    shp = inter_pts.shape[:-2]
    corner_pts = corner_pts.reshape(shp + (8, 2))
    corner_valid = corner_valid.reshape(shp + (8,))

    pts = jnp.concatenate([inter_pts, corner_pts], axis=-2)  # (..., 24, 2)
    valid = jnp.concatenate([inter_valid, corner_valid], axis=-1)

    cnt = jnp.sum(valid, axis=-1)
    cnt_safe = jnp.maximum(cnt, 1).astype(pts.dtype)
    center = jnp.sum(jnp.where(valid[..., None], pts, 0.0), axis=-2) / cnt_safe[..., None]

    ang = jnp.arctan2(pts[..., 1] - center[..., None, 1], pts[..., 0] - center[..., None, 0])
    ang = jnp.where(valid, ang, jnp.inf)
    order = jnp.argsort(ang, axis=-1, stable=True)
    pts_sorted = jnp.take_along_axis(pts, order[..., None], axis=-2)
    valid_sorted = jnp.take_along_axis(valid, order, axis=-1)

    p0 = pts_sorted[..., 0:1, :]
    pts_final = jnp.where(valid_sorted[..., None], pts_sorted, p0)

    v = pts_final - p0  # (..., 24, 2)
    tri = _cross2(v[..., :-1, :], v[..., 1:, :])  # (..., 23)
    area = jnp.abs(jnp.sum(tri, axis=-1)) / 2.0
    return jnp.where(cnt > 0, area, 0.0)


@partial(jax.jit, static_argnames=())
def boxes_overlap_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV overlap area.

    Args:
        boxes_a: (N, 7), boxes_b: (M, 7)
    Returns:
        (N, M) float32 overlap areas.
    """
    boxes_a = boxes_a.astype(jnp.float32)
    boxes_b = boxes_b.astype(jnp.float32)
    ca = box_corners_bev(boxes_a)  # (N, 4, 2)
    cb = box_corners_bev(boxes_b)  # (M, 4, 2)
    return _pair_overlap(
        boxes_a[:, None, :],
        boxes_b[None, :, :],
        ca[:, None, :, :],
        cb[None, :, :, :],
    )


def boxes_iou_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV IoU (iou_bev, iou3d_nms_kernel.cu:227-234)."""
    sa = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    sb = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    return overlap / jnp.maximum(sa + sb - overlap, EPS)


def boxes_iou3d(boxes_a, boxes_b):
    """Pairwise 3-D IoU = BEV overlap x height overlap
    (``iou3d_nms_utils.boxes_iou3d_gpu``, iou3d_nms_utils.py:48-81)."""
    a_hmax = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_hmin = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_hmax = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_hmin = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]

    overlaps_bev = boxes_overlap_bev(boxes_a, boxes_b)
    overlaps_h = jnp.clip(
        jnp.minimum(a_hmax, b_hmax) - jnp.maximum(a_hmin, b_hmin), min=0
    )
    overlaps_3d = overlaps_bev * overlaps_h

    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlaps_3d / jnp.clip(vol_a + vol_b - overlaps_3d, min=1e-6)
