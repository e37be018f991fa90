"""Rotated-box geometry ops as vectorized XLA.

Replaces the reference CUDA kernels with fused, static-shape XLA
formulations (the TPU-native idiom for gather/compare-heavy ops):

* ``rotate_points_along_z``   — ``pcdet/utils/common_utils.py:35-57``
* ``boxes_to_corners_3d``     — ``pcdet/utils/box_utils.py:28-53``
* ``enlarge_box3d``           — ``pcdet/utils/box_utils.py:145-158``
* ``points_in_boxes``         — ``pcdet/ops/roiaware_pool3d/src/
                                 roiaware_pool3d_kernel.cu:313-336`` (GPU
                                 first-hit semantics, -1 for background)

All functions are jittable, differentiable where meaningful, and operate on
batched dense tensors.
"""

import jax.numpy as jnp
import numpy as np

# Corner template, identical ordering to the reference
# (pcdet/utils/box_utils.py:44-47).  numpy so importing the package
# never initializes the JAX backend (jax.distributed.initialize must
# run before backend creation in the multi-process CLIs).
_CORNER_TEMPLATE = np.array(
    [
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ],
    dtype=np.float32,
) / 2.0


def rotate_points_along_z(points, angle):
    """Rotate points around the z axis (angle increases x -> y).

    Args:
        points: (..., N, 3 + C)
        angle: (...,) radians
    Returns:
        (..., N, 3 + C) rotated points.
    """
    cosa = jnp.cos(angle)
    sina = jnp.sin(angle)
    zeros = jnp.zeros_like(cosa)
    ones = jnp.ones_like(cosa)
    # Row-major [[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]]; points @ R,
    # matching the reference's right-multiplication convention.
    rot = jnp.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=-1
    ).reshape(angle.shape + (3, 3))
    xyz = jnp.matmul(points[..., 0:3], rot)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def boxes_to_corners_3d(boxes3d):
    """(N, 7) [x, y, z, dx, dy, dz, heading] -> (N, 8, 3) corners."""
    corners = boxes3d[:, None, 3:6] * _CORNER_TEMPLATE[None, :, :]
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def enlarge_box3d(boxes3d, extra_width=(0, 0, 0)):
    """Grow box extents by ``extra_width`` (x/y/z), keeping centers fixed."""
    extra = jnp.zeros((boxes3d.shape[-1],), dtype=boxes3d.dtype)
    extra = extra.at[3:6].set(jnp.asarray(extra_width, dtype=boxes3d.dtype))
    return boxes3d + extra


def enlarge_box3d_np(boxes3d, extra_width=(0, 0, 0)):
    import numpy as np

    out = np.array(boxes3d, copy=True)
    out[..., 3:6] += np.asarray(extra_width, dtype=out.dtype)
    return out


def in_box_mask(points, boxes, z_margin=0.0, xy_margin=1e-5):
    """Point-in-rotated-box test matrix.

    Args:
        points: (..., N, 3)
        boxes: (..., M, 7)
    Returns:
        (..., N, M) bool — point n inside box m.

    Semantics match ``check_pt_in_box3d``
    (roiaware_pool3d_kernel.cu:23-36): z test is |z - cz| <= dz/2 (no
    margin), the in-plane test uses a 1e-5 margin with strict ``<``.
    """
    d = points[..., :, None, :] - boxes[..., None, :, 0:3]  # (..., N, M, 3)
    rz = boxes[..., None, :, 6]
    cosa = jnp.cos(rz)
    sina = jnp.sin(rz)
    # lidar_to_local_coords with rot_angle = rz (kernel rotates by -rz).
    local_x = d[..., 0] * cosa + d[..., 1] * sina
    local_y = -d[..., 0] * sina + d[..., 1] * cosa
    in_z = jnp.abs(d[..., 2]) <= boxes[..., None, :, 5] / 2.0 + z_margin
    in_xy = (jnp.abs(local_x) < boxes[..., None, :, 3] / 2.0 + xy_margin) & (
        jnp.abs(local_y) < boxes[..., None, :, 4] / 2.0 + xy_margin
    )
    return in_z & in_xy


def points_in_boxes(points, boxes):
    """First-hit box index per point, -1 for background.

    Args:
        points: (..., N, 3)
        boxes: (..., M, 7) — may contain zero-padded rows; identical
            semantics to the reference, which also scans padded gt rows.
    Returns:
        (..., N) int32 box index (first box in scan order that contains the
        point), or -1.
    """
    inside = in_box_mask(points, boxes)
    any_in = jnp.any(inside, axis=-1)
    first = jnp.argmax(inside, axis=-1).astype(jnp.int32)
    return jnp.where(any_in, first, jnp.int32(-1))


def mask_points_by_range(points, limit_range):
    """(N, 3+) points inside [x0, y0, z0, x1, y1, z1] (x/y only, like
    ``common_utils.mask_points_by_range``)."""
    return (
        (points[:, 0] >= limit_range[0])
        & (points[:, 0] <= limit_range[3])
        & (points[:, 1] >= limit_range[1])
        & (points[:, 1] <= limit_range[4])
    )
