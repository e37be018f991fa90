"""Camera/depth transform helpers — counterpart of
``pcdet/utils/transform_utils.py`` (:1-95) (CaDDN support)."""

import math

import jax.numpy as jnp
import numpy as np


def project_to_image(project, points):
    """Project 3D points through a (..., 3, 4) camera matrix.

    Args:
        project: (..., 3, 4); points: (..., N, 3).
    Returns:
        points_img (..., N, 2) pixel coords, points_depth (..., N).
    """
    ones = jnp.ones_like(points[..., :1])
    homo = jnp.concatenate([points, ones], axis=-1)  # (..., N, 4)
    pt = jnp.einsum("...ij,...nj->...ni", project, homo)  # (..., N, 3)
    points_img = pt[..., :2] / jnp.where(
        jnp.abs(pt[..., 2:3]) > 1e-8, pt[..., 2:3], 1e-8
    )
    points_depth = pt[..., 2] - project[..., 2:3, 3]
    return points_img, points_depth


def normalize_coords(coords, shape):
    """[0, shape-1] grid coords -> [-1, 1] (align_corners=True style,
    reference :38-53; the downstream sampler then applies the torch
    grid_sample align_corners=False convention — a reference quirk kept
    for parity).

    Args:
        coords: (..., 3) in (u, v, d) order; shape: (3,) as (d, h, w).
    """
    rev = jnp.asarray(shape, jnp.float32)[::-1]  # (w, h, d)
    return coords / (rev - 1.0) * 2.0 - 1.0


def bin_depths(depth_map, mode, depth_min, depth_max, num_bins,
               target=False):
    """Depth -> bin index (reference :56-95): UD / LID / SID modes."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * jnp.sqrt(
            jnp.maximum(1 + 8 * (depth_map - depth_min) / bin_size, 0.0)
        )
    elif mode == "SID":
        indices = (
            num_bins
            * (jnp.log(1 + depth_map) - math.log(1 + depth_min))
            / (math.log(1 + depth_max) - math.log(1 + depth_min))
        )
    else:
        raise NotImplementedError(mode)
    if target:
        bad = (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices)
        indices = jnp.where(bad, num_bins, indices).astype(jnp.int32)
    return indices


def compute_fg_mask(gt_boxes2d, shape, downsample_factor=1):
    """Foreground pixel mask from 2D boxes (loss_utils.compute_fg_mask,
    reference loss_utils.py:366-390), fixed-shape over padded boxes.

    Args:
        gt_boxes2d: (B, M, 4) [u1 v1 u2 v2] zero-padded; shape: (B, H, W).
    Returns:
        (B, H, W) bool.
    """
    B, H, W = shape
    boxes = gt_boxes2d / float(downsample_factor)
    valid = jnp.any(gt_boxes2d != 0, axis=-1)  # (B, M)
    u1 = jnp.floor(boxes[..., 0])
    v1 = jnp.floor(boxes[..., 1])
    u2 = jnp.ceil(boxes[..., 2])
    v2 = jnp.ceil(boxes[..., 3])
    us = jnp.arange(W, dtype=jnp.float32)
    vs = jnp.arange(H, dtype=jnp.float32)
    in_u = (us[None, None, :] >= u1[..., None]) & (
        us[None, None, :] < u2[..., None]
    )  # (B, M, W)
    in_v = (vs[None, None, :] >= v1[..., None]) & (
        vs[None, None, :] < v2[..., None]
    )  # (B, M, H)
    per_box = in_v[:, :, :, None] & in_u[:, :, None, :]  # (B, M, H, W)
    return jnp.any(per_box & valid[:, :, None, None], axis=1)
