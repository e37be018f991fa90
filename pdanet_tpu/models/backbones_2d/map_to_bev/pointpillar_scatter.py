"""Pillar scatter — counterpart of
``pcdet/models/backbones_2d/map_to_bev/pointpillar_scatter.py``: place each
pillar's feature vector at its (y, x) BEV cell.

Dense formulation: one scatter per batch via ``.at[].set`` with -1-padded
coords dropped (XLA scatter with mode=drop), producing
(B, ny, nx, C) channels-last BEV maps."""

from typing import Any

import jax.numpy as jnp


def pointpillar_scatter(pillar_features, voxel_coords, grid_size,
                        num_bev_features):
    """pillar_features (B, V, C); voxel_coords (B, V, 3) zyx (-1 pads).

    Returns spatial features (B, ny, nx, C).
    """
    B, V, C = pillar_features.shape
    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    assert nz == 1
    valid = voxel_coords[..., 0] >= 0  # (B, V)
    ys = jnp.where(valid, voxel_coords[..., 1], ny)  # oob -> dropped
    xs = jnp.where(valid, voxel_coords[..., 2], nx)
    feats = jnp.where(valid[..., None], pillar_features, 0.0)

    canvas = jnp.zeros((B, ny, nx, C), dtype=pillar_features.dtype)
    batch_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))
    return canvas.at[batch_idx, ys, xs].set(feats, mode="drop")
