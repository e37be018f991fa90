"""DynamicMeanVFE — counterpart of
``pcdet/models/backbones_3d/vfe/dynamic_mean_vfe.py`` (:1-70): voxel
mean features over ALL points (no per-voxel point cap, no voxel-count
cap — the torch version scatter-means over torch_scatter unique groups).

TPU re-design: the fixed-budget (B, N, C) cloud scatter-adds straight
into the dense (B, Z, Y, X, C) grid the 3D backbones consume, dividing
by per-cell counts — the host voxelizer (and its MAX_POINTS_PER_VOXEL /
MAX_NUMBER_OF_VOXELS truncation) disappears entirely.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class DynamicMeanVFE(nn.Module):
    model_cfg: Any
    num_point_features: int
    grid_size: Any  # (nx, ny, nz)
    voxel_size: Any
    point_cloud_range: Any

    @nn.compact
    def __call__(self, points, train=False):
        """points: (B, N, 3 + C) -> dense mean grid (B, Z, Y, X, 3 + C)."""
        B, N, C = points.shape
        nx, ny, nz = (int(g) for g in self.grid_size)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        origin = jnp.asarray(self.point_cloud_range[:3], jnp.float32)

        coords = jnp.floor((points[..., 0:3] - origin) / vs).astype(jnp.int32)
        inside = jnp.all(
            (coords >= 0)
            & (coords < jnp.asarray([nx, ny, nz], jnp.int32)), axis=-1
        )
        n_cells = nz * ny * nx
        flat = (
            coords[..., 2] * (ny * nx) + coords[..., 1] * nx + coords[..., 0]
        )
        flat = jnp.where(inside, flat, n_cells)  # dropped slot

        def per_frame(feat, idx):
            acc = jnp.zeros((n_cells + 1, C), points.dtype)
            acc = acc.at[idx].add(feat, mode="drop")
            cnt = jnp.zeros((n_cells + 1, 1), points.dtype)
            cnt = cnt.at[idx].add(jnp.ones((N, 1), points.dtype), mode="drop")
            mean = acc / jnp.maximum(cnt, 1.0)
            return mean[:n_cells].reshape(nz, ny, nx, C)

        return jax.vmap(per_frame)(points, flat)
