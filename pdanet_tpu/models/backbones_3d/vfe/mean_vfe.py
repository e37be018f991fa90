"""Mean VFE — counterpart of
``pcdet/models/backbones_3d/vfe/mean_vfe.py`` (average of the valid points
in each voxel)."""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MeanVFE(nn.Module):
    model_cfg: Any
    num_point_features: int

    @nn.compact
    def __call__(self, voxels, voxel_num_points, train=False):
        """voxels (B, V, P, C); voxel_num_points (B, V) -> (B, V, C)."""
        counts = jnp.maximum(voxel_num_points, 1).astype(voxels.dtype)
        return jnp.sum(voxels, axis=2) / counts[..., None]
