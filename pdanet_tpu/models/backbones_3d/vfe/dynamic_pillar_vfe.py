"""DynamicPillarVFE — counterpart of
``pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py`` (:1-140):
pillar features over ALL points (no per-pillar cap), PFNLayerV2 stacks
with scatter-max pillar pooling.

TPU re-design: per-point work stays dense (B, N, ...); pillar
aggregations are scatter-add/max into the (ny * nx) BEV canvas with
gathered read-back — torch_scatter's unique-group machinery is exactly a
dense-canvas scatter when the canvas itself is the product.
"""

from typing import Any, Sequence

import flax.linen as nn
from ...norm import BatchNorm
import jax
import jax.numpy as jnp


class DynamicPillarVFE(nn.Module):
    model_cfg: Any
    num_point_features: int
    grid_size: Any  # (nx, ny, nz)
    voxel_size: Any
    point_cloud_range: Any

    @nn.compact
    def __call__(self, points, train=False):
        """points: (B, N, 3 + C) -> BEV canvas (B, ny, nx, C_out)."""
        from ....utils.easydict import EasyDict

        cfg = EasyDict(self.model_cfg)
        use_abs_xyz = bool(cfg.get("USE_ABSLOTE_XYZ", True))
        with_dist = bool(cfg.get("WITH_DISTANCE", False))
        num_filters = [int(f) for f in cfg.NUM_FILTERS]

        B, N, _ = points.shape
        nx, ny, _ = (int(g) for g in self.grid_size)
        vs = jnp.asarray(self.voxel_size[:2], jnp.float32)
        origin = jnp.asarray(self.point_cloud_range[:2], jnp.float32)
        xyz = points[..., 0:3]

        coords = jnp.floor((xyz[..., 0:2] - origin) / vs).astype(jnp.int32)
        inside = jnp.all(
            (coords >= 0) & (coords < jnp.asarray([nx, ny], jnp.int32)),
            axis=-1,
        )
        n_cells = ny * nx
        flat = jnp.where(
            inside, coords[..., 1] * nx + coords[..., 0], n_cells
        )  # (B, N)

        def scatter_mean_xyz(xyz_f, idx):
            acc = jnp.zeros((n_cells + 1, 3), xyz_f.dtype)
            acc = acc.at[idx].add(xyz_f, mode="drop")
            cnt = jnp.zeros((n_cells + 1, 1), xyz_f.dtype)
            cnt = cnt.at[idx].add(
                jnp.ones((xyz_f.shape[0], 1), xyz_f.dtype), mode="drop"
            )
            return acc / jnp.maximum(cnt, 1.0)

        pillar_mean = jax.vmap(scatter_mean_xyz)(xyz, flat)  # (B, cells+1, 3)
        f_cluster = xyz - jnp.take_along_axis(
            pillar_mean, jnp.minimum(flat, n_cells - 1)[..., None], axis=1
        )
        centers = (coords.astype(jnp.float32) + 0.5) * vs + origin
        z_offset = (
            self.voxel_size[2] / 2.0 + self.point_cloud_range[2]
        )
        f_center = jnp.concatenate(
            [xyz[..., 0:2] - centers, xyz[..., 2:3] - z_offset], axis=-1
        )

        feats = [points if use_abs_xyz else points[..., 3:], f_cluster,
                 f_center]
        if with_dist:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        h = jnp.concatenate(feats, axis=-1)

        def scatter_max(h_f, idx):
            acc = jnp.full((n_cells + 1, h_f.shape[-1]), -jnp.inf, h_f.dtype)
            acc = acc.at[idx].max(h_f, mode="drop")
            return jnp.where(jnp.isfinite(acc), acc, 0.0)

        for i, width in enumerate(num_filters):
            last = i == len(num_filters) - 1
            h = nn.Dense(width, use_bias=False, name=f"pfn{i}_linear")(h)
            h = BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                name=f"pfn{i}_bn",
            )(h)
            h = nn.relu(h)
            # padding / out-of-range points never win the max
            h_masked = jnp.where(inside[..., None], h, -jnp.inf)
            pooled = jax.vmap(scatter_max)(h_masked, flat)  # (B, cells+1, W)
            if last:
                return pooled[:, :n_cells].reshape(B, ny, nx, width)
            back = jnp.take_along_axis(
                pooled, jnp.minimum(flat, n_cells - 1)[..., None], axis=1
            )
            h = jnp.concatenate([h, back], axis=-1)
