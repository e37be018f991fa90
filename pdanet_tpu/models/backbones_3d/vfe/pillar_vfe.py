"""Pillar VFE — counterpart of
``pcdet/models/backbones_3d/vfe/pillar_vfe.py`` (PFNLayer stack: Linear ->
BN -> ReLU -> maxpool over the points of each pillar; per-point features
are [xyz, intensity, cluster offsets, center offsets]).

Dense layout: voxels are (B, V, P, C) with a validity count per pillar —
padded pillars/points are masked to zero exactly like the reference's
paddings indicator."""

from typing import Any, Sequence

import flax.linen as nn
from ...norm import BatchNorm
import jax.numpy as jnp
from ....ops.maxpool import max_first_keepdims


class PFNLayer(nn.Module):
    """Reference quirk preserved (pillar_vfe.py:29-49): padded point rows
    are zeroed ONCE before the PFN stack, so after Linear+BN+ReLU they
    carry the constant ``relu(bn(linear(0)))`` "phantom" vector which
    PARTICIPATES in the per-pillar max — non-full pillars see it, full
    pillars don't.  A converted reference checkpoint was trained with
    that max, so no re-masking happens here (padded pillar SLOTS are
    dropped later by coords in pointpillar_scatter)."""

    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, V, P, C)
        out = self.out_channels if self.last_layer else self.out_channels // 2
        if self.use_norm:
            h = nn.Dense(out, use_bias=False, name="linear")(x)
            h = BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                name="norm",
            )(h)
        else:
            h = nn.Dense(out, use_bias=True, name="linear")(x)
        h = nn.relu(h)
        h_max = max_first_keepdims(h, 2)  # (B, V, 1, C'); torch tie grads
        if self.last_layer:
            return h_max
        return jnp.concatenate(
            [h, jnp.broadcast_to(h_max, h.shape)], axis=-1
        )


class PillarVFE(nn.Module):
    """model_cfg keys: USE_NORM, WITH_DISTANCE, USE_ABSLOTE_XYZ, NUM_FILTERS."""

    model_cfg: Any
    num_point_features: int
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]

    @nn.compact
    def __call__(self, voxels, voxel_coords, voxel_num_points, train=False):
        """voxels (B, V, P, C_in); voxel_coords (B, V, 3) zyx (-1 pads);
        voxel_num_points (B, V). Returns pillar features (B, V, C_out)."""
        from ....utils.easydict import EasyDict

        cfg = EasyDict(self.model_cfg)  # linen freezes dict attrs
        vx, vy, vz = self.voxel_size
        x_off = vx / 2 + self.point_cloud_range[0]
        y_off = vy / 2 + self.point_cloud_range[1]
        z_off = vz / 2 + self.point_cloud_range[2]

        counts = jnp.maximum(voxel_num_points, 1).astype(voxels.dtype)
        points_mean = (
            jnp.sum(voxels[..., :3], axis=2, keepdims=True)
            / counts[..., None, None]
        )
        f_cluster = voxels[..., :3] - points_mean

        cz = voxel_coords[..., 0:1].astype(voxels.dtype)
        cy = voxel_coords[..., 1:2].astype(voxels.dtype)
        cx = voxel_coords[..., 2:3].astype(voxels.dtype)
        f_center = jnp.stack(
            [
                voxels[..., 0] - (cx[..., None, 0] * vx + x_off),
                voxels[..., 1] - (cy[..., None, 0] * vy + y_off),
                voxels[..., 2] - (cz[..., None, 0] * vz + z_off),
            ],
            axis=-1,
        )

        if cfg.get("USE_ABSLOTE_XYZ", True):
            feats = [voxels, f_cluster, f_center]
        else:
            feats = [voxels[..., 3:], f_cluster, f_center]
        if cfg.get("WITH_DISTANCE", False):
            feats.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True)
            )
        features = jnp.concatenate(feats, axis=-1)

        P = voxels.shape[2]
        mask = (
            jnp.arange(P)[None, None, :] < voxel_num_points[..., None]
        )[..., None].astype(features.dtype)
        features = features * mask

        num_filters = list(cfg.NUM_FILTERS)
        for i, nf in enumerate(num_filters):
            features = PFNLayer(
                out_channels=nf,
                use_norm=cfg.get("USE_NORM", True),
                last_layer=(i >= len(num_filters) - 1),
                name=f"pfn_layers_{i}",
            )(features, train)
        return features[:, :, 0, :]  # (B, V, C_out)
