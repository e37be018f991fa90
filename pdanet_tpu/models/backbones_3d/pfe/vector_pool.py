"""VectorPool aggregation (PV-RCNN++) — counterpart of
``pcdet/ops/pointnet2/pointnet2_stack/src/vector_pool*`` (485 CU + 203
C++) and ``pointnet2_stack/pointnet2_modules.py``
(VectorPoolLocalInterpolateModule :160-247, VectorPoolAggregationModule
:247-424, VectorPoolAggregationModuleMSG :427-470).

TPU re-design (local_interpolation mode, the one PV-RCNN++ ships):

* Each keypoint owns a static ``num_local_voxel`` grid of sub-voxel
  centers inside its neighbor radius.  Their features come from
  inverse-distance interpolation over the 3 nearest in-range support
  points — a plain batched ``three_nn`` + masked renormalisation (the
  unconstrained 3-NN always contains the in-range 3-NN, so zeroing
  out-of-range taps reproduces the two-step CUDA kernel exactly).
* ``separate_local_aggregation_layer`` (grouped 1x1 conv = one Dense per
  sub-voxel cell) becomes a single einsum with a (V, C_in, C_out)
  kernel — an MXU-friendly batched contraction.
"""

from typing import Any

import flax.linen as nn
from ...norm import BatchNorm
import jax
import jax.numpy as jnp
import numpy as np

from ....ops.interpolate import three_nn
from ....utils.easydict import EasyDict


def dense_grid_offsets(max_neighbour_distance, num_voxels):
    """Sub-voxel center offsets (get_dense_voxels_by_center, :340-362)."""
    R = float(max_neighbour_distance)
    grids = []
    for n in num_voxels:
        n = int(n)
        step = 2 * R / n
        grids.append(np.arange(-R + R / n, R - R / n + 1e-5, step))
    gx, gy, gz = np.meshgrid(*grids, indexing="ij")
    return np.stack(
        [gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=-1
    ).astype(np.float32)  # (V, 3)


def local_interpolate(support_xyz, support_features, grid_centers,
                      max_dist):
    """VectorPoolLocalInterpolateModule.forward (:200-246) on dense
    batches.

    Args:
        support_xyz: (B, N, 3); support_features: (B, N, C);
        grid_centers: (B, G, 3); max_dist: neighbor cut-off.
    Returns:
        (B, G, C + 9): interpolated features || rel-xyz to the 3 taps,
        zeroed where no support point is in range.
    """
    dist2, idx = three_nn(grid_centers, support_xyz)  # (B, G, 3)
    dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
    in_range = dist <= max_dist
    dist_recip = jnp.where(in_range, 1.0 / (dist + 1e-8), 0.0)
    norm = jnp.sum(dist_recip, axis=-1, keepdims=True)
    weight = dist_recip / jnp.maximum(norm, 1e-8)

    gathered = jax.vmap(lambda f, i: f[i])(support_features, idx)
    interp = jnp.sum(gathered * weight[..., None], axis=2)  # (B, G, C)

    near_xyz = jax.vmap(lambda x, i: x[i])(support_xyz, idx)  # (B, G, 3, 3)
    local = (grid_centers[:, :, None, :] - near_xyz).reshape(
        grid_centers.shape[:2] + (9,)
    )
    out = jnp.concatenate([interp, local], axis=-1)
    empty = ~in_range.any(axis=-1)
    return jnp.where(empty[..., None], 0.0, out)


class VectorPoolAggregationModule(nn.Module):
    """One radius group (:247-424), local_interpolation mode."""

    input_channels: int
    num_local_voxel: Any = (3, 3, 3)
    num_reduced_channels: int = 30
    num_channels_of_local_aggregation: int = 32
    post_mlps: Any = (128,)
    max_neighbor_distance: float = 1.0
    neighbor_distance_multiplier: float = 2.0

    @nn.compact
    def __call__(self, xyz, features, new_xyz, train=False):
        """xyz (B, N, 3), features (B, N, C), new_xyz (B, M, 3) ->
        (B, M, post_mlps[-1])."""
        B, M = new_xyz.shape[:2]
        V = int(np.prod([int(v) for v in self.num_local_voxel]))
        red = int(self.num_reduced_channels)
        C = features.shape[-1]
        assert C % red == 0, (C, red)
        # channel reduction by group-sum (:395-398)
        feats = features.reshape(B, -1, C // red, red).sum(axis=2)

        offsets = jnp.asarray(
            dense_grid_offsets(self.max_neighbor_distance,
                               self.num_local_voxel)
        )  # (V, 3)
        grid_centers = (
            new_xyz[:, :, None, :] + offsets[None, None]
        ).reshape(B, M * V, 3)
        vec = local_interpolate(
            xyz, feats, grid_centers,
            self.max_neighbor_distance * self.neighbor_distance_multiplier,
        ).reshape(B, M, V, red + 9)

        # separate per-cell aggregation (grouped conv, :278-283)
        c_agg = int(self.num_channels_of_local_aggregation)
        kernel = self.param(
            "separate_local_aggregation",
            nn.initializers.kaiming_normal(),
            (V, red + 9, c_agg),
        )
        h = jnp.einsum("bmvc,vcd->bmvd", vec, kernel).reshape(
            B, M, V * c_agg
        )
        h = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="sla_bn",
        )(h)
        h = nn.relu(h)

        for k, f in enumerate(self.post_mlps):
            h = nn.Dense(int(f), use_bias=False, name=f"post_{k}")(h)
            h = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"post_bn_{k}",
            )(h)
            h = nn.relu(h)
        return h


class VectorPoolAggregationModuleMSG(nn.Module):
    """Multi-group wrapper (:427-470): concat group outputs + center xyz,
    shared MSG post MLPs."""

    input_channels: int
    config: Any

    @nn.compact
    def __call__(self, xyz, features, new_xyz, train=False):
        cfg = EasyDict(self.config)
        outs = []
        for k in range(int(cfg.NUM_GROUPS)):
            g = EasyDict(cfg[f"GROUP_CFG_{k}"])
            outs.append(
                VectorPoolAggregationModule(
                    input_channels=self.input_channels,
                    num_local_voxel=tuple(g.NUM_LOCAL_VOXEL),
                    post_mlps=tuple(g.POST_MLPS),
                    max_neighbor_distance=float(g.MAX_NEIGHBOR_DISTANCE),
                    num_reduced_channels=int(
                        cfg.get("NUM_REDUCED_CHANNELS", self.input_channels)
                    ),
                    num_channels_of_local_aggregation=int(
                        cfg.NUM_CHANNELS_OF_LOCAL_AGGREGATION
                    ),
                    name=f"layer_{k}",
                )(xyz, features, new_xyz, train)
            )
        h = jnp.concatenate(outs + [new_xyz], axis=-1)
        for k, f in enumerate(cfg.MSG_POST_MLPS):
            h = nn.Dense(int(f), use_bias=False, name=f"msg_post_{k}")(h)
            h = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"msg_post_bn_{k}",
            )(h)
            h = nn.relu(h)
        return h
