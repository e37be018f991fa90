"""PointNet++ MSG backbone with FP decoder — counterpart of
``pcdet/models/backbones_3d/pointnet2_backbone.py`` (PointNet2MSG, the
PointRCNN / PointNet2 zoo backbone) built from
``PointnetSAModuleMSG`` (pointnet2_modules.py vanilla SA) +
``PointnetFPModule`` (:1776-1824, three_nn + inverse-distance feature
interpolation)."""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from ...ops.maxpool import max_first

from ...ops.ball_query import ball_query_multi
from ...ops.grouping import gather_points, group_points
from ...ops.interpolate import three_interpolate, three_nn
from ...ops.sampling import farthest_point_sample
from ..blocks import MLPStack


class PointnetSAModuleMSG(nn.Module):
    """Vanilla multi-scale-grouping SA layer (D-FPS + MSG ball query +
    per-scale MLP + maxpool)."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # each [c_in + 3, ...]

    @nn.compact
    def __call__(self, xyz, features, train=False):
        idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, idx)
        idx_list = ball_query_multi(
            tuple(self.radii), tuple(self.nsamples), xyz, new_xyz
        )
        outs = []
        for i in range(len(self.radii)):
            grouped_xyz = group_points(xyz, idx_list[i]) - new_xyz[:, :, None, :]
            grouped = (
                jnp.concatenate(
                    [grouped_xyz, group_points(features, idx_list[i])], axis=-1
                )
                if features is not None
                else grouped_xyz
            )
            h = MLPStack(tuple(self.mlps[i][1:]), name=f"mlps_{i}")(grouped, train)
            outs.append(max_first(h, 2))  # torch max_pool tie grads
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetFPModule(nn.Module):
    """Feature propagation (pointnet2_modules.py:1776-1824): 3-NN inverse-
    distance interpolation of coarse features onto fine points, concat with
    skip features, shared MLP."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, train=False):
        dist2, idx = three_nn(unknown, known)
        # inverse-distance weights (pointnet2_modules.py:1800-1804; the
        # torch wrapper returns sqrt'd distances, pointnet2_utils.py:104-181)
        dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
        dist_recip = 1.0 / (dist + 1e-8)
        weight = dist_recip / jnp.sum(dist_recip, axis=2, keepdims=True)
        interpolated = three_interpolate(known_feats, idx, weight)
        if unknown_feats is not None:
            h = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            h = interpolated
        return MLPStack(tuple(self.mlp), name="mlp")(h, train)


class PointNet2MSG(nn.Module):
    """model_cfg keys: SA_CONFIG.{NPOINTS, RADIUS, NSAMPLE, MLPS}, FP_MLPS."""

    model_cfg: Any
    input_channels: int

    @nn.compact
    def __call__(self, points, train=False):
        """points (B, N, 3 + C) -> dict(point_features (B, N, C_out),
        point_coords (B, N, 3))."""
        from ...utils.easydict import EasyDict

        cfg = EasyDict(self.model_cfg)
        xyz = points[..., 0:3]
        features = points[..., 3:] if points.shape[-1] > 3 else None

        channel_in = self.input_channels - 3
        skip_channels = [channel_in]
        l_xyz, l_features = [xyz], [features]
        sa_cfg = cfg.SA_CONFIG
        for k in range(len(sa_cfg.NPOINTS)):
            mlps = [[channel_in] + list(m) for m in sa_cfg.MLPS[k]]
            channel_out = sum(m[-1] for m in mlps)
            mlps_eff = [[m[0] + 3] + m[1:] for m in mlps]  # use_xyz
            new_xyz, new_feats = PointnetSAModuleMSG(
                npoint=int(sa_cfg.NPOINTS[k]),
                radii=tuple(sa_cfg.RADIUS[k]),
                nsamples=tuple(sa_cfg.NSAMPLE[k]),
                mlps=tuple(tuple(m) for m in mlps_eff),
                name=f"SA_modules_{k}",
            )(l_xyz[-1], l_features[-1], train=train)
            l_xyz.append(new_xyz)
            l_features.append(new_feats)
            skip_channels.append(channel_out)
            channel_in = channel_out

        fp_mlps = [list(m) for m in cfg.FP_MLPS]
        for i in range(len(fp_mlps) - 1, -1, -1):
            l_features[i] = PointnetFPModule(
                mlp=tuple(fp_mlps[i]), name=f"FP_modules_{i}"
            )(
                l_xyz[i], l_xyz[i + 1], l_features[i], l_features[i + 1],
                train=train,
            )

        return {
            "point_features": l_features[0],  # (B, N, FP_MLPS[0][-1])
            "point_coords": xyz,
        }
