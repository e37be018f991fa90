"""PointRCNN RoI head — counterpart of
``pcdet/models/roi_heads/pointrcnn_head.py`` (:1-180): RoIPoint pooling
(512 in-box points, canonical transform, empty-roi zeroing), xyz-up /
merge-down fusion of [local_xyz | score | depth] with the point
features, a 3-stage single-scale SA encoder (last stage = GroupAll),
and cls/reg FCs.

Dense re-design: the (B, R) roi axis folds into the batch axis for the
SA stages — (B*R, 512, 3) clouds through the same batch FPS/ball-query
ops as every other pointnet path.  ``USE_BN: False`` (the shipped
config) maps to bias+ReLU MLPs.
"""

from typing import Any, Sequence

import flax.linen as nn
from ..norm import BatchNorm
import jax
import jax.numpy as jnp
from ...ops.maxpool import max_first

from ...ops.ball_query import ball_query
from ...ops.geometry import rotate_points_along_z
from ...ops.grouping import gather_points, group_points
from ...ops.roi_pool import roipoint_pool3d
from ...ops.sampling import farthest_point_sample
from ...utils.easydict import EasyDict


class _MLP(nn.Module):
    """Conv1x1 stack; BN optional (USE_BN, pointrcnn_head.py:14-31)."""

    widths: Sequence[int]
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        for k, f in enumerate(self.widths):
            x = nn.Dense(f, use_bias=not self.use_bn, name=f"fc{k}")(x)
            if self.use_bn:
                x = BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, name=f"bn{k}",
                )(x)
            x = nn.relu(x)
        return x


class SAStage(nn.Module):
    """Single-scale PointnetSAModule: FPS + ball query + MLP + maxpool;
    ``npoint=-1`` = GroupAll (everything into one token)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_bn: bool = False

    @nn.compact
    def __call__(self, xyz, features, train=False):
        if self.npoint > 0:
            idx = farthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, idx)
            qidx = ball_query(float(self.radius), int(self.nsample), xyz,
                              new_xyz)
            grouped_xyz = group_points(xyz, qidx) - new_xyz[:, :, None, :]
            grouped = jnp.concatenate(
                [grouped_xyz, group_points(features, qidx)], axis=-1
            )
        else:
            # GroupAll (pointnet2_utils.GroupAll): raw xyz, no centering
            new_xyz = jnp.zeros_like(xyz[:, :1, :])
            grouped = jnp.concatenate([xyz, features], axis=-1)[:, None]
        h = _MLP(tuple(self.mlp), self.use_bn, name="mlp")(grouped, train)
        return new_xyz, max_first(h, 2)  # torch max_pool tie grads


class PointRCNNHeadNet(nn.Module):
    """RoI point cloud encoder + refinement heads
    (pointrcnn_head.py:88-180)."""

    model_cfg: Any
    code_size: int
    num_class: int = 1

    @nn.compact
    def __call__(self, point_coords, point_features, point_scores, rois,
                 train=False):
        """Args:
            point_coords: (B, N, 3); point_features: (B, N, C);
            point_scores: (B, N) sigmoid fg scores; rois: (B, R, 7).
        Returns:
            rcnn_cls (B, R, num_class), rcnn_reg (B, R, code*num_class).
        """
        cfg = EasyDict(self.model_cfg)
        pool_cfg = EasyDict(cfg.ROI_POINT_POOL)
        use_bn = bool(cfg.get("USE_BN", False))
        B, R = rois.shape[:2]
        K = int(pool_cfg.NUM_SAMPLED_POINTS)

        depth = jnp.linalg.norm(point_coords, axis=-1) / float(
            pool_cfg.DEPTH_NORMALIZER
        ) - 0.5
        feats_all = jnp.concatenate(
            [point_scores[..., None], depth[..., None], point_features],
            axis=-1,
        )  # (B, N, 2 + C)

        ew = [float(w) for w in pool_cfg.get("POOL_EXTRA_WIDTH", (0, 0, 0))]
        pool_rois = jnp.concatenate(
            [rois[..., 0:3], rois[..., 3:6] + jnp.asarray(ew),
             rois[..., 6:7]], axis=-1,
        )
        pooled, empty = jax.vmap(
            lambda r, p, f: roipoint_pool3d(r, p, f, K)
        )(pool_rois, point_coords, feats_all)  # (B, R, K, 3+2+C), (B, R)

        # canonical transform (pointrcnn_head.py:120-129); original rois
        # (not the extra-width ones) define the frame
        local_xyz = pooled[..., 0:3] - rois[:, :, None, 0:3]
        local_xyz = rotate_points_along_z(
            local_xyz.reshape(B * R, K, 3), -rois[..., 6].reshape(B * R)
        ).reshape(B, R, K, 3)
        pooled = jnp.concatenate([local_xyz, pooled[..., 3:]], axis=-1)
        pooled = jnp.where(empty[..., None, None], 0.0, pooled)

        flat = pooled.reshape(B * R, K, -1)
        prefix = flat[..., 0:5]  # local_xyz | score | depth
        xyz_feats = _MLP(
            tuple(cfg.XYZ_UP_LAYER), use_bn, name="xyz_up"
        )(prefix, train)
        merged = jnp.concatenate([xyz_feats, flat[..., 5:]], axis=-1)
        merged = _MLP(
            (int(cfg.XYZ_UP_LAYER[-1]),), use_bn, name="merge_down"
        )(merged, train)

        xyz = flat[..., 0:3]
        feats = merged
        sa_cfg = EasyDict(cfg.SA_CONFIG)
        for i in range(len(sa_cfg.NPOINTS)):
            # the reference's vanilla PointnetSAModuleMSG hardcodes
            # Conv2d(bias=False)+BN2d and IGNORES the bn=use_bn argument
            # (pointnet2_batch/pointnet2_modules.py:118-126), so the SA
            # stages are BN'd even under USE_BN: False — only
            # xyz_up/merge_down honor the flag (pointrcnn_head.py:21-31)
            xyz, feats = SAStage(
                npoint=int(sa_cfg.NPOINTS[i]),
                radius=float(sa_cfg.RADIUS[i]),
                nsample=int(sa_cfg.NSAMPLE[i]),
                mlp=tuple(sa_cfg.MLPS[i]),
                use_bn=True,
                name=f"SA_{i}",
            )(xyz, feats, train)

        shared = feats[:, 0, :].reshape(B, R, -1)

        dp = float(cfg.get("DP_RATIO", 0.0))

        def head(x, widths, n_out, prefix):
            for k, f in enumerate(widths):
                x = nn.Dense(f, use_bias=False, name=f"{prefix}_fc{k}")(x)
                x = BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, name=f"{prefix}_bn{k}",
                )(x)
                x = nn.relu(x)
                if k == 0 and dp > 0:
                    x = nn.Dropout(dp, deterministic=not train)(x)
            return nn.Dense(n_out, use_bias=True, name=f"{prefix}_out",
                            kernel_init=nn.initializers.normal(0.001))(x)

        rcnn_cls = head(shared, list(cfg.CLS_FC), self.num_class, "cls")
        rcnn_reg = head(
            shared, list(cfg.REG_FC), self.code_size * self.num_class, "reg"
        )
        return rcnn_cls, rcnn_reg
