"""Voxel Set Abstraction (PV-RCNN keypoint feature extractor) —
counterpart of ``pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py``
(:1-411) + the stacked SA aggregation it drives
(``pointnet2_stack/pointnet2_modules.py:30-115`` StackSAModuleMSG).

TPU re-design:

* The reference's ragged "stacked" batches (``xyz_batch_cnt`` offset
  arithmetic) disappear: everything is padded-dense ``(B, N, ...)`` with
  validity masks, so the batch ops (Pallas ball query, XLA gathers)
  subsume the whole pointnet2_stack op family (SURVEY §2.1 note).
* Non-empty sparse voxels per scale are extracted from the dense feature
  grids with one ``top_k`` over a multi-scale occupancy pyramid (the
  submanifold-conv activity pattern reproduced by 3x3x3/stride-2 max
  pooling of the input occupancy — exactly the active-site dilation of
  the reference's spconv downsample stages), up to a static per-scale
  ``MAX_VOXELS`` budget.  Invalid rows get a far-sentinel center so they
  can never land inside a query ball.
* Empty-ball detection: the batch ball query keeps the CUDA padding
  semantics (zero hits -> index 0), so "group is empty" is exactly
  "the point at slot 0 is outside the radius" — no extra kernel.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
from ...norm import BatchNorm
import jax
import jax.numpy as jnp
from ....ops.maxpool import max_first

from ....ops.ball_query import ball_query_multi
from ....ops.grouping import gather_points, group_points
from ....ops.sampling import farthest_point_sample
from ....utils.easydict import EasyDict
from ...blocks import MLPStack

FAR_SENTINEL = 1.0e6


def bilinear_interpolate(im, x, y):
    """``bilinear_interpolate_torch`` (voxel_set_abstraction.py:11-42):
    clamped-index bilinear taps (no zero padding, unlike grid_sample).

    Args:
        im: (H, W, C); x/y: (M,) fractional index coords.
    Returns:
        (M, C).
    """
    H, W, C = im.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)

    def tap(xi, yi):
        xs = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        ys = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return im[ys, xs]

    wa = (x0 + 1 - x) * (y0 + 1 - y)
    wb = (x0 + 1 - x) * (y - y0)
    wc = (x - x0) * (y0 + 1 - y)
    wd = (x - x0) * (y - y0)
    return (
        tap(x0, y0) * wa[:, None]
        + tap(x0, y0 + 1) * wb[:, None]
        + tap(x0 + 1, y0) * wc[:, None]
        + tap(x0 + 1, y0 + 1) * wd[:, None]
    )


def multi_scale_occupancy(voxel_coords, grid_size, strides):
    """Active-cell masks per backbone scale.

    Args:
        voxel_coords: (B, V, 3) zyx int coords, -1 padded.
        grid_size: (nx, ny, nz) base grid.
        strides: sorted unique downsample factors, e.g. (1, 2, 4, 8).
    Returns:
        {stride: (B, Z_s, Y_s, X_s) bool} — stride 1 is the input pattern
        (submanifold convs preserve it); each stride-2 step dilates by the
        3x3x3 kernel then subsamples, i.e. a k=3/s=2/SAME max-pool —
        matching where spconv's regular downsample conv creates actives.
    """
    B, V, _ = voxel_coords.shape
    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    nz = nz + 1  # reference sparse_shape top z plane (voxel_backbone.py)
    valid = voxel_coords[..., 0] >= 0
    zs = jnp.where(valid, voxel_coords[..., 0], nz)
    ys = jnp.where(valid, voxel_coords[..., 1], ny)
    xs = jnp.where(valid, voxel_coords[..., 2], nx)
    occ = jnp.zeros((B, nz, ny, nx), jnp.float32)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))
    occ = occ.at[bidx, zs, ys, xs].set(
        valid.astype(jnp.float32), mode="drop"
    )
    out = {}
    cur, s = occ, 1
    if 1 in strides:
        out[1] = cur > 0
    while s < max(strides):
        # stride 8 == conv4: reference z padding 0 (same geometry and
        # tiny-grid fallback as the dense backbones)
        z_pad = (0, 0) if (s == 4 and cur.shape[1] >= 3) else (1, 1)
        cur = jax.lax.reduce_window(
            cur, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 3), window_strides=(1, 2, 2, 2),
            padding=((0, 0), z_pad, (1, 1), (1, 1)),
        )
        s *= 2
        if s in strides:
            out[s] = cur > 0
    return out


def sparse_to_voxel_list(entry, stride, voxel_size, pc_range):
    """Sparse-backbone multi-scale entries ARE the voxel list: (coords,
    feats, valid) zyx tuples -> centers/features with far-sentinel
    invalid rows (no top_k extraction needed)."""
    coords, feats, valid = entry
    vs = jnp.asarray(voxel_size, jnp.float32) * float(stride)
    origin = jnp.asarray(pc_range[:3], jnp.float32)
    xyz_idx = coords[..., ::-1].astype(jnp.float32)  # zyx -> xyz
    centers = (xyz_idx + 0.5) * vs + origin
    centers = jnp.where(valid[..., None], centers, FAR_SENTINEL)
    return centers, jnp.where(valid[..., None], feats, 0.0), valid


def dense_to_voxel_list(grid, occ, max_voxels, stride, voxel_size, pc_range):
    """Static-budget extraction of non-empty voxels from a dense grid.

    Args:
        grid: (B, Z, Y, X, C); occ: (B, Z, Y, X) bool.
        max_voxels: static cap V (over-budget actives are dropped in scan
            order — log-free by design, set V generously per config).
    Returns:
        centers (B, V, 3) with FAR_SENTINEL on invalid rows,
        feats (B, V, C) zeroed on invalid rows, valid (B, V) bool.
    """
    B, Z, Y, X, C = grid.shape
    V = int(max_voxels)
    flat_occ = occ.reshape(B, -1).astype(jnp.float32)
    # top_k on a 0/1 key returns the lowest indices among ties -> the
    # first V active cells in zyx scan order (deterministic)
    score, idx = jax.lax.top_k(flat_occ, V)
    valid = score > 0
    feats = jnp.take_along_axis(grid.reshape(B, -1, C), idx[..., None], axis=1)
    feats = jnp.where(valid[..., None], feats, 0.0)
    z = idx // (Y * X)
    y = (idx // X) % Y
    x = idx % X
    vs = jnp.asarray(voxel_size, jnp.float32) * float(stride)
    origin = jnp.asarray(pc_range[:3], jnp.float32)
    centers = (
        jnp.stack([x, y, z], axis=-1).astype(jnp.float32) + 0.5
    ) * vs + origin
    centers = jnp.where(valid[..., None], centers, FAR_SENTINEL)
    return centers, feats, valid


class MaskedSAModuleMSG(nn.Module):
    """StackSAModuleMSG (pointnet2_stack/pointnet2_modules.py:30-115) on
    padded-dense batches: MSG ball query around given centers, rel-xyz ||
    features grouping, per-scale Dense-BN-ReLU MLP, max-pool over the
    group, empty groups zeroed (the reference's ``empty_ball_mask``)."""

    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # hidden widths per scale (post-input)
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features, new_xyz, train=False):
        """Args:
            xyz: (B, N, 3) support points (invalid rows = FAR_SENTINEL);
            features: (B, N, C) or None; new_xyz: (B, M, 3).
        Returns:
            (B, M, sum(mlp[-1])) pooled features.
        """
        idx_list = ball_query_multi(
            tuple(float(r) for r in self.radii),
            tuple(int(k) for k in self.nsamples),
            xyz, new_xyz,
        )
        outs = []
        for i, idx in enumerate(idx_list):
            r2 = float(self.radii[i]) ** 2
            first = group_points(xyz, idx[:, :, :1])[:, :, 0, :]  # (B, M, 3)
            nonempty = (
                jnp.sum((first - new_xyz) ** 2, axis=-1) < r2
            )  # (B, M)
            grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, group_points(features, idx)], axis=-1
                ) if self.use_xyz else group_points(features, idx)
            else:
                grouped = grouped_xyz
            h = MLPStack(tuple(self.mlps[i]), name=f"mlps_{i}")(grouped, train)
            h = max_first(h, 2)  # (B, M, c_out); torch max_pool tie grads
            outs.append(jnp.where(nonempty[..., None], h, 0.0))
        return jnp.concatenate(outs, axis=-1)


def _make_aggregator(scfg, input_channels, name):
    """Per-source aggregation dispatch (build_local_aggregation_module,
    pointnet2_stack/pointnet2_modules.py:10-27): StackSAModuleMSG -> the
    masked batch SA; VectorPoolAggregationModuleMSG -> VectorPool
    (PV-RCNN++)."""
    if scfg.get("NAME", "StackSAModuleMSG") == "VectorPoolAggregationModuleMSG":
        from .vector_pool import VectorPoolAggregationModuleMSG

        return VectorPoolAggregationModuleMSG(
            input_channels=input_channels, config=scfg, name=name
        )
    return MaskedSAModuleMSG(
        radii=tuple(scfg.POOL_RADIUS),
        nsamples=tuple(scfg.NSAMPLE),
        mlps=tuple(tuple(m) for m in scfg.MLPS),
        name=name,
    )


def spc_proximity_collapse(xyz, rois, sample_radius_with_roi):
    """Sectorized-proposal-centric pre-filter
    (sample_points_with_roi, voxel_set_abstraction.py:44-77): points
    farther than (roi half-diagonal + radius) from every roi center
    collapse onto the first in-range point so the subsequent FPS never
    prefers them.  (The reference's per-sector FPS split is a CUDA
    parallelisation artifact — one batch FPS is the TPU form; the
    proximity filter is the semantic part.)

    Args:
        xyz: (B, N, 3); rois: (B, R, 7+).
    Returns:
        (B, N, 3) with out-of-range points collapsed.
    """
    roi_valid = jnp.any(rois[..., 0:7] != 0, axis=-1)  # (B, R)
    d = jnp.linalg.norm(
        xyz[:, :, None, :] - rois[:, None, :, 0:3], axis=-1
    )  # (B, N, R)
    d = jnp.where(roi_valid[:, None, :], d, jnp.inf)
    nearest = jnp.argmin(d, axis=-1)
    roi_dims = jnp.take_along_axis(
        rois[..., 3:6], nearest[..., None], axis=1
    )
    max_dim = jnp.linalg.norm(roi_dims / 2.0, axis=-1)
    keep = jnp.min(d, axis=-1) < max_dim + sample_radius_with_roi  # (B, N)
    # degenerate frame (no roi): keep everything
    keep = keep | ~roi_valid.any(axis=-1, keepdims=True)
    anchor_idx = jnp.argmax(keep, axis=-1)  # first kept point
    anchor = jnp.take_along_axis(xyz, anchor_idx[:, None, None], axis=1)
    return jnp.where(keep[..., None], xyz, anchor)


def roi_neighbor_filter(xyz, rois, radius_of_neighbor):
    """FILTER_NEIGHBOR_WITH_ROI (aggregate_keypoint_features_from_one_source,
    voxel_set_abstraction.py:283-310): support points farther than
    (roi half-diagonal + radius) from every roi move to the far sentinel
    so no query ball or interpolation tap can reach them."""
    roi_valid = jnp.any(rois[..., 0:7] != 0, axis=-1)
    d = jnp.linalg.norm(
        xyz[:, :, None, :] - rois[:, None, :, 0:3], axis=-1
    )
    d = jnp.where(roi_valid[:, None, :], d, jnp.inf)
    nearest = jnp.argmin(d, axis=-1)
    roi_dims = jnp.take_along_axis(rois[..., 3:6], nearest[..., None], axis=1)
    max_dim = jnp.linalg.norm(roi_dims / 2.0, axis=-1)
    keep = jnp.min(d, axis=-1) < max_dim + radius_of_neighbor
    keep = keep | ~roi_valid.any(axis=-1, keepdims=True)
    return jnp.where(keep[..., None], xyz, FAR_SENTINEL)


class VoxelSetAbstraction(nn.Module):
    """Keypoint FPS + multi-source feature aggregation
    (voxel_set_abstraction.py:123-411).

    model_cfg keys (reference-compatible): POINT_SOURCE, NUM_KEYPOINTS,
    NUM_OUTPUT_FEATURES, SAMPLE_METHOD (FPS | SPC + SPC_SAMPLING),
    FEATURES_SOURCE, SA_LAYER (per-source MLPS/POOL_RADIUS/NSAMPLE or a
    VectorPoolAggregationModuleMSG group config, DOWNSAMPLE_FACTOR, plus
    the TPU-static MAX_VOXELS budget per voxel source).
    """

    model_cfg: Any
    voxel_size: Any
    point_cloud_range: Any
    num_bev_features: int = 0
    num_rawpoint_features: int = 4

    @nn.compact
    def __call__(self, points, multi_scale, occupancy, spatial_features,
                 bev_stride, rois=None, train=False):
        """Args:
            points: (B, N, 3 + C) fixed-budget raw points;
            multi_scale: {'x_conv1': (B, Z, Y, X, C), ...};
            occupancy: {stride: (B, Z, Y, X) bool} (multi_scale_occupancy);
            spatial_features: (B, H, W, C_bev) BEV map (pre-2D-backbone);
            rois: (B, R, 7+) first-stage proposals (SPC sampling only).
        Returns dict:
            point_coords (B, K, 3), point_features (B, K, F_out),
            point_features_before_fusion (B, K, F_cat).
        """
        cfg = EasyDict(self.model_cfg)
        K = int(cfg.NUM_KEYPOINTS)
        xyz = points[..., 0:3]
        assert cfg.get("POINT_SOURCE", "raw_points") == "raw_points"
        method = cfg.get("SAMPLE_METHOD", "FPS")
        if method == "SPC":
            assert rois is not None, "SPC sampling needs first-stage rois"
            fps_xyz = spc_proximity_collapse(
                xyz, rois,
                float(EasyDict(cfg.SPC_SAMPLING).SAMPLE_RADIUS_WITH_ROI),
            )
        else:
            assert method == "FPS", method
            fps_xyz = xyz
        keypoints = gather_points(xyz, farthest_point_sample(fps_xyz, K))

        feats = []
        if "bev" in cfg.FEATURES_SOURCE:
            vs = self.voxel_size
            pcr = self.point_cloud_range
            x_idx = (keypoints[..., 0] - pcr[0]) / vs[0] / float(bev_stride)
            y_idx = (keypoints[..., 1] - pcr[1]) / vs[1] / float(bev_stride)
            bev = jax.vmap(bilinear_interpolate)(spatial_features, x_idx, y_idx)
            feats.append(bev)

        if "raw_points" in cfg.FEATURES_SOURCE:
            scfg = EasyDict(cfg.SA_LAYER["raw_points"])
            pf = points[..., 3:] if points.shape[-1] > 3 else None
            n_raw = self.num_rawpoint_features - 3
            src_xyz = xyz
            if scfg.get("FILTER_NEIGHBOR_WITH_ROI", False) and rois is not None:
                src_xyz = roi_neighbor_filter(
                    xyz, rois, float(scfg.RADIUS_OF_NEIGHBOR_WITH_ROI)
                )
            feats.append(
                _make_aggregator(scfg, n_raw, "SA_rawpoints")(
                    src_xyz, pf, keypoints, train
                )
            )

        for src in cfg.FEATURES_SOURCE:
            if src in ("bev", "raw_points"):
                continue
            scfg = EasyDict(cfg.SA_LAYER[src])
            stride = int(scfg.DOWNSAMPLE_FACTOR)
            if isinstance(multi_scale[src], tuple):
                centers, vfeats, _ = sparse_to_voxel_list(
                    multi_scale[src], stride, self.voxel_size,
                    self.point_cloud_range,
                )
            else:
                centers, vfeats, _ = dense_to_voxel_list(
                    multi_scale[src], occupancy[stride],
                    int(scfg.get("MAX_VOXELS", 8192)), stride,
                    self.voxel_size, self.point_cloud_range,
                )
            if scfg.get("FILTER_NEIGHBOR_WITH_ROI", False) and rois is not None:
                centers = roi_neighbor_filter(
                    centers, rois, float(scfg.RADIUS_OF_NEIGHBOR_WITH_ROI)
                )
            feats.append(
                _make_aggregator(
                    scfg, int(vfeats.shape[-1]), f"SA_{src}"
                )(centers, vfeats, keypoints, train)
            )

        before_fusion = jnp.concatenate(feats, axis=-1)
        h = nn.Dense(
            int(cfg.NUM_OUTPUT_FEATURES), use_bias=False, name="fusion"
        )(before_fusion)
        h = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="fusion_bn",
        )(h)
        point_features = nn.relu(h)
        return {
            "point_coords": keypoints,
            "point_features": point_features,
            "point_features_before_fusion": before_fusion,
        }
