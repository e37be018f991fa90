"""IA-SSD / PDA-SSD backbone (flax.linen, dense channels-last tensors).

Rebuilds the reference stack TPU-first:

* ``PointnetSAModuleMSG_WithSampling``            — pointnet2_modules.py:1417-1686
* ``PointnetSAModuleMSG_WithSampling_Ellipsoid``  — pointnet2_modules.py:541-954
  (the PDA module: density / position / global / raw branches fused by a
  K-neighbor transformer)
* ``Vote_layer``                                  — pointnet2_modules.py:1689-1753
* ``IASSD_Backbone``                              — models/backbones_3d/IASSD_backbone.py:9-240

Design deltas (TPU-native, not behavioral):
* All tensors are dense ``(B, N, C)`` — the reference flattens to
  ``(B*N, 1+C)`` rows with a batch-index column and immediately reshapes
  back (IASSD_backbone.py:133-139); we skip the round-trip.
* Grouping/gather are XLA gathers; ball query/FPS come from
  ``pdanet_tpu.ops`` with exact CUDA padding semantics.
* The per-center transformer runs on ``(B, M, K, D)`` directly; K stays the
  token axis, so the MXU sees batched (K x D) attention without the
  reference's permute/reshape traffic.
"""

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.maxpool import max_first, max_first_keepdims
from ...ops.ball_query import ball_query, ball_query_multi
from ...ops.grouping import gather_points, group_points
from ...ops.sampling import (
    ds_fps,
    farthest_point_sample,
    farthest_point_sample_features,
    ry_fps,
)
from ..blocks import (
    CBAM,
    DenseBNReLU,
    DensityNet,
    EncoderLayer,
    MLPStack,
    TransformerEncoderLayerPreNorm,
)


def sample_indices(
    sample_type: str,
    npoint: int,
    xyz: jnp.ndarray,
    features: Optional[jnp.ndarray],
    cls_features: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Sampling dispatch (pointnet2_modules.py:1556-1644).

    Args:
        xyz: (B, N, 3); features: (B, N, C) or None;
        cls_features: (B, N, num_class) or None.
    Returns:
        (B, npoint) int32 indices.
    """
    B, N, _ = xyz.shape
    if N <= npoint:  # no-downsample passthrough (:1562)
        return jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    if ("cls" in sample_type) or ("ctr" in sample_type):
        score = jax.nn.sigmoid(jnp.max(cls_features, axis=-1))  # (B, N)
        _, idx = jax.lax.top_k(score, npoint)
        return idx.astype(jnp.int32)
    if "D-FPS" in sample_type or "DFS" in sample_type:
        return farthest_point_sample(xyz, npoint)
    if "F-FPS" in sample_type or "FFS" in sample_type:
        feats_ssd = jnp.concatenate([xyz, features], axis=-1)
        return farthest_point_sample_features(feats_ssd, npoint)
    if sample_type == "FS":
        feats_ssd = jnp.concatenate([xyz, features], axis=-1)
        idx1 = farthest_point_sample_features(feats_ssd, npoint)
        idx2 = farthest_point_sample(xyz, npoint)
        return jnp.concatenate([idx1, idx2], axis=-1)
    if sample_type in ("ds_FPS", "ds-FPS"):
        return ds_fps(xyz, npoint)
    if sample_type in ("ry_FPS", "ry-FPS"):
        return ry_fps(xyz, npoint)
    raise NotImplementedError(f"sample_type={sample_type}")


def run_sampling(
    sample_type_list: Sequence[str],
    sample_range_list: Sequence[int],
    npoint_list: Sequence[int],
    xyz: jnp.ndarray,
    features: Optional[jnp.ndarray],
    cls_features: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Multi-segment sampling loop (pointnet2_modules.py:1541-1646)."""
    out = []
    last_end = 0
    for sample_type, sample_range, npoint in zip(
        sample_type_list, sample_range_list, npoint_list
    ):
        if npoint <= 0:
            continue
        if sample_range == -1:
            sl = slice(last_end, None)
        else:
            sl = slice(last_end, sample_range)
            last_end += sample_range
        xyz_tmp = xyz[:, sl, :]
        feat_tmp = features[:, sl, :] if features is not None else None
        cls_tmp = cls_features[:, sl, :] if cls_features is not None else None
        idx = sample_indices(sample_type, npoint, xyz_tmp, feat_tmp, cls_tmp)
        out.append(idx + sl.start if sl.start else idx)
    return jnp.concatenate(out, axis=-1)


class QueryGroupDensityDirectional(nn.Module):
    """``QueryAndGroup_alone_grouped_density_directional``
    (pointnet2_utils.py:557-614): ball query then per-neighbor channels
    [abs_xyz(3) | gaussian_density(1) | unit_dir(3) | features(C)].

    Channels-last: returns a tuple instead of one packed tensor.  ``idx``
    may be precomputed (shared multi-radius query).
    """

    radius: float
    nsample: int

    def __call__(self, xyz, new_xyz, features, idx=None):
        if idx is None:
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
        # one merged f32 gather of [xyz | features] (see the
        # SAModuleWithSampling grouping note: separate small-channel
        # gathers lower poorly on TPU)
        g = group_points(jnp.concatenate([xyz, features], axis=-1), idx)
        grouped_xyz = g[..., 0:3]  # (B, M, K, 3) absolute
        d2 = jnp.sum(
            jnp.square(grouped_xyz - new_xyz[:, :, None, :]), axis=-1
        )  # (B, M, K)
        density = jnp.exp(-d2 / (2.0 * self.radius**2)) / (2.5 * self.radius)
        direction = (grouped_xyz - new_xyz[:, :, None, :]) / self.radius
        return grouped_xyz, density[..., None], direction, g[..., 3:]


class SAModuleWithSampling(nn.Module):
    """IA-SSD SA layer (pointnet2_modules.py:1417-1686), channels-last.

    forward contract matches the reference: (xyz, features, cls_features,
    ctr_xyz) -> (new_xyz, new_features, cls_preds, sampled_idx).
    """

    npoint_list: Sequence[int]
    sample_range_list: Sequence[int]
    sample_type_list: Sequence[str]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # each already [channel_in + 3, ...]
    aggregation_mlp: Optional[Sequence[int]]
    confidence_mlp: Optional[Sequence[int]]
    num_class: int
    compute_dtype: Optional[Any] = None  # eval-only (blocks._infer_dtype)
    # Proposal_Aware ablation (pointnet2_modules.py:1048-1321): CBAM
    # spatial attention over the aggregated features before the
    # confidence layers.  Dead in the reference (class never
    # instantiated); enabled via SA_CONFIG.PROPOSAL_AWARE_CBAM.
    use_cbam: bool = False

    @nn.compact
    def __call__(self, xyz, features, cls_features=None, ctr_xyz=None,
                 train=False, fps_identity=False):
        sampled_idx = None
        if ctr_xyz is None:
            if fps_identity:
                # input is D-FPS selection-ordered: FPS = identity prefix
                # (see the backbone setup proof note)
                B, N = xyz.shape[:2]
                m = min(int(self.npoint_list[0]), N)
                sampled_idx = jnp.broadcast_to(
                    jnp.arange(m, dtype=jnp.int32)[None], (B, m)
                )
            else:
                sampled_idx = run_sampling(
                    self.sample_type_list,
                    self.sample_range_list,
                    self.npoint_list,
                    xyz,
                    features,
                    cls_features,
                )
            new_xyz = (
                xyz[:, : sampled_idx.shape[1]]
                if fps_identity
                else gather_points(xyz, sampled_idx)
            )
        else:
            new_xyz = ctr_xyz

        if len(self.radii) > 0:
            # one shared distance field for all MSG radii
            idx_list = ball_query_multi(
                tuple(self.radii), tuple(self.nsamples), xyz, new_xyz
            )
            # ONE f32 gather of [xyz | features] per scale: a separate
            # 1-channel feature gather (L0's intensity) lowers to a
            # pathological scalar bf16 gather on TPU — profiled at
            # 1.38 ms/frame of the 8.4 ms KITTI b1 forward vs ~0.25 ms
            # for the merged 4-channel f32 form (identical values)
            src = jnp.concatenate([xyz, features], axis=-1)
            scale_feats = []
            for i, (radius, nsample) in enumerate(zip(self.radii, self.nsamples)):
                idx = idx_list[i]
                g = group_points(src, idx)
                grouped = jnp.concatenate(
                    [g[..., 0:3] - new_xyz[:, :, None, :], g[..., 3:]],
                    axis=-1,
                )
                h = MLPStack(
                    tuple(self.mlps[i][1:]), dtype=self.compute_dtype,
                    name=f"mlps_{i}",
                )(grouped, train)
                # maxpool over K — torch F.max_pool2d tie-grad semantics
                scale_feats.append(max_first(h, 2))
            new_features = jnp.concatenate(scale_feats, axis=-1)
            if self.aggregation_mlp:
                new_features = MLPStack(
                    tuple(self.aggregation_mlp), dtype=self.compute_dtype,
                    name="aggregation_layer"
                )(new_features, train)
            new_features = new_features.astype(xyz.dtype)  # exit bf16 compute
        else:
            new_features = gather_points(features, sampled_idx)

        if self.use_cbam:
            # Proposal_Aware applies CBAM after aggregation, before the
            # confidence layers (pointnet2_modules.py:1318-1321)
            new_features = CBAM(name="cbam")(new_features)

        cls_preds = None
        if self.confidence_mlp:
            h = MLPStack(
                tuple(self.confidence_mlp), dtype=self.compute_dtype,
                name="confidence_mlp",
            )(new_features, train)
            cls_preds = nn.Dense(self.num_class, use_bias=True, name="confidence_out")(h)
            cls_preds = cls_preds.astype(xyz.dtype)
        return new_xyz, new_features, cls_preds, sampled_idx


class SAModuleEllipsoid(nn.Module):
    """The PDA SA layer (pointnet2_modules.py:541-954).

    Per radius scale, four branches over the grouped neighborhood —
    (a) density-scaled features via DensityNet (:983-1006),
    (b) RPPE position encoding MLP(12 -> d/2 -> d) (:634-641, :905-915),
    (c) a global per-center MLP broadcast to neighbors (:643-650, :887),
    (d) raw grouped features — concatenated to 4d channels and fused by a
    pre-norm transformer across the K neighbors (:920-929), max-pooled and
    projected by fin_conv (:664-671, :931-933).
    """

    npoint_list: Sequence[int]
    sample_range_list: Sequence[int]
    sample_type_list: Sequence[str]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # each [channel_in, ...] (no +3)
    aggregation_mlp: Optional[Sequence[int]]
    confidence_mlp: Optional[Sequence[int]]
    num_class: int
    compute_dtype: Optional[Any] = None  # eval-only (blocks._infer_dtype)
    # No_Global ablation (pointnet2_modules.py:130-539): drop the global
    # branch — 3-token fusion (rppe | density-scaled | raw), transformer
    # d_model 3d instead of 4d.  Selected via SA_CONFIG.PDA_VARIANT:
    # no_global (the reference selects it only by editing
    # IASSD_backbone.py:81).
    use_global: bool = True
    # EncoderLayer/FullAttention ablation (pointnet2_modules.py:1325-1414)
    # as the K-neighbor fuser: SA_CONFIG.POINTFORMER_IMPL: encoder_layer.
    pointformer_impl: str = "pre_norm"

    @nn.compact
    def __call__(self, xyz, features, cls_features=None, ctr_xyz=None,
                 train=False, fps_identity=False):
        sampled_idx = None
        if ctr_xyz is None:
            if fps_identity:
                # input is D-FPS selection-ordered: FPS = identity prefix
                # (see the backbone setup proof note)
                B, N = xyz.shape[:2]
                m = min(int(self.npoint_list[0]), N)
                sampled_idx = jnp.broadcast_to(
                    jnp.arange(m, dtype=jnp.int32)[None], (B, m)
                )
            else:
                sampled_idx = run_sampling(
                    self.sample_type_list,
                    self.sample_range_list,
                    self.npoint_list,
                    xyz,
                    features,
                    cls_features,
                )
            if fps_identity:
                new_xyz = xyz[:, : sampled_idx.shape[1]]
                new_xyz_feature = features[:, : sampled_idx.shape[1]]
            else:
                new_xyz = gather_points(xyz, sampled_idx)
                new_xyz_feature = gather_points(features, sampled_idx)
        else:
            new_xyz = ctr_xyz
            new_xyz_feature = None

        if len(self.radii) > 0:
            # (B, M, 3 + C): per-center global descriptor (:748)
            global_input = (
                jnp.concatenate([new_xyz, new_xyz_feature], axis=-1)
                if self.use_global
                else None
            )
            # one shared distance field for all MSG radii
            idx_list = ball_query_multi(
                tuple(self.radii), tuple(self.nsamples), xyz, new_xyz
            )
            scale_feats = []
            for i, (radius, nsample) in enumerate(zip(self.radii, self.nsamples)):
                d = self.mlps[i][0]
                grouped_xyz, density, direction, grouped_feats = (
                    QueryGroupDensityDirectional(radius, nsample, name=f"groupers_{i}")(
                        xyz, new_xyz, features, idx=idx_list[i]
                    )
                )
                # (a) density branch (:799-806)
                dmax = max_first_keepdims(density, 2)  # torch .max(dim) tie grads
                density_scale = DensityNet(name=f"point_density_{i}")(
                    density / dmax, train
                )
                feat_density = grouped_feats * density_scale
                # (b) RPPE (:812-824): [center | neighbor | center-neighbor | dir]
                centers_k = jnp.broadcast_to(
                    new_xyz[:, :, None, :], grouped_xyz.shape
                )
                rppe = jnp.concatenate(
                    [centers_k, grouped_xyz, centers_k - grouped_xyz, direction],
                    axis=-1,
                )
                rppe = MLPStack(
                    (d // 2, d), dtype=self.compute_dtype,
                    name=f"position_mlp_{i}",
                )(rppe, train)
                if self.use_global:
                    # (c) global branch, broadcast over K (:787)
                    g = MLPStack(
                        (d, d), dtype=self.compute_dtype,
                        name=f"global_mlps_{i}",
                    )(global_input, train)
                    g_k = jnp.broadcast_to(
                        g[:, :, None, :], rppe.shape[:3] + (d,)
                    )
                    branches = [rppe, feat_density, grouped_feats, g_k]
                else:
                    # No_Global (:497-505): 3-token fusion, d_model 3d
                    branches = [rppe, feat_density, grouped_feats]
                # fuse: (B, M, K, n*d) -> transformer over K -> maxpool -> fin_conv
                fused = jnp.concatenate(branches, axis=-1)
                if self.pointformer_impl == "encoder_layer":
                    fused = EncoderLayer(
                        d_model=len(branches) * d,
                        nhead=4,
                        dtype=self.compute_dtype,
                        name=f"Local_pointformer_{i}",
                    )(fused, train)
                else:
                    fused = TransformerEncoderLayerPreNorm(
                        d_model=len(branches) * d,
                        nhead=4,
                        dim_feedforward=2 * d,
                        dtype=self.compute_dtype,
                        name=f"Local_pointformer_{i}",
                    )(fused, train)
                pooled = max_first(fused, 2)  # (B, M, 4d); torch tie grads
                out = MLPStack(
                    (2 * d, self.mlps[i][-1]), dtype=self.compute_dtype,
                    name=f"fin_conv_{i}",
                )(pooled, train)
                scale_feats.append(out)
            new_features = jnp.concatenate(scale_feats, axis=-1)
            if self.aggregation_mlp:
                new_features = MLPStack(
                    tuple(self.aggregation_mlp), dtype=self.compute_dtype,
                    name="aggregation_layer"
                )(new_features, train)
            new_features = new_features.astype(xyz.dtype)  # exit bf16 compute
        else:
            new_features = gather_points(features, sampled_idx)

        cls_preds = None
        if self.confidence_mlp:
            h = MLPStack(
                tuple(self.confidence_mlp), dtype=self.compute_dtype,
                name="confidence_mlp",
            )(new_features, train)
            cls_preds = nn.Dense(self.num_class, use_bias=True, name="confidence_out")(h)
            cls_preds = cls_preds.astype(xyz.dtype)
        return new_xyz, new_features, cls_preds, sampled_idx


class VoteLayer(nn.Module):
    """Center-shift voting (pointnet2_modules.py:1689-1753)."""

    mlp_list: Sequence[int]
    max_translate_range: Optional[Sequence[float]]

    @nn.compact
    def __call__(self, xyz, features, train=False):
        h = features
        if self.mlp_list:
            h = MLPStack(tuple(self.mlp_list), name="mlp_modules")(h, train)
        ctr_offsets = nn.Dense(3, use_bias=True, name="ctr_reg")(h)  # (B, N, 3)
        if self.max_translate_range is not None:
            limit = jnp.asarray(self.max_translate_range, dtype=ctr_offsets.dtype)
            limited = jnp.clip(ctr_offsets, -limit, limit)
            vote_xyz = xyz + limited
        else:
            vote_xyz = xyz + ctr_offsets
        return vote_xyz, xyz, ctr_offsets


class IASSDBackbone(nn.Module):
    """SA-stack backbone (IASSD_backbone.py:9-240).

    Input: points (B, N, 3 + C) dense, channels = [x, y, z, feats...].
    Output dict keys (dense analogues of the reference's flat tensors):
        centers (B, M, 3), centers_origin, ctr_offsets, centers_features,
        encoder_xyz: list[(B, Ni, 3)], sa_ins_preds: list (per SA layer,
        (B, Ni, num_class) or None), encoder_coords: list[(B, Ni, 3)] in the
        reference's indexing (incl. the centers_origin entry inserted at the
        vote layer, IASSD_backbone.py:161).
    """

    model_cfg: Any
    num_class: int
    input_channels: int

    def setup(self):
        from ...utils.easydict import EasyDict

        # linen freezes dict attributes; restore attribute access.
        sa_cfg = EasyDict(self.model_cfg).SA_CONFIG
        self.layer_types = sa_cfg.LAYER_TYPE
        self.ctr_idx_list = sa_cfg.CTR_INDEX
        self.layer_inputs = sa_cfg.LAYER_INPUT
        aggregation_mlps = sa_cfg.get("AGGREGATION_MLPS", None)
        confidence_mlps = sa_cfg.get("CONFIDENCE_MLPS", None)
        # optional bf16 compute for the MLP/transformer stacks (params
        # stay f32).  COMPUTE_DTYPE applies at eval only (training runs
        # f32 — reference numerics); TRAIN_COMPUTE_DTYPE additionally
        # opts training into bf16 matmuls with f32 BN/LN statistics
        # (blocks._infer_dtype / _norm_dtype).
        from ..blocks import TrainEvalDtype

        mcfg = EasyDict(self.model_cfg)
        compute_dtype = (
            jnp.bfloat16
            if str(mcfg.get("COMPUTE_DTYPE", "")) in ("bfloat16", "bf16")
            else None
        )
        if str(mcfg.get("TRAIN_COMPUTE_DTYPE", "")) in ("bfloat16", "bf16"):
            compute_dtype = TrainEvalDtype(jnp.bfloat16)
        max_translate = sa_cfg.get("MAX_TRANSLATE_RANGE", None)

        # Stacked-D-FPS identity shortcut: FPS over a SELECTION-ORDERED
        # point set is the identity prefix [0..m).  Proof sketch: let
        # Y = the full output of a D-FPS run (in selection order).  At
        # step j of FPS(Y, m), the j-th selection p_j of the original run
        # is in Y with Y-index j; the running min-distance field on Y is
        # the original field restricted to Y, so p_j attains the maximum;
        # any tying candidate is unselected (selected points sit at
        # distance 0) and therefore has Y-index > j — the lowest-index
        # tie-break picks p_j = Y[j].  (Degenerate caveat: when uniques
        # are exhausted the reference re-emits index 0; the identity
        # prefix emits later indices of the SAME duplicated point —
        # value-identical downstream.)  Layer 1's 4096->1024 D-FPS on
        # KITTI (and the 16384->4096 ONCE one) therefore needs no kernel.
        self_shortcut = bool(mcfg.get("FPS_IDENTITY_SHORTCUT", True))

        def _is_pure_dfps(j):
            return (
                self.layer_types[j] == "SA_Layer"
                and list(sa_cfg.SAMPLE_METHOD_LIST[j]) == ["D-FPS"]
                and list(sa_cfg.SAMPLE_RANGE_LIST[j]) == [-1]
                and int(self.ctr_idx_list[j]) == -1
            )

        fps_identity = []
        for k in range(len(sa_cfg.NSAMPLE_LIST)):
            li = self.layer_inputs[k]
            li = li[-1] if isinstance(li, list) else li
            producer_ordered = li > 0 and _is_pure_dfps(li - 1)
            fps_identity.append(
                self_shortcut and _is_pure_dfps(k) and producer_ordered
            )
        self.fps_identity = tuple(fps_identity)

        channel_in = self.input_channels - 3
        channel_out_list = [channel_in]
        modules = []
        for k in range(len(sa_cfg.NSAMPLE_LIST)):
            layer_input = self.layer_inputs[k]
            channel_in = channel_out_list[
                layer_input[-1] if isinstance(layer_input, list) else layer_input
            ]
            if self.layer_types[k] == "SA_Layer":
                mlps = [list(m) for m in sa_cfg.MLPS[k]]
                channel_out = 0
                for idx in range(len(mlps)):
                    mlps[idx] = [channel_in] + mlps[idx]
                    channel_out += mlps[idx][-1]
                aggregation_mlp = None
                if aggregation_mlps and aggregation_mlps[k]:
                    aggregation_mlp = list(aggregation_mlps[k])
                    channel_out = aggregation_mlp[-1]
                confidence_mlp = None
                if confidence_mlps and confidence_mlps[k]:
                    confidence_mlp = list(confidence_mlps[k])
                # PDA placement rule (IASSD_backbone.py:62-94): layers 1-4
                # use the Ellipsoid (PDA) module, others plain WithSampling.
                cls = SAModuleWithSampling if (k < 1 or k > 4) else SAModuleEllipsoid
                if cls is SAModuleWithSampling:
                    # +3 for the use_xyz concat (pointnet2_modules.py:1480-1481)
                    mlps_eff = [[m[0] + 3] + m[1:] for m in mlps]
                else:
                    mlps_eff = mlps
                # Ablation-variant switches (reference: source-edit-only;
                # pointnet2_modules.py:130-539 No_Global, :1048-1321
                # Proposal_Aware/CBAM, :1325-1414 EncoderLayer)
                variant_kw = {}
                if cls is SAModuleEllipsoid:
                    pda_variant = str(sa_cfg.get("PDA_VARIANT", "ellipsoid"))
                    if pda_variant not in ("ellipsoid", "no_global"):
                        raise NotImplementedError(
                            f"PDA_VARIANT={pda_variant}"
                        )
                    variant_kw["use_global"] = pda_variant != "no_global"
                    variant_kw["pointformer_impl"] = str(
                        sa_cfg.get("POINTFORMER_IMPL", "pre_norm")
                    )
                else:
                    variant_kw["use_cbam"] = bool(
                        sa_cfg.get("PROPOSAL_AWARE_CBAM", False)
                    )
                modules.append(
                    cls(
                        npoint_list=tuple(sa_cfg.NPOINT_LIST[k]),
                        sample_range_list=tuple(sa_cfg.SAMPLE_RANGE_LIST[k]),
                        sample_type_list=tuple(sa_cfg.SAMPLE_METHOD_LIST[k]),
                        radii=tuple(sa_cfg.RADIUS_LIST[k]),
                        nsamples=tuple(sa_cfg.NSAMPLE_LIST[k]),
                        mlps=tuple(tuple(m) for m in mlps_eff),
                        aggregation_mlp=tuple(aggregation_mlp) if aggregation_mlp else None,
                        confidence_mlp=tuple(confidence_mlp) if confidence_mlp else None,
                        num_class=self.num_class,
                        compute_dtype=compute_dtype,
                        name=f"SA_modules_{k}",
                        **variant_kw,
                    )
                )
            elif self.layer_types[k] == "Vote_Layer":
                modules.append(
                    VoteLayer(
                        mlp_list=tuple(sa_cfg.MLPS[k]),
                        max_translate_range=tuple(max_translate) if max_translate else None,
                        name=f"SA_modules_{k}",
                    )
                )
                channel_out = channel_out_list[layer_input]
            channel_out_list.append(channel_out)
        self.sa_modules = modules
        self.num_point_features = channel_out_list[-1]

    def __call__(self, points, train=False):
        xyz = points[..., 0:3]
        features = points[..., 3:]

        encoder_xyz: List[jnp.ndarray] = [xyz]
        encoder_features: List[Optional[jnp.ndarray]] = [features]
        encoder_coords: List[jnp.ndarray] = [xyz]
        sa_ins_preds: List[Optional[jnp.ndarray]] = []

        li_cls_pred = None
        centers = centers_origin = ctr_offsets = None
        for i, module in enumerate(self.sa_modules):
            xyz_input = encoder_xyz[self.layer_inputs[i]]
            feature_input = encoder_features[self.layer_inputs[i]]
            if self.layer_types[i] == "SA_Layer":
                ctr_xyz = (
                    encoder_xyz[self.ctr_idx_list[i]]
                    if self.ctr_idx_list[i] != -1
                    else None
                )
                li_xyz, li_features, li_cls_pred, _ = module(
                    xyz_input, feature_input, li_cls_pred, ctr_xyz=ctr_xyz,
                    train=train, fps_identity=self.fps_identity[i],
                )
            else:  # Vote_Layer
                li_xyz, xyz_select, ctr_offsets = module(
                    xyz_input, feature_input, train=train
                )
                li_features = feature_input  # reference returns empty; unused
                centers = li_xyz
                centers_origin = xyz_select
                encoder_coords.append(centers_origin)
            encoder_xyz.append(li_xyz)
            encoder_coords.append(li_xyz)
            encoder_features.append(li_features)
            sa_ins_preds.append(li_cls_pred if li_cls_pred is not None else None)

        return {
            "centers": centers,
            "centers_origin": centers_origin,
            "ctr_offsets": ctr_offsets,
            "centers_features": encoder_features[-1],
            "encoder_xyz": encoder_xyz,
            "encoder_coords": encoder_coords,
            "encoder_features": encoder_features,
            "sa_ins_preds": sa_ins_preds,
        }
