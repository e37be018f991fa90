"""Structural converter validation for the two-stage families
(SECOND-IoU, Voxel-RCNN) and the sparse gather-matmul backbone:
inverse-emit a reference-layout (pcdet/spconv) state_dict from real flax
variables, convert it back, and require exact tree/value equality + full
key consumption + a live forward (same method as tests/test_converter.py
— pins name/index/layout bookkeeping without a public .pth)."""

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from test_converter import (  # noqa: E402
    TrackingDict, _emit_bn, _emit_conv2d, _emit_deconv2d, _tree_paths,
)

from pdanet_tpu.utils.easydict import EasyDict  # noqa: E402


def _emit_fc_bn_stack(sd, prefix, params, stats, n, drop_after,
                      flax_prefix):
    """Inverse of ckpt_converter.convert_fc_bn_stack: flax
    {flax_prefix}_fc{k}/_bn{k} -> torch Sequential slots with Dropout
    index gaps.  Returns the next Sequential index."""
    idx = 0
    for k in range(n):
        lp = params[f"{flax_prefix}_fc{k}"]
        sd[f"{prefix}.{idx}.weight"] = np.asarray(lp["kernel"]).T
        if "bias" in lp:
            sd[f"{prefix}.{idx}.bias"] = np.asarray(lp["bias"])
        _emit_bn(sd, f"{prefix}.{idx + 1}",
                 params[f"{flax_prefix}_bn{k}"],
                 stats[f"{flax_prefix}_bn{k}"])
        idx += 3 + (1 if drop_after(k) else 0)
    return idx


def _emit_dense_voxel_backbone(sd, prefix, params, stats, layer_nums=None):
    """Inverse of convert_voxel_backbone_dense (complete: down + both
    subm blocks per level)."""

    def seq(name, torch_prefix):
        sd[f"{torch_prefix}.0.weight"] = np.asarray(
            params[name]["Conv_0"]["kernel"])
        _emit_bn(sd, f"{torch_prefix}.1",
                 {"scale": params[name]["BatchNorm_0"]["scale"],
                  "bias": params[name]["BatchNorm_0"]["bias"]},
                 {"mean": stats[name]["BatchNorm_0"]["mean"],
                  "var": stats[name]["BatchNorm_0"]["var"]})

    seq("conv_input", f"{prefix}.conv_input")
    seq("conv1", f"{prefix}.conv1.0")
    for lvl in (2, 3, 4):
        seq(f"conv{lvl}_down", f"{prefix}.conv{lvl}.0")
        seq(f"conv{lvl}_a", f"{prefix}.conv{lvl}.1")
        seq(f"conv{lvl}_b", f"{prefix}.conv{lvl}.2")
    seq("conv_out", f"{prefix}.conv_out")


def _emit_bev_backbone(sd, prefix, params, stats, bcfg):
    for idx in range(len(bcfg.LAYER_NUMS)):
        _emit_conv2d(sd, f"{prefix}.blocks.{idx}.1",
                     params[f"blocks_{idx}_down"]["conv"]["kernel"])
        _emit_bn(sd, f"{prefix}.blocks.{idx}.2",
                 params[f"blocks_{idx}_down"]["bn"],
                 stats[f"blocks_{idx}_down"]["bn"])
        for k in range(bcfg.LAYER_NUMS[idx]):
            _emit_conv2d(sd, f"{prefix}.blocks.{idx}.{4 + 3 * k}",
                         params[f"blocks_{idx}_{k}"]["conv"]["kernel"])
            _emit_bn(sd, f"{prefix}.blocks.{idx}.{5 + 3 * k}",
                     params[f"blocks_{idx}_{k}"]["bn"],
                     stats[f"blocks_{idx}_{k}"]["bn"])
        _emit_deconv2d(sd, f"{prefix}.deblocks.{idx}.0",
                       params[f"deblocks_{idx}_deconv"]["kernel"])
        _emit_bn(sd, f"{prefix}.deblocks.{idx}.1",
                 params[f"deblocks_{idx}_bn"],
                 stats[f"deblocks_{idx}_bn"])


def _emit_first_stage(sd, variables, cfg):
    params, stats = variables["params"], variables["batch_stats"]
    _emit_dense_voxel_backbone(sd, "backbone_3d", params["backbone_3d"],
                               stats["backbone_3d"])
    _emit_bev_backbone(sd, "backbone_2d", params["backbone_2d"],
                       stats["backbone_2d"], cfg.BACKBONE_2D)
    for hname, hp in params["dense_head"].items():
        _emit_conv2d(sd, f"dense_head.{hname}", hp["kernel"], hp["bias"])


def _assert_roundtrip(variables, converted):
    for col in ("params", "batch_stats"):
        want = _tree_paths(dict(variables[col]))
        got = _tree_paths(converted[col])
        assert set(want) == set(got), sorted(set(want) ^ set(got))[:10]
        for path, arr in want.items():
            np.testing.assert_allclose(
                np.asarray(got[path]), np.asarray(arr), rtol=1e-6,
                err_msg=str(path))


def test_second_iou_converter_roundtrip():
    from ckpt_converter import convert_second_iou_checkpoint
    from test_second import GRID, _make_inputs
    from test_two_stage import _second_iou_tiny_cfg

    from pdanet_tpu.models import build_network

    cfg = _second_iou_tiny_cfg()
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"))
    voxels, coords, nums = _make_inputs(seed=11)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    variables = jax.tree.map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    _emit_first_stage(sd, variables, cfg)

    rp, rs = params["roi_head"], stats["roi_head"]
    roi_cfg = cfg.ROI_HEAD
    dp = float(roi_cfg.DP_RATIO)
    n_sh = len(roi_cfg.SHARED_FC)
    _emit_fc_bn_stack(sd, "roi_head.shared_fc_layer", rp, rs, n_sh,
                      lambda k: k != n_sh - 1 and dp > 0, "shared")
    idx = _emit_fc_bn_stack(sd, "roi_head.iou_layers", rp, rs,
                            len(roi_cfg.IOU_FC),
                            lambda k: dp >= 0 and k == 0, "iou")
    sd[f"roi_head.iou_layers.{idx}.weight"] = np.asarray(
        rp["iou_out"]["kernel"]).T
    sd[f"roi_head.iou_layers.{idx}.bias"] = np.asarray(
        rp["iou_out"]["bias"])

    sd = TrackingDict(sd)
    converted = convert_second_iou_checkpoint(sd, cfg)
    unread = set(sd.keys()) - sd.read
    assert not unread, sorted(unread)[:10]
    _assert_roundtrip(variables, converted)

    out = model.apply(
        jax.tree.map(jnp.asarray, converted), voxels, coords, nums,
        train=False)
    assert np.isfinite(np.asarray(out["rcnn_iou"])).all()


def test_voxel_rcnn_converter_roundtrip():
    from ckpt_converter import convert_voxelrcnn_checkpoint
    from test_second import GRID, _make_inputs
    from test_two_stage import _voxel_rcnn_tiny_cfg

    from pdanet_tpu.models import build_network

    cfg = _voxel_rcnn_tiny_cfg()
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"))
    voxels, coords, nums = _make_inputs(seed=12)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    variables = jax.tree.map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    _emit_first_stage(sd, variables, cfg)

    rp, rs = params["roi_head"], stats["roi_head"]
    roi_cfg = cfg.ROI_HEAD
    dp = float(roi_cfg.DP_RATIO)
    for k, src in enumerate(roi_cfg.ROI_GRID_POOL.FEATURES_SOURCE):
        pp, ps = rp[f"pool_{src}"], rs[f"pool_{src}"]
        base = f"roi_head.roi_grid_pool_layers.{k}"
        for tname, fname in (("mlps_in.0", "in"), ("mlps_pos.0", "pos"),
                             ("mlps_out.0", "out")):
            sd[f"{base}.{tname}.0.weight"] = np.asarray(
                pp[f"mlp_{fname}"]["kernel"]).T[:, :, None]
            _emit_bn(sd, f"{base}.{tname}.1", pp[f"bn_{fname}"],
                     ps[f"bn_{fname}"])
    for torch_name, prefix, fcs in (
        ("shared_fc_layer", "shared", roi_cfg.SHARED_FC),
        ("cls_fc_layers", "cls", roi_cfg.CLS_FC),
        ("reg_fc_layers", "reg", roi_cfg.REG_FC),
    ):
        n = len(fcs)
        _emit_fc_bn_stack(sd, f"roi_head.{torch_name}", rp, rs, n,
                          lambda k, n=n: k != n - 1 and dp > 0, prefix)
    for torch_name, flax_name in (("cls_pred_layer", "cls_pred"),
                                  ("reg_pred_layer", "reg_pred")):
        sd[f"roi_head.{torch_name}.weight"] = np.asarray(
            rp[flax_name]["kernel"]).T
        sd[f"roi_head.{torch_name}.bias"] = np.asarray(
            rp[flax_name]["bias"])

    sd = TrackingDict(sd)
    converted = convert_voxelrcnn_checkpoint(sd, cfg)
    unread = set(sd.keys()) - sd.read
    assert not unread, sorted(unread)[:10]
    _assert_roundtrip(variables, converted)

    out = model.apply(
        jax.tree.map(jnp.asarray, converted), voxels, coords, nums,
        train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def _emit_plain_mlp(sd, prefix, params, stats, n, use_bn):
    """Inverse of ckpt_converter.convert_plain_mlp (Conv2d [+BN] +ReLU)."""
    stride = 3 if use_bn else 2
    for k in range(n):
        lp = params[f"fc{k}"]
        sd[f"{prefix}.{stride * k}.weight"] = np.asarray(
            lp["kernel"]).T[:, :, None, None]
        if "bias" in lp:
            sd[f"{prefix}.{stride * k}.bias"] = np.asarray(lp["bias"])
        if use_bn:
            _emit_bn(sd, f"{prefix}.{stride * k + 1}", params[f"bn{k}"],
                     stats[f"bn{k}"])


def _emit_mlpstack(sd, prefix, params, stats, conv_dim=4):
    for name, lp in params.items():
        j = int(name.replace("layer", ""))
        w = np.asarray(lp["dense"]["kernel"]).T
        if conv_dim == 4:
            w = w[:, :, None, None]
        elif conv_dim == 3:
            w = w[:, :, None]
        sd[f"{prefix}.{3 * j}.weight"] = w
        _emit_bn(sd, f"{prefix}.{3 * j + 1}", lp["bn"], stats[name]["bn"])


def test_pointrcnn_converter_roundtrip():
    from ckpt_converter import convert_pointrcnn_checkpoint
    from test_pointrcnn import POINTRCNN_MODEL_CFG

    from pdanet_tpu.models import build_network

    cfg = EasyDict(POINTRCNN_MODEL_CFG)
    model = build_network(cfg, num_class=2, input_channels=4,
                          class_names=("Car", "Pedestrian"))
    rng = np.random.RandomState(7)
    N = 256
    points = np.concatenate([
        rng.uniform(0, 6.4, (1, N, 1)),
        rng.uniform(-3.2, 3.2, (1, N, 1)),
        rng.uniform(-3, 1, (1, N, 1)),
        rng.rand(1, N, 1),
    ], axis=-1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), points)
    variables = jax.tree.map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    # backbone: SA/FP MLPStacks
    bb_p, bb_s = params["backbone_3d"], stats["backbone_3d"]
    for mod, mp in bb_p.items():
        if mod.startswith("SA_modules_"):
            k = mod.replace("SA_modules_", "")
            for sub, sp in mp.items():
                i = sub.replace("mlps_", "")
                _emit_mlpstack(sd, f"backbone_3d.SA_modules.{k}.mlps.{i}",
                               sp, bb_s[mod][sub])
        elif mod.startswith("FP_modules_"):
            i = mod.replace("FP_modules_", "")
            _emit_mlpstack(sd, f"backbone_3d.FP_modules.{i}.mlp",
                           mp["mlp"], bb_s[mod]["mlp"])
    # point head: plain make_fc_layers stacks (no dropout)
    hp, hs = params["point_head"], stats["point_head"]
    for prefix, torch_name, fc_key in (("cls", "cls_layers", "CLS_FC"),
                                       ("box", "box_layers", "REG_FC")):
        n = len(cfg.POINT_HEAD[fc_key])
        idx = _emit_fc_bn_stack(sd, f"point_head.{torch_name}", hp, hs, n,
                                lambda k: False, prefix)
        sd[f"point_head.{torch_name}.{idx}.weight"] = np.asarray(
            hp[f"{prefix}_out"]["kernel"]).T
        sd[f"point_head.{torch_name}.{idx}.bias"] = np.asarray(
            hp[f"{prefix}_out"]["bias"])
    # roi head
    rp, rs = params["roi_head"], stats["roi_head"]
    roi_cfg = cfg.ROI_HEAD
    use_bn = bool(roi_cfg.USE_BN)
    dp = float(roi_cfg.DP_RATIO)
    _emit_plain_mlp(sd, "roi_head.xyz_up_layer", rp["xyz_up"],
                    rs.get("xyz_up", {}), len(roi_cfg.XYZ_UP_LAYER), use_bn)
    _emit_plain_mlp(sd, "roi_head.merge_down_layer", rp["merge_down"],
                    rs.get("merge_down", {}), 1, use_bn)
    for k in range(len(roi_cfg.SA_CONFIG.NPOINTS)):
        _emit_plain_mlp(sd, f"roi_head.SA_modules.{k}.mlps.0",
                        rp[f"SA_{k}"]["mlp"], rs[f"SA_{k}"]["mlp"],
                        len(roi_cfg.SA_CONFIG.MLPS[k]), True)
    for prefix, torch_name, fc_key in (("cls", "cls_layers", "CLS_FC"),
                                       ("reg", "reg_layers", "REG_FC")):
        n = len(roi_cfg[fc_key])
        idx = _emit_fc_bn_stack(sd, f"roi_head.{torch_name}", rp, rs, n,
                                lambda k: dp >= 0 and k == 0, prefix)
        sd[f"roi_head.{torch_name}.{idx}.weight"] = np.asarray(
            rp[f"{prefix}_out"]["kernel"]).T[:, :, None]
        sd[f"roi_head.{torch_name}.{idx}.bias"] = np.asarray(
            rp[f"{prefix}_out"]["bias"])

    sd = TrackingDict(sd)
    converted = convert_pointrcnn_checkpoint(sd, cfg, input_channels=4)
    unread = set(sd.keys()) - sd.read
    assert not unread, sorted(unread)[:10]
    _assert_roundtrip(variables, converted)

    out = model.apply(
        jax.tree.map(jnp.asarray, converted), points, train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def test_pvrcnn_converter_roundtrip():
    from ckpt_converter import convert_pvrcnn_checkpoint
    from test_pvrcnn import PVRCNN_MODEL_CFG, _build, _make_inputs

    cfg = EasyDict(PVRCNN_MODEL_CFG)
    model = _build()
    voxels, coords, nums, points = _make_inputs(seed=13)
    variables = model.init(
        jax.random.PRNGKey(0), voxels, coords, nums, points)
    variables = jax.tree.map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    _emit_first_stage(sd, variables, cfg)

    # pfe: SA_rawpoints + SA_layers.{k} MLPStacks + fusion Linear/BN
    pp, ps = params["pfe"], stats["pfe"]
    sa_sources = [s for s in cfg.PFE.FEATURES_SOURCE
                  if s not in ("bev", "raw_points")]
    for name, mp in pp.items():
        if name == "SA_rawpoints":
            torch_base = "pfe.SA_rawpoints"
        elif name.startswith("SA_"):
            torch_base = f"pfe.SA_layers.{sa_sources.index(name[3:])}"
        else:
            continue
        for sub, sp in mp.items():
            i = sub.replace("mlps_", "")
            _emit_mlpstack(sd, f"{torch_base}.mlps.{i}", sp, ps[name][sub])
    sd["pfe.vsa_point_feature_fusion.0.weight"] = np.asarray(
        pp["fusion"]["kernel"]).T
    _emit_bn(sd, "pfe.vsa_point_feature_fusion.1", pp["fusion_bn"],
             ps["fusion_bn"])

    # point head simple: one cls stack
    hp, hs = params["point_head"], stats["point_head"]
    n = len(cfg.POINT_HEAD.CLS_FC)
    idx = _emit_fc_bn_stack(sd, "point_head.cls_layers", hp, hs, n,
                            lambda k: False, "cls")
    sd[f"point_head.cls_layers.{idx}.weight"] = np.asarray(
        hp["cls_out"]["kernel"]).T
    sd[f"point_head.cls_layers.{idx}.bias"] = np.asarray(
        hp["cls_out"]["bias"])

    # roi head
    rp, rs = params["roi_head"], stats["roi_head"]
    roi_cfg = cfg.ROI_HEAD
    dp = float(roi_cfg.DP_RATIO)
    for sub, sp in rp["roi_grid_pool"].items():
        i = sub.replace("mlps_", "")
        _emit_mlpstack(sd, f"roi_head.roi_grid_pool_layer.mlps.{i}",
                       sp, rs["roi_grid_pool"][sub])
    n_sh = len(roi_cfg.SHARED_FC)
    _emit_fc_bn_stack(sd, "roi_head.shared_fc_layer", rp, rs, n_sh,
                      lambda k: k != n_sh - 1 and dp > 0, "shared")
    for prefix, torch_name, pred, fc_key in (
        ("cls", "cls_layers", "cls_pred", "CLS_FC"),
        ("reg", "reg_layers", "reg_pred", "REG_FC"),
    ):
        n = len(roi_cfg[fc_key])
        idx = _emit_fc_bn_stack(sd, f"roi_head.{torch_name}", rp, rs, n,
                                lambda k: dp >= 0 and k == 0, prefix)
        sd[f"roi_head.{torch_name}.{idx}.weight"] = np.asarray(
            rp[pred]["kernel"]).T[:, :, None]
        sd[f"roi_head.{torch_name}.{idx}.bias"] = np.asarray(
            rp[pred]["bias"])

    sd = TrackingDict(sd)
    converted = convert_pvrcnn_checkpoint(sd, cfg)
    unread = set(sd.keys()) - sd.read
    assert not unread, sorted(unread)[:10]
    _assert_roundtrip(variables, converted)

    out = model.apply(
        jax.tree.map(jnp.asarray, converted), voxels, coords, nums,
        points, train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def _emit_vector_pool(sd, prefix, vp, vs, cfg):
    """Inverse of ckpt_converter.convert_vector_pool_msg: flax einsum
    kernel (V, red+9, c_agg) -> group-major grouped-Conv1d rows; Dense ->
    Conv1d(out, in, 1)."""
    def emit_conv1d_bn(base, j, dense_name, bn_name, p, s):
        sd[f"{base}.{3 * j}.weight"] = np.asarray(
            p[dense_name]["kernel"]).T[:, :, None]
        _emit_bn(sd, f"{base}.{3 * j + 1}", p[bn_name], s[bn_name])

    for k in range(int(cfg["NUM_GROUPS"])):
        g = cfg[f"GROUP_CFG_{k}"]
        lp, ls = vp[f"layer_{k}"], vs[f"layer_{k}"]
        w = np.asarray(lp["separate_local_aggregation"])  # (V, in, c_agg)
        sd[f"{prefix}.layer_{k}.separate_local_aggregation_layer.0.weight"] = \
            np.ascontiguousarray(
                w.transpose(0, 2, 1).reshape(-1, w.shape[1])[:, :, None])
        _emit_bn(sd, f"{prefix}.layer_{k}.separate_local_aggregation_layer.1",
                 lp["sla_bn"], ls["sla_bn"])
        for j in range(len(g["POST_MLPS"])):
            emit_conv1d_bn(f"{prefix}.layer_{k}.post_mlps", j,
                           f"post_{j}", f"post_bn_{j}", lp, ls)
    for j in range(len(cfg["MSG_POST_MLPS"])):
        emit_conv1d_bn(f"{prefix}.msg_post_mlps", j,
                       f"msg_post_{j}", f"msg_post_bn_{j}", vp, vs)


def test_pvrcnn_pp_converter_roundtrip():
    """PV-RCNN++: VectorPoolAggregationModuleMSG schemas in the PFE
    (SA_rawpoints + SA_layers) and the RoI grid pool, via the
    convert_checkpoint_any PVRCNNPlusPlus dispatch."""
    from ckpt_converter import convert_checkpoint_any
    from test_pvrcnn import _make_inputs
    from test_pvrcnn_pp import GRID, PC_RANGE, VOXEL_SIZE, _pp_cfg

    from pdanet_tpu.models import build_network

    cfg = EasyDict(_pp_cfg())
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=VOXEL_SIZE,
        point_cloud_range=PC_RANGE, class_names=("Car", "Pedestrian"))
    voxels, coords, nums, points = _make_inputs(seed=23)
    variables = model.init(
        jax.random.PRNGKey(0), voxels, coords, nums, points)
    variables = jax.tree.map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    _emit_first_stage(sd, variables, cfg)

    pp, ps = params["pfe"], stats["pfe"]
    sa_sources = [s for s in cfg.PFE.FEATURES_SOURCE
                  if s not in ("bev", "raw_points")]
    for name in pp:
        if name == "SA_rawpoints":
            torch_base, src = "pfe.SA_rawpoints", "raw_points"
        elif name.startswith("SA_"):
            src = name[3:]
            torch_base = f"pfe.SA_layers.{sa_sources.index(src)}"
        else:
            continue
        _emit_vector_pool(sd, torch_base, pp[name], ps[name],
                          cfg.PFE.SA_LAYER[src])
    sd["pfe.vsa_point_feature_fusion.0.weight"] = np.asarray(
        pp["fusion"]["kernel"]).T
    _emit_bn(sd, "pfe.vsa_point_feature_fusion.1", pp["fusion_bn"],
             ps["fusion_bn"])

    hp, hs = params["point_head"], stats["point_head"]
    n = len(cfg.POINT_HEAD.CLS_FC)
    idx = _emit_fc_bn_stack(sd, "point_head.cls_layers", hp, hs, n,
                            lambda k: False, "cls")
    sd[f"point_head.cls_layers.{idx}.weight"] = np.asarray(
        hp["cls_out"]["kernel"]).T
    sd[f"point_head.cls_layers.{idx}.bias"] = np.asarray(
        hp["cls_out"]["bias"])

    rp, rs = params["roi_head"], stats["roi_head"]
    roi_cfg = cfg.ROI_HEAD
    dp = float(roi_cfg.DP_RATIO)
    _emit_vector_pool(sd, "roi_head.roi_grid_pool_layer",
                      rp["roi_grid_pool"], rs["roi_grid_pool"],
                      roi_cfg.ROI_GRID_POOL)
    n_sh = len(roi_cfg.SHARED_FC)
    _emit_fc_bn_stack(sd, "roi_head.shared_fc_layer", rp, rs, n_sh,
                      lambda k: k != n_sh - 1 and dp > 0, "shared")
    for prefix, torch_name, pred, fc_key in (
        ("cls", "cls_layers", "cls_pred", "CLS_FC"),
        ("reg", "reg_layers", "reg_pred", "REG_FC"),
    ):
        n = len(roi_cfg[fc_key])
        idx = _emit_fc_bn_stack(sd, f"roi_head.{torch_name}", rp, rs, n,
                                lambda k: dp >= 0 and k == 0, prefix)
        sd[f"roi_head.{torch_name}.{idx}.weight"] = np.asarray(
            rp[pred]["kernel"]).T[:, :, None]
        sd[f"roi_head.{torch_name}.{idx}.bias"] = np.asarray(
            rp[pred]["bias"])

    sd = TrackingDict(sd)
    converted = convert_checkpoint_any(sd, cfg, num_class=2,
                                       class_names=["Car", "Pedestrian"])
    unread = set(sd.keys()) - sd.read
    assert not unread, sorted(unread)[:10]
    _assert_roundtrip(variables, converted)

    out = model.apply(
        jax.tree.map(jnp.asarray, converted), voxels, coords, nums,
        points, train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def _emit_conv3d_seq(sd, prefix, params, stats, name):
    """flax {Conv_0, BatchNorm_0} block -> torch Sequential .0/.1 with
    spconv 1.x (k,k,k,in,out) passthrough weights."""
    sd[f"{prefix}.0.weight"] = np.asarray(params[name]["Conv_0"]["kernel"])
    _emit_bn(sd, f"{prefix}.1", params[name]["BatchNorm_0"],
             stats[name]["BatchNorm_0"])


def _emit_dense_unet(sd, prefix, bp, bs):
    """Inverse-emit the dense flax UNetV2 variables into the reference
    spconv_unet key schema (encoder + UR decoder; dense ConvTranspose
    kernels mirror back to the spconv orientation)."""
    _emit_conv3d_seq(sd, f"{prefix}.conv_input", bp, bs, "conv_input")
    _emit_conv3d_seq(sd, f"{prefix}.conv1.0", bp, bs, "conv1")
    for lvl in (2, 3, 4):
        _emit_conv3d_seq(sd, f"{prefix}.conv{lvl}.0", bp, bs,
                         f"conv{lvl}_down")
        _emit_conv3d_seq(sd, f"{prefix}.conv{lvl}.1", bp, bs,
                         f"conv{lvl}_a")
        _emit_conv3d_seq(sd, f"{prefix}.conv{lvl}.2", bp, bs,
                         f"conv{lvl}_b")
    if "conv_out" in bp:
        _emit_conv3d_seq(sd, f"{prefix}.conv_out", bp, bs, "conv_out")
    for k in (4, 3, 2, 1):
        up, us = bp[f"ur{k}"], bs[f"ur{k}"]
        for cname, bname in (("conv1", "bn1"), ("conv2", "bn2")):
            sd[f"{prefix}.conv_up_t{k}.{cname}.weight"] = np.asarray(
                up["conv_up_t"][cname]["kernel"])
            _emit_bn(sd, f"{prefix}.conv_up_t{k}.{bname}",
                     up["conv_up_t"][bname], us["conv_up_t"][bname])
        sd[f"{prefix}.conv_up_m{k}.0.weight"] = np.asarray(
            up["conv_up_m"]["Conv_0"]["kernel"])
        _emit_bn(sd, f"{prefix}.conv_up_m{k}.1",
                 up["conv_up_m"]["BatchNorm_0"],
                 us["conv_up_m"]["BatchNorm_0"])
        if k > 1:
            iv, ivs = bp[f"inv_conv{k}"], bs[f"inv_conv{k}"]
            w = np.asarray(iv["ConvTranspose_0"]["kernel"])
            sd[f"{prefix}.inv_conv{k}.0.weight"] = np.ascontiguousarray(
                w[::-1, ::-1, ::-1])
            _emit_bn(sd, f"{prefix}.inv_conv{k}.1",
                     iv["BatchNorm_0"], ivs["BatchNorm_0"])
    _emit_conv3d_seq(sd, f"{prefix}.conv5.0", bp, bs, "conv5")


def test_parta2_converter_roundtrip():
    from ckpt_converter import convert_parta2_checkpoint
    from test_parta2 import GRID, PARTA2_MODEL_CFG, PC_RANGE, VOXEL_SIZE, \
        _make_inputs

    from pdanet_tpu.models import build_network

    cfg = EasyDict(PARTA2_MODEL_CFG)
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=VOXEL_SIZE,
        point_cloud_range=PC_RANGE, class_names=("Car", "Pedestrian"))
    voxels, coords, nums = _make_inputs(seed=17)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    variables = jax.tree.map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    # UNetV2 dense backbone (encoder + decoder)
    _emit_dense_unet(sd, "backbone_3d", params["backbone_3d"],
                     stats["backbone_3d"])

    # BEV RPN first stage
    _emit_bev_backbone(sd, "backbone_2d", params["backbone_2d"],
                       stats["backbone_2d"], cfg.BACKBONE_2D)
    for hname, hp in params["dense_head"].items():
        _emit_conv2d(sd, f"dense_head.{hname}", hp["kernel"], hp["bias"])

    # intra-part point head (CLS_FC/PART_FC empty -> bare final Linear,
    # so batch_stats has no point_head subtree)
    hp, hs = params["point_head"], stats.get("point_head", {})
    for prefix, torch_name, fcs in (
        ("cls", "cls_layers", cfg.POINT_HEAD.CLS_FC),
        ("part", "part_reg_layers", cfg.POINT_HEAD.PART_FC),
    ):
        idx = _emit_fc_bn_stack(sd, f"point_head.{torch_name}", hp, hs,
                                len(fcs), lambda k: False, prefix)
        sd[f"point_head.{torch_name}.{idx}.weight"] = np.asarray(
            hp[f"{prefix}_out"]["kernel"]).T
        sd[f"point_head.{torch_name}.{idx}.bias"] = np.asarray(
            hp[f"{prefix}_out"]["bias"])

    # roi head
    rp, rs = params["roi_head"], stats["roi_head"]
    roi_cfg = cfg.ROI_HEAD
    dp = float(roi_cfg.DP_RATIO)
    for base in ("conv_part", "conv_rpn"):
        for j, suffix in enumerate(("a", "b")):
            _emit_conv3d_seq(sd, f"roi_head.{base}.{j}", rp, rs,
                             f"{base}_{suffix}")
    n_sh = len(roi_cfg.SHARED_FC)
    _emit_fc_bn_stack(sd, "roi_head.shared_fc_layer", rp, rs, n_sh,
                      lambda k: k != n_sh - 1 and dp > 0, "shared")
    for prefix, torch_name, pred, fcs in (
        ("cls", "cls_layers", "cls_pred", roi_cfg.CLS_FC),
        ("reg", "reg_layers", "reg_pred", roi_cfg.REG_FC),
    ):
        idx = _emit_fc_bn_stack(sd, f"roi_head.{torch_name}", rp, rs,
                                len(fcs), lambda k: dp >= 0 and k == 0,
                                prefix)
        sd[f"roi_head.{torch_name}.{idx}.weight"] = np.asarray(
            rp[pred]["kernel"]).T[:, :, None]
        sd[f"roi_head.{torch_name}.{idx}.bias"] = np.asarray(
            rp[pred]["bias"])

    sd = TrackingDict(sd)
    converted = convert_parta2_checkpoint(sd, cfg, anchor=True)
    unread = set(sd.keys()) - sd.read
    assert not unread, sorted(unread)[:10]
    _assert_roundtrip(variables, converted)

    out = model.apply(
        jax.tree.map(jnp.asarray, converted), voxels, coords, nums,
        train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def test_deconv3d_torch_activation_parity():
    """_deconv3d_kernel mirror rule + the UpConv3D padding law
    ``(k-1-p, k-1-p+op)`` vs torch ConvTranspose3d twins of the dense
    UNetV2 ``inv_conv`` stages: a pad-1 inverse (lax (1,2)) and the
    conv4 z-pad-0 inverse (lax (2,3)).  flax SAME would be (2,1) — one
    voxel off; this test pins the corrected geometry."""
    import pytest
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    from ckpt_converter import _deconv3d_kernel

    cin, cout, D = 5, 3, 4
    torch.manual_seed(3)
    x = np.random.RandomState(7).randn(2, cin, D, D, D).astype(np.float32)
    for p, op, pad in ((1, 1, (1, 2)), (0, 1, (2, 3))):
        ref = torch.nn.ConvTranspose3d(cin, cout, 3, stride=2, padding=p,
                                       output_padding=op, bias=False)
        ref.eval()
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x)).numpy()

        # torch ConvTranspose3d weight is (in, out, k, k, k); emit it in
        # the spconv 1.x (k, k, k, in, out) layout the converter expects
        w = ref.weight.detach().numpy().transpose(2, 3, 4, 0, 1)
        kernel = _deconv3d_kernel(w, cin, cout)

        class Up(nn.Module):
            @nn.compact
            def __call__(self, xx):
                return nn.ConvTranspose(
                    cout, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                    padding=(pad,) * 3, use_bias=False)(xx)

        y = Up().apply(
            {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(kernel)}}},
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 4, 1, 2, 3), y_ref, atol=2e-5,
            err_msg=f"p={p} op={op}")


def test_vector_pool_torch_activation_parity():
    """convert_vector_pool_msg weight mapping vs a torch twin of the
    VectorPoolAggregationModuleMSG parameterized pipeline
    (pointnet2_stack/pointnet2_modules.py:279-293,451-470): grouped
    Conv1d -> BN -> ReLU -> post Conv1d+BN+ReLU per group, concat + xyz,
    msg_post Conv1d+BN+ReLU.  The data-dependent interpolation is pinned
    by test_pvrcnn_pp.test_local_interpolate_oracle; here it is replaced
    (monkeypatched on both sides with the same closed form) so the test
    isolates the group-major kernel reshape and BN folding."""
    import pytest
    torch = pytest.importorskip("torch")

    from ckpt_converter import TorchTree, convert_vector_pool_msg

    from pdanet_tpu.models.backbones_3d.pfe import vector_pool

    cfg = EasyDict({
        "NUM_GROUPS": 2,
        "LOCAL_AGGREGATION_TYPE": "local_interpolation",
        "NUM_REDUCED_CHANNELS": 2,
        "NUM_CHANNELS_OF_LOCAL_AGGREGATION": 4,
        "MSG_POST_MLPS": [16, 8],
        "GROUP_CFG_0": {"NUM_LOCAL_VOXEL": [2, 2, 2],
                        "MAX_NEIGHBOR_DISTANCE": 0.6,
                        "NEIGHBOR_NSAMPLE": -1, "POST_MLPS": [8, 8]},
        "GROUP_CFG_1": {"NUM_LOCAL_VOXEL": [3, 1, 1],
                        "MAX_NEIGHBOR_DISTANCE": 1.2,
                        "NEIGHBOR_NSAMPLE": -1, "POST_MLPS": [8]},
    })
    red = 2
    B, N, M = 1, 16, 6
    rng = np.random.RandomState(5)
    xyz = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    feats = rng.rand(B, N, 2 * red).astype(np.float32)
    new_xyz = rng.uniform(-1, 1, (B, M, 3)).astype(np.float32)

    def fake_vec(support_xyz, support_features, grid_centers, max_dist):
        # deterministic closed form of the (C + 9)-channel vec tensor
        G = grid_centers.shape[1]
        C = support_features.shape[-1]
        cols = jnp.arange(C + 9, dtype=jnp.float32)
        base = jnp.sin(grid_centers.sum(-1) * 3.1 + float(max_dist))
        return base[..., None] * (0.1 + 0.05 * cols) + 0.02 * jnp.cos(
            grid_centers[..., :1] * cols
        )

    # ---- torch twin ----
    torch.manual_seed(11)
    groups = []
    for k in range(2):
        g = cfg[f"GROUP_CFG_{k}"]
        V = int(np.prod(g.NUM_LOCAL_VOXEL))
        c_agg = cfg.NUM_CHANNELS_OF_LOCAL_AGGREGATION
        sla = torch.nn.Sequential(
            torch.nn.Conv1d(V * (red + 9), V * c_agg, 1, groups=V,
                            bias=False),
            torch.nn.BatchNorm1d(V * c_agg),
            torch.nn.ReLU(),
        )
        posts = []
        c_in = V * c_agg
        for f in g.POST_MLPS:
            posts += [torch.nn.Conv1d(c_in, f, 1, bias=False),
                      torch.nn.BatchNorm1d(f), torch.nn.ReLU()]
            c_in = f
        groups.append((sla, torch.nn.Sequential(*posts), V, g))
    msg_posts = []
    c_in = sum(g.POST_MLPS[-1] for _, _, _, g in groups) + 3
    for f in cfg.MSG_POST_MLPS:
        msg_posts += [torch.nn.Conv1d(c_in, f, 1, bias=False),
                      torch.nn.BatchNorm1d(f), torch.nn.ReLU()]
        c_in = f
    msg_post = torch.nn.Sequential(*msg_posts)
    all_bns = [m for seq in
               [s for s, p, _, _ in groups] + [p for s, p, _, _ in groups]
               + [msg_post] for m in seq
               if isinstance(m, torch.nn.BatchNorm1d)]
    with torch.no_grad():
        for bn in all_bns:
            bn.running_mean.uniform_(-0.2, 0.2)
            bn.running_var.uniform_(0.5, 2.0)
    for seq, post, _, _ in groups:
        seq.eval(), post.eval()
    msg_post.eval()

    outs = []
    for (sla, post, V, g) in groups:
        offs = vector_pool.dense_grid_offsets(
            g.MAX_NEIGHBOR_DISTANCE, g.NUM_LOCAL_VOXEL)
        centers = (new_xyz[:, :, None, :] + offs[None, None]).reshape(
            B, M * V, 3)
        vec = np.asarray(fake_vec(
            jnp.asarray(xyz), jnp.asarray(feats[..., :red]),
            jnp.asarray(centers),
            g.MAX_NEIGHBOR_DISTANCE * 2.0,
        )).reshape(B, M, V * (red + 9))
        x = torch.from_numpy(vec.reshape(M, -1).T[None])  # (1, V*(C+9), M)
        with torch.no_grad():
            outs.append(post(sla(x)))
    cat = torch.cat(outs + [torch.from_numpy(new_xyz[0].T[None])], dim=1)
    with torch.no_grad():
        y_ref = msg_post(cat).numpy()[0].T  # (M, C_out)

    # ---- emit the reference-layout state dict ----
    sd = {}
    for k, (sla, post, V, g) in enumerate(groups):
        sd[f"layer_{k}.separate_local_aggregation_layer.0.weight"] = \
            sla[0].weight.detach().numpy()
        bn = sla[1]
        sd[f"layer_{k}.separate_local_aggregation_layer.1.weight"] = \
            bn.weight.detach().numpy()
        sd[f"layer_{k}.separate_local_aggregation_layer.1.bias"] = \
            bn.bias.detach().numpy()
        sd[f"layer_{k}.separate_local_aggregation_layer.1.running_mean"] = \
            bn.running_mean.numpy()
        sd[f"layer_{k}.separate_local_aggregation_layer.1.running_var"] = \
            bn.running_var.numpy()
        for j in range(len(g.POST_MLPS)):
            sd[f"layer_{k}.post_mlps.{3 * j}.weight"] = \
                post[3 * j].weight.detach().numpy()
            bn = post[3 * j + 1]
            for attr, nm in (("weight", "weight"), ("bias", "bias"),
                             ("running_mean", "running_mean"),
                             ("running_var", "running_var")):
                sd[f"layer_{k}.post_mlps.{3 * j + 1}.{nm}"] = getattr(
                    bn, attr).detach().numpy()
    for j in range(len(cfg.MSG_POST_MLPS)):
        sd[f"msg_post_mlps.{3 * j}.weight"] = \
            msg_post[3 * j].weight.detach().numpy()
        bn = msg_post[3 * j + 1]
        for nm in ("weight", "bias", "running_mean", "running_var"):
            sd[f"msg_post_mlps.{3 * j + 1}.{nm}"] = getattr(
                bn, nm).detach().numpy()

    tracking = TrackingDict(sd)
    params, stats = convert_vector_pool_msg(TorchTree(tracking), cfg)
    assert not (set(sd) - tracking.read), sorted(set(sd) - tracking.read)[:5]

    # ---- flax side with the interpolation monkeypatched ----
    real = vector_pool.local_interpolate
    vector_pool.local_interpolate = fake_vec
    try:
        mod = vector_pool.VectorPoolAggregationModuleMSG(
            input_channels=2 * red, config=cfg)
        y = mod.apply(
            {"params": jax.tree.map(jnp.asarray, params),
             "batch_stats": jax.tree.map(jnp.asarray, stats)},
            jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(new_xyz),
        )
    finally:
        vector_pool.local_interpolate = real
    np.testing.assert_allclose(np.asarray(y)[0], y_ref, atol=2e-5)


def test_sparse_voxel_backbone_converter_structure():
    """convert_sparse_voxel_backbone maps the full spconv key schema
    (both subm blocks per level) onto SparseVoxelBackBone8x: tree paths
    match a real init, all keys consumed, spconv biases fold into BN
    means, and a live apply runs."""
    from ckpt_converter import TorchTree, convert_sparse_voxel_backbone

    from pdanet_tpu.models.backbones_3d.sparse_backbone import (
        SparseVoxelBackBone8x,
    )

    widths = [4, 4, 8, 12, 12]
    c_out = 16
    c_in = 4
    grid = (16, 16, 8)  # nx, ny, nz
    rng = np.random.RandomState(31)

    def emit_seq(sd, prefix, cin, cout, k=(3, 3, 3), bias=False):
        sd[prefix + ".0.weight"] = rng.randn(*k, cin, cout).astype(
            np.float32)
        if bias:
            sd[prefix + ".0.bias"] = rng.randn(cout).astype(np.float32)
        sd[prefix + ".1.weight"] = rng.rand(cout).astype(np.float32)
        sd[prefix + ".1.bias"] = rng.randn(cout).astype(np.float32)
        sd[prefix + ".1.running_mean"] = rng.randn(cout).astype(np.float32)
        sd[prefix + ".1.running_var"] = rng.rand(cout).astype(np.float32)

    sd = {}
    emit_seq(sd, "conv_input", c_in, widths[0], bias=True)
    emit_seq(sd, "conv1.0", widths[0], widths[1])
    for lvl, cin, cout in ((2, widths[1], widths[2]),
                           (3, widths[2], widths[3]),
                           (4, widths[3], widths[4])):
        emit_seq(sd, f"conv{lvl}.0", cin, cout)
        emit_seq(sd, f"conv{lvl}.1", cout, cout)
        emit_seq(sd, f"conv{lvl}.2", cout, cout)
    emit_seq(sd, "conv_out", widths[4], c_out, k=(3, 1, 1))

    tracking = TrackingDict(sd)
    params, stats = convert_sparse_voxel_backbone(
        TorchTree(tracking), widths, c_out, input_channels=c_in)
    unread = set(sd) - tracking.read
    assert not unread, sorted(unread)[:10]

    # bias folding: conv_input's BN mean shifted by the conv bias
    np.testing.assert_allclose(
        stats["conv_input"]["bn"]["mean"],
        sd["conv_input.1.running_mean"] - sd["conv_input.0.bias"],
        rtol=1e-6)
    # tap flattening: row-major (kz, ky, kx) onto K=27
    np.testing.assert_array_equal(
        params["conv1"]["kernel"],
        sd["conv1.0.0.weight"].reshape(27, widths[0], widths[1]))

    model = SparseVoxelBackBone8x(
        model_cfg={"NUM_FILTERS": widths, "NUM_OUTPUT_FEATURES": c_out,
                   "ACTIVE_BUDGETS": [32, 32, 32, 32]},
        input_channels=c_in, grid_size=grid)
    vox = jnp.zeros((1, 32, c_in))
    coords = jnp.zeros((1, 32, 3), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), vox, coords)

    for col, tree in (("params", params), ("batch_stats", stats)):
        want = set(_tree_paths(dict(variables[col])))
        got = set(_tree_paths(tree))
        assert want == got, sorted(want ^ got)[:10]

    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        vox, coords, train=False)
    bev = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(bev)).all()


def test_sparse_voxel_res_backbone_converter_structure():
    """convert_sparse_voxel_res_backbone maps the reference
    VoxelResBackBone8x schema (conv_input, conv1.{0,1} SparseBasicBlocks,
    conv{2..4}.0 downs + .{1,2} res blocks, conv_out) onto
    SparseVoxelResBackBone8x: tree paths match a real init, all keys
    consumed, res-block conv biases fold into BN means, live apply."""
    from ckpt_converter import TorchTree, convert_sparse_voxel_res_backbone

    from pdanet_tpu.models.backbones_3d.sparse_backbone import (
        SparseVoxelResBackBone8x,
    )

    widths = [16, 16, 32, 64, 128]
    rng = np.random.RandomState(37)

    def emit_seq(sd, prefix, cin, cout, k=(3, 3, 3), bias=False):
        sd[prefix + ".0.weight"] = rng.randn(*k, cin, cout).astype(
            np.float32)
        if bias:
            sd[prefix + ".0.bias"] = rng.randn(cout).astype(np.float32)
        sd[prefix + ".1.weight"] = rng.rand(cout).astype(np.float32)
        sd[prefix + ".1.bias"] = rng.randn(cout).astype(np.float32)
        sd[prefix + ".1.running_mean"] = rng.randn(cout).astype(np.float32)
        sd[prefix + ".1.running_var"] = rng.rand(cout).astype(np.float32)

    def emit_res(sd, prefix, c):
        for i in (1, 2):
            sd[f"{prefix}.conv{i}.weight"] = rng.randn(
                3, 3, 3, c, c).astype(np.float32)
            sd[f"{prefix}.conv{i}.bias"] = rng.randn(c).astype(np.float32)
            sd[f"{prefix}.bn{i}.weight"] = rng.rand(c).astype(np.float32)
            sd[f"{prefix}.bn{i}.bias"] = rng.randn(c).astype(np.float32)
            sd[f"{prefix}.bn{i}.running_mean"] = rng.randn(c).astype(
                np.float32)
            sd[f"{prefix}.bn{i}.running_var"] = rng.rand(c).astype(
                np.float32)

    sd = {}
    emit_seq(sd, "conv_input", 4, widths[0], bias=True)
    emit_res(sd, "conv1.0", widths[1])
    emit_res(sd, "conv1.1", widths[1])
    for lvl, cin, cout in ((2, widths[1], widths[2]),
                           (3, widths[2], widths[3]),
                           (4, widths[3], widths[4])):
        emit_seq(sd, f"conv{lvl}.0", cin, cout)
        emit_res(sd, f"conv{lvl}.1", cout)
        emit_res(sd, f"conv{lvl}.2", cout)
    emit_seq(sd, "conv_out", widths[4], 128, k=(3, 1, 1))

    tracking = TrackingDict(sd)
    params, stats = convert_sparse_voxel_res_backbone(
        TorchTree(tracking), input_channels=4)
    assert not (set(sd) - tracking.read), sorted(set(sd) - tracking.read)[:8]

    # bias folding on a res-block BN
    np.testing.assert_allclose(
        stats["res1_a"]["bn1"]["mean"],
        sd["conv1.0.bn1.running_mean"] - sd["conv1.0.conv1.bias"],
        rtol=1e-6)

    model = SparseVoxelResBackBone8x(
        model_cfg={"ACTIVE_BUDGETS": [32, 32, 32, 32]},
        input_channels=4, grid_size=(16, 16, 24))
    vox = jnp.zeros((1, 32, 4))
    coords = jnp.zeros((1, 32, 3), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), vox, coords)
    for col, tree in (("params", params), ("batch_stats", stats)):
        want = set(_tree_paths(dict(variables[col])))
        got = set(_tree_paths(tree))
        assert want == got, sorted(want ^ got)[:10]

    bev, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        vox, coords, train=False)
    assert np.isfinite(np.asarray(bev)).all()
