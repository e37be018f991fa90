"""Structural validation of the torch->JAX checkpoint converter
(tools/ckpt_converter.py): build a synthetic torch-layout state_dict by
INVERTING the converter's mapping from the tiny model's real flax
variables, convert it, and require (a) an exact tree/value match against
the original variables and (b) that every synthetic torch key was
consumed.  This pins the name/layout mapping without needing a real
reference .pth (none is publicly available in this environment)."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from model_cfg import tiny_model_cfg  # noqa: E402


def _emit_dense(sd, key, p, conv_dim=2):
    """flax Dense {kernel (in,out)[, bias]} -> torch conv/linear arrays."""
    w = np.asarray(p["kernel"]).T  # (out, in)
    if conv_dim == 3:
        w = w[:, :, None]
    elif conv_dim == 4:
        w = w[:, :, None, None]
    sd[key + ".weight"] = w
    if "bias" in p:
        sd[key + ".bias"] = np.asarray(p["bias"])


def _emit_bn(sd, key, p, s):
    sd[key + ".weight"] = np.asarray(p["scale"])
    sd[key + ".bias"] = np.asarray(p["bias"])
    sd[key + ".running_mean"] = np.asarray(s["mean"])
    sd[key + ".running_var"] = np.asarray(s["var"])


def _emit_mlp_stack(sd, prefix, params, stats, conv_dim=4, stride=3,
                    start=0):
    for name, lp in params.items():
        j = int(name.replace("layer", ""))
        _emit_dense(sd, f"{prefix}.{start + stride * j}", lp["dense"],
                    conv_dim)
        _emit_bn(sd, f"{prefix}.{start + stride * j + 1}", lp["bn"],
                 stats[name]["bn"])


def _emit_densitynet(sd, prefix, params, stats):
    for j in range(3):
        _emit_dense(sd, f"{prefix}.mlp_convs.{j}", params[f"conv{j}"], 4)
        sd[f"{prefix}.mlp_bns.{j}.weight"] = np.asarray(
            params[f"bn{j}"]["scale"])
        sd[f"{prefix}.mlp_bns.{j}.bias"] = np.asarray(params[f"bn{j}"]["bias"])
        sd[f"{prefix}.mlp_bns.{j}.running_mean"] = np.asarray(
            stats[f"bn{j}"]["mean"])
        sd[f"{prefix}.mlp_bns.{j}.running_var"] = np.asarray(
            stats[f"bn{j}"]["var"])


def _emit_transformer(sd, prefix, params):
    d = np.asarray(params["norm1"]["scale"]).shape[0]
    attn = params["self_attn"]
    in_w, in_b = [], []
    for name in ("query", "key", "value"):
        k = np.asarray(attn[name]["kernel"]).reshape(d, d)  # (in, nh*hd)
        in_w.append(k.T)
        in_b.append(np.asarray(attn[name]["bias"]).reshape(d))
    sd[prefix + ".self_attn.in_proj_weight"] = np.concatenate(in_w, 0)
    sd[prefix + ".self_attn.in_proj_bias"] = np.concatenate(in_b, 0)
    out_k = np.asarray(attn["out"]["kernel"]).reshape(d, d)  # (nh*hd, out)
    sd[prefix + ".self_attn.out_proj.weight"] = out_k.T
    sd[prefix + ".self_attn.out_proj.bias"] = np.asarray(attn["out"]["bias"])
    for nrm in ("norm1", "norm2"):
        sd[f"{prefix}.{nrm}.weight"] = np.asarray(params[nrm]["scale"])
        sd[f"{prefix}.{nrm}.bias"] = np.asarray(params[nrm]["bias"])
    for lin in ("linear1", "linear2"):
        sd[f"{prefix}.{lin}.weight"] = np.asarray(params[lin]["kernel"]).T
        sd[f"{prefix}.{lin}.bias"] = np.asarray(params[lin]["bias"])


def build_torch_state_dict(variables, model_cfg):
    """Inverse of convert_checkpoint for the tiny IASSD config."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sd = {}

    bb_p, bb_s = params["backbone_3d"], stats["backbone_3d"]
    for mod_name, mp in bb_p.items():
        k = int(mod_name.replace("SA_modules_", ""))
        ms = bb_s.get(mod_name, {})
        tp = f"backbone_3d.SA_modules.{k}"
        for sub, sp in mp.items():
            if sub.startswith("mlps_"):
                i = sub.split("_")[-1]
                _emit_mlp_stack(sd, f"{tp}.mlps.{i}", sp, ms[sub], 4)
            elif sub.startswith("position_mlp_"):
                i = sub.split("_")[-1]
                _emit_mlp_stack(sd, f"{tp}.position_mlp.{i}", sp, ms[sub], 4)
            elif sub.startswith("global_mlps_"):
                i = sub.split("_")[-1]
                _emit_mlp_stack(sd, f"{tp}.global_mlps.{i}", sp, ms[sub], 4)
            elif sub.startswith("fin_conv_"):
                i = sub.split("_")[-1]
                _emit_mlp_stack(sd, f"{tp}.fin_conv.{i}", sp, ms[sub], 4)
            elif sub.startswith("point_density_"):
                i = sub.split("_")[-1]
                _emit_densitynet(
                    sd, f"{tp}.point_density.{i}.densitynet", sp, ms[sub]
                )
            elif sub.startswith("Local_pointformer_"):
                i = sub.split("_")[-1]
                _emit_transformer(sd, f"{tp}.Local_pointformer.{i}", sp)
            elif sub == "aggregation_layer":
                _emit_mlp_stack(sd, f"{tp}.aggregation_layer", sp, ms[sub], 3)
            elif sub == "confidence_mlp":
                _emit_mlp_stack(sd, f"{tp}.confidence_layers", sp, ms[sub], 3)
            elif sub == "confidence_out":
                n = len(mp["confidence_mlp"])
                _emit_dense(sd, f"{tp}.confidence_layers.{3 * n}", sp, 3)
            elif sub == "mlp_modules":
                _emit_mlp_stack(sd, f"{tp}.mlp_modules", sp, ms[sub], 3)
            elif sub == "ctr_reg":
                _emit_dense(sd, f"{tp}.ctr_reg", sp, 3)
            else:
                raise AssertionError(f"unmapped backbone subtree {sub}")

    hp, hs = params["point_head"], stats["point_head"]
    for stack, out, fc in (
        ("cls_center_layers", "cls_center_out", "CLS_FC"),
        ("box_center_layers", "box_center_out", "REG_FC"),
    ):
        _emit_mlp_stack(sd, f"point_head.{stack}", hp[stack], hs[stack], 2)
        n = len(list(model_cfg.POINT_HEAD[fc]))
        _emit_dense(sd, f"point_head.{stack}.{3 * n}", hp[out], 2)
    return sd


class TrackingDict(dict):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.read = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_tree_paths(v, prefix + (k,)))
        return out
    return {prefix: tree}


def test_converter_roundtrip_tiny_config():
    from ckpt_converter import convert_checkpoint

    from pdanet_tpu.models import build_network

    cfg = tiny_model_cfg()
    model = build_network(cfg, num_class=3, input_channels=4)
    pts = np.random.RandomState(0).rand(1, 128, 4).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), pts)
    variables = jax.tree.map(np.asarray, dict(variables))

    sd = TrackingDict(build_torch_state_dict(variables, cfg))
    converted = convert_checkpoint(sd, cfg, num_class=3, input_channels=4)

    # every synthetic reference key consumed
    unread = set(sd.keys()) - sd.read
    assert not unread, sorted(unread)[:10]

    # exact structural + numerical match against the original variables
    for col in ("params", "batch_stats"):
        want = _tree_paths({
            "backbone_3d": variables[col]["backbone_3d"],
            "point_head": variables[col]["point_head"],
        })
        got = _tree_paths(converted[col])
        missing = set(want) - set(got)
        extra = set(got) - set(want)
        assert not missing, sorted(missing)[:10]
        assert not extra, sorted(extra)[:10]
        for path, arr in want.items():
            np.testing.assert_allclose(
                np.asarray(got[path]), np.asarray(arr), rtol=1e-6,
                err_msg=str(path),
            )

    # the converted variables drive a real forward pass
    out = model.apply(converted, pts, train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
