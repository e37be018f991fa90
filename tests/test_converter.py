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
import jax.numpy as jnp

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


def test_transformer_layer_torch_activation_parity():
    """Numerical ground truth for the PDA transformer block AND the
    converter's MultiheadAttention mapping: a reference-shaped torch
    pre-norm layer (PointFormer.py:7-39 — norm1 -> self_attn -> residual
    on the NORMALIZED input -> norm2 -> FFN residual) is run on random
    data, its state_dict converted via ``convert_transformer_layer``, and
    the flax block must reproduce the activations."""
    torch = pytest.importorskip("torch")
    from ckpt_converter import TorchTree, convert_transformer_layer

    from pdanet_tpu.models.blocks import TransformerEncoderLayerPreNorm

    d_model, nhead, dim_ff, K, tokens = 32, 4, 64, 16, 6
    torch.manual_seed(0)

    class RefPreNorm(torch.nn.Module):
        # same module set + dataflow as the reference layer; dropout is
        # inert in eval mode
        def __init__(self):
            super().__init__()
            self.self_attn = torch.nn.MultiheadAttention(d_model, nhead)
            self.linear1 = torch.nn.Linear(d_model, dim_ff)
            self.linear2 = torch.nn.Linear(dim_ff, d_model)
            self.norm1 = torch.nn.LayerNorm(d_model)
            self.norm2 = torch.nn.LayerNorm(d_model)

        def forward(self, src):  # (K, B*N, C)
            src = self.norm1(src)
            src2, _ = self.self_attn(src, src, src)
            src = src + src2
            src = self.norm2(src)
            return src + self.linear2(torch.relu(self.linear1(src)))

    ref = RefPreNorm().eval()
    x = torch.randn(K, tokens, d_model)
    with torch.no_grad():
        y_ref = ref(x).numpy()  # (K, tokens, C)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_transformer_layer(TorchTree(sd), d_model, nhead)

    blk = TransformerEncoderLayerPreNorm(
        d_model=d_model, nhead=nhead, dim_feedforward=dim_ff)
    # flax layout: (B, M, K, C); tokens axis = K
    x_jax = jnp.asarray(x.numpy().transpose(1, 0, 2))[None]  # (1, tokens, K, C)
    y = np.asarray(blk.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, x_jax, train=False))
    np.testing.assert_allclose(y[0].transpose(1, 0, 2), y_ref, atol=2e-5)


def test_densitynet_torch_activation_parity():
    """DensityNet vs a reference-shaped torch twin (pointnet2_modules.py:
    956-979): Conv2d-1x1 + BatchNorm2d + ReLU for every layer including
    the last (the sigmoid branch is dead there), eval-mode running stats."""
    torch = pytest.importorskip("torch")
    from ckpt_converter import TorchTree, convert_densitynet

    from pdanet_tpu.models.blocks import DensityNet

    torch.manual_seed(1)

    class RefDensityNet(torch.nn.Module):
        def __init__(self, hidden=(16, 8)):
            super().__init__()
            chans = (1,) + tuple(hidden) + (1,)
            self.mlp_convs = torch.nn.ModuleList(
                [torch.nn.Conv2d(chans[i], chans[i + 1], 1)
                 for i in range(len(chans) - 1)])
            self.mlp_bns = torch.nn.ModuleList(
                [torch.nn.BatchNorm2d(c) for c in chans[1:]])

        def forward(self, x):  # (B, 1, N, K)
            for conv, bn in zip(self.mlp_convs, self.mlp_bns):
                x = torch.relu(bn(conv(x)))
            return x

    ref = RefDensityNet()
    # randomize running stats so eval-mode BN is a real check
    with torch.no_grad():
        for bn in ref.mlp_bns:
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.5, 0.5)
    ref.eval()

    x = torch.rand(2, 1, 5, 7)
    with torch.no_grad():
        y_ref = ref(x).numpy()  # (B, 1, N, K)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_densitynet(TorchTree(sd))

    dn = DensityNet()
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # (B, N, K, 1)
    y = np.asarray(dn.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        x_jax, train=False))
    np.testing.assert_allclose(y.transpose(0, 3, 1, 2), y_ref, atol=1e-5)
