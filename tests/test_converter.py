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


@pytest.mark.parametrize(
    "d_model,impl",
    [
        (32, None),                 # flax path (hd=8: kernel-ineligible)
        (128, "pallas_interpret"),  # fused-kernel path on converted weights
    ],
)
def test_transformer_layer_torch_activation_parity(d_model, impl):
    """Numerical ground truth for the PDA transformer block AND the
    converter's MultiheadAttention mapping: a reference-shaped torch
    pre-norm layer (PointFormer.py:7-39 — norm1 -> self_attn -> residual
    on the NORMALIZED input -> norm2 -> FFN residual) is run on random
    data, its state_dict converted via ``convert_transformer_layer``, and
    the flax block must reproduce the activations.  The d_model=128 case
    drives the SAME converted checkpoint through the Pallas attention
    route (ops/pallas/attention.py) — torch ground truth for the kernel
    path, not just flax-vs-flax."""
    torch = pytest.importorskip("torch")
    from ckpt_converter import TorchTree, convert_transformer_layer

    from pdanet_tpu.models.blocks import TransformerEncoderLayerPreNorm

    nhead, dim_ff, K, tokens = 4, 64, 16, 6
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
        d_model=d_model, nhead=nhead, dim_feedforward=dim_ff,
        attention_impl=impl)
    # flax layout: (B, M, K, C); tokens axis = K
    x_jax = jnp.asarray(x.numpy().transpose(1, 0, 2))[None]  # (1, tokens, K, C)
    y = np.asarray(blk.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, x_jax, train=False))
    np.testing.assert_allclose(y[0].transpose(1, 0, 2), y_ref, atol=2e-5)


def test_sa_ellipsoid_torch_activation_parity():
    """End-to-end activation parity for the WHOLE PDA SA layer aggregation
    path: a reference-shaped torch twin of
    ``PointnetSAModuleMSG_WithSampling_Ellipsoid`` (pointnet2_modules.py:
    541-954 — grouper channels [abs_xyz|density|dir|feats], DensityNet
    scaling, RPPE position MLP, broadcast global MLP, 4d-concat pre-norm
    transformer over K, maxpool, fin_conv, aggregation + confidence
    stacks) is run on random data with randomized BN running stats; its
    state_dict is converted via ``convert_sa_ellipsoid`` and the flax
    ``SAModuleEllipsoid`` must reproduce new_features and cls_preds.

    Sampling + ball query come from this repo's ops on BOTH sides (those
    are oracle-tested against the CUDA semantics separately), so this
    test pins the branch plumbing: channel concat order, density
    normalization, RPPE layout, global broadcast, token axis."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from ckpt_converter import TorchTree, convert_sa_ellipsoid

    from pdanet_tpu.models.backbones_3d.iassd_backbone import SAModuleEllipsoid
    from pdanet_tpu.ops.ball_query import ball_query
    from pdanet_tpu.ops.sampling import farthest_point_sample

    B, N, M, C = 2, 48, 12, 16
    radii, nsamples = [0.5, 1.0], [4, 8]
    mlps = [[16, 24], [16, 24]]  # d=16, out=24 per scale
    agg_mlp, conf_mlp, num_class = [20], [12], 3

    torch.manual_seed(2)

    def _seq2d(chans):
        layers = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [torch.nn.Conv2d(cin, cout, 1, bias=False),
                       torch.nn.BatchNorm2d(cout), torch.nn.ReLU()]
        return torch.nn.Sequential(*layers)

    def _seq1d(chans, final=None):
        layers = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [torch.nn.Conv1d(cin, cout, 1, bias=False),
                       torch.nn.BatchNorm1d(cout), torch.nn.ReLU()]
        if final is not None:
            layers.append(torch.nn.Conv1d(chans[-1], final, 1, bias=True))
        return torch.nn.Sequential(*layers)

    class RefDensity(torch.nn.Module):
        # PointConvDensitySetAbstraction + DensityNet as executed
        # (pointnet2_modules.py:956-1006): all-ReLU, max-normalized input
        def __init__(self):
            super().__init__()
            dn = torch.nn.Module()
            dn.mlp_convs = torch.nn.ModuleList(
                [torch.nn.Conv2d(a, b, 1) for a, b in
                 ((1, 16), (16, 8), (8, 1))])
            dn.mlp_bns = torch.nn.ModuleList(
                [torch.nn.BatchNorm2d(c) for c in (16, 8, 1)])
            self.densitynet = dn

        def forward(self, grouped_density):  # (B, 1, M, K)
            x = grouped_density / grouped_density.max(dim=3, keepdim=True)[0]
            for conv, bn in zip(self.densitynet.mlp_convs,
                                self.densitynet.mlp_bns):
                x = torch.relu(bn(conv(x)))
            return x

    class RefPreNorm(torch.nn.Module):
        # PointFormer.py:7-39, dropout inert in eval
        def __init__(self, d_model, nhead, dim_ff):
            super().__init__()
            self.self_attn = torch.nn.MultiheadAttention(d_model, nhead)
            self.linear1 = torch.nn.Linear(d_model, dim_ff)
            self.linear2 = torch.nn.Linear(dim_ff, d_model)
            self.norm1 = torch.nn.LayerNorm(d_model)
            self.norm2 = torch.nn.LayerNorm(d_model)

        def forward(self, src):
            src = self.norm1(src)
            src2, _ = self.self_attn(src, src, src)
            src = src + src2
            src = self.norm2(src)
            return src + self.linear2(torch.relu(self.linear1(src)))

    class RefEllipsoidSA(torch.nn.Module):
        def __init__(self):
            super().__init__()
            d = mlps[0][0]
            n_sc = len(radii)
            self.position_mlp = torch.nn.ModuleList(
                [_seq2d([12, d // 2, d]) for _ in range(n_sc)])
            self.global_mlps = torch.nn.ModuleList(
                [_seq2d([3 + C, d, d]) for _ in range(n_sc)])
            self.point_density = torch.nn.ModuleList(
                [RefDensity() for _ in range(n_sc)])
            self.Local_pointformer = torch.nn.ModuleList(
                [RefPreNorm(4 * d, 4, 2 * d) for _ in range(n_sc)])
            self.fin_conv = torch.nn.ModuleList(
                [_seq2d([4 * d, 2 * d, mlps[i][-1]]) for i in range(n_sc)])
            out_ch = sum(m[-1] for m in mlps)
            self.aggregation_layer = _seq1d([out_ch] + agg_mlp)
            self.confidence_layers = _seq1d(
                [agg_mlp[-1]] + conf_mlp, final=num_class)

        def forward(self, xyz, feats_cf, fps_idx, idx_list):
            # xyz (B,N,3); feats_cf (B,C,N); fps_idx (B,M); idx (B,M,K)
            def gather_cf(t, idx):  # (B,C,N) x (B,M) -> (B,C,M)
                return torch.gather(
                    t, 2, idx[:, None, :].expand(t.shape[0], t.shape[1], -1))

            def group_cf(t, idx):  # (B,C,N) x (B,M,K) -> (B,C,M,K)
                Bs, Cs, _ = t.shape
                Ms, Ks = idx.shape[1:]
                flat = torch.gather(
                    t, 2, idx.reshape(Bs, 1, Ms * Ks).expand(Bs, Cs, -1))
                return flat.reshape(Bs, Cs, Ms, Ks)

            new_xyz = gather_cf(xyz.transpose(1, 2), fps_idx).transpose(1, 2)
            new_feat_cf = gather_cf(feats_cf, fps_idx)  # (B,C,M)
            global_feature = torch.cat(
                [new_xyz, new_feat_cf.transpose(1, 2)], dim=-1
            ).transpose(1, 2).unsqueeze(-1)  # (B, 3+C, M, 1)
            outs = []
            for i, (radius, K) in enumerate(zip(radii, nsamples)):
                idx = idx_list[i]
                grouped_xyz = group_cf(xyz.transpose(1, 2), idx)  # (B,3,M,K)
                dist = torch.norm(
                    grouped_xyz.permute(0, 2, 3, 1) - new_xyz.unsqueeze(2),
                    dim=-1)
                density = (torch.exp(-dist ** 2 / (2 * radius ** 2))
                           / (2.5 * radius))[:, None]  # (B,1,M,K)
                direction = (grouped_xyz
                             - new_xyz.transpose(1, 2).unsqueeze(-1)) / radius
                grouped_feats = group_cf(feats_cf, idx)  # (B,C,M,K)
                g_k = self.global_mlps[i](global_feature).repeat(1, 1, 1, K)
                dens_scale = self.point_density[i](density)
                dens_feat = grouped_feats * dens_scale
                ext = new_xyz.unsqueeze(-2).expand(B, M, K, 3)
                new_xyz_k = grouped_xyz.permute(0, 2, 3, 1)
                rppe = torch.cat(
                    [ext, new_xyz_k, ext - new_xyz_k,
                     direction.permute(0, 2, 3, 1)], dim=-1)
                rppe = self.position_mlp[i](rppe.permute(0, 3, 1, 2))
                inp = torch.cat([rppe, dens_feat, grouped_feats, g_k], dim=1)
                D = inp.shape[1]
                tokens = inp.permute(0, 2, 1, 3).reshape(-1, D, K).permute(
                    2, 0, 1)
                tf = self.Local_pointformer[i](tokens).permute(
                    1, 2, 0).reshape(B, M, D, K).transpose(1, 2)
                pooled = F.max_pool2d(tf, kernel_size=[1, K])
                outs.append(self.fin_conv[i](pooled).squeeze(-1))
            nf = self.aggregation_layer(torch.cat(outs, dim=1))
            cls = self.confidence_layers(nf).transpose(1, 2)
            return new_xyz, nf, cls

    ref = RefEllipsoidSA()
    with torch.no_grad():  # real eval-mode BN stats
        for mod in ref.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
    ref.eval()

    rng = np.random.RandomState(7)
    xyz = rng.rand(B, N, 3).astype(np.float32) * 2.0
    feats = rng.randn(B, N, C).astype(np.float32)

    fps_idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), M))
    new_xyz_np = np.take_along_axis(xyz, fps_idx[..., None], axis=1)
    idx_list = [
        np.asarray(ball_query(r, k, jnp.asarray(xyz),
                              jnp.asarray(new_xyz_np)))
        for r, k in zip(radii, nsamples)
    ]

    with torch.no_grad():
        t_new_xyz, t_nf, t_cls = ref(
            torch.from_numpy(xyz),
            torch.from_numpy(feats.transpose(0, 2, 1).copy()),
            torch.from_numpy(fps_idx.astype(np.int64)),
            [torch.from_numpy(i.astype(np.int64)) for i in idx_list],
        )

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_sa_ellipsoid(
        TorchTree(sd), mlps, agg_mlp, conf_mlp)

    blk = SAModuleEllipsoid(
        npoint_list=[M], sample_range_list=[-1], sample_type_list=["D-FPS"],
        radii=radii, nsamples=nsamples, mlps=mlps,
        aggregation_mlp=agg_mlp, confidence_mlp=conf_mlp,
        num_class=num_class)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    new_xyz_j, nf_j, cls_j, samp_idx = blk.apply(
        variables, jnp.asarray(xyz), jnp.asarray(feats), train=False)

    np.testing.assert_array_equal(np.asarray(samp_idx), fps_idx)
    np.testing.assert_allclose(
        np.asarray(new_xyz_j), t_new_xyz.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(nf_j).transpose(0, 2, 1), t_nf.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(cls_j), t_cls.numpy(), atol=2e-4)


def test_sa_withsampling_torch_activation_parity():
    """Activation parity for the IA-SSD SA layer (pointnet2_modules.py:
    1417-1686, layers 0/5): QueryAndGroup rel-xyz grouping, per-scale
    shared Conv2d-BN-ReLU MLP + maxpool over K, concat scales,
    aggregation + confidence Conv1d stacks — torch twin state_dict
    converted via ``convert_sa_withsampling``."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from ckpt_converter import TorchTree, convert_sa_withsampling

    from pdanet_tpu.models.backbones_3d.iassd_backbone import SAModuleWithSampling
    from pdanet_tpu.ops.ball_query import ball_query
    from pdanet_tpu.ops.sampling import farthest_point_sample

    B, N, M, C = 2, 40, 10, 8
    radii, nsamples = [0.6, 1.2], [4, 8]
    mlps = [[C + 3, 12, 16], [C + 3, 12, 16]]
    agg_mlp, conf_mlp, num_class = [24], [12], 3

    torch.manual_seed(3)

    def _seq2d(chans):
        layers = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [torch.nn.Conv2d(cin, cout, 1, bias=False),
                       torch.nn.BatchNorm2d(cout), torch.nn.ReLU()]
        return torch.nn.Sequential(*layers)

    def _seq1d(chans, final=None):
        layers = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [torch.nn.Conv1d(cin, cout, 1, bias=False),
                       torch.nn.BatchNorm1d(cout), torch.nn.ReLU()]
        if final is not None:
            layers.append(torch.nn.Conv1d(chans[-1], final, 1, bias=True))
        return torch.nn.Sequential(*layers)

    class RefSA(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.mlps = torch.nn.ModuleList([_seq2d(m) for m in mlps])
            out_ch = sum(m[-1] for m in mlps)
            self.aggregation_layer = _seq1d([out_ch] + agg_mlp)
            self.confidence_layers = _seq1d(
                [agg_mlp[-1]] + conf_mlp, final=num_class)

        def forward(self, xyz, feats_cf, fps_idx, idx_list):
            def gather_cf(t, idx):
                return torch.gather(
                    t, 2, idx[:, None, :].expand(t.shape[0], t.shape[1], -1))

            def group_cf(t, idx):
                Bs, Cs, _ = t.shape
                Ms, Ks = idx.shape[1:]
                flat = torch.gather(
                    t, 2, idx.reshape(Bs, 1, Ms * Ks).expand(Bs, Cs, -1))
                return flat.reshape(Bs, Cs, Ms, Ks)

            new_xyz = gather_cf(xyz.transpose(1, 2), fps_idx).transpose(1, 2)
            outs = []
            for i, K in enumerate(nsamples):
                idx = idx_list[i]
                # QueryAndGroup (pointnet2_utils.py:671): rel xyz + feats
                grouped_xyz = (group_cf(xyz.transpose(1, 2), idx)
                               - new_xyz.transpose(1, 2).unsqueeze(-1))
                grouped = torch.cat(
                    [grouped_xyz, group_cf(feats_cf, idx)], dim=1)
                h = self.mlps[i](grouped)
                outs.append(
                    F.max_pool2d(h, kernel_size=[1, K]).squeeze(-1))
            nf = self.aggregation_layer(torch.cat(outs, dim=1))
            cls = self.confidence_layers(nf).transpose(1, 2)
            return new_xyz, nf, cls

    ref = RefSA()
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
    ref.eval()

    rng = np.random.RandomState(11)
    xyz = rng.rand(B, N, 3).astype(np.float32) * 2.0
    feats = rng.randn(B, N, C).astype(np.float32)

    fps_idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), M))
    new_xyz_np = np.take_along_axis(xyz, fps_idx[..., None], axis=1)
    idx_list = [
        np.asarray(ball_query(r, k, jnp.asarray(xyz),
                              jnp.asarray(new_xyz_np)))
        for r, k in zip(radii, nsamples)
    ]

    with torch.no_grad():
        t_new_xyz, t_nf, t_cls = ref(
            torch.from_numpy(xyz),
            torch.from_numpy(feats.transpose(0, 2, 1).copy()),
            torch.from_numpy(fps_idx.astype(np.int64)),
            [torch.from_numpy(i.astype(np.int64)) for i in idx_list],
        )

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_sa_withsampling(
        TorchTree(sd), mlps, agg_mlp, conf_mlp)

    blk = SAModuleWithSampling(
        npoint_list=[M], sample_range_list=[-1], sample_type_list=["D-FPS"],
        radii=radii, nsamples=nsamples, mlps=mlps,
        aggregation_mlp=agg_mlp, confidence_mlp=conf_mlp,
        num_class=num_class)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    new_xyz_j, nf_j, cls_j, samp_idx = blk.apply(
        variables, jnp.asarray(xyz), jnp.asarray(feats), train=False)

    np.testing.assert_array_equal(np.asarray(samp_idx), fps_idx)
    np.testing.assert_allclose(
        np.asarray(new_xyz_j), t_new_xyz.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(nf_j).transpose(0, 2, 1), t_nf.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cls_j), t_cls.numpy(), atol=1e-4)


def test_vote_layer_torch_activation_parity():
    """Vote_layer (pointnet2_modules.py:1689-1753) twin: Conv1d-BN-ReLU
    mlp + ctr_reg Conv1d(bias), per-axis offset clamp; converted via
    ``convert_vote_layer``."""
    torch = pytest.importorskip("torch")
    from ckpt_converter import TorchTree, convert_vote_layer

    from pdanet_tpu.models.backbones_3d.iassd_backbone import VoteLayer

    B, N, C = 2, 16, 24
    mlp_list = [12]
    max_range = [3.0, 3.0, 2.0]
    torch.manual_seed(4)

    class RefVote(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.mlp_modules = torch.nn.Sequential(
                torch.nn.Conv1d(C, mlp_list[0], 1, bias=False),
                torch.nn.BatchNorm1d(mlp_list[0]), torch.nn.ReLU())
            self.ctr_reg = torch.nn.Conv1d(mlp_list[0], 3, 1)

        def forward(self, xyz, feats_cf):
            h = self.mlp_modules(feats_cf)
            off = self.ctr_reg(h).transpose(1, 2)  # (B,N,3)
            lim = torch.tensor(max_range).view(1, 1, 3)
            off_lim = torch.where(off > lim, lim, off)
            off_lim = torch.where(off_lim < -lim, -lim, off_lim)
            return xyz + off_lim, xyz, off

    ref = RefVote()
    with torch.no_grad():
        bn = ref.mlp_modules[1]
        bn.running_mean.uniform_(-0.2, 0.2)
        bn.running_var.uniform_(0.5, 2.0)
        # make some raw offsets exceed the clamp so the clamp is exercised
        ref.ctr_reg.bias.uniform_(-4.0, 4.0)
    ref.eval()

    rng = np.random.RandomState(13)
    xyz = rng.rand(B, N, 3).astype(np.float32) * 2.0
    feats = rng.randn(B, N, C).astype(np.float32)

    with torch.no_grad():
        t_vote, t_xyz, t_off = ref(
            torch.from_numpy(xyz),
            torch.from_numpy(feats.transpose(0, 2, 1).copy()))

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_vote_layer(TorchTree(sd), mlp_list)

    blk = VoteLayer(mlp_list=mlp_list, max_translate_range=max_range)
    vote_j, xyz_j, off_j = blk.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(xyz), jnp.asarray(feats), train=False)

    np.testing.assert_allclose(np.asarray(off_j), t_off.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vote_j), t_vote.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(xyz_j), xyz)


def test_binori_coder_torch_parity():
    """encode/decode vs a verbatim-math torch twin of
    ``PointResidual_BinOri_Coder`` (box_coder_utils.py:224-319): mean-size
    diagonal normalization, bin floor/residual normalization on encode,
    argmax-bin + half-interval reconstruction on decode."""
    torch = pytest.importorskip("torch")

    from pdanet_tpu.utils.box_coder_utils import build_box_coder

    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
    nbin = 12
    coder = build_box_coder(
        "PointResidual_BinOri_Coder",
        {"angle_bin_num": nbin, "use_mean_size": True,
         "mean_size": mean_size},
    )
    bin_inter = 2 * np.pi / nbin
    ms = torch.tensor(mean_size)

    def ref_encode(gt, pts, cls):
        gt = gt.clone()
        gt[:, 3:6] = torch.clamp_min(gt[:, 3:6], min=1e-5)
        xg, yg, zg, dxg, dyg, dzg, rg = torch.split(gt[:, :7], 1, dim=-1)
        xa, ya, za = torch.split(pts, 1, dim=-1)
        anchor = ms[cls - 1]
        dxa, dya, dza = torch.split(anchor, 1, dim=-1)
        diag = torch.sqrt(dxa ** 2 + dya ** 2)
        rg = torch.clamp(rg, max=np.pi - 1e-5, min=-np.pi + 1e-5)
        bin_id = torch.floor((rg + np.pi) / bin_inter)
        bin_res = ((rg + np.pi) - (bin_id * bin_inter + bin_inter / 2)) / (
            bin_inter / 2)
        return torch.cat(
            [(xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza,
             torch.log(dxg / dxa), torch.log(dyg / dya),
             torch.log(dzg / dza), bin_id, bin_res], dim=-1)

    def ref_decode(enc, pts, cls):
        xt, yt, zt, dxt, dyt, dzt = torch.split(enc[..., :6], 1, dim=-1)
        xa, ya, za = torch.split(pts, 1, dim=-1)
        anchor = ms[cls - 1]
        dxa, dya, dza = torch.split(anchor, 1, dim=-1)
        diag = torch.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg = torch.exp(dxt) * dxa
        dyg = torch.exp(dyt) * dya
        dzg = torch.exp(dzt) * dza
        _, bin_id = torch.max(enc[..., 6:6 + nbin], dim=-1)
        one_hot = torch.nn.functional.one_hot(bin_id.long(), nbin).float()
        bin_res = torch.sum(enc[..., 6 + nbin:] * one_hot, dim=-1)
        rg = (bin_id.float() * bin_inter - np.pi + bin_inter / 2
              + bin_res * (bin_inter / 2)).unsqueeze(-1)
        return torch.cat([xg, yg, zg, dxg, dyg, dzg, rg], dim=-1)

    rng = np.random.RandomState(5)
    n = 64
    boxes = np.stack(
        [rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
         rng.uniform(-2, 1, n), rng.uniform(1, 5, n),
         rng.uniform(0.5, 2.5, n), rng.uniform(1, 2, n),
         rng.uniform(-np.pi, np.pi, n)], axis=-1).astype(np.float32)
    pts = boxes[:, :3] + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    classes = rng.randint(1, 4, n)

    enc_ref = ref_encode(torch.from_numpy(boxes.copy()),
                         torch.from_numpy(pts),
                         torch.from_numpy(classes)).numpy()
    enc = np.asarray(coder.encode(
        jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(classes)))
    np.testing.assert_allclose(enc, enc_ref, rtol=1e-5, atol=1e-5)

    raw = rng.randn(n, coder.code_size).astype(np.float32)
    dec_ref = ref_decode(torch.from_numpy(raw), torch.from_numpy(pts),
                         torch.from_numpy(classes)).numpy()
    dec = np.asarray(coder.decode(
        jnp.asarray(raw), jnp.asarray(pts), jnp.asarray(classes)))
    np.testing.assert_allclose(dec, dec_ref, rtol=1e-5, atol=1e-5)


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


def _emit_conv2d(sd, key, kernel, bias=None):
    """flax Conv kernel (kh,kw,in,out) -> torch Conv2d weight."""
    sd[key + ".weight"] = np.transpose(np.asarray(kernel), (3, 2, 0, 1))
    if bias is not None:
        sd[key + ".bias"] = np.asarray(bias)


def _emit_deconv2d(sd, key, kernel):
    """Inverse of ckpt_converter._deconv2d_kernel."""
    k = np.asarray(kernel)[::-1, ::-1]
    sd[key + ".weight"] = np.transpose(k, (2, 3, 0, 1))


def test_pillar_vfe_torch_activation_parity():
    """PillarVFE vs a verbatim-math torch twin of the reference
    (pillar_vfe.py:8-121) including the padded-row "phantom" quirk: the
    mask is applied ONCE before the PFN stack, so padded point rows carry
    relu(bn(linear(0))) into the per-pillar max for non-full pillars.
    Two PFN layers exercise the concat (non-last) path; state_dict
    converted via ``convert_pillar_vfe``."""
    torch = pytest.importorskip("torch")
    from ckpt_converter import TorchTree, convert_pillar_vfe

    from pdanet_tpu.models.backbones_3d.vfe.pillar_vfe import PillarVFE
    from pdanet_tpu.utils.easydict import EasyDict

    V, P = 12, 6
    voxel_size = [0.4, 0.4, 4.0]
    pcr = [0.0, -12.8, -3.0, 25.6, 12.8, 1.0]
    num_filters = [8, 16]
    cfg = EasyDict({
        "USE_NORM": True, "WITH_DISTANCE": True, "USE_ABSLOTE_XYZ": True,
        "NUM_FILTERS": num_filters,
    })
    c_in = 4 + 6 + 1  # xyzi + cluster + center + dist

    torch.manual_seed(6)

    class RefPFN(torch.nn.Module):
        def __init__(self, cin, cout, last):
            super().__init__()
            self.last = last
            out = cout if last else cout // 2
            self.linear = torch.nn.Linear(cin, out, bias=False)
            self.norm = torch.nn.BatchNorm1d(out, eps=1e-3, momentum=0.01)

        def forward(self, x):  # (V, P, C)
            x = self.linear(x)
            x = self.norm(x.permute(0, 2, 1)).permute(0, 2, 1)
            x = torch.relu(x)
            x_max = torch.max(x, dim=1, keepdim=True)[0]
            if self.last:
                return x_max
            return torch.cat([x, x_max.repeat(1, x.shape[1], 1)], dim=2)

    class RefVFE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            chans = [c_in] + num_filters
            self.pfn_layers = torch.nn.ModuleList([
                RefPFN(chans[i], chans[i + 1],
                       last=(i >= len(chans) - 2))
                for i in range(len(chans) - 1)
            ])

        def forward(self, voxels, coords, counts):
            # voxels (V, P, 4); coords (V, 4) bzyx; counts (V,)
            points_mean = (voxels[:, :, :3].sum(1, keepdim=True)
                           / counts.type_as(voxels).view(-1, 1, 1))
            f_cluster = voxels[:, :, :3] - points_mean
            f_center = torch.zeros_like(voxels[:, :, :3])
            f_center[:, :, 0] = voxels[:, :, 0] - (
                coords[:, 3].type_as(voxels).unsqueeze(1) * voxel_size[0]
                + (voxel_size[0] / 2 + pcr[0]))
            f_center[:, :, 1] = voxels[:, :, 1] - (
                coords[:, 2].type_as(voxels).unsqueeze(1) * voxel_size[1]
                + (voxel_size[1] / 2 + pcr[1]))
            f_center[:, :, 2] = voxels[:, :, 2] - (
                coords[:, 1].type_as(voxels).unsqueeze(1) * voxel_size[2]
                + (voxel_size[2] / 2 + pcr[2]))
            dist = torch.norm(voxels[:, :, :3], 2, 2, keepdim=True)
            features = torch.cat(
                [voxels, f_cluster, f_center, dist], dim=-1)
            mask = (torch.arange(P).view(1, P)
                    < counts.unsqueeze(1)).unsqueeze(-1).type_as(voxels)
            features = features * mask
            for pfn in self.pfn_layers:
                features = pfn(features)
            return features.squeeze(1)  # (V, C_out)

    ref = RefVFE()
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
                # negative bias would relu phantom rows to zero; keep it
                # positive so the quirk actually bites
                mod.bias.uniform_(0.1, 0.5)
    ref.eval()

    rng = np.random.RandomState(17)
    voxels = rng.uniform(
        [0, -12, -3, 0], [25, 12, 1, 1], (V, P, 4)).astype(np.float32)
    coords = np.stack([
        np.zeros(V, np.int32),                      # batch
        np.zeros(V, np.int32),                      # z
        rng.randint(0, 64, V).astype(np.int32),     # y
        rng.randint(0, 64, V).astype(np.int32),     # x
    ], axis=1)
    counts = rng.randint(1, P + 1, V).astype(np.int32)
    counts[:2] = P  # a couple of full pillars (no phantom row)
    assert (counts < P).any()
    pmask = np.arange(P)[None, :] < counts[:, None]
    voxels = voxels * pmask[..., None]

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(voxels), torch.from_numpy(coords),
                    torch.from_numpy(counts)).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_pillar_vfe(TorchTree(sd), num_filters)

    vfe = PillarVFE(model_cfg=dict(cfg), num_point_features=4,
                    voxel_size=voxel_size, point_cloud_range=pcr)
    y = np.asarray(vfe.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(voxels)[None], jnp.asarray(coords[:, 1:])[None],
        jnp.asarray(counts)[None], train=False))
    np.testing.assert_allclose(y[0], y_ref, atol=2e-5)


def test_bev_backbone_torch_activation_parity():
    """BaseBEVBackbone vs a reference-structured torch twin
    (base_bev_backbone.py:6-107): ZeroPad2d+Conv blocks, ConvTranspose2d
    deblocks (k == stride), multi-scale concat.  Pins the
    ``_deconv2d_kernel`` spatial flip and the blocks.{i}.{1,2,4+3k,5+3k}
    Sequential indexing via ``convert_bev_backbone``."""
    torch = pytest.importorskip("torch")
    from ckpt_converter import TorchTree, convert_bev_backbone

    from pdanet_tpu.models.backbones_2d.base_bev_backbone import (
        BaseBEVBackbone,
    )
    from pdanet_tpu.utils.easydict import EasyDict

    c_in, H = 6, 16
    cfg = EasyDict({
        "LAYER_NUMS": [1, 2], "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [8, 16], "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [8, 8],
    })
    torch.manual_seed(8)

    def make_block(cin, cout, stride, layer_num):
        layers = [
            torch.nn.ZeroPad2d(1),
            torch.nn.Conv2d(cin, cout, 3, stride=stride, padding=0,
                            bias=False),
            torch.nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01),
            torch.nn.ReLU(),
        ]
        for _ in range(layer_num):
            layers += [
                torch.nn.Conv2d(cout, cout, 3, padding=1, bias=False),
                torch.nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01),
                torch.nn.ReLU(),
            ]
        return torch.nn.Sequential(*layers)

    class RefBEV(torch.nn.Module):
        def __init__(self):
            super().__init__()
            cins = [c_in] + list(cfg.NUM_FILTERS[:-1])
            self.blocks = torch.nn.ModuleList([
                make_block(cins[i], cfg.NUM_FILTERS[i],
                           cfg.LAYER_STRIDES[i], cfg.LAYER_NUMS[i])
                for i in range(2)
            ])
            self.deblocks = torch.nn.ModuleList([
                torch.nn.Sequential(
                    torch.nn.ConvTranspose2d(
                        cfg.NUM_FILTERS[i], cfg.NUM_UPSAMPLE_FILTERS[i],
                        cfg.UPSAMPLE_STRIDES[i],
                        stride=cfg.UPSAMPLE_STRIDES[i], bias=False),
                    torch.nn.BatchNorm2d(cfg.NUM_UPSAMPLE_FILTERS[i],
                                         eps=1e-3, momentum=0.01),
                    torch.nn.ReLU(),
                ) for i in range(2)
            ])

        def forward(self, x):
            ups = []
            for i in range(2):
                x = self.blocks[i](x)
                ups.append(self.deblocks[i](x))
            return torch.cat(ups, dim=1)

    ref = RefBEV()
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
    ref.eval()

    x = np.random.RandomState(19).randn(2, c_in, H, H).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()  # (B, C, H, W)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_bev_backbone(TorchTree(sd), cfg)

    net = BaseBEVBackbone(model_cfg=dict(cfg), input_channels=c_in)
    y = np.asarray(net.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(y.transpose(0, 3, 1, 2), y_ref, atol=2e-5)


def test_bev_backbone_downsample_and_final_deblock_parity():
    """The stride<1 deblock branch (Conv2d downsample,
    base_bev_backbone.py:60-69) and the extra final deblock
    (len(UPSAMPLE_STRIDES) > num_levels, reference :72-78)."""
    torch = pytest.importorskip("torch")
    from ckpt_converter import TorchTree, convert_bev_backbone

    from pdanet_tpu.models.backbones_2d.base_bev_backbone import (
        BaseBEVBackbone,
    )
    from pdanet_tpu.utils.easydict import EasyDict

    c_in, H = 4, 16
    cfg = EasyDict({
        "LAYER_NUMS": [1], "LAYER_STRIDES": [1], "NUM_FILTERS": [8],
        "UPSAMPLE_STRIDES": [0.5, 2], "NUM_UPSAMPLE_FILTERS": [8],
    })
    torch.manual_seed(9)

    class RefBEV(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = torch.nn.ModuleList([torch.nn.Sequential(
                torch.nn.ZeroPad2d(1),
                torch.nn.Conv2d(c_in, 8, 3, stride=1, padding=0,
                                bias=False),
                torch.nn.BatchNorm2d(8, eps=1e-3, momentum=0.01),
                torch.nn.ReLU(),
                torch.nn.Conv2d(8, 8, 3, padding=1, bias=False),
                torch.nn.BatchNorm2d(8, eps=1e-3, momentum=0.01),
                torch.nn.ReLU(),
            )])
            self.deblocks = torch.nn.ModuleList([
                torch.nn.Sequential(  # stride 0.5 -> Conv2d(k=2, s=2)
                    torch.nn.Conv2d(8, 8, 2, stride=2, bias=False),
                    torch.nn.BatchNorm2d(8, eps=1e-3, momentum=0.01),
                    torch.nn.ReLU(),
                ),
                torch.nn.Sequential(  # extra final deblock
                    torch.nn.ConvTranspose2d(8, 8, 2, stride=2,
                                             bias=False),
                    torch.nn.BatchNorm2d(8, eps=1e-3, momentum=0.01),
                    torch.nn.ReLU(),
                ),
            ])

        def forward(self, x):
            x = self.deblocks[0](self.blocks[0](x))
            return self.deblocks[1](x)

    ref = RefBEV()
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
    ref.eval()

    x = np.random.RandomState(23).randn(1, c_in, H, H).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_bev_backbone(TorchTree(sd), cfg)

    net = BaseBEVBackbone(model_cfg=dict(cfg), input_channels=c_in)
    y = np.asarray(net.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(y.transpose(0, 3, 1, 2), y_ref, atol=2e-5)


def test_pointpillar_converter_roundtrip():
    """Full-model structural roundtrip for ``convert_pointpillar_checkpoint``
    on the PointPillar tiny config: inverse-emit a torch-layout state_dict
    from the real flax variables, convert, and require an exact tree/value
    match + full key consumption + a live forward."""
    from ckpt_converter import convert_pointpillar_checkpoint

    from pdanet_tpu.models import build_network
    from pdanet_tpu.utils.easydict import EasyDict
    from test_pointpillar import GRID, PCR, PP_MODEL_CFG, VOXEL

    cfg = EasyDict(PP_MODEL_CFG)
    model = build_network(
        cfg, num_class=2, input_channels=4, grid_size=GRID,
        voxel_size=tuple(VOXEL), point_cloud_range=tuple(PCR))
    V, P = 32, 8
    voxels = np.zeros((1, V, P, 4), np.float32)
    coords = np.full((1, V, 3), -1, np.int32)
    counts = np.zeros((1, V), np.int32)
    coords[0, :4] = [[0, 5, 7], [0, 9, 2], [0, 30, 40], [0, 63, 63]]
    counts[0, :4] = [3, 8, 1, 5]
    voxels[0, :4, :, :3] = np.random.RandomState(3).uniform(
        0, 1, (4, P, 3))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(voxels), jnp.asarray(coords),
        jnp.asarray(counts))
    variables = jax.tree.map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    # vfe
    for name, lp in params["vfe"].items():
        i = name.replace("pfn_layers_", "")
        sd[f"vfe.pfn_layers.{i}.linear.weight"] = np.asarray(
            lp["linear"]["kernel"]).T
        _emit_bn(sd, f"vfe.pfn_layers.{i}.norm", lp["norm"],
                 stats["vfe"][name]["norm"])
    # backbone_2d
    bb_p = params["backbone_2d"]
    bb_s = stats["backbone_2d"]
    bcfg = cfg.BACKBONE_2D
    for idx in range(len(bcfg.LAYER_NUMS)):
        _emit_conv2d(sd, f"backbone_2d.blocks.{idx}.1",
                     bb_p[f"blocks_{idx}_down"]["conv"]["kernel"])
        _emit_bn(sd, f"backbone_2d.blocks.{idx}.2",
                 bb_p[f"blocks_{idx}_down"]["bn"],
                 bb_s[f"blocks_{idx}_down"]["bn"])
        for k in range(bcfg.LAYER_NUMS[idx]):
            _emit_conv2d(sd, f"backbone_2d.blocks.{idx}.{4 + 3 * k}",
                         bb_p[f"blocks_{idx}_{k}"]["conv"]["kernel"])
            _emit_bn(sd, f"backbone_2d.blocks.{idx}.{5 + 3 * k}",
                     bb_p[f"blocks_{idx}_{k}"]["bn"],
                     bb_s[f"blocks_{idx}_{k}"]["bn"])
        _emit_deconv2d(sd, f"backbone_2d.deblocks.{idx}.0",
                       bb_p[f"deblocks_{idx}_deconv"]["kernel"])
        _emit_bn(sd, f"backbone_2d.deblocks.{idx}.1",
                 {"scale": bb_p[f"deblocks_{idx}_bn"]["scale"],
                  "bias": bb_p[f"deblocks_{idx}_bn"]["bias"]},
                 bb_s[f"deblocks_{idx}_bn"])
    # dense head
    for hname, hp in params["dense_head"].items():
        _emit_conv2d(sd, f"dense_head.{hname}", hp["kernel"], hp["bias"])

    sd = TrackingDict(sd)
    converted = convert_pointpillar_checkpoint(sd, cfg)

    unread = set(sd.keys()) - sd.read
    assert not unread, sorted(unread)[:10]

    for col in ("params", "batch_stats"):
        want = _tree_paths(variables[col])
        got = _tree_paths(converted[col])
        assert set(want) == set(got), (
            sorted(set(want) ^ set(got))[:10])
        for path, arr in want.items():
            np.testing.assert_allclose(
                np.asarray(got[path]), np.asarray(arr), rtol=1e-6,
                err_msg=str(path))

    out = model.apply(
        converted, jnp.asarray(voxels), jnp.asarray(coords),
        jnp.asarray(counts), train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def test_second_backbone_converter_structure():
    """``convert_voxel_backbone_dense`` maps the reference's spconv
    VoxelBackBone8x key schema (spconv_backbone.py:70-120: conv_input,
    conv{1..4} post_act_block stacks, conv_out) onto the dense flax
    analogue: tree paths match the real model init, ALL reference keys
    are consumed (down + both subm blocks per level), and spconv 2.x
    native (out, in)-minor weights are transposed."""
    from ckpt_converter import TorchTree, convert_voxel_backbone_dense

    from pdanet_tpu.models.backbones_3d.voxel_backbone import VoxelBackBone8x

    widths = [4, 4, 8, 12, 12]
    c_out = 16
    c_in = 4
    grid = (16, 16, 8)  # nx, ny, nz
    rng = np.random.RandomState(29)

    def emit_seq(sd, prefix, cin, cout, k=(3, 3, 3)):
        sd[prefix + ".0.weight"] = rng.randn(*k, cin, cout).astype(
            np.float32)
        sd[prefix + ".1.weight"] = rng.rand(cout).astype(np.float32)
        sd[prefix + ".1.bias"] = rng.randn(cout).astype(np.float32)
        sd[prefix + ".1.running_mean"] = rng.randn(cout).astype(np.float32)
        sd[prefix + ".1.running_var"] = rng.rand(cout).astype(np.float32)

    sd = {}
    emit_seq(sd, "conv_input", c_in, widths[0])
    emit_seq(sd, "conv1.0", widths[0], widths[1])
    for lvl, cin, cout in (("conv2", widths[1], widths[2]),
                           ("conv3", widths[2], widths[3]),
                           ("conv4", widths[3], widths[4])):
        emit_seq(sd, f"{lvl}.0", cin, cout)
        emit_seq(sd, f"{lvl}.1", cout, cout)
        emit_seq(sd, f"{lvl}.2", cout, cout)
    emit_seq(sd, "conv_out", widths[4], c_out, k=(3, 1, 1))

    tracking = TrackingDict(sd)
    params, stats = convert_voxel_backbone_dense(
        TorchTree(tracking), widths, c_out, input_channels=c_in)

    assert not (set(sd) - tracking.read), sorted(set(sd) - tracking.read)[:8]

    model = VoxelBackBone8x(
        model_cfg={"NUM_FILTERS": widths, "NUM_OUTPUT_FEATURES": c_out},
        input_channels=c_in, grid_size=grid)
    vox = jnp.zeros((1, 32, c_in))
    coords = jnp.zeros((1, 32, 3), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), vox, coords)

    for col, tree in (("params", params), ("batch_stats", stats)):
        want = set(_tree_paths(dict(variables[col])))
        got = set(_tree_paths(tree))
        assert want == got, sorted(want ^ got)[:10]

    # shape sanity through a live apply
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        vox, coords, train=False)

    # spconv 2.x native layout: (k,k,k,out,in) gets transposed back
    w2 = rng.randn(3, 3, 3, widths[2], widths[1]).astype(np.float32)
    sd2 = dict(sd)
    sd2["conv2.0.0.weight"] = w2
    p2, _ = convert_voxel_backbone_dense(
        TorchTree(sd2), widths, c_out, input_channels=c_in)
    np.testing.assert_array_equal(
        p2["conv2_down"]["Conv_0"]["kernel"], np.swapaxes(w2, -1, -2))


def _emit_conv3d_spconv(sd, key, kernel, bias=None):
    """flax Conv kernel (k1,k2,k3,in,out) == spconv 1.x layout; emitted
    as-is (the dense analogue assumes spconv's dense-equivalent
    cross-correlation orientation)."""
    sd[key + ".weight"] = np.asarray(kernel)
    if bias is not None:
        sd[key + ".bias"] = np.asarray(bias)


def test_res_block3d_torch_activation_parity():
    """ResBlock3D vs a dense torch twin of SparseBasicBlock
    (spconv_backbone.py:30-67): Conv3d(k=3, pad=1, WITH bias)-BN-ReLU ->
    Conv3d-BN -> +identity -> ReLU.  The twin's conv biases are folded
    into the BN running means by ``convert_res_block3d`` — parity here
    proves the fold is exact."""
    torch = pytest.importorskip("torch")
    from ckpt_converter import TorchTree, convert_res_block3d

    from pdanet_tpu.models.backbones_3d.voxel_backbone import ResBlock3D

    C, D = 6, 5
    torch.manual_seed(12)

    class RefBlock(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv3d(C, C, 3, padding=1, bias=True)
            self.bn1 = torch.nn.BatchNorm3d(C, eps=1e-3, momentum=0.01)
            self.conv2 = torch.nn.Conv3d(C, C, 3, padding=1, bias=True)
            self.bn2 = torch.nn.BatchNorm3d(C, eps=1e-3, momentum=0.01)

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(x + out)

    ref = RefBlock()
    with torch.no_grad():
        for bn in (ref.bn1, ref.bn2):
            bn.running_mean.uniform_(-0.2, 0.2)
            bn.running_var.uniform_(0.5, 2.0)
        ref.conv1.bias.uniform_(-0.5, 0.5)
        ref.conv2.bias.uniform_(-0.5, 0.5)
    ref.eval()

    x = np.random.RandomState(31).randn(2, C, D, D, D).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    sd = {}
    for name in ("conv1", "conv2"):
        w = getattr(ref, name).weight.detach().numpy()  # (out,in,k,k,k)
        sd[f"{name}.weight"] = np.transpose(w, (2, 3, 4, 1, 0))
        sd[f"{name}.bias"] = getattr(ref, name).bias.detach().numpy()
    for name in ("bn1", "bn2"):
        bn = getattr(ref, name)
        sd[f"{name}.weight"] = bn.weight.detach().numpy()
        sd[f"{name}.bias"] = bn.bias.detach().numpy()
        sd[f"{name}.running_mean"] = bn.running_mean.numpy()
        sd[f"{name}.running_var"] = bn.running_var.numpy()

    params, stats = {}, {}
    convert_res_block3d(TorchTree(sd), "blk", params, stats)

    blk = ResBlock3D(C)
    y = np.asarray(blk.apply(
        {"params": jax.tree.map(jnp.asarray, params["blk"]),
         "batch_stats": jax.tree.map(jnp.asarray, stats["blk"])},
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False))
    np.testing.assert_allclose(y.transpose(0, 4, 1, 2, 3), y_ref, atol=3e-5)


def test_center_head_torch_activation_parity():
    """CenterHeadNet vs a reference-structured torch twin
    (center_head.py:11-101): shared Conv-BN-ReLU, per-head fc stacks of
    [Conv2d-BN-ReLU] Sequentials + bare final Conv2d; converted via
    ``convert_center_head``."""
    torch = pytest.importorskip("torch")
    from ckpt_converter import TorchTree, convert_center_head

    from pdanet_tpu.models.dense_heads.center_head import CenterHeadNet
    from pdanet_tpu.utils.easydict import EasyDict
    from test_centerpoint import CP_MODEL_CFG

    head_cfg = EasyDict(
        {k: v for k, v in CP_MODEL_CFG["DENSE_HEAD"].items()})
    c_in, sc = 8, int(head_cfg.SHARED_CONV_CHANNEL)
    n_each = [2]
    use_bias = bool(head_cfg.USE_BIAS_BEFORE_NORM)
    torch.manual_seed(14)

    def sep_stack(cout, num_conv):
        fc = []
        for _ in range(num_conv - 1):
            fc.append(torch.nn.Sequential(
                torch.nn.Conv2d(sc, sc, 3, padding=1, bias=use_bias),
                torch.nn.BatchNorm2d(sc), torch.nn.ReLU()))
        fc.append(torch.nn.Conv2d(sc, cout, 3, padding=1, bias=True))
        return torch.nn.Sequential(*fc)

    class RefSepHead(torch.nn.Module):
        def __init__(self, hd):
            super().__init__()
            self.hd = hd
            for name, spec in hd.items():
                setattr(self, name, sep_stack(int(spec["out_channels"]),
                                              int(spec["num_conv"])))

        def forward(self, x):
            return {n: getattr(self, n)(x) for n in self.hd}

    class RefCenterHead(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.shared_conv = torch.nn.Sequential(
                torch.nn.Conv2d(c_in, sc, 3, padding=1, bias=use_bias),
                torch.nn.BatchNorm2d(sc), torch.nn.ReLU())
            hd = {k: dict(v) for k, v in
                  dict(head_cfg.SEPARATE_HEAD_CFG.HEAD_DICT).items()}
            hd["hm"] = {"out_channels": n_each[0],
                        "num_conv": int(head_cfg.NUM_HM_CONV)}
            self.heads_list = torch.nn.ModuleList([RefSepHead(hd)])

        def forward(self, x):
            x = self.shared_conv(x)
            return [h(x) for h in self.heads_list]

    ref = RefCenterHead()
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
    ref.eval()

    x = np.random.RandomState(37).randn(2, c_in, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_center_head(TorchTree(sd), head_cfg, n_each)

    net = CenterHeadNet(
        model_cfg=dict(head_cfg), num_class_each_head=n_each,
        head_order=list(head_cfg.SEPARATE_HEAD_CFG.HEAD_ORDER),
        head_dict=dict(head_cfg.SEPARATE_HEAD_CFG.HEAD_DICT))
    preds = net.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(preds) == 1
    for name, t_val in ref_out[0].items():
        np.testing.assert_allclose(
            np.asarray(preds[0][name]).transpose(0, 3, 1, 2),
            t_val.numpy(), atol=2e-5, err_msg=name)


def test_centerpoint_converter_roundtrip():
    """Full-model roundtrip for ``convert_centerpoint_checkpoint`` on the
    CenterPoint tiny config: inverse-emit a torch/spconv-layout
    state_dict from the real flax variables (zero conv biases inside the
    residual blocks — the fold then reproduces the means exactly),
    convert, exact tree/value match + full consumption + live forward."""
    from ckpt_converter import convert_centerpoint_checkpoint

    from pdanet_tpu.utils.easydict import EasyDict
    from test_centerpoint import CP_MODEL_CFG, _build, _make_inputs

    cfg = EasyDict(CP_MODEL_CFG)
    model = _build()
    voxels, coords, nums = _make_inputs()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(voxels), jnp.asarray(coords),
        jnp.asarray(nums))
    variables = jax.tree.map(np.asarray, dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}
    # backbone_3d
    bp, bs = params["backbone_3d"], stats["backbone_3d"]

    def emit_seq3d(flax_name, torch_prefix):
        _emit_conv3d_spconv(sd, torch_prefix + ".0",
                            bp[flax_name]["Conv_0"]["kernel"])
        _emit_bn(sd, torch_prefix + ".1",
                 bp[flax_name]["BatchNorm_0"],
                 bs[flax_name]["BatchNorm_0"])

    def emit_res(flax_name, torch_prefix):
        for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
            k = bp[flax_name][conv]["kernel"]
            _emit_conv3d_spconv(
                sd, f"{torch_prefix}.{conv}", k,
                bias=np.zeros(k.shape[-1], np.float32))
            _emit_bn(sd, f"{torch_prefix}.{bn}", bp[flax_name][bn],
                     bs[flax_name][bn])

    emit_seq3d("conv_input", "backbone_3d.conv_input")
    emit_res("res1_a", "backbone_3d.conv1.0")
    emit_res("res1_b", "backbone_3d.conv1.1")
    for lvl in (2, 3, 4):
        emit_seq3d(f"conv{lvl}_down", f"backbone_3d.conv{lvl}.0")
        emit_res(f"res{lvl}_a", f"backbone_3d.conv{lvl}.1")
        emit_res(f"res{lvl}_b", f"backbone_3d.conv{lvl}.2")
    emit_seq3d("conv_out", "backbone_3d.conv_out")

    # backbone_2d (single level, deconv upsample)
    bb_p, bb_s = params["backbone_2d"], stats["backbone_2d"]
    bcfg = cfg.BACKBONE_2D
    for idx in range(len(bcfg.LAYER_NUMS)):
        _emit_conv2d(sd, f"backbone_2d.blocks.{idx}.1",
                     bb_p[f"blocks_{idx}_down"]["conv"]["kernel"])
        _emit_bn(sd, f"backbone_2d.blocks.{idx}.2",
                 bb_p[f"blocks_{idx}_down"]["bn"],
                 bb_s[f"blocks_{idx}_down"]["bn"])
        for k in range(bcfg.LAYER_NUMS[idx]):
            _emit_conv2d(sd, f"backbone_2d.blocks.{idx}.{4 + 3 * k}",
                         bb_p[f"blocks_{idx}_{k}"]["conv"]["kernel"])
            _emit_bn(sd, f"backbone_2d.blocks.{idx}.{5 + 3 * k}",
                     bb_p[f"blocks_{idx}_{k}"]["bn"],
                     bb_s[f"blocks_{idx}_{k}"]["bn"])
        _emit_deconv2d(sd, f"backbone_2d.deblocks.{idx}.0",
                       bb_p[f"deblocks_{idx}_deconv"]["kernel"])
        _emit_bn(sd, f"backbone_2d.deblocks.{idx}.1",
                 bb_p[f"deblocks_{idx}_bn"], bb_s[f"deblocks_{idx}_bn"])

    # dense_head
    hp, hs = params["dense_head"], stats["dense_head"]
    _emit_conv2d(sd, "dense_head.shared_conv.0",
                 hp["shared_conv"]["kernel"],
                 hp["shared_conv"].get("bias"))
    _emit_bn(sd, "dense_head.shared_conv.1", hp["shared_bn"],
             hs["shared_bn"])
    head_dict = {k: dict(v) for k, v in
                 dict(cfg.DENSE_HEAD.SEPARATE_HEAD_CFG.HEAD_DICT).items()}
    head_dict["hm"] = {"out_channels": 2,
                       "num_conv": int(cfg.DENSE_HEAD.NUM_HM_CONV)}
    for i in range(1):
        for name, spec in head_dict.items():
            nc = int(spec["num_conv"])
            for k in range(nc - 1):
                lp = hp[f"head_{i}"][f"{name}_conv{k}"]
                _emit_conv2d(sd,
                             f"dense_head.heads_list.{i}.{name}.{k}.0",
                             lp["kernel"], lp.get("bias"))
                _emit_bn(sd, f"dense_head.heads_list.{i}.{name}.{k}.1",
                         hp[f"head_{i}"][f"{name}_bn{k}"],
                         hs[f"head_{i}"][f"{name}_bn{k}"])
            fin = hp[f"head_{i}"][f"{name}_out"]
            _emit_conv2d(sd, f"dense_head.heads_list.{i}.{name}.{nc - 1}",
                         fin["kernel"], fin["bias"])

    sd = TrackingDict(sd)
    converted = convert_centerpoint_checkpoint(
        sd, cfg, class_names=["Car", "Pedestrian"])

    unread = set(sd.keys()) - sd.read
    assert not unread, sorted(unread)[:10]

    for col in ("params", "batch_stats"):
        want = _tree_paths(variables[col])
        got = _tree_paths(converted[col])
        assert set(want) == set(got), sorted(set(want) ^ set(got))[:10]
        for path, arr in want.items():
            np.testing.assert_allclose(
                np.asarray(got[path]), np.asarray(arr), rtol=1e-6,
                err_msg=str(path))

    out = model.apply(
        converted, jnp.asarray(voxels), jnp.asarray(coords),
        jnp.asarray(nums), train=False)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
