"""FULL-MODEL activation parity: a reference-shaped torch twin of the entire
tiny PDA-SSD — the 6-layer SA backbone (IASSD_backbone.py:9-240) plus the
IASSD prediction head MLPs (IASSD_head.py:28-43) — against the flax model
running from the twin's state_dict through ``convert_checkpoint``.

tests/test_converter.py pins each layer's numerics with per-module twins;
what those cannot catch is the INTER-layer plumbing of the reference's
backbone loop (IASSD_backbone.py:96-170): which ``encoder_xyz``/
``encoder_features`` entry feeds which layer (``LAYER_INPUT``), the
ctr-aware cls-score chain across layers, the ``CTR_INDEX`` ctr_xyz route
into the final center-grouping layer, the vote-layer insertion, the PDA
placement rule (WithSampling at k<1 or k>4, Ellipsoid at 1..4), and the
head's ``centers_features`` hand-off.  A wiring mistake there (e.g. feeding
layer 5 from the wrong encoder slot) could still overfit fixtures and still
round-trip the converter — only a composed forward exposes it.

Index discipline: sampling indices are extracted from the flax run
(``capture_intermediates``) and the ball-query index lists recomputed with
this repo's oracle-tested ops from the flax coordinate chain, then fed to
BOTH sides.  The index-producing ops are covered by their own CUDA-semantics
oracles; sharing indices removes the only discontinuous operations, so every
remaining op is continuous and the two frameworks must agree to fp tolerance
end to end.

This is also the first NUMERICAL end-to-end exercise of
``convert_checkpoint`` on a full reference-shaped state_dict (ModuleList key
surface ``backbone_3d.SA_modules.{k}.*`` + ``point_head.*``), complementing
the structural roundtrip in tests/test_converter.py.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from model_cfg import tiny_model_cfg

from pdanet_tpu.utils.easydict import EasyDict


def _build_torch_twin(torch, sa_cfg, head_cfg, num_class, code_size,
                      input_channels=4):
    """Reference-shaped torch modules with the exact state_dict key surface
    convert_checkpoint expects (pointnet2_modules.py attribute names)."""
    nn = torch.nn

    def seq2d(chans):
        layers = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [nn.Conv2d(cin, cout, 1, bias=False),
                       nn.BatchNorm2d(cout), nn.ReLU()]
        return nn.Sequential(*layers)

    def seq1d(chans, final=None):
        layers = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [nn.Conv1d(cin, cout, 1, bias=False),
                       nn.BatchNorm1d(cout), nn.ReLU()]
        if final is not None:
            layers.append(nn.Conv1d(chans[-1], final, 1, bias=True))
        return nn.Sequential(*layers)

    def fc_stack(cin, fcs, out):
        layers = []
        for c in fcs:
            layers += [nn.Linear(cin, c, bias=False),
                       nn.BatchNorm1d(c), nn.ReLU()]
            cin = c
        layers.append(nn.Linear(cin, out, bias=True))
        return nn.Sequential(*layers)

    class DensityTwin(nn.Module):
        # PointConvDensitySetAbstraction DensityNet as executed
        # (pointnet2_modules.py:956-1006): all-ReLU, max-normalized input
        def __init__(self):
            super().__init__()
            dn = nn.Module()
            dn.mlp_convs = nn.ModuleList(
                [nn.Conv2d(a, b, 1) for a, b in ((1, 16), (16, 8), (8, 1))])
            dn.mlp_bns = nn.ModuleList(
                [nn.BatchNorm2d(c) for c in (16, 8, 1)])
            self.densitynet = dn

        def forward(self, x):  # (B, 1, M, K) max-normalized density
            for conv, bn in zip(self.densitynet.mlp_convs,
                                self.densitynet.mlp_bns):
                x = torch.relu(bn(conv(x)))
            return x

    class PreNormTwin(nn.Module):
        # PointFormer.py:7-39 (norm-then-residual quirk), dropout inert
        def __init__(self, d_model, nhead, dim_ff):
            super().__init__()
            self.self_attn = nn.MultiheadAttention(d_model, nhead)
            self.linear1 = nn.Linear(d_model, dim_ff)
            self.linear2 = nn.Linear(dim_ff, d_model)
            self.norm1 = nn.LayerNorm(d_model)
            self.norm2 = nn.LayerNorm(d_model)

        def forward(self, src):  # (K, B*M, C) tokens
            src = self.norm1(src)
            src2, _ = self.self_attn(src, src, src)
            src = src + src2
            src = self.norm2(src)
            return src + self.linear2(torch.relu(self.linear1(src)))

    # per-layer channel bookkeeping, identical to convert_checkpoint
    channel_in = input_channels - 3
    channel_out_list = [channel_in]
    sa_modules = nn.ModuleList()
    layer_meta = []  # ("with"|"ellipsoid"|"gather"|"vote", specs...)
    for k in range(len(sa_cfg.NSAMPLE_LIST)):
        li = sa_cfg.LAYER_INPUT[k]
        cin = channel_out_list[li[-1] if isinstance(li, list) else li]
        mod = nn.Module()
        if sa_cfg.LAYER_TYPE[k] == "SA_Layer":
            mlps = [[cin] + list(m) for m in sa_cfg.MLPS[k]]
            channel_out = sum(m[-1] for m in mlps) if mlps else cin
            agg = (list(sa_cfg.AGGREGATION_MLPS[k])
                   if sa_cfg.AGGREGATION_MLPS[k] and sa_cfg.MLPS[k] else None)
            conf = (list(sa_cfg.CONFIDENCE_MLPS[k])
                    if sa_cfg.CONFIDENCE_MLPS[k] and sa_cfg.MLPS[k] else None)
            if agg:
                channel_out = agg[-1]
            if not mlps:
                layer_meta.append(("gather",))
            elif k < 1 or k > 4:
                # IA-SSD WithSampling layer: +3 use_xyz concat
                mod.mlps = nn.ModuleList(
                    [seq2d([m[0] + 3] + m[1:]) for m in mlps])
                out_ch = sum(m[-1] for m in mlps)
                if agg:
                    mod.aggregation_layer = seq1d([out_ch] + agg)
                    out_ch = agg[-1]
                if conf:
                    mod.confidence_layers = seq1d(
                        [out_ch] + conf, final=num_class)
                layer_meta.append(("with", mlps, agg, conf))
            else:
                d = cin
                n_sc = len(mlps)
                mod.position_mlp = nn.ModuleList(
                    [seq2d([12, d // 2, d]) for _ in range(n_sc)])
                mod.global_mlps = nn.ModuleList(
                    [seq2d([3 + cin, d, d]) for _ in range(n_sc)])
                mod.point_density = nn.ModuleList(
                    [DensityTwin() for _ in range(n_sc)])
                mod.Local_pointformer = nn.ModuleList(
                    [PreNormTwin(4 * d, 4, 2 * d) for _ in range(n_sc)])
                mod.fin_conv = nn.ModuleList(
                    [seq2d([4 * d, 2 * d, m[-1]]) for m in mlps])
                out_ch = sum(m[-1] for m in mlps)
                if agg:
                    mod.aggregation_layer = seq1d([out_ch] + agg)
                    out_ch = agg[-1]
                if conf:
                    mod.confidence_layers = seq1d(
                        [out_ch] + conf, final=num_class)
                layer_meta.append(("ellipsoid", mlps, agg, conf))
        else:  # Vote_Layer
            mlist = list(sa_cfg.MLPS[k])
            mod.mlp_modules = seq1d([cin] + mlist)
            mod.ctr_reg = nn.Conv1d(mlist[-1], 3, 1, bias=True)
            channel_out = channel_out_list[li]
            layer_meta.append(("vote", mlist))
        sa_modules.append(mod)
        channel_out_list.append(channel_out)

    model = nn.Module()
    model.backbone_3d = nn.Module()
    model.backbone_3d.SA_modules = sa_modules
    model.point_head = nn.Module()
    model.point_head.cls_center_layers = fc_stack(
        channel_out_list[-1], list(head_cfg.CLS_FC), num_class)
    model.point_head.box_center_layers = fc_stack(
        channel_out_list[-1], list(head_cfg.REG_FC), code_size)
    return model, layer_meta


def _gather_cf(torch, t, idx):  # (B,C,N) x (B,M) -> (B,C,M)
    return torch.gather(
        t, 2, idx[:, None, :].expand(t.shape[0], t.shape[1], -1))


def _group_cf(torch, t, idx):  # (B,C,N) x (B,M,K) -> (B,C,M,K)
    B, C, _ = t.shape
    M, K = idx.shape[1:]
    flat = torch.gather(t, 2, idx.reshape(B, 1, M * K).expand(B, C, -1))
    return flat.reshape(B, C, M, K)


def _twin_sa_with(torch, mod, xyz, feats_cf, samp_idx, idx_list, nsamples,
                  ctr_xyz=None):
    """WithSampling forward (pointnet2_modules.py:1417-1686)."""
    import torch.nn.functional as F
    if ctr_xyz is None:
        new_xyz = _gather_cf(
            torch, xyz.transpose(1, 2), samp_idx).transpose(1, 2)
    else:
        new_xyz = ctr_xyz
    outs = []
    for i, K in enumerate(nsamples):
        idx = idx_list[i]
        grouped_xyz = (_group_cf(torch, xyz.transpose(1, 2), idx)
                       - new_xyz.transpose(1, 2).unsqueeze(-1))
        grouped = torch.cat(
            [grouped_xyz, _group_cf(torch, feats_cf, idx)], dim=1)
        h = mod.mlps[i](grouped)
        outs.append(F.max_pool2d(h, kernel_size=[1, K]).squeeze(-1))
    nf = torch.cat(outs, dim=1)
    if hasattr(mod, "aggregation_layer"):
        nf = mod.aggregation_layer(nf)
    cls = (mod.confidence_layers(nf).transpose(1, 2)
           if hasattr(mod, "confidence_layers") else None)
    return new_xyz, nf, cls


def _twin_sa_ellipsoid(torch, mod, xyz, feats_cf, samp_idx, idx_list,
                       radii, nsamples, mlps):
    """PDA Ellipsoid forward (pointnet2_modules.py:541-954)."""
    import torch.nn.functional as F
    B = xyz.shape[0]
    M = samp_idx.shape[1]
    new_xyz = _gather_cf(torch, xyz.transpose(1, 2), samp_idx).transpose(1, 2)
    new_feat_cf = _gather_cf(torch, feats_cf, samp_idx)  # (B,C,M)
    global_feature = torch.cat(
        [new_xyz, new_feat_cf.transpose(1, 2)], dim=-1
    ).transpose(1, 2).unsqueeze(-1)  # (B, 3+C, M, 1)
    outs = []
    for i, (radius, K) in enumerate(zip(radii, nsamples)):
        idx = idx_list[i]
        grouped_xyz = _group_cf(torch, xyz.transpose(1, 2), idx)  # (B,3,M,K)
        dist = torch.norm(
            grouped_xyz.permute(0, 2, 3, 1) - new_xyz.unsqueeze(2), dim=-1)
        density = (torch.exp(-dist ** 2 / (2 * radius ** 2))
                   / (2.5 * radius))[:, None]  # (B,1,M,K)
        direction = (grouped_xyz
                     - new_xyz.transpose(1, 2).unsqueeze(-1)) / radius
        grouped_feats = _group_cf(torch, feats_cf, idx)  # (B,C,M,K)
        g_k = mod.global_mlps[i](global_feature).repeat(1, 1, 1, K)
        dens_in = density / density.max(dim=3, keepdim=True)[0]
        dens_feat = grouped_feats * mod.point_density[i](dens_in)
        ext = new_xyz.unsqueeze(-2).expand(B, M, K, 3)
        new_xyz_k = grouped_xyz.permute(0, 2, 3, 1)
        rppe = torch.cat(
            [ext, new_xyz_k, ext - new_xyz_k,
             direction.permute(0, 2, 3, 1)], dim=-1)
        rppe = mod.position_mlp[i](rppe.permute(0, 3, 1, 2))
        inp = torch.cat([rppe, dens_feat, grouped_feats, g_k], dim=1)
        D = inp.shape[1]
        tokens = inp.permute(0, 2, 1, 3).reshape(-1, D, K).permute(2, 0, 1)
        tf = mod.Local_pointformer[i](tokens).permute(
            1, 2, 0).reshape(B, M, D, K).transpose(1, 2)
        pooled = F.max_pool2d(tf, kernel_size=[1, K])
        outs.append(mod.fin_conv[i](pooled).squeeze(-1))
    nf = torch.cat(outs, dim=1)
    if hasattr(mod, "aggregation_layer"):
        nf = mod.aggregation_layer(nf)
    cls = (mod.confidence_layers(nf).transpose(1, 2)
           if hasattr(mod, "confidence_layers") else None)
    return new_xyz, nf, cls


def test_full_pda_ssd_torch_activation_parity():
    torch = pytest.importorskip("torch")
    from ckpt_converter import convert_checkpoint

    from pdanet_tpu.models.backbones_3d.iassd_backbone import IASSDBackbone
    from pdanet_tpu.models.dense_heads.iassd_head import IASSDHeadNet
    from pdanet_tpu.ops.ball_query import ball_query_multi

    num_class = 3
    code_size = 30  # PointResidual_BinOri_Coder, 12 bins: 6 + 2*12
    cfg = tiny_model_cfg(num_class)
    sa_cfg = EasyDict(cfg.BACKBONE_3D).SA_CONFIG

    torch.manual_seed(20)
    twin, layer_meta = _build_torch_twin(
        torch, sa_cfg, cfg.POINT_HEAD, num_class, code_size)
    with torch.no_grad():  # non-trivial eval BN statistics everywhere
        for mod in twin.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
    twin.eval()

    sd = {k: v.numpy() for k, v in twin.state_dict().items()
          if "num_batches" not in k}
    variables = convert_checkpoint(sd, cfg, num_class=num_class,
                                   input_channels=4)
    # full-consumption of reference keys is asserted by the TrackingDict
    # roundtrip in tests/test_converter.py; here the twin FORWARD is the
    # ground truth, so any missed tensor shows up as a numeric mismatch

    rng = np.random.RandomState(17)
    B, N = 2, 128
    xyz = (rng.rand(B, N, 3).astype(np.float32) * np.array(
        [6.0, 6.0, 3.0], np.float32))
    intensity = rng.rand(B, N, 1).astype(np.float32)
    points = np.concatenate([xyz, intensity], axis=-1)

    # ---- flax side -------------------------------------------------------
    backbone = IASSDBackbone(model_cfg=cfg.BACKBONE_3D, num_class=num_class,
                             input_channels=4)
    bb_vars = {"params": variables["params"]["backbone_3d"],
               "batch_stats": variables["batch_stats"]["backbone_3d"]}
    out, state = backbone.apply(
        bb_vars, jnp.asarray(points), train=False,
        capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]

    head = IASSDHeadNet(cls_fc=tuple(cfg.POINT_HEAD.CLS_FC),
                        reg_fc=tuple(cfg.POINT_HEAD.REG_FC),
                        num_class=num_class, code_size=code_size)
    hd_vars = {"params": variables["params"]["point_head"],
               "batch_stats": variables["batch_stats"]["point_head"]}
    cls_j, box_j, _ = head.apply(hd_vars, out["centers_features"],
                                 train=False)

    # per-layer sampling indices from the flax run; ball-query index lists
    # recomputed with the repo's (oracle-tested) ops on the flax coord chain
    n_layers = len(sa_cfg.NSAMPLE_LIST)
    enc_xyz_j = [np.asarray(t) for t in out["encoder_xyz"]]
    samp_idx, ball_idx = [None] * n_layers, [None] * n_layers
    for k in range(n_layers):
        if sa_cfg.LAYER_TYPE[k] != "SA_Layer":
            continue
        mod_out = inter[f"SA_modules_{k}"]["__call__"][0]
        if mod_out[3] is not None:
            samp_idx[k] = np.asarray(mod_out[3])
        if len(sa_cfg.RADIUS_LIST[k]) > 0:
            support = enc_xyz_j[sa_cfg.LAYER_INPUT[k]]
            ball_idx[k] = [
                np.asarray(i) for i in ball_query_multi(
                    tuple(sa_cfg.RADIUS_LIST[k]),
                    tuple(sa_cfg.NSAMPLE_LIST[k]),
                    jnp.asarray(support), jnp.asarray(enc_xyz_j[k + 1]))
            ]

    # ---- torch side: the reference backbone loop (IASSD_backbone.py:96-170)
    t_xyz = torch.from_numpy(xyz)
    t_feats = torch.from_numpy(
        intensity.transpose(0, 2, 1).copy())  # channels-first
    enc_xyz = [t_xyz]
    enc_feat = [t_feats]
    li_cls = None
    centers = centers_origin = ctr_offsets = None
    sa_ins = [None] * n_layers
    with torch.no_grad():
        for k in range(n_layers):
            mod = twin.backbone_3d.SA_modules[k]
            xin = enc_xyz[sa_cfg.LAYER_INPUT[k]]
            fin = enc_feat[sa_cfg.LAYER_INPUT[k]]
            kind = layer_meta[k][0]
            if kind == "vote":
                h = mod.mlp_modules(fin)
                off = mod.ctr_reg(h).transpose(1, 2)
                lim = torch.tensor(
                    sa_cfg.MAX_TRANSLATE_RANGE).view(1, 1, 3).float()
                off_lim = torch.min(torch.max(off, -lim), lim)
                li_xyz = xin + off_lim
                li_feat = fin
                centers, centers_origin, ctr_offsets = li_xyz, xin, off
            else:
                idx = (torch.from_numpy(samp_idx[k].astype(np.int64))
                       if samp_idx[k] is not None else None)
                idxl = ([torch.from_numpy(i.astype(np.int64))
                         for i in ball_idx[k]] if ball_idx[k] else None)
                if kind == "gather":
                    li_xyz = _gather_cf(
                        torch, xin.transpose(1, 2), idx).transpose(1, 2)
                    li_feat = _gather_cf(torch, fin, idx)
                    cls = None
                elif kind == "with":
                    ctr = (enc_xyz[sa_cfg.CTR_INDEX[k]]
                           if sa_cfg.CTR_INDEX[k] != -1 else None)
                    li_xyz, li_feat, cls = _twin_sa_with(
                        torch, mod, xin, fin, idx, idxl,
                        sa_cfg.NSAMPLE_LIST[k], ctr_xyz=ctr)
                else:
                    li_xyz, li_feat, cls = _twin_sa_ellipsoid(
                        torch, mod, xin, fin, idx, idxl,
                        sa_cfg.RADIUS_LIST[k], sa_cfg.NSAMPLE_LIST[k],
                        layer_meta[k][1])
                li_cls = cls
                sa_ins[k] = cls
            enc_xyz.append(li_xyz)
            enc_feat.append(li_feat)

        t_centers_feat = enc_feat[-1]  # (B, C, M)
        Bm, Cm, Mm = t_centers_feat.shape
        flat = t_centers_feat.transpose(1, 2).reshape(Bm * Mm, Cm)
        t_cls = twin.point_head.cls_center_layers(flat).reshape(
            Bm, Mm, num_class)
        t_box = twin.point_head.box_center_layers(flat).reshape(
            Bm, Mm, code_size)

    # ---- compare ---------------------------------------------------------
    # coordinate chain: pre-vote layers are pure gathers -> exact equality;
    # vote centers and the final ctr-grouped layer involve arithmetic
    for k in range(n_layers):
        want_exact = sa_cfg.LAYER_TYPE[k] == "SA_Layer" and \
            sa_cfg.CTR_INDEX[k] == -1
        got = enc_xyz[k + 1].numpy()
        if want_exact:
            np.testing.assert_array_equal(got, enc_xyz_j[k + 1], err_msg=f"L{k}")
        else:
            np.testing.assert_allclose(
                got, enc_xyz_j[k + 1], atol=1e-5, err_msg=f"L{k}")

    np.testing.assert_allclose(
        centers.numpy(), np.asarray(out["centers"]), atol=1e-5)
    np.testing.assert_allclose(
        ctr_offsets.numpy(), np.asarray(out["ctr_offsets"]), atol=1e-4)
    np.testing.assert_array_equal(
        centers_origin.numpy(), np.asarray(out["centers_origin"]))

    for k in range(n_layers):
        pred_j = out["sa_ins_preds"][k]
        if sa_ins[k] is None:
            continue
        np.testing.assert_allclose(
            sa_ins[k].numpy(), np.asarray(pred_j), atol=3e-4,
            err_msg=f"sa_ins L{k}")

    np.testing.assert_allclose(
        t_centers_feat.transpose(1, 2).numpy(),
        np.asarray(out["centers_features"]), atol=1e-3)
    np.testing.assert_allclose(t_cls.numpy(), np.asarray(cls_j), atol=2e-3)
    np.testing.assert_allclose(t_box.numpy(), np.asarray(box_j), atol=2e-3)
