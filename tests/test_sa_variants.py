"""SA ablation variants (VERDICT r4 next#8 — close SURVEY §2.2 to 9/9).

Covers the reference's three source-edit-only SA ablations:
* No_Global      — pointnet2_modules.py:130-539 (PDA module minus the
                   global branch; 3-token fusion, d_model 3d)
* Proposal_Aware — pointnet2_modules.py:1048-1321 (WithSampling + CBAM
                   spatial attention, :1010-1046)
* EncoderLayer   — pointnet2_modules.py:1325-1414 (FullAttention encoder
                   layer as the K-neighbor fuser)

CBAM and EncoderLayer get torch oracle twins (verbatim-math translations
of the reference modules, params copied across); the variants get
construction/forward/gradient coverage through the tiny backbone.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pdanet_tpu.models.blocks import CBAM, EncoderLayer
from tests.model_cfg import tiny_model_cfg

pytestmark = pytest.mark.smoke


def _build_backbone(cfg3d, num_class=3, input_channels=4):
    from pdanet_tpu.models.backbones_3d.iassd_backbone import IASSDBackbone

    return IASSDBackbone(
        model_cfg=cfg3d, num_class=num_class, input_channels=input_channels
    )


def _points(B=2, N=128, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-4, 4, (B, N, 4)).astype(np.float32)
    pts = np.take_along_axis(
        pts, np.argsort(pts[..., 0], axis=1)[..., None], 1
    )
    return jnp.asarray(pts)


class TestCBAMOracle:
    def _torch_cbam(self, x_bcn, w):
        """Reference CBAM.forward as executed (:1027-1046), (B, C, N)."""
        inp = torch.from_numpy(x_bcn)
        mp = F.max_pool1d(inp.transpose(1, 2).contiguous(),
                          kernel_size=inp.size(1))
        ap = F.avg_pool1d(inp.transpose(1, 2).contiguous(),
                          kernel_size=inp.size(1))
        mp_ap = torch.cat([mp, ap], 2).transpose(1, 2).contiguous()
        conv = torch.nn.Conv1d(2, 1, kernel_size=1, bias=False)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w.T[:, :, None]))
        return (inp * torch.sigmoid(conv(mp_ap))).detach().numpy()

    def test_matches_reference_math(self):
        rng = np.random.RandomState(3)
        x = rng.randn(2, 16, 40).astype(np.float32)  # (B, C, N)
        mod = CBAM()
        var = mod.init(jax.random.PRNGKey(0), jnp.asarray(x).transpose(0, 2, 1))
        w = np.asarray(var["params"]["conv_layer"]["kernel"])  # (2, 1)
        ours = mod.apply(var, jnp.asarray(x).transpose(0, 2, 1))
        ref = self._torch_cbam(x, w)
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, rtol=1e-5, atol=1e-6
        )


class _TorchEncoderLayer(torch.nn.Module):
    """Verbatim translation of pointnet2_modules.py:1325-1414."""

    def __init__(self, d_model, nhead):
        super().__init__()
        self.dim = d_model // nhead
        self.nhead = nhead
        self.q_proj = torch.nn.Linear(d_model, d_model, bias=False)
        self.k_proj = torch.nn.Linear(d_model, d_model, bias=False)
        self.v_proj = torch.nn.Linear(d_model, d_model, bias=False)
        self.merge = torch.nn.Linear(d_model, d_model, bias=False)
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(d_model, d_model * 2, bias=False),
            torch.nn.ReLU(True),
            torch.nn.Linear(d_model * 2, d_model, bias=False),
        )
        self.norm1 = torch.nn.LayerNorm(d_model)
        self.norm2 = torch.nn.LayerNorm(d_model)

    def forward(self, x):
        bs = x.size(0)
        residual = x
        x = self.norm1(x)
        q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(x).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(x).view(bs, -1, self.nhead, self.dim)
        qk = torch.einsum("nlhd,nshd->nlsh", q, k)
        a = torch.softmax(qk / self.dim**0.5, dim=2)
        msg = torch.einsum("nlsh,nshd->nlhd", a, v).contiguous()
        msg = self.merge(msg.view(bs, -1, self.nhead * self.dim))
        msg = msg + residual
        residual = msg
        msg = self.norm2(msg)
        return residual + self.mlp(msg)


class TestEncoderLayerOracle:
    def test_matches_torch_twin(self):
        d, H = 48, 4
        rng = np.random.RandomState(7)
        x = rng.randn(3, 8, d).astype(np.float32)  # (B, K, D)
        mod = EncoderLayer(d_model=d, nhead=H)
        var = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), False)
        p = var["params"]

        twin = _TorchEncoderLayer(d, H)
        with torch.no_grad():
            for nm in ("q_proj", "k_proj", "v_proj", "merge"):
                getattr(twin, nm).weight.copy_(
                    torch.from_numpy(np.asarray(p[nm]["kernel"]).T)
                )
            twin.mlp[0].weight.copy_(
                torch.from_numpy(np.asarray(p["mlp_0"]["kernel"]).T)
            )
            twin.mlp[2].weight.copy_(
                torch.from_numpy(np.asarray(p["mlp_1"]["kernel"]).T)
            )
            for nm in ("norm1", "norm2"):
                getattr(twin, nm).weight.copy_(
                    torch.from_numpy(np.asarray(p[nm]["scale"]))
                )
                getattr(twin, nm).bias.copy_(
                    torch.from_numpy(np.asarray(p[nm]["bias"]))
                )
        ref = twin(torch.from_numpy(x)).detach().numpy()
        ours = mod.apply(var, jnp.asarray(x), False)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5, atol=2e-5)

    def test_batched_centers_shape(self):
        # the backbone feeds (B, M, K, D); the layer must handle the extra dim
        mod = EncoderLayer(d_model=24, nhead=4)
        x = jnp.ones((2, 5, 8, 24))
        var = mod.init(jax.random.PRNGKey(0), x, False)
        assert mod.apply(var, x, False).shape == x.shape


class TestVariantBackbones:
    def _forward(self, cfg3d, seed=0):
        bb = _build_backbone(cfg3d)
        pts = _points(seed=seed)
        var = bb.init(jax.random.PRNGKey(0), pts, train=False)
        out = bb.apply(var, pts, train=False)
        return bb, var, out

    def test_no_global_drops_branch_and_runs(self):
        cfg = tiny_model_cfg().BACKBONE_3D
        base_bb, base_var, base_out = self._forward(cfg)

        cfg_ng = copy.deepcopy(cfg)
        cfg_ng.SA_CONFIG.PDA_VARIANT = "no_global"
        bb, var, out = self._forward(cfg_ng)

        flat = jax.tree_util.tree_flatten_with_path(var["params"])[0]
        names = ["/".join(str(k.key) for k in path) for path, _ in flat]
        assert not any("global_mlps" in n for n in names), (
            "no_global must not own global-branch params"
        )
        base_names = [
            "/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(
                base_var["params"]
            )[0]
        ]
        assert any("global_mlps" in n for n in base_names)
        # transformer d_model shrinks 4d -> 3d: check a qkv kernel fan-in
        k1 = var["params"]["SA_modules_1"]["Local_pointformer_0"][
            "self_attn"
        ]["query"]["kernel"]
        k1_base = base_var["params"]["SA_modules_1"]["Local_pointformer_0"][
            "self_attn"
        ]["query"]["kernel"]
        assert k1.shape[0] * 4 == k1_base.shape[0] * 3
        # output contract identical
        assert out["centers_features"].shape == base_out[
            "centers_features"
        ].shape
        assert np.isfinite(np.asarray(out["centers_features"])).all()

    def test_no_global_grads_flow(self):
        cfg = copy.deepcopy(tiny_model_cfg().BACKBONE_3D)
        cfg.SA_CONFIG.PDA_VARIANT = "no_global"
        bb = _build_backbone(cfg)
        pts = _points()
        var = bb.init(jax.random.PRNGKey(0), pts, train=False)

        def loss(p):
            out = bb.apply(
                {"params": p, "batch_stats": var.get("batch_stats", {})},
                pts, train=True, mutable=["batch_stats"],
            )[0]
            return jnp.sum(jnp.square(out["centers_features"]))

        g = jax.grad(loss)(var["params"])
        gn = jax.tree.map(lambda a: float(jnp.sum(jnp.abs(a))), g)
        leaves = jax.tree.leaves(gn)
        assert all(np.isfinite(v) for v in leaves)
        assert sum(v > 0 for v in leaves) > len(leaves) // 2

    def test_proposal_aware_cbam(self):
        cfg = copy.deepcopy(tiny_model_cfg().BACKBONE_3D)
        cfg.SA_CONFIG.PROPOSAL_AWARE_CBAM = True
        bb, var, out = self._forward(cfg)
        names = [
            "/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(
                var["params"]
            )[0]
        ]
        # WithSampling layers (k=0 and k=5) gain cbam; PDA layers don't
        assert any(n.startswith("SA_modules_0/cbam") for n in names)
        assert any(n.startswith("SA_modules_5/cbam") for n in names)
        assert not any("SA_modules_1/cbam" in n for n in names)
        assert np.isfinite(np.asarray(out["centers_features"])).all()

    def test_encoder_layer_pointformer(self):
        cfg = copy.deepcopy(tiny_model_cfg().BACKBONE_3D)
        cfg.SA_CONFIG.POINTFORMER_IMPL = "encoder_layer"
        bb, var, out = self._forward(cfg)
        names = [
            "/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(
                var["params"]
            )[0]
        ]
        assert any("Local_pointformer_0/q_proj" in n for n in names)
        assert not any("Local_pointformer_0/self_attn" in n for n in names)
        assert np.isfinite(np.asarray(out["centers_features"])).all()

    def test_unknown_variant_rejected(self):
        cfg = copy.deepcopy(tiny_model_cfg().BACKBONE_3D)
        cfg.SA_CONFIG.PDA_VARIANT = "bogus"
        with pytest.raises(NotImplementedError):
            self._forward(cfg)
