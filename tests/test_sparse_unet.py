"""Sparse UNetV2 tests: inverse-conv table vs a numpy transposed-conv
oracle, decoder forward contract, and Part-A2 end-to-end on the sparse
backbone (the full-res formulation of spconv_unet.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.ops.sparse_conv import (
    build_inverse_neighbor_table,
    build_neighbor_table,
    downsample_coords,
    gather_matmul_conv,
)
from pdanet_tpu.utils.easydict import EasyDict

from tests.test_parta2 import (
    GRID,
    PARTA2_MODEL_CFG,
    PC_RANGE,
    VOXEL_SIZE,
    _make_inputs,
)


def _unique_active(rng, B, V, grid, n_pad=8):
    nx, ny, nz = grid
    coords = np.full((B, V, 3), -1, np.int32)
    for b in range(B):
        cells = rng.permutation(nx * ny * nz)[: V - n_pad - b]
        coords[b, : len(cells), 0] = cells // (ny * nx)
        coords[b, : len(cells), 1] = (cells // nx) % ny
        coords[b, : len(cells), 2] = cells % nx
    return coords


def test_inverse_conv_matches_transposed_oracle():
    """output(q) = sum_off w[off] @ x((q - off) / stride) over exact
    divisions — the defining equation of the stride-2 transposed conv
    restricted to active sites (SparseInverseConv3d)."""
    rng = np.random.RandomState(0)
    grid_fine = (10, 8, 6)  # (nx, ny, nz)
    grid_coarse = tuple((g + 1) // 2 for g in grid_fine)
    B, Vf, Vc, C_in, C_out = 2, 48, 24, 5, 4
    fine = _unique_active(rng, B, Vf, grid_fine)
    coarse = _unique_active(rng, B, Vc, grid_coarse, n_pad=4)
    feats = rng.randn(B, Vc, C_in).astype(np.float32)
    feats[coarse[..., 0] < 0] = 0
    w = rng.randn(27, C_in, C_out).astype(np.float32) * 0.1

    inv_tab = build_inverse_neighbor_table(
        jnp.asarray(coarse), grid_coarse, query_coords=jnp.asarray(fine)
    )
    got = np.asarray(
        gather_matmul_conv(jnp.asarray(feats), inv_tab, jnp.asarray(w))
    )

    offs = [(oz, oy, ox) for oz in (-1, 0, 1) for oy in (-1, 0, 1)
            for ox in (-1, 0, 1)]
    lut = {}
    for b in range(B):
        for v in range(Vc):
            if coarse[b, v, 0] >= 0:
                lut[(b, *coarse[b, v])] = v
    want = np.zeros((B, Vf, C_out), np.float32)
    for b in range(B):
        for q in range(Vf):
            if fine[b, q, 0] < 0:
                continue
            for k, off in enumerate(offs):
                t = fine[b, q] - np.array(off)
                if np.any(t % 2) or np.any(t < 0):
                    continue
                src = lut.get((b, *(t // 2)))
                if src is not None:
                    want[b, q] += feats[b, src] @ w[k]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sparse_unet_forward_contract():
    from pdanet_tpu.models.backbones_3d.sparse_unet import SparseUNetV2

    rng = np.random.RandomState(1)
    B, V = 2, 64
    coords = _unique_active(rng, B, V, GRID)
    feats = rng.rand(B, V, 4).astype(np.float32)
    net = SparseUNetV2(model_cfg={}, input_channels=4, grid_size=GRID)
    vars_ = net.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(coords)
    )
    bev, aux = jax.jit(net.apply)(
        vars_, jnp.asarray(feats), jnp.asarray(coords)
    )
    nx, ny, nz = GRID
    assert bev.shape[1:3] == (ny // 8, nx // 8)
    assert aux["point_features"].shape == (B, V, 16)
    pf = np.asarray(aux["point_features"])
    pv = np.asarray(aux["point_valid"])
    assert np.isfinite(pf).all()
    assert (pf[~pv] == 0).all() and (~pv).sum() > 0
    # decoder output carries signal at the active rows
    assert np.abs(pf[pv]).max() > 0

    # RETURN_ENCODED_TENSOR: False (PartA2-free) skips the BEV branch
    net2 = SparseUNetV2(
        model_cfg={"RETURN_ENCODED_TENSOR": False},
        input_channels=4, grid_size=GRID,
    )
    vars2 = net2.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(coords)
    )
    bev2, aux2 = net2.apply(vars2, jnp.asarray(feats), jnp.asarray(coords))
    assert bev2 is None and aux2["point_features"].shape == (B, V, 16)


def test_parta2_sparse_unet_forward_and_loss():
    import copy

    cfg = EasyDict(copy.deepcopy(PARTA2_MODEL_CFG))
    cfg.BACKBONE_3D = {"NAME": "SparseUNetV2"}
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=VOXEL_SIZE,
        point_cloud_range=PC_RANGE, class_names=("Car", "Pedestrian"),
    )
    voxels, coords, nums = _make_inputs(seed=3)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    P = PARTA2_MODEL_CFG["ROI_HEAD"]["NMS_CONFIG"]["TEST"]["NMS_POST_MAXSIZE"]
    assert out["batch_box_preds"].shape == (1, P, 7)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [1.5, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]
    batch = {
        "voxels": jnp.asarray(voxels), "voxel_coords": jnp.asarray(coords),
        "voxel_num_points": jnp.asarray(nums), "gt_boxes": jnp.asarray(gt),
    }

    def loss_fn(params):
        def fwd_loss(mdl, b):
            o = mdl.forward_batch(b, train=True)
            return mdl.loss_batch(o, b)

        (loss, tb), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, mutable=["batch_stats"], method=fwd_loss,
            rngs={"proposal": jax.random.PRNGKey(5),
                  "dropout": jax.random.PRNGKey(6)},
        )
        return loss, tb

    (loss, tb), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    b3d_grads = jax.tree_util.tree_leaves(grads["backbone_3d"])
    assert all(np.isfinite(np.asarray(g)).all() for g in b3d_grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in b3d_grads)


def test_dense_masked_matches_sparse_unet():
    """UNet-pair capstone: the masked dense UNetV2's variables are
    inverse-emitted into the reference spconv_unet schema and converted
    via convert_sparse_unet onto SparseUNetV2 — the two INDEPENDENT
    implementations (dense ConvTranspose decoder vs inverse neighbor
    tables) must then agree on the encoder BEV and the decoder's
    per-voxel features.  Validates both converters, both modules, and
    the torch ConvTranspose/(inverse conv) equivalence in one shot."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from ckpt_converter import TorchTree, convert_sparse_unet
    from test_converter_two_stage import _emit_dense_unet

    from pdanet_tpu.models.backbones_3d.sparse_unet import SparseUNetV2
    from pdanet_tpu.models.backbones_3d.voxel_unet import UNetV2

    rng = np.random.RandomState(13)
    nx, ny, nz = 16, 16, 24
    B, V = 1, 40
    cells = np.stack([
        rng.choice(nz * ny * nx, V, replace=False) for _ in range(B)
    ])
    coords = np.stack([cells // (ny * nx), (cells // nx) % ny,
                       cells % nx], -1).astype(np.int32)
    feats = rng.randn(B, V, 4).astype(np.float32)

    dense = UNetV2(model_cfg={}, input_channels=4, grid_size=(nx, ny, nz))
    dvars = jax.tree.map(np.asarray, dict(dense.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(coords))))

    def rand_stats(tree):
        for k, v in tree.items():
            if k == "mean":
                tree[k] = rng.uniform(-0.2, 0.2, v.shape).astype(np.float32)
            elif k == "var":
                tree[k] = rng.uniform(0.5, 2.0, v.shape).astype(np.float32)
            elif isinstance(v, dict):
                rand_stats(v)
    rand_stats(dvars["batch_stats"])

    sd = {}
    _emit_dense_unet(sd, "bb", dvars["params"], dvars["batch_stats"])
    sp, ss = convert_sparse_unet(TorchTree(sd).sub("bb"), input_channels=4)

    sparse = SparseUNetV2(
        model_cfg={"ACTIVE_BUDGETS": [8 * V] * 4},
        input_channels=4, grid_size=(nx, ny, nz))
    svars = sparse.init(jax.random.PRNGKey(1), jnp.asarray(feats),
                        jnp.asarray(coords))

    def paths(t, pre=()):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out.update(paths(v, pre + (k,)))
            else:
                out[pre + (k,)] = v
        return out
    assert set(paths(dict(svars["params"]))) == set(paths(sp))
    assert set(paths(dict(svars["batch_stats"]))) == set(paths(ss))

    d_bev, d_aux = dense.apply(
        jax.tree.map(jnp.asarray, dvars), jnp.asarray(feats),
        jnp.asarray(coords), train=False)
    s_bev, s_aux = sparse.apply(
        {"params": jax.tree.map(jnp.asarray, sp),
         "batch_stats": jax.tree.map(jnp.asarray, ss)},
        jnp.asarray(feats), jnp.asarray(coords), train=False)

    np.testing.assert_allclose(np.asarray(s_bev), np.asarray(d_bev),
                               rtol=1e-4, atol=1e-4)
    dv = np.asarray(d_aux["point_valid"])
    np.testing.assert_array_equal(np.asarray(s_aux["point_valid"]), dv)
    df = np.asarray(d_aux["point_features"])
    sf = np.asarray(s_aux["point_features"])
    np.testing.assert_allclose(sf[dv], df[dv], rtol=1e-4, atol=1e-4)
