"""Gather-matmul sparse conv tests: submanifold and strided convs are
checked bit-close against dense XLA convolutions restricted to the
active set, plus SECOND end-to-end on a full-res-style grid that the
dense backbone could not hold."""

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.ops.sparse_conv import (
    build_neighbor_table,
    downsample_coords,
    gather_matmul_conv,
)

GRID = (12, 10, 8)  # (nx, ny, nz)


def _active(rng, B=2, V=64, frac_pad=0.25):
    nx, ny, nz = GRID
    # unique sites per frame via permutation of flat cells
    coords = np.full((B, V, 3), -1, np.int32)
    for b in range(B):
        n_real = V - int(V * frac_pad) - b  # different counts per frame
        cells = rng.permutation(nx * ny * nz)[:n_real]
        coords[b, :n_real, 0] = cells // (ny * nx)
        coords[b, :n_real, 1] = (cells // nx) % ny
        coords[b, :n_real, 2] = cells % nx
    return coords


def _dense_from_sparse(coords, feats):
    nx, ny, nz = GRID
    B, V, C = feats.shape
    g = np.zeros((B, nz, ny, nx, C), np.float32)
    for b in range(B):
        for v in range(V):
            z, y, x = coords[b, v]
            if z >= 0:
                g[b, z, y, x] = feats[b, v]
    return g


def test_subm_conv_matches_dense_at_active_sites():
    rng = np.random.RandomState(0)
    coords = _active(rng)
    B, V = coords.shape[:2]
    C_in, C_out = 5, 7
    feats = rng.randn(B, V, C_in).astype(np.float32)
    feats[coords[..., 0] < 0] = 0
    w = rng.randn(27, C_in, C_out).astype(np.float32) * 0.1

    tab = build_neighbor_table(jnp.asarray(coords), GRID)
    got = np.asarray(gather_matmul_conv(
        jnp.asarray(feats), tab, jnp.asarray(w)
    ))

    dense = _dense_from_sparse(coords, feats)
    wd = w.reshape(3, 3, 3, C_in, C_out)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(wd),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    ref = np.asarray(ref)
    for b in range(B):
        for v in range(V):
            z, y, x = coords[b, v]
            if z >= 0:
                np.testing.assert_allclose(
                    got[b, v], ref[b, z, y, x], rtol=1e-4, atol=1e-4
                )
            else:
                assert (got[b, v] == 0).all()


def test_strided_conv_matches_dense_at_occupied_sites():
    rng = np.random.RandomState(1)
    coords = _active(rng)
    B, V = coords.shape[:2]
    C_in, C_out = 4, 6
    feats = rng.randn(B, V, C_in).astype(np.float32)
    feats[coords[..., 0] < 0] = 0
    w = rng.randn(27, C_in, C_out).astype(np.float32) * 0.1

    out_coords = np.asarray(downsample_coords(jnp.asarray(coords), V))
    tab = build_neighbor_table(
        jnp.asarray(coords), GRID, query_coords=jnp.asarray(out_coords),
        stride=(2, 2, 2),
    )
    got = np.asarray(gather_matmul_conv(
        jnp.asarray(feats), tab, jnp.asarray(w)
    ))

    dense = _dense_from_sparse(coords, feats)
    wd = w.reshape(3, 3, 3, C_in, C_out)
    # spconv SparseConv3d(k=3, s=2, padding=1) correlation
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(wd),
        window_strides=(2, 2, 2), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ))
    # every occupied half-res site appears exactly once in out_coords
    for b in range(B):
        occ = {
            (z // 2, y // 2, x // 2)
            for z, y, x in coords[b] if z >= 0
        }
        listed = {
            tuple(c) for c in out_coords[b] if c[0] >= 0
        }
        assert listed == occ
        for v in range(out_coords.shape[1]):
            z, y, x = out_coords[b, v]
            if z >= 0:
                np.testing.assert_allclose(
                    got[b, v], ref[b, z, y, x], rtol=1e-4, atol=1e-4
                )


def test_masked_batchnorm_ignores_padding():
    from pdanet_tpu.models.backbones_3d.sparse_backbone import MaskedBatchNorm

    rng = np.random.RandomState(2)
    x = rng.randn(2, 16, 4).astype(np.float32)
    valid = np.ones((2, 16), bool)
    valid[:, 12:] = False
    x[~valid] = 1e6  # poison the padding rows

    bn = MaskedBatchNorm()
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid),
                    train=True)
    y, mut = bn.apply(vars_, jnp.asarray(x), jnp.asarray(valid), train=True,
                      mutable=["batch_stats"])
    y = np.asarray(y)
    assert (y[~valid] == 0).all()
    # normalized valid rows: ~zero mean, ~unit var
    flat = y[valid]
    np.testing.assert_allclose(flat.mean(0), 0, atol=1e-4)
    np.testing.assert_allclose(flat.var(0), 1, atol=1e-2)
    # running stats untouched by the poison rows
    assert np.abs(np.asarray(mut["batch_stats"]["mean"])).max() < 1e3


def test_second_with_sparse_backbone_fullres_grid():
    """SECOND over the sparse backbone on a 0.05 m-style grid whose dense
    form (141 x 128 x 41 cells/frame here, 1408 x 1600 x 41 at real
    KITTI) the dense backbone would materialize at every conv."""
    import copy

    from pdanet_tpu.models import build_network
    from pdanet_tpu.utils.easydict import EasyDict

    from test_second import SECOND_MODEL_CFG

    grid = (144, 128, 40)  # nx, ny, nz — full-res aspect, fixture extent
    cfg = EasyDict(copy.deepcopy(dict(SECOND_MODEL_CFG)))
    cfg.BACKBONE_3D = {
        "NAME": "SparseVoxelBackBone8x",
        "NUM_FILTERS": [4, 4, 8, 8, 8],
        "NUM_OUTPUT_FEATURES": 8,
    }
    cfg.MAP_TO_BEV = {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 24}
    model = build_network(
        cfg, num_class=2, grid_size=grid, voxel_size=(0.05, 0.05, 0.1),
        point_cloud_range=(0, -3.2, -4, 7.2, 3.2, 0),
        class_names=("Car", "Pedestrian"),
    )
    rng = np.random.RandomState(3)
    B, V, P = 1, 256, 5
    voxels = rng.rand(B, V, P, 4).astype(np.float32)
    nums = rng.randint(1, P + 1, (B, V)).astype(np.int32)
    nx, ny, nz = grid
    cells = rng.permutation(nx * ny * nz)[:V]
    coords = np.stack(
        [cells // (ny * nx), (cells // nx) % ny, cells % nx], axis=-1
    ).astype(np.int32)[None]
    coords[:, -V // 4:] = -1
    voxels[:, -V // 4:] = 0
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    # grid/8 = 18 x 16 feature map, 2 cls x 2 rot anchors
    assert out["batch_box_preds"].shape == (1, 18 * 16 * 4, 7)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    gt = np.zeros((1, 1, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -2.0, 3.9, 1.6, 1.56, 0.3, 1]

    def loss_fn(params):
        def fwd_loss(mdl):
            o = mdl(jnp.asarray(voxels), jnp.asarray(coords),
                    jnp.asarray(nums), train=True)
            return mdl.loss(o, jnp.asarray(gt), ["Car", "Pedestrian"])

        (loss, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            mutable=["batch_stats"], method=fwd_loss,
        )
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    bb = jax.tree_util.tree_leaves(grads["backbone_3d"])
    assert any(float(jnp.abs(g).max()) > 0 for g in bb)


def test_voxelrcnn_with_sparse_backbone():
    """VoxelRCNN's grid pool dispatches to the sparse voxel-query path
    when the backbone emits (coords, feats, valid) levels."""
    import copy

    from pdanet_tpu.models import build_network
    from pdanet_tpu.utils.easydict import EasyDict

    from test_two_stage import _voxel_rcnn_tiny_cfg

    grid = (32, 32, 8)
    cfg = EasyDict(copy.deepcopy(dict(_voxel_rcnn_tiny_cfg())))
    cfg.BACKBONE_3D = {
        "NAME": "SparseVoxelBackBone8x",
        "NUM_FILTERS": [4, 4, 8, 8, 8],
        "NUM_OUTPUT_FEATURES": 16,
    }
    cfg.MAP_TO_BEV = {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 16}
    model = build_network(
        cfg, num_class=2, grid_size=grid, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"),
    )
    rng = np.random.RandomState(4)
    B, V, P = 1, 64, 5
    voxels = rng.rand(B, V, P, 4).astype(np.float32)
    nums = rng.randint(1, P + 1, (B, V)).astype(np.int32)
    nx, ny, nz = grid
    cells = rng.permutation(nx * ny * nz)[:V]
    coords = np.stack(
        [cells // (ny * nx), (cells // nx) % ny, cells % nx], axis=-1
    ).astype(np.int32)[None]
    coords[:, -16:] = -1
    voxels[:, -16:] = 0

    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    gt = np.zeros((1, 1, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    batch = {
        "voxels": jnp.asarray(voxels), "voxel_coords": jnp.asarray(coords),
        "voxel_num_points": jnp.asarray(nums), "gt_boxes": jnp.asarray(gt),
    }

    def loss_fn(params):
        def fwd_loss(mdl, b):
            o = mdl.forward_batch(b, train=True)
            return mdl.loss_batch(o, b)

        (loss, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, mutable=["batch_stats"], method=fwd_loss,
            rngs={"proposal": jax.random.PRNGKey(5),
                  "dropout": jax.random.PRNGKey(6)},
        )
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    roi = jax.tree_util.tree_leaves(grads["roi_head"])
    assert any(float(jnp.abs(g).max()) > 0 for g in roi)


def test_pvrcnn_with_sparse_backbone():
    """VSA consumes sparse multi-scale entries directly (no occupancy
    pyramid, no top-k extraction)."""
    import copy

    from pdanet_tpu.models import build_network
    from pdanet_tpu.utils.easydict import EasyDict

    from test_pvrcnn import GRID as G, PC_RANGE, PVRCNN_MODEL_CFG, \
        VOXEL_SIZE, _make_inputs

    cfg = EasyDict(copy.deepcopy(dict(PVRCNN_MODEL_CFG)))
    cfg.BACKBONE_3D = {
        "NAME": "SparseVoxelBackBone8x",
        "NUM_FILTERS": [4, 4, 8, 8, 8],
        "NUM_OUTPUT_FEATURES": 16,
    }
    cfg.MAP_TO_BEV = {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 16}
    model = build_network(
        cfg, num_class=2, grid_size=G, voxel_size=VOXEL_SIZE,
        point_cloud_range=PC_RANGE, class_names=("Car", "Pedestrian"),
    )
    voxels, coords, nums, points = _make_inputs(seed=11)
    variables = model.init(
        jax.random.PRNGKey(0), voxels, coords, nums, points
    )
    out = jax.jit(
        lambda v, a, b, c, p: model.apply(v, a, b, c, p, train=False)
    )(variables, voxels, coords, nums, points)
    assert out["point_features"].shape == (1, 32, 32)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()


def test_dilated_downsample_matches_spconv_active_sets():
    """downsample_coords(dilate=True) must list EXACTLY the sites whose
    pad-1 tap window [2o-1, 2o+1] contains an active input (spconv
    SparseConv3d output semantics), and the strided gather-matmul over
    them must match the dense conv at every listed site."""
    rng = np.random.RandomState(3)
    coords = _active(rng)
    B, V = coords.shape[:2]
    C_in, C_out = 4, 6
    feats = rng.randn(B, V, C_in).astype(np.float32)
    feats[coords[..., 0] < 0] = 0
    w = rng.randn(27, C_in, C_out).astype(np.float32) * 0.1

    nx, ny, nz = GRID
    og = ((nz + 1) // 2, (ny + 1) // 2, (nx + 1) // 2)  # zyx
    out_coords = np.asarray(downsample_coords(
        jnp.asarray(coords), 8 * V, out_grid=og, dilate=True))
    tab = build_neighbor_table(
        jnp.asarray(coords), GRID, query_coords=jnp.asarray(out_coords),
        stride=(2, 2, 2),
    )
    got = np.asarray(gather_matmul_conv(
        jnp.asarray(feats), tab, jnp.asarray(w)
    ))

    dense = _dense_from_sparse(coords, feats)
    wd = w.reshape(3, 3, 3, C_in, C_out)
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(wd),
        window_strides=(2, 2, 2), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ))

    for b in range(B):
        want = set()
        for z, y, x in coords[b]:
            if z < 0:
                continue
            for oz in ((z - 1) // 2, (z + 1) // 2):
                for oy in ((y - 1) // 2, (y + 1) // 2):
                    for ox in ((x - 1) // 2, (x + 1) // 2):
                        if (0 <= oz < og[0] and 0 <= oy < og[1]
                                and 0 <= ox < og[2]
                                and abs(z - 2 * oz) <= 1
                                and abs(y - 2 * oy) <= 1
                                and abs(x - 2 * ox) <= 1):
                            want.add((oz, oy, ox))
        listed = {tuple(c) for c in out_coords[b] if c[0] >= 0}
        assert listed == want, (len(listed), len(want))
        for v in range(out_coords.shape[1]):
            z, y, x = out_coords[b, v]
            if z >= 0:
                np.testing.assert_allclose(
                    got[b, v], ref[b, z, y, x], rtol=1e-4, atol=1e-4)


def test_dense_masked_matches_sparse_backbone():
    """The submanifold-masked dense VoxelBackBone8x and the gather-matmul
    SparseVoxelBackBone8x are INDEPENDENT implementations of the same
    spconv semantics — with identical weights and running stats they
    must agree: BEV maps equal everywhere, stage features equal at every
    active site.  This is the strongest internal consistency check for
    the reference-exact geometry + masking work."""
    from pdanet_tpu.models.backbones_3d.sparse_backbone import (
        SparseVoxelBackBone8x,
    )
    from pdanet_tpu.models.backbones_3d.voxel_backbone import VoxelBackBone8x

    rng = np.random.RandomState(7)
    nx, ny, nz = 16, 16, 24  # z deep enough for the pad-0 reference path
    B, V = 2, 48
    widths = [3, 3, 4, 6, 6]
    c_out = 8
    # unique cells per frame (duplicate coords are voxelizer-impossible
    # and make dense scatter vs sparse gather pick different rows)
    cells = np.stack([
        rng.choice(nz * ny * nx, V, replace=False) for _ in range(B)
    ])
    coords = np.stack([cells // (ny * nx), (cells // nx) % ny,
                       cells % nx], -1).astype(np.int32)
    coords[:, -8:] = -1
    feats = rng.randn(B, V, 4).astype(np.float32)
    feats[coords[..., 0] < 0] = 0

    dense = VoxelBackBone8x(
        model_cfg={"NUM_FILTERS": widths, "NUM_OUTPUT_FEATURES": c_out},
        input_channels=4, grid_size=(nx, ny, nz))
    dvars = dense.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                       jnp.asarray(coords))
    dvars = jax.tree.map(np.asarray, dict(dvars))
    # randomize running stats so BN folding is non-trivial
    for name, st in dvars["batch_stats"].items():
        st["BatchNorm_0"]["mean"] = rng.uniform(
            -0.2, 0.2, st["BatchNorm_0"]["mean"].shape).astype(np.float32)
        st["BatchNorm_0"]["var"] = rng.uniform(
            0.5, 2.0, st["BatchNorm_0"]["var"].shape).astype(np.float32)

    sparse = SparseVoxelBackBone8x(
        model_cfg={"NUM_FILTERS": widths, "NUM_OUTPUT_FEATURES": c_out,
                   "ACTIVE_BUDGETS": [8 * V] * 4},
        input_channels=4, grid_size=(nx, ny, nz))
    svars = sparse.init(jax.random.PRNGKey(1), jnp.asarray(feats),
                        jnp.asarray(coords))
    svars = jax.tree.map(np.asarray, dict(svars))

    # copy dense weights/stats into the sparse layout
    sp, ss = svars["params"], svars["batch_stats"]
    names = (["conv_input", "conv1"]
             + [f"conv{l}{suf}" for l in (2, 3, 4)
                for suf in ("_a", "_b")])
    for name in names:
        k = dvars["params"][name]["Conv_0"]["kernel"]
        sp[name]["kernel"] = np.ascontiguousarray(
            k.reshape(-1, k.shape[-2], k.shape[-1]))
        sp[name]["bn"]["scale"] = dvars["params"][name]["BatchNorm_0"]["scale"]
        sp[name]["bn"]["bias"] = dvars["params"][name]["BatchNorm_0"]["bias"]
        ss[name]["bn"]["mean"] = dvars["batch_stats"][name]["BatchNorm_0"]["mean"]
        ss[name]["bn"]["var"] = dvars["batch_stats"][name]["BatchNorm_0"]["var"]
    for l in (2, 3, 4):
        k = dvars["params"][f"conv{l}_down"]["Conv_0"]["kernel"]
        sp[f"conv{l}_down_kernel"] = np.ascontiguousarray(
            k.reshape(-1, k.shape[-2], k.shape[-1]))
        dbn = dvars["params"][f"conv{l}_down"]["BatchNorm_0"]
        dst = dvars["batch_stats"][f"conv{l}_down"]["BatchNorm_0"]
        sp[f"conv{l}_down_bn"]["scale"] = dbn["scale"]
        sp[f"conv{l}_down_bn"]["bias"] = dbn["bias"]
        ss[f"conv{l}_down_bn"]["mean"] = dst["mean"]
        ss[f"conv{l}_down_bn"]["var"] = dst["var"]
    k = dvars["params"]["conv_out"]["Conv_0"]["kernel"]
    sp["conv_out_kernel"] = np.ascontiguousarray(
        k.reshape(-1, k.shape[-2], k.shape[-1]))
    dbn = dvars["params"]["conv_out"]["BatchNorm_0"]
    dst = dvars["batch_stats"]["conv_out"]["BatchNorm_0"]
    sp["conv_out_bn"]["scale"] = dbn["scale"]
    sp["conv_out_bn"]["bias"] = dbn["bias"]
    ss["conv_out_bn"]["mean"] = dst["mean"]
    ss["conv_out_bn"]["var"] = dst["var"]

    d_bev, d_ms = dense.apply(
        jax.tree.map(jnp.asarray, dvars), jnp.asarray(feats),
        jnp.asarray(coords), train=False)
    s_bev, s_ms = sparse.apply(
        jax.tree.map(jnp.asarray, svars), jnp.asarray(feats),
        jnp.asarray(coords), train=False)

    np.testing.assert_allclose(np.asarray(s_bev), np.asarray(d_bev),
                               rtol=1e-4, atol=1e-4)
    for lvl in (1, 2, 3, 4):
        dgrid = np.asarray(d_ms[f"x_conv{lvl}"])
        c, f, v = s_ms[f"x_conv{lvl}"]
        c, f, v = np.asarray(c), np.asarray(f), np.asarray(v)
        for b in range(B):
            for row in range(c.shape[1]):
                if v[b, row]:
                    z, y, x = c[b, row]
                    np.testing.assert_allclose(
                        f[b, row], dgrid[b, z, y, x],
                        rtol=1e-4, atol=1e-4,
                        err_msg=f"lvl{lvl} b{b} site {(z, y, x)}")


def test_dense_masked_matches_sparse_res_backbone():
    """Same cross-implementation check for the RES pair: masked dense
    VoxelResBackBone8x vs SparseVoxelResBackBone8x with shared weights
    must agree at every active site and on the BEV map."""
    from pdanet_tpu.models.backbones_3d.sparse_backbone import (
        SparseVoxelResBackBone8x,
    )
    from pdanet_tpu.models.backbones_3d.voxel_backbone import (
        VoxelResBackBone8x,
    )

    rng = np.random.RandomState(11)
    nx, ny, nz = 16, 16, 24
    B, V = 1, 40
    cells = np.stack([
        rng.choice(nz * ny * nx, V, replace=False) for _ in range(B)
    ])
    coords = np.stack([cells // (ny * nx), (cells // nx) % ny,
                       cells % nx], -1).astype(np.int32)
    feats = rng.randn(B, V, 4).astype(np.float32)

    dense = VoxelResBackBone8x(
        model_cfg={}, input_channels=4, grid_size=(nx, ny, nz))
    dvars = jax.tree.map(np.asarray, dict(dense.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(coords))))
    # randomized running stats exercise the BN affine at every block
    def rand_stats(tree):
        for k, v in tree.items():
            if k == "mean":
                tree[k] = rng.uniform(-0.2, 0.2, v.shape).astype(np.float32)
            elif k == "var":
                tree[k] = rng.uniform(0.5, 2.0, v.shape).astype(np.float32)
            elif isinstance(v, dict):
                rand_stats(v)
    rand_stats(dvars["batch_stats"])

    sparse = SparseVoxelResBackBone8x(
        model_cfg={"ACTIVE_BUDGETS": [8 * V] * 4},
        input_channels=4, grid_size=(nx, ny, nz))
    svars = jax.tree.map(np.asarray, dict(sparse.init(
        jax.random.PRNGKey(1), jnp.asarray(feats), jnp.asarray(coords))))
    sp, ss = svars["params"], svars["batch_stats"]

    def copy_seq(dname, skern, sbn):
        k = dvars["params"][dname]["Conv_0"]["kernel"]
        dst = sp
        dst[skern] = np.ascontiguousarray(
            k.reshape(-1, k.shape[-2], k.shape[-1]))
        sp[sbn]["scale"] = dvars["params"][dname]["BatchNorm_0"]["scale"]
        sp[sbn]["bias"] = dvars["params"][dname]["BatchNorm_0"]["bias"]
        ss[sbn]["mean"] = dvars["batch_stats"][dname]["BatchNorm_0"]["mean"]
        ss[sbn]["var"] = dvars["batch_stats"][dname]["BatchNorm_0"]["var"]

    # conv_input (dict-layout on the sparse side)
    k = dvars["params"]["conv_input"]["Conv_0"]["kernel"]
    sp["conv_input"]["kernel"] = np.ascontiguousarray(
        k.reshape(-1, k.shape[-2], k.shape[-1]))
    sp["conv_input"]["bn"]["scale"] = \
        dvars["params"]["conv_input"]["BatchNorm_0"]["scale"]
    sp["conv_input"]["bn"]["bias"] = \
        dvars["params"]["conv_input"]["BatchNorm_0"]["bias"]
    ss["conv_input"]["bn"]["mean"] = \
        dvars["batch_stats"]["conv_input"]["BatchNorm_0"]["mean"]
    ss["conv_input"]["bn"]["var"] = \
        dvars["batch_stats"]["conv_input"]["BatchNorm_0"]["var"]
    for name in [f"res{l}_{s}" for l in (1, 2, 3, 4) for s in ("a", "b")]:
        for i in (1, 2):
            k = dvars["params"][name][f"conv{i}"]["kernel"]
            sp[name][f"kernel{i}"] = np.ascontiguousarray(
                k.reshape(-1, k.shape[-2], k.shape[-1]))
            sp[name][f"bn{i}"]["scale"] = \
                dvars["params"][name][f"bn{i}"]["scale"]
            sp[name][f"bn{i}"]["bias"] = \
                dvars["params"][name][f"bn{i}"]["bias"]
            ss[name][f"bn{i}"]["mean"] = \
                dvars["batch_stats"][name][f"bn{i}"]["mean"]
            ss[name][f"bn{i}"]["var"] = \
                dvars["batch_stats"][name][f"bn{i}"]["var"]
    for l in (2, 3, 4):
        copy_seq(f"conv{l}_down", f"conv{l}_down_kernel", f"conv{l}_down_bn")
    copy_seq("conv_out", "conv_out_kernel", "conv_out_bn")

    d_bev, d_ms = dense.apply(
        jax.tree.map(jnp.asarray, dvars), jnp.asarray(feats),
        jnp.asarray(coords), train=False)
    s_bev, s_ms = sparse.apply(
        jax.tree.map(jnp.asarray, svars), jnp.asarray(feats),
        jnp.asarray(coords), train=False)
    np.testing.assert_allclose(np.asarray(s_bev), np.asarray(d_bev),
                               rtol=1e-4, atol=1e-4)
    for lvl in (1, 2, 3, 4):
        dgrid = np.asarray(d_ms[f"x_conv{lvl}"])
        c, f, v = (np.asarray(t) for t in s_ms[f"x_conv{lvl}"])
        for b in range(B):
            for row in range(c.shape[1]):
                if v[b, row]:
                    z, y, x = c[b, row]
                    np.testing.assert_allclose(
                        f[b, row], dgrid[b, z, y, x],
                        rtol=1e-4, atol=1e-4,
                        err_msg=f"lvl{lvl} {(z, y, x)}")


def test_dense_masked_bn_train_stats_match_sparse():
    """DenseMaskedBatchNorm (grid occupancy) and MaskedBatchNorm (sparse
    rows) must compute identical TRAIN-mode statistics and running-stat
    updates over the same active set — training the dense and sparse
    formulations stays equivalent, matching spconv's BN-over-actives."""
    from pdanet_tpu.models.backbones_3d.sparse_backbone import (
        MaskedBatchNorm,
    )
    from pdanet_tpu.models.backbones_3d.voxel_backbone import (
        DenseMaskedBatchNorm,
    )

    rng = np.random.RandomState(5)
    B, V, C = 2, 24, 4
    nx, ny, nz = GRID
    coords = _active(rng, B=B, V=V)
    valid = coords[..., 0] >= 0
    rows = rng.randn(B, V, C).astype(np.float32)
    rows[~valid] = 1e6  # poison padding

    grid = np.zeros((B, nz, ny, nx, C), np.float32)
    occ = np.zeros((B, nz, ny, nx), bool)
    for b in range(B):
        for v in range(V):
            z, y, x = coords[b, v]
            if z >= 0:
                grid[b, z, y, x] = rows[b, v]
                occ[b, z, y, x] = True

    sbn = MaskedBatchNorm(momentum=0.9)
    svars = sbn.init(jax.random.PRNGKey(0), jnp.asarray(rows),
                     jnp.asarray(valid), train=True)
    _, smut = sbn.apply(svars, jnp.asarray(rows), jnp.asarray(valid),
                        train=True, mutable=["batch_stats"])

    dbn = DenseMaskedBatchNorm(momentum=0.9, epsilon=1e-3)
    dvars = dbn.init(jax.random.PRNGKey(0), jnp.asarray(grid),
                     jnp.asarray(occ), train=True)
    dy, dmut = dbn.apply(dvars, jnp.asarray(grid), jnp.asarray(occ),
                         train=True, mutable=["batch_stats"])

    np.testing.assert_allclose(
        np.asarray(dmut["batch_stats"]["mean"]),
        np.asarray(smut["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dmut["batch_stats"]["var"]),
        np.asarray(smut["batch_stats"]["var"]), rtol=1e-5, atol=1e-6)
    # normalized values agree at active sites too
    dy = np.asarray(dy)
    sy = np.asarray(sbn.apply(svars, jnp.asarray(rows), jnp.asarray(valid),
                              train=True, mutable=["batch_stats"])[0])
    for b in range(B):
        for v in range(V):
            z, y, x = coords[b, v]
            if z >= 0:
                np.testing.assert_allclose(dy[b, z, y, x], sy[b, v],
                                           rtol=1e-4, atol=1e-5)
    assert (dy[~occ] == 0).all()


def test_sparse_voxel_query_first_k_vs_oracle():
    """SparseNeighborGridPool's selection must reproduce the CUDA voxel
    query (voxel_query_gpu.cu:11-89): +-QUERY_RANGES window scanned in
    z-major (dz, dy, dx) order, first-NSAMPLE active voxels whose CENTER
    is within radius (dist^2 <= r^2), empty -> ghost relu(mlp_pos(0)).

    The selection itself has no learnable surface, so the check runs the
    module with identity-friendly params: mlp_in/bn_in identity-ish is
    impossible to force exactly, so instead we compare the module against
    a numpy re-aggregation that uses the ORACLE's selected slots with the
    module's own extracted parameters."""
    import flax
    from pdanet_tpu.models.roi_heads.voxelrcnn_head import (
        SparseNeighborGridPool,
    )
    from pdanet_tpu.ops.sparse_conv import stage_grids

    rng = np.random.RandomState(7)
    grid_size = (16, 16, 8)  # (nx, ny, nz)
    stride = 2
    vs_base = np.array([0.2, 0.2, 0.4], np.float32)
    pc_range = np.array([0, -1.6, -1.6, 3.2, 1.6, 1.6], np.float32)
    B, V, C = 1, 40, 6
    G = 24
    q_range = (2, 2, 2)
    nsample = 4
    radius = 1.1

    grids, _ = stage_grids(grid_size)
    gx, gy, gz = grids[1]  # stride-2 level dims (nx, ny, nz)
    cells = rng.permutation(gx * gy * gz)[:V]
    coords = np.stack(
        [cells // (gy * gx), (cells // gx) % gy, cells % gx], axis=-1
    ).astype(np.int32)[None]
    coords[:, -8:] = -1  # padding rows
    feats = rng.randn(B, V, C).astype(np.float32)
    feats[:, -8:] = 0
    query = rng.uniform(
        pc_range[:3] + 0.1, pc_range[3:] - 0.1, (B, G, 3)
    ).astype(np.float32)

    mod = SparseNeighborGridPool(
        mlp=(C, 5, 7), radius=radius, query_range=q_range, nsample=nsample
    )
    variables = mod.init(
        jax.random.PRNGKey(0), tuple(map(jnp.asarray, (
            coords, feats, (coords[..., 0] >= 0)))),
        stride, jnp.asarray(query), tuple(vs_base), tuple(pc_range),
        grid_size, False,
    )
    got = np.asarray(mod.apply(
        variables, tuple(map(jnp.asarray, (
            coords, feats, (coords[..., 0] >= 0)))),
        stride, jnp.asarray(query), tuple(vs_base), tuple(pc_range),
        grid_size, False,
    ))

    # ---- numpy oracle ----
    p = flax.core.unfreeze(variables)["params"]
    s = flax.core.unfreeze(variables)["batch_stats"]

    def dense_bn(x, pn, bn):
        w = np.asarray(p[pn]["kernel"])
        y = x @ w
        mean, var = np.asarray(s[bn]["mean"]), np.asarray(s[bn]["var"])
        sc, bi = np.asarray(p[bn]["scale"]), np.asarray(p[bn]["bias"])
        return (y - mean) / np.sqrt(var + 1e-5) * sc + bi

    f_pre = dense_bn(feats, "mlp_in", "bn_in")
    f_pre[:, -8:] = 0
    vs = vs_base * stride
    origin = pc_range[:3]
    out_ref = np.zeros((B, G, 7), np.float32)
    occ = {}
    for v in range(V):
        z, y, x = coords[0, v]
        if z >= 0:
            occ[(z, y, x)] = v
    for g in range(G):
        q = query[0, g]
        cz, cy, cx = np.floor((q - origin) / vs).astype(np.int64)[::-1]
        hits = []
        for dz in range(-q_range[0], q_range[0] + 1):
            for dy in range(-q_range[1], q_range[1] + 1):
                for dx in range(-q_range[2], q_range[2] + 1):
                    z, y, x = cz + dz, cy + dy, cx + dx
                    if not (0 <= z < gz and 0 <= y < gy and 0 <= x < gx):
                        continue
                    v = occ.get((z, y, x))
                    if v is None:
                        continue
                    center = (np.array([x, y, z], np.float32) + 0.5) * vs + origin
                    d2 = float(np.sum((center - q) ** 2))
                    if d2 > radius * radius:
                        continue
                    hits.append((v, center))
                    if len(hits) >= nsample:
                        break
                else:
                    continue
                break
            else:
                continue
            break
        cands = []
        if not hits:
            cands.append((None, np.zeros(3, np.float32)))  # ghost slot
        for v, center in hits:
            cands.append((f_pre[0, v], center - q))
        hs = []
        for fv, rel in cands:
            pos = dense_bn(rel[None], "mlp_pos", "bn_pos")[0]
            base = np.zeros(5, np.float32) if fv is None else fv
            hs.append(np.maximum(base + pos, 0.0))
        pooled = np.max(np.stack(hs, 0), axis=0)
        out_ref[0, g] = np.maximum(
            dense_bn(pooled[None], "mlp_out", "bn_out")[0], 0.0
        )

    np.testing.assert_allclose(got, out_ref, rtol=2e-4, atol=2e-4)
