"""PV-RCNN++ tests: VectorPool local interpolation vs a numpy oracle,
SPC proximity collapse, and the full detector with SPC sampling +
VectorPool aggregation in PFE and RoI grid pool."""

import copy

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.models.backbones_3d.pfe.vector_pool import (
    VectorPoolAggregationModuleMSG,
    dense_grid_offsets,
    local_interpolate,
)
from pdanet_tpu.models.backbones_3d.pfe.voxel_set_abstraction import (
    spc_proximity_collapse,
)
from pdanet_tpu.utils.easydict import EasyDict

from test_pvrcnn import GRID, PC_RANGE, PVRCNN_MODEL_CFG, VOXEL_SIZE, _make_inputs


def test_dense_grid_offsets():
    offs = dense_grid_offsets(1.2, (2, 2, 2))
    assert offs.shape == (8, 3)
    # 2x2x2 grid in [-R, R]: centers at +-R/2
    np.testing.assert_allclose(sorted(set(np.round(offs[:, 0], 5))),
                               [-0.6, 0.6])
    offs3 = dense_grid_offsets(3.0, (3, 1, 1))
    np.testing.assert_allclose(sorted(offs3[:, 0]), [-2.0, 0.0, 2.0])


def test_local_interpolate_oracle():
    rng = np.random.RandomState(0)
    support = rng.uniform(-2, 2, (1, 32, 3)).astype(np.float32)
    feats = rng.rand(1, 32, 4).astype(np.float32)
    centers = np.concatenate([
        rng.uniform(-1, 1, (1, 5, 3)),
        np.full((1, 1, 3), 50.0),  # out of range -> zeros
    ], axis=1).astype(np.float32)
    max_dist = 1.5
    got = np.asarray(local_interpolate(
        jnp.asarray(support), jnp.asarray(feats), jnp.asarray(centers),
        max_dist,
    ))
    assert got.shape == (1, 6, 13)
    for g in range(5):
        d = np.linalg.norm(support[0] - centers[0, g], axis=-1)
        idx = np.argsort(d)[:3]
        dd = d[idx]
        ok = dd <= max_dist
        w = np.where(ok, 1.0 / (dd + 1e-8), 0.0)
        w = w / max(w.sum(), 1e-8)
        exp = (feats[0, idx] * w[:, None]).sum(0)
        np.testing.assert_allclose(got[0, g, :4], exp, rtol=1e-4, atol=1e-5)
        rel = (centers[0, g] - support[0, idx]).reshape(-1)
        np.testing.assert_allclose(got[0, g, 4:], rel, rtol=1e-4, atol=1e-5)
    assert (got[0, 5] == 0).all()


def test_spc_proximity_collapse():
    xyz = np.array([[[0.0, 0, 0], [1, 0, 0], [30, 0, 0], [31, 0, 0]]],
                   np.float32)
    rois = np.zeros((1, 2, 7), np.float32)
    rois[0, 0] = [0.5, 0, 0, 2, 2, 2, 0]  # half diag ~1.73
    out = np.asarray(spc_proximity_collapse(
        jnp.asarray(xyz), jnp.asarray(rois), 1.0
    ))
    np.testing.assert_allclose(out[0, 0], xyz[0, 0])
    np.testing.assert_allclose(out[0, 1], xyz[0, 1])
    # far points collapse onto the first kept point
    np.testing.assert_allclose(out[0, 2], xyz[0, 0])
    np.testing.assert_allclose(out[0, 3], xyz[0, 0])

    # no valid roi: everything kept
    out2 = np.asarray(spc_proximity_collapse(
        jnp.asarray(xyz), jnp.zeros((1, 2, 7), np.float32), 1.0
    ))
    np.testing.assert_allclose(out2, xyz)


def test_vector_pool_msg_shapes():
    cfg = EasyDict({
        "NUM_GROUPS": 2,
        "LOCAL_AGGREGATION_TYPE": "local_interpolation",
        "NUM_REDUCED_CHANNELS": 2,
        "NUM_CHANNELS_OF_LOCAL_AGGREGATION": 4,
        "MSG_POST_MLPS": [16],
        "GROUP_CFG_0": {"NUM_LOCAL_VOXEL": [2, 2, 2],
                        "MAX_NEIGHBOR_DISTANCE": 0.6,
                        "NEIGHBOR_NSAMPLE": -1, "POST_MLPS": [8, 8]},
        "GROUP_CFG_1": {"NUM_LOCAL_VOXEL": [3, 3, 3],
                        "MAX_NEIGHBOR_DISTANCE": 1.2,
                        "NEIGHBOR_NSAMPLE": -1, "POST_MLPS": [8, 8]},
    })
    rng = np.random.RandomState(1)
    xyz = rng.uniform(-2, 2, (2, 64, 3)).astype(np.float32)
    feats = rng.rand(2, 64, 4).astype(np.float32)
    new_xyz = rng.uniform(-1, 1, (2, 8, 3)).astype(np.float32)
    mod = VectorPoolAggregationModuleMSG(input_channels=4, config=cfg)
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(xyz),
                     jnp.asarray(feats), jnp.asarray(new_xyz))
    out = mod.apply(vars_, jnp.asarray(xyz), jnp.asarray(feats),
                    jnp.asarray(new_xyz))
    assert out.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def _pp_cfg():
    cfg = copy.deepcopy(PVRCNN_MODEL_CFG)
    cfg["NAME"] = "PVRCNNPlusPlus"
    pfe = cfg["PFE"]
    pfe["SAMPLE_METHOD"] = "SPC"
    pfe["SPC_SAMPLING"] = {"NUM_SECTORS": 6, "SAMPLE_RADIUS_WITH_ROI": 1.6}
    pfe["FEATURES_SOURCE"] = ["bev", "x_conv3", "x_conv4", "raw_points"]
    vp = {
        "NAME": "VectorPoolAggregationModuleMSG",
        "NUM_GROUPS": 2,
        "LOCAL_AGGREGATION_TYPE": "local_interpolation",
        "NUM_REDUCED_CHANNELS": 1,
        "NUM_CHANNELS_OF_LOCAL_AGGREGATION": 4,
        "MSG_POST_MLPS": [8],
        "GROUP_CFG_0": {"NUM_LOCAL_VOXEL": [2, 2, 2],
                        "MAX_NEIGHBOR_DISTANCE": 0.4,
                        "NEIGHBOR_NSAMPLE": -1, "POST_MLPS": [8, 8]},
        "GROUP_CFG_1": {"NUM_LOCAL_VOXEL": [2, 2, 2],
                        "MAX_NEIGHBOR_DISTANCE": 0.8,
                        "NEIGHBOR_NSAMPLE": -1, "POST_MLPS": [8, 8]},
    }
    pfe["SA_LAYER"] = {
        "raw_points": dict(vp),
        "x_conv3": dict(vp, DOWNSAMPLE_FACTOR=4, MAX_VOXELS=32,
                        NUM_REDUCED_CHANNELS=8),
        "x_conv4": dict(vp, DOWNSAMPLE_FACTOR=8, MAX_VOXELS=16,
                        NUM_REDUCED_CHANNELS=8),
    }
    cfg["ROI_HEAD"]["ROI_GRID_POOL"] = dict(
        vp, GRID_SIZE=3, NUM_REDUCED_CHANNELS=8,
    )
    return cfg


def test_pvrcnn_pp_forward_and_loss():
    cfg = _pp_cfg()
    model = build_network(
        EasyDict(cfg), num_class=2,
        grid_size=GRID, voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
        class_names=("Car", "Pedestrian"),
    )
    voxels, coords, nums, points = _make_inputs(seed=9)
    variables = model.init(
        jax.random.PRNGKey(0), voxels, coords, nums, points
    )
    out = jax.jit(
        lambda v, a, b, c, p: model.apply(v, a, b, c, p, train=False)
    )(variables, voxels, coords, nums, points)
    P = cfg["ROI_HEAD"]["NMS_CONFIG"]["TEST"]["NMS_POST_MAXSIZE"]
    assert out["batch_box_preds"].shape == (1, P, 7)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [1.5, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]
    batch = {
        "voxels": jnp.asarray(voxels), "voxel_coords": jnp.asarray(coords),
        "voxel_num_points": jnp.asarray(nums),
        "points": jnp.asarray(points), "gt_boxes": jnp.asarray(gt),
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
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    for part in ("roi_head", "pfe"):
        part_grads = jax.tree_util.tree_leaves(grads[part])
        assert any(float(jnp.abs(g).max()) > 0 for g in part_grads), part
