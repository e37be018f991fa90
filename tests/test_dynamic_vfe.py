"""Dynamic VFE tests: scatter-mean grid vs a numpy oracle, pillar
feature geometry, and SECOND/PointPillar driven from the raw cloud."""

import copy

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.models.backbones_3d.vfe.dynamic_mean_vfe import DynamicMeanVFE
from pdanet_tpu.models.backbones_3d.vfe.dynamic_pillar_vfe import (
    DynamicPillarVFE,
)
from pdanet_tpu.utils.easydict import EasyDict

GRID = (32, 32, 8)
VOXEL_SIZE = (0.2, 0.2, 0.5)
PC_RANGE = (0.0, -3.2, -3.0, 6.4, 3.2, 1.0)


def _points(B=1, N=128, seed=0):
    rng = np.random.RandomState(seed)
    return np.concatenate([
        rng.uniform(-0.5, 6.9, (B, N, 1)),  # some out of range
        rng.uniform(-3.2, 3.2, (B, N, 1)),
        rng.uniform(-3, 1, (B, N, 1)),
        rng.rand(B, N, 1),
    ], axis=-1).astype(np.float32)


def test_dynamic_mean_vfe_oracle():
    pts = _points(seed=1)
    vfe = DynamicMeanVFE(
        model_cfg={}, num_point_features=4, grid_size=GRID,
        voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
    )
    grid = np.asarray(vfe.apply({}, jnp.asarray(pts)))
    nx, ny, nz = GRID
    assert grid.shape == (1, nz, ny, nx, 4)

    # numpy oracle
    acc = np.zeros((nz, ny, nx, 4), np.float64)
    cnt = np.zeros((nz, ny, nx), np.int64)
    for p in pts[0]:
        c = np.floor((p[:3] - np.array(PC_RANGE[:3])) / VOXEL_SIZE).astype(int)
        if (c >= 0).all() and (c < [nx, ny, nz]).all():
            acc[c[2], c[1], c[0]] += p
            cnt[c[2], c[1], c[0]] += 1
    mean = acc / np.maximum(cnt, 1)[..., None]
    np.testing.assert_allclose(grid[0], mean, rtol=1e-5, atol=1e-6)


def test_dynamic_pillar_vfe_geometry():
    # one isolated point: f_cluster must be 0, f_center the exact offset
    pts = np.zeros((1, 2, 4), np.float32)
    pts[0, 0] = [1.23, 0.47, -0.8, 0.5]
    pts[0, 1] = [5.0, -2.0, 0.0, 0.1]
    cfg = {
        "NAME": "DynamicPillarVFE", "WITH_DISTANCE": False,
        "USE_ABSLOTE_XYZ": True, "USE_NORM": True, "NUM_FILTERS": [8],
    }
    vfe = DynamicPillarVFE(
        model_cfg=cfg, num_point_features=4, grid_size=GRID,
        voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
    )
    vars_ = vfe.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    out = vfe.apply(vars_, jnp.asarray(pts))
    nx, ny, _ = GRID
    assert out.shape == (1, ny, nx, 8)
    # the pillar holding point 0 is non-zero, empty pillars are zero
    cx = int((1.23 - PC_RANGE[0]) / VOXEL_SIZE[0])
    cy = int((0.47 - PC_RANGE[1]) / VOXEL_SIZE[1])
    assert float(jnp.abs(out[0, cy, cx]).max()) > 0
    assert float(jnp.abs(out[0, 0, 0]).max()) == 0


def test_second_with_dynamic_mean_vfe():
    from test_second import GRID as G2, SECOND_MODEL_CFG

    cfg = EasyDict(copy.deepcopy(dict(SECOND_MODEL_CFG)))
    cfg.VFE = {"NAME": "DynamicMeanVFE"}
    model = build_network(
        cfg, num_class=2, grid_size=G2, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"),
    )
    assert model.DEVICE_BATCH_KEYS == ("points", "gt_boxes")
    pts = _points(seed=2)
    variables = model.init(jax.random.PRNGKey(0), pts, None, None)
    out = jax.jit(
        lambda v, p: model.apply(v, p, None, None, train=False)
    )(variables, pts)
    assert out["batch_box_preds"].shape[0] == 1
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [1.5, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]
    batch = {"points": jnp.asarray(pts), "gt_boxes": jnp.asarray(gt)}

    def loss_fn(params):
        def fwd_loss(mdl, b):
            o = mdl.forward_batch(b, train=True)
            return mdl.loss_batch(o, b)

        (loss, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, mutable=["batch_stats"], method=fwd_loss,
        )
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_pointpillar_with_dynamic_pillar_vfe():
    from test_pointpillar import PP_MODEL_CFG

    cfg = EasyDict(copy.deepcopy(dict(PP_MODEL_CFG)))
    cfg.VFE = {
        "NAME": "DynamicPillarVFE", "WITH_DISTANCE": False,
        "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
        "NUM_FILTERS": [cfg.MAP_TO_BEV.NUM_BEV_FEATURES],
    }
    model = build_network(
        cfg, num_class=2, grid_size=(32, 32, 1),
        voxel_size=(0.2, 0.2, 4.0),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"),
    )
    pts = _points(seed=3)
    variables = model.init(jax.random.PRNGKey(0), pts, None, None)
    out = jax.jit(
        lambda v, p: model.apply(v, p, None, None, train=False)
    )(variables, pts)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
