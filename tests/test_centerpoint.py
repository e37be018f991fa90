"""CenterPoint family tests: vectorized heatmap targets vs the reference's
per-box drawing loop (numpy oracle), forward/decode shapes, loss grads,
and the shared DP train step."""

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.utils.easydict import EasyDict

GRID = (32, 32, 8)  # (nx, ny, nz)
VOXEL = (0.2, 0.2, 0.5)
PC_RANGE = (0.0, -3.2, -3.0, 6.4, 3.2, 1.0)

CP_MODEL_CFG = {
    "NAME": "CenterPoint",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {"NAME": "VoxelResBackBone8x"},
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 128},
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2], "LAYER_STRIDES": [1],
        "NUM_FILTERS": [16], "UPSAMPLE_STRIDES": [2],
        "NUM_UPSAMPLE_FILTERS": [16],
    },
    "DENSE_HEAD": {
        "NAME": "CenterHead", "CLASS_AGNOSTIC": False,
        "CLASS_NAMES_EACH_HEAD": [["Car", "Pedestrian"]],
        "SHARED_CONV_CHANNEL": 16,
        "USE_BIAS_BEFORE_NORM": True,
        "NUM_HM_CONV": 2,
        "SEPARATE_HEAD_CFG": {
            "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
            "HEAD_DICT": {
                "center": {"out_channels": 2, "num_conv": 2},
                "center_z": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
            },
        },
        "TARGET_ASSIGNER_CONFIG": {
            "FEATURE_MAP_STRIDE": 4, "NUM_MAX_OBJS": 500,
            "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2,
        },
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0,
                "code_weights": [1.0] * 8,
            }
        },
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "POST_CENTER_LIMIT_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4],
            "MAX_OBJ_PER_SAMPLE": 64,
            "NMS_CONFIG": {
                "NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 32,
            },
        },
    },
}


def _make_inputs(B=1, V=64, P=5, C=4, seed=0):
    rng = np.random.RandomState(seed)
    voxels = rng.rand(B, V, P, C).astype(np.float32)
    nums = rng.randint(1, P + 1, (B, V)).astype(np.int32)
    nx, ny, nz = GRID
    coords = np.stack(
        [rng.randint(0, nz, (B, V)), rng.randint(0, ny, (B, V)),
         rng.randint(0, nx, (B, V))], axis=-1,
    ).astype(np.int32)
    coords[:, -V // 4:] = -1
    voxels[:, -V // 4:] = 0
    nums[:, -V // 4:] = 0
    return voxels, coords, nums


def _build():
    return build_network(
        EasyDict(CP_MODEL_CFG), num_class=2,
        grid_size=GRID, voxel_size=VOXEL, point_cloud_range=PC_RANGE,
        class_names=("Car", "Pedestrian"),
    )


def _gt(B=1):
    gt = np.zeros((B, 4, 8), np.float32)
    gt[:, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [1.5, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]
    gt[:, 2] = [5.0, 2.0, -0.5, 1.76, 0.6, 1.73, 1.2, 1]
    return gt


# ---- numpy oracle of the reference target assigner ----

def _gaussian_radius_np(h, w, overlap):
    a1, b1 = 1, h + w
    c1 = w * h * (1 - overlap) / (1 + overlap)
    r1 = (b1 + np.sqrt(b1**2 - 4 * a1 * c1)) / 2
    a2, b2, c2 = 4, 2 * (h + w), (1 - overlap) * w * h
    r2 = (b2 + np.sqrt(b2**2 - 4 * a2 * c2)) / 2
    a3 = 4 * overlap
    b3 = -2 * overlap * (h + w)
    c3 = (overlap - 1) * w * h
    r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


def _assign_oracle(gt_boxes, class_ids, size_xy, stride, pc_range, voxel,
                   overlap=0.1, min_radius=2):
    """Direct port of center_head.py:105-161 (per-box loops, patch draw)."""
    W, H = size_xy
    C = len(class_ids)
    heatmap = np.zeros((C, H, W), np.float32)
    M = gt_boxes.shape[0]
    ret = np.zeros((M, 8), np.float32)
    inds = np.zeros((M,), np.int64)
    mask = np.zeros((M,), np.int64)
    for k in range(M):
        b = gt_boxes[k]
        if not np.any(b[:7]):
            continue
        if int(b[7]) not in class_ids:
            continue
        cls_local = class_ids.index(int(b[7]))
        cx = np.clip((b[0] - pc_range[0]) / voxel[0] / stride, 0, W - 0.5)
        cy = np.clip((b[1] - pc_range[1]) / voxel[1] / stride, 0, H - 0.5)
        xi, yi = int(cx), int(cy)
        dxg = b[3] / voxel[0] / stride
        dyg = b[4] / voxel[1] / stride
        if dxg <= 0 or dyg <= 0:
            continue
        if not (0 <= xi <= W and 0 <= yi <= H):
            continue
        radius = max(int(_gaussian_radius_np(dxg, dyg, overlap)), min_radius)
        # draw_gaussian_to_heatmap (centernet_utils.py:47-70)
        d = 2 * radius + 1
        sigma = d / 6.0
        ys, xs = np.ogrid[-radius:radius + 1, -radius:radius + 1]
        g = np.exp(-(xs * xs + ys * ys) / (2 * sigma * sigma))
        left, right = min(xi, radius), min(W - xi, radius + 1)
        top, bottom = min(yi, radius), min(H - yi, radius + 1)
        patch = heatmap[cls_local, yi - top:yi + bottom, xi - left:xi + right]
        gpatch = g[radius - top:radius + bottom, radius - left:radius + right]
        np.maximum(patch, gpatch, out=patch)
        inds[k] = yi * W + xi
        mask[k] = 1
        ret[k, 0:2] = [cx - xi, cy - yi]
        ret[k, 2] = b[2]
        ret[k, 3:6] = np.log(b[3:6])
        ret[k, 6] = np.cos(b[6])
        ret[k, 7] = np.sin(b[6])
    return heatmap, ret, inds, mask


def test_heatmap_targets_vs_oracle():
    from pdanet_tpu.models.dense_heads.center_head import (
        assign_targets_single_head,
    )

    rng = np.random.RandomState(3)
    B, M = 2, 8
    gt = np.zeros((B, M, 8), np.float32)
    for b in range(B):
        n = rng.randint(2, M)
        gt[b, :n, 0] = rng.uniform(0.2, 6.0, n)
        gt[b, :n, 1] = rng.uniform(-3.0, 3.0, n)
        gt[b, :n, 2] = rng.uniform(-1.5, 0.5, n)
        gt[b, :n, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
        gt[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[b, :n, 7] = rng.randint(1, 3, n)
    size_xy = (GRID[0] // 4, GRID[1] // 4)

    got = jax.jit(
        lambda g: assign_targets_single_head(
            g, (1, 2), size_xy, 4, np.asarray(PC_RANGE), np.asarray(VOXEL)
        )
    )(jnp.asarray(gt))

    for b in range(B):
        hm, ret, inds, mask = _assign_oracle(
            gt[b], [1, 2], size_xy, 4, PC_RANGE, VOXEL
        )
        np.testing.assert_allclose(
            np.asarray(got["heatmap"][b]).transpose(2, 0, 1), hm,
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_array_equal(np.asarray(got["inds"][b]), inds)
        np.testing.assert_array_equal(
            np.asarray(got["mask"][b]).astype(np.int64), mask
        )
        np.testing.assert_allclose(
            np.asarray(got["target_boxes"][b]) * mask[:, None],
            ret * mask[:, None], rtol=1e-5, atol=1e-6,
        )


def test_centerpoint_forward_and_post():
    from pdanet_tpu.models.detectors.centerpoint import post_processing

    model = _build()
    voxels, coords, nums = _make_inputs()
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    out = jax.jit(
        lambda p, a, b, c: model.apply(p, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    K = CP_MODEL_CFG["DENSE_HEAD"]["POST_PROCESSING"]["MAX_OBJ_PER_SAMPLE"]
    assert out["batch_box_preds"].shape == (1, K, 7)
    assert out["batch_score_preds"].shape == (1, K)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
    # labels 1-based within the head's class set
    labs = np.asarray(out["batch_label_preds"])
    assert labs.min() >= 1 and labs.max() <= 2

    pred = jax.jit(
        lambda o: post_processing(
            o, EasyDict(CP_MODEL_CFG["DENSE_HEAD"]["POST_PROCESSING"])
        )
    )(out)
    assert pred["pred_boxes"].shape == (1, 32, 7)
    assert int(pred["pred_counts"][0]) <= 32


def test_centerpoint_loss_and_grads():
    model = _build()
    voxels, coords, nums = _make_inputs(seed=1)
    variables = model.init(jax.random.PRNGKey(1), voxels, coords, nums)
    gt = jnp.asarray(_gt())

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            voxels, coords, nums, train=True, mutable=["batch_stats"],
        )
        loss, tb = model.apply(variables, out, gt, method=model.loss)
        return loss, tb

    (loss, tb), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"]
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert "hm_loss_head_0" in tb and "loc_loss_head_0" in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_centerpoint_dp_train_step():
    import optax

    from pdanet_tpu.parallel import make_data_mesh, replicate, shard_batch
    from pdanet_tpu.train.train_utils import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    model = _build()
    voxels, coords, nums = _make_inputs(B=8, V=64, seed=2)
    variables = model.init(
        jax.random.PRNGKey(2), voxels[:1], coords[:1], nums[:1]
    )
    tx = optax.adam(1e-3)
    state = create_train_state(model, variables, tx)
    mesh = make_data_mesh()
    step = jit_train_step(make_train_step(model, tx), mesh)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, {
        "voxels": jnp.asarray(voxels),
        "voxel_coords": jnp.asarray(coords),
        "voxel_num_points": jnp.asarray(nums),
        "gt_boxes": jnp.asarray(_gt(B=8)),
    })
    losses = []
    for _ in range(4):
        state, loss, tb = step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses


def test_centerpoint_with_sparse_res_backbone():
    """CenterPoint over SparseVoxelResBackBone8x (the full-res config's
    backbone, centerpoint.yaml): forward decodes finite boxes and the
    loss produces finite nonzero backbone gradients."""
    import copy

    cfg = EasyDict(copy.deepcopy(CP_MODEL_CFG))
    cfg.BACKBONE_3D = {"NAME": "SparseVoxelResBackBone8x",
                       "ACTIVE_BUDGETS": [128, 128, 128, 64]}
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=VOXEL,
        point_cloud_range=PC_RANGE, class_names=("Car", "Pedestrian"))
    voxels, coords, nums = _make_inputs(seed=21)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    gt = np.zeros((1, 1, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]

    def loss_fn(params):
        def fwd_loss(mdl):
            o = mdl(jnp.asarray(voxels), jnp.asarray(coords),
                    jnp.asarray(nums), train=True)
            return mdl.loss(o, jnp.asarray(gt))

        (loss, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            mutable=["batch_stats"], method=fwd_loss,
        )
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    bb = jax.tree_util.tree_leaves(grads["backbone_3d"])
    assert any(float(jnp.abs(g).max()) > 0 for g in bb)
