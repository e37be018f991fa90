"""PV-RCNN stack tests: occupancy pyramid vs a numpy dilate+downsample
oracle, static non-empty voxel extraction, masked stack-SA empty-ball
semantics, BEV bilinear interpolation vs the reference formula, and the
full detector forward/loss/grads."""

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.models.backbones_3d.pfe.voxel_set_abstraction import (
    FAR_SENTINEL,
    MaskedSAModuleMSG,
    bilinear_interpolate,
    dense_to_voxel_list,
    multi_scale_occupancy,
)
from pdanet_tpu.utils.easydict import EasyDict

GRID = (32, 32, 8)  # (nx, ny, nz)
VOXEL_SIZE = (0.2, 0.2, 0.5)
PC_RANGE = (0.0, -3.2, -3.0, 6.4, 3.2, 1.0)

PVRCNN_MODEL_CFG = {
    "NAME": "PVRCNN",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {
        "NAME": "VoxelBackBone8x",
        "NUM_FILTERS": [4, 4, 8, 8, 8],
        "NUM_OUTPUT_FEATURES": 16,
    },
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 16},
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [16, 32], "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [16, 16],
    },
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
        "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "ANCHOR_GENERATOR_CONFIG": [
            {"class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
             "align_center": False, "feature_map_stride": 8,
             "matched_threshold": 0.6, "unmatched_threshold": 0.45},
            {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
             "align_center": False, "feature_map_stride": 8,
             "matched_threshold": 0.5, "unmatched_threshold": 0.35},
        ],
        "TARGET_ASSIGNER_CONFIG": {
            "NAME": "AxisAlignedTargetAssigner", "POS_FRACTION": -1.0,
            "SAMPLE_SIZE": 512, "NORM_BY_NUM_EXAMPLES": False,
            "MATCH_HEIGHT": False, "BOX_CODER": "ResidualCoder",
        },
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7,
            }
        },
    },
    "PFE": {
        "NAME": "VoxelSetAbstraction",
        "POINT_SOURCE": "raw_points",
        "NUM_KEYPOINTS": 32,
        "NUM_OUTPUT_FEATURES": 32,
        "SAMPLE_METHOD": "FPS",
        "FEATURES_SOURCE": [
            "bev", "x_conv1", "x_conv2", "x_conv3", "x_conv4", "raw_points",
        ],
        "SA_LAYER": {
            "raw_points": {
                "MLPS": [[4, 4], [4, 4]],
                "POOL_RADIUS": [0.4, 0.8], "NSAMPLE": [8, 8],
            },
            "x_conv1": {
                "DOWNSAMPLE_FACTOR": 1, "MAX_VOXELS": 64,
                "MLPS": [[4, 4], [4, 4]],
                "POOL_RADIUS": [0.4, 0.8], "NSAMPLE": [8, 8],
            },
            "x_conv2": {
                "DOWNSAMPLE_FACTOR": 2, "MAX_VOXELS": 64,
                "MLPS": [[4, 4], [4, 4]],
                "POOL_RADIUS": [0.8, 1.2], "NSAMPLE": [8, 8],
            },
            "x_conv3": {
                "DOWNSAMPLE_FACTOR": 4, "MAX_VOXELS": 32,
                "MLPS": [[8, 8], [8, 8]],
                "POOL_RADIUS": [1.2, 2.4], "NSAMPLE": [8, 8],
            },
            "x_conv4": {
                "DOWNSAMPLE_FACTOR": 8, "MAX_VOXELS": 16,
                "MLPS": [[8, 8], [8, 8]],
                "POOL_RADIUS": [2.4, 4.8], "NSAMPLE": [8, 8],
            },
        },
    },
    "POINT_HEAD": {
        "NAME": "PointHeadSimple",
        "CLS_FC": [16], "CLASS_AGNOSTIC": True,
        "USE_POINT_FEATURES_BEFORE_FUSION": True,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0}},
    },
    "ROI_HEAD": {
        "NAME": "PVRCNNHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "CLS_FC": [16], "REG_FC": [16],
        "DP_RATIO": 0.3,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7},
        },
        "ROI_GRID_POOL": {
            "GRID_SIZE": 3, "MLPS": [[8, 8], [8, 8]],
            "POOL_RADIUS": [0.8, 1.6], "NSAMPLE": [8, 8],
            "POOL_METHOD": "max_pool",
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
            "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
            "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
            "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
        },
        "LOSS_CONFIG": {
            "CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
            "CORNER_LOSS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {
                "rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                "rcnn_corner_weight": 1.0, "code_weights": [1.0] * 7,
            },
        },
    },
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
        "SCORE_THRESH": 0.1,
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 128,
                       "NMS_POST_MAXSIZE": 16},
    },
}


def test_multi_scale_occupancy_oracle():
    rng = np.random.RandomState(0)
    B, V = 2, 40
    nx, ny, nz = GRID
    coords = np.stack(
        [rng.randint(0, nz, (B, V)), rng.randint(0, ny, (B, V)),
         rng.randint(0, nx, (B, V))], axis=-1,
    ).astype(np.int32)
    coords[:, -8:] = -1
    occ = multi_scale_occupancy(jnp.asarray(coords), GRID, (1, 2, 4, 8))

    # stride-1 grid carries the reference's empty top z plane (+1)
    dense = np.zeros((B, nz + 1, ny, nx), bool)
    for b in range(B):
        for v in range(V - 8):
            z, y, x = coords[b, v]
            dense[b, z, y, x] = True
    assert (np.asarray(occ[1]) == dense).all()

    def pool(o):
        # torch pad-1 window (k=3, s=2): start = 2*i - 1
        B, Z, Y, X = o.shape
        oz, oy, ox = (Z + 1) // 2, (Y + 1) // 2, (X + 1) // 2
        out = np.zeros((B, oz, oy, ox), bool)
        for b in range(B):
            for zz in range(oz):
                for yy in range(oy):
                    for xx in range(ox):
                        def rng_(i, n):
                            return max(2 * i - 1, 0), min(2 * i + 2, n)
                        zl, zh = rng_(zz, Z)
                        yl, yh = rng_(yy, Y)
                        xl, xh = rng_(xx, X)
                        out[b, zz, yy, xx] = o[b, zl:zh, yl:yh, xl:xh].any()
        return out

    o2 = pool(dense)
    assert (np.asarray(occ[2]) == o2).all()
    assert (np.asarray(occ[4]) == pool(o2)).all()


def test_dense_to_voxel_list():
    rng = np.random.RandomState(1)
    B, Z, Y, X, C = 1, 2, 4, 4, 3
    occ = np.zeros((B, Z, Y, X), bool)
    actives = [(0, 1, 2), (1, 0, 0), (1, 3, 3)]
    for z, y, x in actives:
        occ[0, z, y, x] = True
    grid = rng.rand(B, Z, Y, X, C).astype(np.float32)
    V = 8
    centers, feats, valid = dense_to_voxel_list(
        jnp.asarray(grid), jnp.asarray(occ), V, 2, VOXEL_SIZE, PC_RANGE
    )
    got_valid = np.asarray(valid[0])
    assert got_valid.sum() == 3
    # scan order (z, y, x) with first-V determinism
    exp_centers = []
    for z, y, x in sorted(actives):
        exp_centers.append([
            PC_RANGE[0] + (x + 0.5) * VOXEL_SIZE[0] * 2,
            PC_RANGE[1] + (y + 0.5) * VOXEL_SIZE[1] * 2,
            PC_RANGE[2] + (z + 0.5) * VOXEL_SIZE[2] * 2,
        ])
    np.testing.assert_allclose(
        np.asarray(centers[0])[:3], np.array(exp_centers, np.float32),
        rtol=1e-5,
    )
    for i, (z, y, x) in enumerate(sorted(actives)):
        np.testing.assert_allclose(
            np.asarray(feats[0, i]), grid[0, z, y, x], rtol=1e-6
        )
    assert (np.asarray(centers[0])[3:] == FAR_SENTINEL).all()
    assert (np.asarray(feats[0])[3:] == 0).all()


def test_masked_sa_empty_ball():
    """Centers with no in-radius support points must produce exactly 0."""
    rng = np.random.RandomState(2)
    xyz = rng.rand(1, 32, 3).astype(np.float32)  # cluster near origin cube
    feats = rng.rand(1, 32, 2).astype(np.float32)
    new_xyz = np.array([[[0.5, 0.5, 0.5], [50.0, 50.0, 50.0]]], np.float32)
    mod = MaskedSAModuleMSG(radii=(0.9,), nsamples=(8,), mlps=((4, 4),))
    vars_ = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.asarray(feats),
        jnp.asarray(new_xyz),
    )
    out = np.asarray(mod.apply(
        vars_, jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(new_xyz)
    ))
    assert out.shape == (1, 2, 4)
    assert np.abs(out[0, 0]).max() > 0
    assert (out[0, 1] == 0).all()


def test_bilinear_interpolate_oracle():
    rng = np.random.RandomState(3)
    im = rng.rand(4, 5, 2).astype(np.float32)
    x = np.array([0.0, 1.5, 3.9, -1.0, 10.0], np.float32)
    y = np.array([0.0, 0.5, 2.2, -0.5, 10.0], np.float32)
    got = np.asarray(bilinear_interpolate(
        jnp.asarray(im), jnp.asarray(x), jnp.asarray(y)
    ))
    H, W = 4, 5
    for i in range(len(x)):
        x0, y0 = int(np.floor(x[i])), int(np.floor(y[i]))
        xs = [min(max(v, 0), W - 1) for v in (x0, x0 + 1)]
        ys = [min(max(v, 0), H - 1) for v in (y0, y0 + 1)]
        wa = (x0 + 1 - x[i]) * (y0 + 1 - y[i])
        wb = (x0 + 1 - x[i]) * (y[i] - y0)
        wc = (x[i] - x0) * (y0 + 1 - y[i])
        wd = (x[i] - x0) * (y[i] - y0)
        exp = (im[ys[0], xs[0]] * wa + im[ys[1], xs[0]] * wb
               + im[ys[0], xs[1]] * wc + im[ys[1], xs[1]] * wd)
        np.testing.assert_allclose(got[i], exp, rtol=1e-4, atol=1e-5)


def _make_inputs(B=1, V=64, P=5, N=128, C=4, seed=0):
    rng = np.random.RandomState(seed)
    voxels = rng.rand(B, V, P, C).astype(np.float32)
    nums = rng.randint(1, P + 1, (B, V)).astype(np.int32)
    for b in range(B):
        for v in range(V):
            voxels[b, v, nums[b, v]:] = 0
    nx, ny, nz = GRID
    coords = np.stack(
        [rng.randint(0, nz, (B, V)), rng.randint(0, ny, (B, V)),
         rng.randint(0, nx, (B, V))], axis=-1,
    ).astype(np.int32)
    coords[:, -V // 4:] = -1
    voxels[:, -V // 4:] = 0
    nums[:, -V // 4:] = 0
    points = np.concatenate([
        rng.uniform(0, 6.4, (B, N, 1)),
        rng.uniform(-3.2, 3.2, (B, N, 1)),
        rng.uniform(-3, 1, (B, N, 1)),
        rng.rand(B, N, 1),
    ], axis=-1).astype(np.float32)
    return voxels, coords, nums, points


def _build():
    return build_network(
        EasyDict(PVRCNN_MODEL_CFG), num_class=2,
        grid_size=GRID, voxel_size=VOXEL_SIZE,
        point_cloud_range=PC_RANGE,
        class_names=("Car", "Pedestrian"),
    )


def test_pvrcnn_forward_and_loss():
    model = _build()
    voxels, coords, nums, points = _make_inputs(seed=4)
    variables = model.init(
        jax.random.PRNGKey(0), voxels, coords, nums, points
    )
    out = jax.jit(
        lambda v, a, b, c, p: model.apply(v, a, b, c, p, train=False)
    )(variables, voxels, coords, nums, points)
    assert out["point_coords"].shape == (1, 32, 3)
    assert out["point_features"].shape == (1, 32, 32)
    assert out["point_cls_scores"].shape == (1, 32)
    P = PVRCNN_MODEL_CFG["ROI_HEAD"]["NMS_CONFIG"]["TEST"]["NMS_POST_MAXSIZE"]
    assert out["batch_box_preds"].shape == (1, P, 7)
    assert out["rcnn_cls"].shape == (1, P, 1)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    from pdanet_tpu.models.detectors.voxel_rcnn import post_processing

    pred = jax.jit(
        lambda o: post_processing(o, EasyDict(PVRCNN_MODEL_CFG))
    )(out)
    assert pred["pred_boxes"].shape[0] == 1

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
    assert "point_loss_cls" in tb and "rcnn_loss" in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # second stage and VSA both receive gradient
    for part in ("roi_head", "pfe", "point_head"):
        part_grads = jax.tree_util.tree_leaves(grads[part])
        assert any(float(jnp.abs(g).max()) > 0 for g in part_grads), part
