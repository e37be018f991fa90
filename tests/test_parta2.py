"""Part-A2 tests: UNet decoder shapes/voxel gather, intra-part labels vs
a numpy oracle, and detector forward/loss/grads."""

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.utils.easydict import EasyDict

GRID = (32, 32, 8)
VOXEL_SIZE = (0.2, 0.2, 0.5)
PC_RANGE = (0.0, -3.2, -3.0, 6.4, 3.2, 1.0)

PARTA2_MODEL_CFG = {
    "NAME": "PartA2Net",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {"NAME": "UNetV2"},
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
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
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
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
    "POINT_HEAD": {
        "NAME": "PointIntraPartOffsetHead",
        "CLS_FC": [], "PART_FC": [],
        "CLASS_AGNOSTIC": True,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "point_cls_weight": 1.0, "point_part_weight": 1.0,
            }
        },
    },
    "ROI_HEAD": {
        "NAME": "PartA2FCHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "CLS_FC": [16], "REG_FC": [16],
        "DP_RATIO": 0.3, "SEG_MASK_SCORE_THRESH": 0.3,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7},
        },
        "ROI_AWARE_POOL": {
            "POOL_SIZE": 4, "NUM_FEATURES": 16, "MAX_POINTS_PER_VOXEL": 128,
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
            "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
            "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
            "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.65,
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


def test_unet_decoder_shapes_and_gather():
    from pdanet_tpu.models.backbones_3d.voxel_unet import (
        UNetV2,
        gather_from_dense,
    )

    rng = np.random.RandomState(0)
    B, V = 1, 32
    nx, ny, nz = GRID
    coords = np.stack(
        [rng.randint(0, nz, (B, V)), rng.randint(0, ny, (B, V)),
         rng.randint(0, nx, (B, V))], axis=-1,
    ).astype(np.int32)
    coords[:, -8:] = -1
    feats = rng.rand(B, V, 4).astype(np.float32)
    net = UNetV2(model_cfg={}, input_channels=4, grid_size=GRID)
    vars_ = net.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                     jnp.asarray(coords))
    bev, aux = net.apply(vars_, jnp.asarray(feats), jnp.asarray(coords))
    # conv_out: z 8->4->4->... stride chain 8/2=4 /2=2 /2=1, (3,1,1)@(2,1,1)
    assert bev.shape[1:3] == (ny // 8, nx // 8)
    assert aux["point_features"].shape == (B, V, 16)
    assert (np.asarray(aux["point_features"])[0, -8:] == 0).all()
    assert np.asarray(aux["point_valid"])[0, :-8].all()

    # gather is the exact inverse of scatter for distinct coords
    grid = rng.rand(B, nz, ny, nx, 3).astype(np.float32)
    got = np.asarray(gather_from_dense(jnp.asarray(grid), jnp.asarray(coords)))
    for v in range(V - 8):
        z, y, x = coords[0, v]
        np.testing.assert_allclose(got[0, v], grid[0, z, y, x])
    assert (got[0, -8:] == 0).all()


def test_intra_part_labels_oracle():
    from pdanet_tpu.models.dense_heads.point_intra_part_head import (
        intra_part_labels,
    )

    gt = np.array([[2.0, 1.0, 0.0, 4.0, 2.0, 2.0, 0.5]], np.float32)
    # a point at the box's +x face center, in the box frame
    local = np.array([2.0, 0.0, 0.0], np.float32)
    c, s = np.cos(0.5), np.sin(0.5)
    world = np.array([
        local[0] * c - local[1] * s + 2.0,
        local[0] * s + local[1] * c + 1.0,
        0.0,
    ], np.float32)
    pts = world[None, None]  # (1, 1, 3)
    gt_of = np.concatenate([gt, [[1]]], axis=-1)[None]  # (1, 1, 8)
    lab = np.asarray(intra_part_labels(
        jnp.asarray(pts), jnp.asarray(gt_of),
        jnp.ones((1, 1), bool),
    ))
    np.testing.assert_allclose(lab[0, 0], [1.0, 0.5, 0.5], atol=1e-5)


def _make_inputs(B=1, V=64, P=5, seed=0):
    rng = np.random.RandomState(seed)
    voxels = rng.rand(B, V, P, 4).astype(np.float32)
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
    return voxels, coords, nums


def test_parta2_forward_and_loss():
    model = build_network(
        EasyDict(PARTA2_MODEL_CFG), num_class=2,
        grid_size=GRID, voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
        class_names=("Car", "Pedestrian"),
    )
    voxels, coords, nums = _make_inputs(seed=1)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    P = PARTA2_MODEL_CFG["ROI_HEAD"]["NMS_CONFIG"]["TEST"]["NMS_POST_MAXSIZE"]
    assert out["batch_box_preds"].shape == (1, P, 7)
    assert out["point_part_preds"].shape[-1] == 3
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
    assert "point_loss_part" in tb and "rcnn_loss" in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    for part in ("roi_head", "point_head", "backbone_3d"):
        part_grads = jax.tree_util.tree_leaves(grads[part])
        assert any(float(jnp.abs(g).max()) > 0 for g in part_grads), part


def test_parta2_free_forward_and_loss():
    """PartA2-free: PointRCNN name + UNetV2 resolves to PartA2Free; point
    head grows a box branch; RoI head pools raw coords (DISABLE_PART)."""
    import copy

    cfg = EasyDict({
        "NAME": "PointRCNN",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "UNetV2", "RETURN_ENCODED_TENSOR": False},
        "POINT_HEAD": {
            "NAME": "PointIntraPartOffsetHead",
            "CLS_FC": [16], "PART_FC": [16], "REG_FC": [16],
            "CLASS_AGNOSTIC": False,
            "TARGET_CONFIG": {
                "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
                "BOX_CODER": "PointResidualCoder",
                "BOX_CODER_CONFIG": {
                    "use_mean_size": True,
                    "mean_size": [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73]],
                },
            },
            "LOSS_CONFIG": {
                "LOSS_WEIGHTS": {
                    "point_cls_weight": 1.0, "point_box_weight": 1.0,
                    "point_part_weight": 1.0, "code_weights": [1.0] * 8,
                }
            },
        },
        "ROI_HEAD": copy.deepcopy(PARTA2_MODEL_CFG["ROI_HEAD"]),
        "POST_PROCESSING": copy.deepcopy(PARTA2_MODEL_CFG["POST_PROCESSING"]),
    })
    cfg.ROI_HEAD["DISABLE_PART"] = True
    cfg.ROI_HEAD["SEG_MASK_SCORE_THRESH"] = 0.0

    from pdanet_tpu.models.detectors import PartA2Free, resolve_detector_name

    assert resolve_detector_name(cfg) == "PartA2Free"
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=VOXEL_SIZE,
        point_cloud_range=PC_RANGE, class_names=("Car", "Pedestrian"),
    )
    assert isinstance(model, PartA2Free)

    voxels, coords, nums = _make_inputs(seed=5)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    P = cfg.ROI_HEAD["NMS_CONFIG"]["TEST"]["NMS_POST_MAXSIZE"]
    assert out["batch_box_preds"].shape == (1, P, 7)
    assert out["point_box_preds"].shape[-1] == 8
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
    assert "point_loss_box" in tb and "point_loss_part" in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    for part in ("roi_head", "point_head", "backbone_3d"):
        part_grads = jax.tree_util.tree_leaves(grads[part])
        assert any(float(jnp.abs(g).max()) > 0 for g in part_grads), part
