"""PointRCNN tests: RoIPoint pooling canonical transform, the point-box
head decode, and detector forward/loss/grads."""

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.utils.easydict import EasyDict

POINTRCNN_MODEL_CFG = {
    "NAME": "PointRCNN",
    "BACKBONE_3D": {
        "NAME": "PointNet2MSG",
        "SA_CONFIG": {
            "NPOINTS": [64, 16],
            "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
            "NSAMPLE": [[8, 8], [8, 8]],
            "MLPS": [[[8, 8], [8, 8]], [[8, 16], [8, 16]]],
        },
        "FP_MLPS": [[16, 16], [16, 16]],
    },
    "POINT_HEAD": {
        "NAME": "PointHeadBox",
        "CLS_FC": [16], "REG_FC": [16],
        "CLASS_AGNOSTIC": False,
        "USE_POINT_FEATURES_BEFORE_FUSION": False,
        "TARGET_CONFIG": {
            "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
            "BOX_CODER": "PointResidualCoder",
            "BOX_CODER_CONFIG": {
                "use_mean_size": True,
                "mean_size": [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73]],
            },
        },
        "LOSS_CONFIG": {
            "LOSS_REG": "WeightedSmoothL1Loss",
            "LOSS_WEIGHTS": {
                "point_cls_weight": 1.0, "point_box_weight": 1.0,
                "code_weights": [1.0] * 8,
            },
        },
    },
    "ROI_HEAD": {
        "NAME": "PointRCNNHead", "CLASS_AGNOSTIC": True,
        "ROI_POINT_POOL": {
            "POOL_EXTRA_WIDTH": [0.0, 0.0, 0.0],
            "NUM_SAMPLED_POINTS": 32,
            "DEPTH_NORMALIZER": 70.0,
        },
        "XYZ_UP_LAYER": [16, 16],
        "CLS_FC": [16], "REG_FC": [16],
        "DP_RATIO": 0.0, "USE_BN": False,
        "SA_CONFIG": {
            "NPOINTS": [16, -1],
            "RADIUS": [0.4, 100],
            "NSAMPLE": [8, 8],
            "MLPS": [[16, 16], [16, 32]],
        },
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.85},
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
            "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
            "CLS_SCORE_TYPE": "cls", "CLS_FG_THRESH": 0.6,
            "CLS_BG_THRESH": 0.45, "CLS_BG_THRESH_LO": 0.1,
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


def test_roipoint_pool_canonical():
    """Points pooled into a rotated roi land in its canonical frame."""
    from pdanet_tpu.ops.geometry import rotate_points_along_z
    from pdanet_tpu.ops.roi_pool import roipoint_pool3d

    rois = np.array([[2.0, 1.0, 0.0, 4.0, 2.0, 2.0, 0.7]], np.float32)
    rng = np.random.RandomState(0)
    local = rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32) * [2, 1, 1]
    pts = np.asarray(
        rotate_points_along_z(jnp.asarray(local)[None], jnp.asarray([0.7]))
    )[0] + rois[0, :3]
    feats = rng.rand(64, 2).astype(np.float32)
    pooled, empty = roipoint_pool3d(
        jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats), 32
    )
    assert not bool(empty[0])
    # canonical transform as the head applies it
    can = np.asarray(rotate_points_along_z(
        (pooled[0, :, 0:3] - jnp.asarray(rois[0, :3]))[None],
        jnp.asarray([-0.7]),
    ))[0]
    assert (np.abs(can[:, 0]) <= 2.0 + 1e-4).all()
    assert (np.abs(can[:, 1]) <= 1.0 + 1e-4).all()


def test_point_box_decode_roundtrip():
    from pdanet_tpu.models.dense_heads.point_head_box import (
        generate_predicted_boxes,
    )
    from pdanet_tpu.utils.box_coder_utils import build_box_coder

    coder = build_box_coder("PointResidualCoder", {
        "use_mean_size": True,
        "mean_size": [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73]],
    })
    rng = np.random.RandomState(1)
    pts = rng.uniform(-5, 5, (1, 8, 3)).astype(np.float32)
    gt = np.zeros((1, 8, 7), np.float32)
    gt[..., 0:3] = pts + rng.uniform(-1, 1, (1, 8, 3))
    gt[..., 3:6] = rng.uniform(1, 4, (1, 8, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (1, 8))
    classes = rng.randint(1, 3, (1, 8))
    enc = coder.encode(jnp.asarray(gt), jnp.asarray(pts), jnp.asarray(classes))
    cls_logits = jax.nn.one_hot(classes - 1, 2) * 10.0
    _, dec = generate_predicted_boxes(
        jnp.asarray(pts), cls_logits, enc, coder
    )
    np.testing.assert_allclose(np.asarray(dec)[..., :6], gt[..., :6],
                               rtol=1e-4, atol=1e-4)
    # heading equal modulo 2pi
    dh = (np.asarray(dec)[..., 6] - gt[..., 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dh, 0, atol=1e-4)


def test_pointrcnn_forward_and_loss():
    model = build_network(
        EasyDict(POINTRCNN_MODEL_CFG), num_class=2, input_channels=4,
        class_names=("Car", "Pedestrian"),
    )
    rng = np.random.RandomState(2)
    N = 256
    points = np.concatenate([
        rng.uniform(0, 6.4, (1, N, 1)),
        rng.uniform(-3.2, 3.2, (1, N, 1)),
        rng.uniform(-3, 1, (1, N, 1)),
        rng.rand(1, N, 1),
    ], axis=-1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), points)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(
        variables, points
    )
    P = POINTRCNN_MODEL_CFG["ROI_HEAD"]["NMS_CONFIG"]["TEST"]["NMS_POST_MAXSIZE"]
    assert out["batch_box_preds"].shape == (1, P, 7)
    assert out["rcnn_cls"].shape == (1, P, 1)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [1.5, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]
    batch = {"points": jnp.asarray(points), "gt_boxes": jnp.asarray(gt)}

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
    assert "point_loss_box" in tb and "rcnn_loss" in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    for part in ("roi_head", "point_head", "backbone_3d"):
        part_grads = jax.tree_util.tree_leaves(grads[part])
        assert any(float(jnp.abs(g).max()) > 0 for g in part_grads), part
