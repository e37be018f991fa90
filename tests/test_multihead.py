"""AnchorHeadMulti + multi-class NMS tests: layout consistency between
flat anchors / conv outputs / targets, loss + grads in both shared and
separate-multihead modes, and per-class NMS independence."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdanet_tpu.models.dense_heads import anchor_head as AH
from pdanet_tpu.models.dense_heads import anchor_head_multi as AHM
from pdanet_tpu.utils.box_coder_utils import build_box_coder
from pdanet_tpu.utils.easydict import EasyDict

GRID = (32, 32, 8)
PC_RANGE = (0, -3.2, -3, 6.4, 3.2, 1)

ANCHOR_CFG = [
    {"class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
     "align_center": False, "feature_map_stride": 8,
     "matched_threshold": 0.6, "unmatched_threshold": 0.45},
    {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
     "align_center": False, "feature_map_stride": 8,
     "matched_threshold": 0.5, "unmatched_threshold": 0.35},
    {"class_name": "Cyclist", "anchor_sizes": [[1.76, 0.6, 1.73]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
     "align_center": False, "feature_map_stride": 8,
     "matched_threshold": 0.5, "unmatched_threshold": 0.35},
]
CLASS_NAMES = ["Car", "Pedestrian", "Cyclist"]
RPN_HEAD_CFGS = [
    {"HEAD_CLS_NAME": ["Car"]},
    {"HEAD_CLS_NAME": ["Pedestrian", "Cyclist"]},
]


def _anchors():
    all_anchors, num_per_loc = AH.generate_anchors(
        ANCHOR_CFG, GRID, PC_RANGE
    )
    _, per_class = AH.flat_anchors_per_class(all_anchors)
    return [np.asarray(a) for a in per_class], num_per_loc


@pytest.mark.parametrize("separate", [False, True])
def test_multihead_layout_and_loss(separate):
    per_class, num_per_loc = _anchors()
    groups = AHM.build_head_groups(RPN_HEAD_CFGS, CLASS_NAMES)
    flat, counts = AHM.multihead_flat_anchors(per_class, groups)
    assert flat.shape[0] == sum(counts)
    assert counts[0] == per_class[0].reshape(-1, 7).shape[0]

    coder = build_box_coder("ResidualCoder", {})
    model_cfg = {
        "SHARED_CONV_NUM_FILTER": 16,
        "SEPARATE_MULTIHEAD": separate,
        "USE_DIRECTION_CLASSIFIER": True,
        "NUM_DIR_BINS": 2,
        "RPN_HEAD_CFGS": RPN_HEAD_CFGS,
    }
    net = AHM.AnchorHeadMultiNet(
        model_cfg=model_cfg, head_groups=tuple(tuple(g) for g in groups),
        num_anchors_per_loc_per_class=tuple(num_per_loc),
        code_size=coder.code_size, num_class=3,
    )
    rng = np.random.RandomState(0)
    x = rng.rand(2, 4, 4, 8).astype(np.float32)
    vars_ = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    outs, _ = net.apply(
        vars_, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    assert len(outs) == 2
    cls_preds, box_preds, dir_preds = AHM.concat_head_preds(
        outs, groups, 3, coder.code_size, 2, separate
    )
    assert cls_preds.shape == (2, flat.shape[0], 3)
    assert box_preds.shape == (2, flat.shape[0], coder.code_size)
    assert dir_preds.shape == (2, flat.shape[0], 2)
    if separate:
        # head 0 (Car only) must mask Ped/Cyc columns to -inf
        assert float(cls_preds[0, 0, 1]) < -1e8
        assert np.isfinite(float(cls_preds[0, 0, 0]))

    gt = np.zeros((2, 2, 8), np.float32)
    gt[:, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [1.5, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]
    class_ids = [1, 2, 3]
    thresholds = [(c["matched_threshold"], c["unmatched_threshold"])
                  for c in ANCHOR_CFG]
    targets = AHM.assign_targets_multi(
        [jnp.asarray(a) for a in per_class], groups, jnp.asarray(gt),
        class_ids, thresholds, coder,
    )
    assert targets["box_cls_labels"].shape == (2, flat.shape[0])
    # car gt can only match head-0 anchors; ped gt only head-1 anchors
    labels = np.asarray(targets["box_cls_labels"])
    assert set(np.unique(labels[:, :counts[0]])) <= {-1, 0, 1}
    assert set(np.unique(labels[:, counts[0]:])) <= {-1, 0, 2, 3}

    loss, tb = AHM.anchor_head_multi_loss(
        outs, groups, counts, targets, flat, 3,
        {"cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
         "code_weights": [1.0] * 7, "pos_cls_weight": 1.0,
         "neg_cls_weight": 2.0},
        coder.code_size, separate=separate,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert "rpn_loss_dir" in tb


def test_separate_reg_branches_match_code_size():
    per_class, num_per_loc = _anchors()
    groups = AHM.build_head_groups(RPN_HEAD_CFGS, CLASS_NAMES)
    coder = build_box_coder("ResidualCoder", {})
    model_cfg = {
        "SHARED_CONV_NUM_FILTER": 16,
        "SEPARATE_MULTIHEAD": True,
        "USE_DIRECTION_CLASSIFIER": False,
        "RPN_HEAD_CFGS": RPN_HEAD_CFGS,
        "SEPARATE_REG_CONFIG": {
            "NUM_MIDDLE_CONV": 1,
            "NUM_MIDDLE_FILTER": 8,
            "REG_LIST": ["reg:2", "height:1", "size:3", "angle:1"],
        },
    }
    net = AHM.AnchorHeadMultiNet(
        model_cfg=model_cfg, head_groups=tuple(tuple(g) for g in groups),
        num_anchors_per_loc_per_class=tuple(num_per_loc),
        code_size=coder.code_size, num_class=3,
    )
    x = np.random.RandomState(1).rand(1, 4, 4, 8).astype(np.float32)
    vars_ = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    outs = net.apply(vars_, jnp.asarray(x))
    _, box_preds, _ = AHM.concat_head_preds(
        outs, groups, 3, coder.code_size, 2, True
    )
    flat, _ = AHM.multihead_flat_anchors(per_class, groups)
    assert box_preds.shape == (1, flat.shape[0], 7)


def test_multi_classes_nms_independent_per_class():
    from pdanet_tpu.models.model_utils.model_nms_utils import (
        batched_multi_classes_nms,
    )

    # two identical overlapping boxes, each the winner of a DIFFERENT
    # class: class-agnostic NMS would keep one; multi-class keeps both
    boxes = np.zeros((1, 4, 7), np.float32)
    boxes[0, 0] = [0, 0, 0, 4, 2, 2, 0]
    boxes[0, 1] = [0.1, 0, 0, 4, 2, 2, 0]
    boxes[0, 2] = [20, 20, 0, 4, 2, 2, 0]  # far box, class 1
    boxes[0, 3] = [40, 40, 0, 4, 2, 2, 0.5]  # far box, class 2
    scores = np.zeros((1, 4, 2), np.float32)
    scores[0, 0, 0] = 0.9
    scores[0, 1, 1] = 0.8
    scores[0, 2, 0] = 0.7
    scores[0, 3, 1] = 0.6
    cfg = EasyDict({"NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 4,
                    "NMS_POST_MAXSIZE": 4})
    out = jax.jit(
        lambda s, b: batched_multi_classes_nms(
            s, b, jnp.ones((1, 4), bool), cfg, score_thresh=0.1
        )
    )(jnp.asarray(scores), jnp.asarray(boxes))
    cnt = int(out["pred_counts"][0])
    assert cnt == 4
    labels = np.asarray(out["pred_labels"][0, :cnt])
    assert sorted(labels.tolist()) == [1, 1, 2, 2]
    got_scores = sorted(np.asarray(out["pred_scores"][0, :cnt]).tolist())
    np.testing.assert_allclose(got_scores, [0.6, 0.7, 0.8, 0.9], atol=1e-6)


def test_second_multihead_forward_and_loss():
    """SECOND + AnchorHeadMulti (second_multihead.yaml wiring)."""
    from pdanet_tpu.models import build_network

    from test_second import GRID, SECOND_MODEL_CFG, _make_inputs

    cfg = EasyDict(copy.deepcopy(dict(SECOND_MODEL_CFG)))
    cfg.DENSE_HEAD.NAME = "AnchorHeadMulti"
    cfg.DENSE_HEAD.USE_MULTIHEAD = True
    cfg.DENSE_HEAD.SEPARATE_MULTIHEAD = True
    cfg.DENSE_HEAD.SHARED_CONV_NUM_FILTER = 16
    cfg.DENSE_HEAD.RPN_HEAD_CFGS = [
        {"HEAD_CLS_NAME": ["Car"]},
        {"HEAD_CLS_NAME": ["Pedestrian"]},
    ]
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"),
    )
    voxels, coords, nums = _make_inputs(seed=3)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    n_anchors = 4 * 4 * 2 * 2  # per head: H*W*2rot, 2 heads
    assert out["batch_box_preds"].shape == (1, n_anchors, 7)
    assert out["batch_cls_preds"].shape == (1, n_anchors, 2)

    from pdanet_tpu.models.detectors.iassd import post_processing

    post_cfg = EasyDict({
        "SCORE_THRESH": 0.1,
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": True, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 64,
                       "NMS_POST_MAXSIZE": 16},
    })
    pred = jax.jit(lambda o: post_processing(
        o["batch_cls_preds"], o["batch_box_preds"], post_cfg
    ))(out)
    assert pred["pred_boxes"].shape[1] == 32  # 2 classes x POST

    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [1.5, -1.0, -0.2, 0.8, 0.6, 1.73, -0.5, 2]

    def loss_fn(params):
        def fwd_loss(mdl):
            o = mdl(jnp.asarray(voxels), jnp.asarray(coords),
                    jnp.asarray(nums), train=True)
            return mdl.loss(o, jnp.asarray(gt), ["Car", "Pedestrian"])

        (loss, tb), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            mutable=["batch_stats"], method=fwd_loss,
        )
        return loss, tb

    (loss, tb), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert "rpn_loss_dir" in tb
    leaves = jax.tree_util.tree_leaves(grads["dense_head"])
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
