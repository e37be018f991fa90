"""PointPillar family tests: voxelizer, pillar VFE, scatter, anchor
generation/assignment, forward shapes, loss gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdanet_tpu.models import build_network
from pdanet_tpu.models.dense_heads import anchor_head as AH
from pdanet_tpu.utils.box_coder_utils import ResidualCoder
from pdanet_tpu.utils.easydict import EasyDict

PP_MODEL_CFG = {
    "NAME": "PointPillar",
    "VFE": {
        "NAME": "PillarVFE", "WITH_DISTANCE": False, "USE_ABSLOTE_XYZ": True,
        "USE_NORM": True, "NUM_FILTERS": [16],
    },
    "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [2, 2],
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
             "align_center": False, "feature_map_stride": 2,
             "matched_threshold": 0.6, "unmatched_threshold": 0.45},
            {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
             "align_center": False, "feature_map_stride": 2,
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
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
        "OUTPUT_RAW_SCORE": False, "EVAL_METRIC": "kitti",
        "NMS_CONFIG": {
            "MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
            "NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 256,
            "NMS_POST_MAXSIZE": 32,
        },
    },
}

PCR = [0, -12.8, -3, 25.6, 12.8, 1]
VOXEL = [0.4, 0.4, 4]
GRID = (64, 64, 1)  # nx, ny, nz


def _voxelize(points):
    """Use the production host voxelizer."""
    from pdanet_tpu.datasets.processor.data_processor import DataProcessor

    cfg = EasyDict(
        {
            "NAME": "transform_points_to_voxels",
            "VOXEL_SIZE": VOXEL,
            "MAX_POINTS_PER_VOXEL": 8,
            "MAX_NUMBER_OF_VOXELS": {"train": 512, "test": 512},
        }
    )
    dp = DataProcessor([], np.asarray(PCR, np.float32), True, 4)
    dp.grid_size = np.asarray(GRID, np.int64)
    dd = dp.transform_points_to_voxels({"points": points}, cfg)
    return dd


def test_voxelizer_semantics():
    pts = np.array(
        [
            [0.1, 0.1, 0.0, 1.0],   # voxel (0, 32, 0)
            [0.15, 0.12, 0.1, 2.0],  # same voxel, second point
            [5.0, 3.0, -1.0, 3.0],  # another voxel
            [-10.0, 0.0, 0.0, 4.0],  # out of range -> dropped
        ],
        dtype=np.float32,
    )
    dd = _voxelize(pts)
    assert dd["voxels"].shape[1] == 8
    assert dd["voxel_num_points"][0] == 2
    np.testing.assert_allclose(dd["voxels"][0, 0], pts[0])
    np.testing.assert_allclose(dd["voxels"][0, 1], pts[1])
    # zyx coords
    assert tuple(dd["voxel_coords"][0]) == (0, 32, 0)
    assert dd["voxel_num_points"][1] == 1


def test_anchor_assignment_semantics():
    gen_cfg = PP_MODEL_CFG["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"]
    anchors, num_per_loc = AH.generate_anchors(gen_cfg, GRID, PCR)
    assert anchors[0].shape == (1, 32, 32, 1, 2, 7)
    assert num_per_loc == [2, 2]
    flat, per_class = AH.flat_anchors_per_class(anchors)
    coder = ResidualCoder()

    # one Car gt exactly on an anchor position: must be matched
    gt = np.zeros((1, 3, 8), np.float32)
    gt[0, 0] = [12.8, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0, 1.0]
    t = AH.assign_targets(
        [jnp.asarray(a) for a in per_class],
        jnp.asarray(gt),
        class_ids=[1, 2],
        thresholds=[(0.6, 0.45), (0.5, 0.35)],
        box_coder=coder,
    )
    labels = np.asarray(t["box_cls_labels"][0])
    assert (labels == 1).sum() >= 1, "Car gt must match at least one anchor"
    assert (labels == 2).sum() == 0
    # most anchors are background
    assert (labels == 0).sum() > 0.9 * labels.size


@pytest.fixture(scope="module")
def pp_setup():
    model = build_network(
        EasyDict(PP_MODEL_CFG), num_class=2, input_channels=4,
        grid_size=GRID, voxel_size=tuple(VOXEL),
        point_cloud_range=tuple(PCR),
    )
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    B, V, P = 2, 512, 8
    voxels, coords, counts = [], [], []
    for _ in range(B):
        pts = np.concatenate(
            [
                rs.uniform([0, -12.8, -3], [25.6, 12.8, 1], (800, 3)),
                rs.uniform(0, 1, (800, 1)),
            ],
            axis=1,
        ).astype(np.float32)
        dd = _voxelize(pts)
        v = np.zeros((V, P, 4), np.float32)
        c = np.full((V, 3), -1, np.int32)
        n = np.zeros((V,), np.int32)
        nv = len(dd["voxels"])
        v[:nv], c[:nv], n[:nv] = dd["voxels"], dd["voxel_coords"], dd["voxel_num_points"]
        voxels.append(v)
        coords.append(c)
        counts.append(n)
    voxels = jnp.asarray(np.stack(voxels))
    coords = jnp.asarray(np.stack(coords))
    counts = jnp.asarray(np.stack(counts))
    variables = jax.jit(
        lambda r, a, b, c: model.init({"params": r}, a, b, c, train=False)
    )(rng, voxels, coords, counts)
    return model, variables, voxels, coords, counts


def test_pointpillar_forward_shapes(pp_setup):
    model, variables, voxels, coords, counts = pp_setup
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, counts)
    A = 32 * 32 * 4  # gy * gx * (2 classes x 2 rot)
    assert out["batch_cls_preds"].shape == (2, A, 2)
    assert out["batch_box_preds"].shape == (2, A, 7)
    assert np.all(np.isfinite(np.asarray(out["batch_box_preds"])))


def test_pointpillar_loss_and_grads(pp_setup):
    model, variables, voxels, coords, counts = pp_setup
    gt = np.zeros((2, 4, 8), np.float32)
    gt[:, 0] = [12.8, 0.0, -1.0, 3.9, 1.6, 1.56, 0.2, 1.0]
    gt[:, 1] = [6.0, 3.0, -0.6, 0.8, 0.6, 1.73, -0.4, 2.0]
    gt = jnp.asarray(gt)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            voxels, coords, counts, train=True, mutable=["batch_stats"],
        )
        loss, tb = model.apply(
            variables, out, gt, ["Car", "Pedestrian"], method=model.loss
        )
        return loss, tb

    (loss, tb), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ["rpn_loss_cls", "rpn_loss_loc", "rpn_loss_dir"]:
        assert np.isfinite(float(tb[k])), k
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)
