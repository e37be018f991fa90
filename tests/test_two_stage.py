"""Two-stage (RoI) stack tests: proposal sampling invariants, canonical
target transform vs a numpy port of the reference, rotated BEV grid
pooling vs torch's affine_grid/grid_sample (the reference's exact ops),
and SECOND-IoU end-to-end forward/loss/grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdanet_tpu.models.roi_heads import roi_head_template as RHT
from pdanet_tpu.utils.easydict import EasyDict

SAMPLER_CFG = EasyDict({
    "ROI_PER_IMAGE": 32,
    "FG_RATIO": 0.5,
    "SAMPLE_ROI_BY_EACH_CLASS": True,
    "CLS_SCORE_TYPE": "roi_iou",
    "CLS_FG_THRESH": 0.75,
    "CLS_BG_THRESH": 0.25,
    "CLS_BG_THRESH_LO": 0.1,
    "HARD_BG_RATIO": 0.8,
    "REG_FG_THRESH": 0.55,
})


def _boxes(n, seed, spread=10.0):
    rng = np.random.RandomState(seed)
    b = np.zeros((n, 7), np.float32)
    b[:, 0:3] = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    b[:, 2] *= 0.1
    b[:, 3:6] = rng.uniform(1.0, 4.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


class TestSubsampleRois:
    def test_fg_bg_split(self):
        overlaps = np.concatenate([
            np.full(5, 0.9), np.full(10, 0.3), np.full(20, 0.01),
        ]).astype(np.float32)
        inds = np.asarray(
            RHT.subsample_rois(
                jax.random.PRNGKey(0), jnp.asarray(overlaps), SAMPLER_CFG
            )
        )
        assert inds.shape == (32,)
        # all 5 fg rois fill the first 5 slots (fg_this = min(16, 5))
        assert sorted(inds[:5]) == [0, 1, 2, 3, 4]
        # remaining 27 bg slots: hard first — min(int(27*0.8), n_hard=10)
        # (the reference caps at the pool size, proposal_target_layer:199)
        hard = inds[5:5 + 10]
        easy = inds[5 + 10:]
        assert ((hard >= 5) & (hard < 15)).all()
        assert (easy >= 15).all()

    def test_fg_cap(self):
        overlaps = np.full(40, 0.9, np.float32)
        overlaps[-1] = 0.0  # one easy bg
        inds = np.asarray(
            RHT.subsample_rois(
                jax.random.PRNGKey(1), jnp.asarray(overlaps), SAMPLER_CFG
            )
        )
        # fg capped at 16 random distinct fg rois
        assert len(set(inds[:16].tolist())) == 16
        assert (overlaps[inds[:16]] >= 0.55).all()
        assert (inds[16:] == 39).all()  # only bg candidate

    def test_no_bg(self):
        overlaps = np.full(8, 0.9, np.float32)
        inds = np.asarray(
            RHT.subsample_rois(
                jax.random.PRNGKey(2), jnp.asarray(overlaps), SAMPLER_CFG
            )
        )
        assert (overlaps[inds] >= 0.55).all()  # all slots fg (w/ repl.)

    def test_no_fg(self):
        overlaps = np.full(8, 0.2, np.float32)
        inds = np.asarray(
            RHT.subsample_rois(
                jax.random.PRNGKey(3), jnp.asarray(overlaps), SAMPLER_CFG
            )
        )
        assert (overlaps[inds] < 0.55).all()


def test_canonicalize_vs_oracle():
    rois = _boxes(16, 1)[None]
    gt = np.concatenate(
        [_boxes(16, 2), np.ones((16, 1), np.float32)], axis=-1
    )[None]
    got = np.asarray(
        RHT.canonicalize_gt_of_rois(jnp.asarray(rois), jnp.asarray(gt))
    )

    # numpy port of roi_head_template.py:108-139
    r, g = rois[0], gt[0].copy()
    roi_ry = r[:, 6] % (2 * np.pi)
    g[:, 0:3] -= r[:, 0:3]
    g[:, 6] -= roi_ry
    cosa, sina = np.cos(-roi_ry), np.sin(-roi_ry)
    x = g[:, 0] * cosa - g[:, 1] * sina
    y = g[:, 0] * sina + g[:, 1] * cosa
    g[:, 0], g[:, 1] = x, y
    heading = g[:, 6] % (2 * np.pi)
    opp = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading[opp] = (heading[opp] + np.pi) % (2 * np.pi)
    heading[heading > np.pi] -= 2 * np.pi
    g[:, 6] = np.clip(heading, -np.pi / 2, np.pi / 2)
    np.testing.assert_allclose(got[0], g, rtol=1e-4, atol=1e-5)


def test_roi_grid_pool_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(7)
    B, H, W, C, R, G = 2, 24, 20, 6, 5, 7
    feat = rng.randn(B, H, W, C).astype(np.float32)
    rois = np.zeros((B, R, 7), np.float32)
    rois[..., 0] = rng.uniform(1.0, 14.0, (B, R))
    rois[..., 1] = rng.uniform(-8.0, 8.0, (B, R))
    rois[..., 3:6] = rng.uniform(1.0, 6.0, (B, R, 3))
    rois[..., 6] = rng.uniform(-np.pi, np.pi, (B, R))
    pc_range = (0.0, -9.6, -3.0, 16.0, 9.6, 1.0)
    voxel = (0.1, 0.1, 0.2)
    ds = 8

    got = np.asarray(RHT.roi_grid_pool_bev(
        jnp.asarray(feat), jnp.asarray(rois), G, pc_range, voxel, ds
    ))  # (B, R, G, G, C)

    # torch reference (second_head.py:53-113)
    tfeat = torch.from_numpy(feat).permute(0, 3, 1, 2)  # (B, C, H, W)
    for b in range(B):
        x1 = (rois[b, :, 0] - rois[b, :, 3] / 2 - pc_range[0]) / (voxel[0] * ds)
        x2 = (rois[b, :, 0] + rois[b, :, 3] / 2 - pc_range[0]) / (voxel[0] * ds)
        y1 = (rois[b, :, 1] - rois[b, :, 4] / 2 - pc_range[1]) / (voxel[1] * ds)
        y2 = (rois[b, :, 1] + rois[b, :, 4] / 2 - pc_range[1]) / (voxel[1] * ds)
        ang = torch.from_numpy(rois[b, :, 6])
        cosa, sina = torch.cos(ang), torch.sin(ang)
        x1t, x2t = torch.from_numpy(x1), torch.from_numpy(x2)
        y1t, y2t = torch.from_numpy(y1), torch.from_numpy(y2)
        theta = torch.stack((
            (x2t - x1t) / (W - 1) * cosa, (x2t - x1t) / (W - 1) * (-sina),
            (x1t + x2t - W + 1) / (W - 1),
            (y2t - y1t) / (H - 1) * sina, (y2t - y1t) / (H - 1) * cosa,
            (y1t + y2t - H + 1) / (H - 1),
        ), dim=1).view(-1, 2, 3).float()
        grid = F.affine_grid(theta, torch.Size((R, C, G, G)),
                             align_corners=False)
        pooled = F.grid_sample(
            tfeat[b].unsqueeze(0).expand(R, C, H, W), grid,
            align_corners=False,
        )  # (R, C, G, G)
        want = pooled.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def test_proposal_layer_shapes():
    rng = np.random.RandomState(3)
    cls_preds = rng.randn(2, 64, 3).astype(np.float32)
    boxes = np.stack([_boxes(64, 4), _boxes(64, 5)], axis=0)
    nms_cfg = EasyDict({
        "NMS_THRESH": 0.7, "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16,
    })
    out = jax.jit(lambda c, b: RHT.proposal_layer(c, b, nms_cfg))(
        jnp.asarray(cls_preds), jnp.asarray(boxes)
    )
    assert out["rois"].shape == (2, 16, 7)
    assert out["roi_labels"].shape == (2, 16)
    labs = np.asarray(out["roi_labels"])
    valid = np.asarray(out["roi_valid"])
    assert ((labs >= 1) & (labs <= 3))[valid].all()


def _second_iou_tiny_cfg():
    from test_second import SECOND_MODEL_CFG

    cfg = EasyDict({k: v for k, v in SECOND_MODEL_CFG.items()})
    cfg.NAME = "SECONDNetIoU"
    cfg.POST_PROCESSING = EasyDict({
        "SCORE_THRESH": 0.1,
        "NMS_CONFIG": {"NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 16,
                       "NMS_POST_MAXSIZE": 8},
    })
    cfg.ROI_HEAD = EasyDict({
        "NAME": "SECONDHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "IOU_FC": [32], "DP_RATIO": 0.3,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7},
        },
        "ROI_GRID_POOL": {"GRID_SIZE": 7, "IN_CHANNEL": 32,
                          "DOWNSAMPLE_RATIO": 8},
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
            "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
            "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
            "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
        },
        "LOSS_CONFIG": {
            "IOU_LOSS": "BinaryCrossEntropy",
            "LOSS_WEIGHTS": {"rcnn_iou_weight": 1.0,
                             "code_weights": [1.0] * 7},
        },
    })
    return cfg


def test_second_iou_forward_loss_grads():
    import sys
    sys.path.insert(0, "tests")
    from test_second import GRID, _make_inputs

    from pdanet_tpu.models import build_network

    cfg = _second_iou_tiny_cfg()
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"),
    )
    voxels, coords, nums = _make_inputs(seed=3)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)

    # eval forward: boxes are the rois, cls preds are iou logits
    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    assert out["batch_box_preds"].shape == (1, 16, 7)
    assert out["rcnn_iou"].shape == (1, 16, 1)

    from pdanet_tpu.models.detectors.second_iou import post_processing

    pred = jax.jit(lambda o: post_processing(o, cfg))(out)
    assert pred["pred_boxes"].shape[0] == 1

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
    assert "rcnn_loss_iou" in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the roi head got gradients too
    roi_grads = jax.tree_util.tree_leaves(grads["roi_head"])
    assert any(float(jnp.abs(g).max()) > 0 for g in roi_grads)


def test_dense_grid_points_vs_oracle():
    from pdanet_tpu.models.roi_heads.voxelrcnn_head import get_dense_grid_points

    rois = _boxes(4, 21)[None]
    g = 4
    got = np.asarray(get_dense_grid_points(jnp.asarray(rois), g))  # (1,4,64,3)
    # numpy port of voxelrcnn_head.py:193-215
    for r in range(4):
        cx, cy, cz, dx, dy, dz, ry = rois[0, r]
        idx = np.stack(np.meshgrid(
            np.arange(g), np.arange(g), np.arange(g), indexing="ij"
        ), axis=-1).reshape(-1, 3).astype(np.float32)
        local = (idx + 0.5) / g * np.array([dx, dy, dz]) - np.array(
            [dx, dy, dz]) / 2
        ca, sa = np.cos(ry), np.sin(ry)
        x = local[:, 0] * ca - local[:, 1] * sa
        y = local[:, 0] * sa + local[:, 1] * ca
        want = np.stack([x + cx, y + cy, local[:, 2] + cz], axis=-1)
        np.testing.assert_allclose(got[0, r], want, rtol=1e-4, atol=1e-5)


def _voxel_rcnn_tiny_cfg():
    from test_second import SECOND_MODEL_CFG

    cfg = EasyDict({k: v for k, v in SECOND_MODEL_CFG.items()})
    cfg.NAME = "VoxelRCNN"
    cfg.POST_PROCESSING = EasyDict({
        "SCORE_THRESH": 0.3,
        "NMS_CONFIG": {"NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 16,
                       "NMS_POST_MAXSIZE": 8},
    })
    cfg.ROI_HEAD = EasyDict({
        "NAME": "VoxelRCNNHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "CLS_FC": [16], "REG_FC": [16],
        "DP_RATIO": 0.3,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7},
        },
        "ROI_GRID_POOL": {
            "FEATURES_SOURCE": ["x_conv2", "x_conv3", "x_conv4"],
            "PRE_MLP": True, "GRID_SIZE": 4,
            "POOL_LAYERS": {
                "x_conv2": {"MLPS": [[8, 8]], "QUERY_RANGES": [[4, 4, 4]],
                            "POOL_RADIUS": [0.8], "NSAMPLE": [16],
                            "POOL_METHOD": "max_pool"},
                "x_conv3": {"MLPS": [[8, 8]], "QUERY_RANGES": [[4, 4, 4]],
                            "POOL_RADIUS": [1.6], "NSAMPLE": [16],
                            "POOL_METHOD": "max_pool"},
                "x_conv4": {"MLPS": [[8, 8]], "QUERY_RANGES": [[4, 4, 4]],
                            "POOL_RADIUS": [3.2], "NSAMPLE": [16],
                            "POOL_METHOD": "max_pool"},
            },
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
            "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                             "rcnn_corner_weight": 1.0,
                             "code_weights": [1.0] * 7},
        },
    })
    return cfg


def test_voxel_rcnn_forward_loss_grads():
    import sys
    sys.path.insert(0, "tests")
    from test_second import GRID, _make_inputs

    from pdanet_tpu.models import build_network
    from pdanet_tpu.models.detectors.voxel_rcnn import post_processing

    cfg = _voxel_rcnn_tiny_cfg()
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"),
    )
    voxels, coords, nums = _make_inputs(seed=4)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)

    out = jax.jit(
        lambda v, a, b, c: model.apply(v, a, b, c, train=False)
    )(variables, voxels, coords, nums)
    assert out["batch_box_preds"].shape == (1, 16, 7)  # refined rois
    assert out["rcnn_cls"].shape == (1, 16, 1)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
    pred = jax.jit(lambda o: post_processing(o, cfg))(out)
    assert pred["pred_boxes"].shape == (1, 8, 7)

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
    assert "rcnn_loss_cls" in tb and "rcnn_loss_reg" in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    roi_grads = jax.tree_util.tree_leaves(grads["roi_head"])
    assert any(float(jnp.abs(g).max()) > 0 for g in roi_grads)


def test_voxel_rcnn_in_graph_roi_recall():
    """The eval recall path records first-stage (roi) recall separately
    from the refined-box (rcnn) recall for two-stage detectors
    (detector3d_template.py:293,316-320), in one jitted graph."""
    import sys
    sys.path.insert(0, "tests")
    from test_second import GRID, _make_inputs

    from pdanet_tpu.models import build_network
    from pdanet_tpu.models.detectors.iassd import generate_recall_record
    from pdanet_tpu.models.detectors.voxel_rcnn import post_processing

    cfg = _voxel_rcnn_tiny_cfg()
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"),
    )
    voxels, coords, nums = _make_inputs(seed=4)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)

    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [3.0, 0.5, -0.8, 3.9, 1.6, 1.56, 0.3, 1]
    thresh_list = [0.3, 0.5, 0.7]

    @jax.jit
    def fwd_recall(variables, voxels, coords, nums, gt_boxes):
        out = model.apply(variables, voxels, coords, nums, train=False)
        pred = post_processing(out, cfg)
        P = pred["pred_boxes"].shape[1]
        pv = jnp.arange(P, dtype=jnp.int32)[None, :] < pred["pred_counts"][:, None]
        rec = jax.vmap(
            lambda pb, v, gb, rb, rv: generate_recall_record(
                pb, v, gb, thresh_list, rb, rv
            )
        )(pred["pred_boxes"], pv, gt_boxes, out["rois"], out["roi_valid"])
        return {k: jnp.sum(v) for k, v in rec.items()}

    rec = jax.tree.map(
        np.asarray,
        fwd_recall(variables, jnp.asarray(voxels), jnp.asarray(coords),
                   jnp.asarray(nums), jnp.asarray(gt)),
    )
    assert rec["gt"] == 1
    for t in thresh_list:
        assert f"roi_{t}" in rec and f"rcnn_{t}" in rec
        assert 0 <= rec[f"roi_{t}"] <= 1 and 0 <= rec[f"rcnn_{t}"] <= 1
