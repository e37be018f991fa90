"""ATSS target assigner vs a direct numpy port of the reference algorithm
(atss_target_assigner.py:76-141), cross-validated through the native/host
rotated-IoU path, plus a SECOND loss smoke with ATSS dispatched."""

import numpy as np

import jax
import jax.numpy as jnp

from pdanet_tpu.models.dense_heads.atss_assigner import atss_assign_targets
from pdanet_tpu.utils.box_coder_utils import ResidualCoder
from pdanet_tpu.utils.iou3d_np import boxes_bev_iou_cpu


def _atss_oracle(anchors, gt, gt_cls, topk, coder):
    """Loop-for-loop port of the torch reference (independent IoU path)."""
    A, M = len(anchors), len(gt)
    iou = boxes_bev_iou_cpu(anchors, gt).astype(np.float64)  # (A, M)
    dist = np.linalg.norm(
        anchors[:, None, 0:3] - gt[None, :, 0:3], axis=-1
    )
    K = min(topk, A)
    topk_idxs = np.argsort(dist, axis=0, kind="stable")[:K]  # (K, M)
    cand = np.take_along_axis(iou, topk_idxs, axis=0)  # (K, M)
    thresh = cand.mean(0) + cand.std(0, ddof=1) + 1e-6
    is_pos = cand >= thresh[None, :]

    # in-gt BEV check with the reference's extent swap
    for m in range(M):
        for k in range(K):
            a = anchors[topk_idxs[k, m]]
            d = a[0:3] - gt[m, 0:3]
            c, s = np.cos(-gt[m, 6]), np.sin(-gt[m, 6])
            xl = d[0] * c - d[1] * s
            yl = d[0] * s + d[1] * c
            lw = (gt[m, 4], gt[m, 3])  # swapped (dy, dx)
            if not (-lw[0] / 2 <= xl <= lw[0] / 2
                    and -lw[1] / 2 <= yl <= lw[1] / 2):
                is_pos[k, m] = False

    INF = float(2.0**31)
    ious_inf = np.full((A, M), -INF)
    for m in range(M):
        for k in range(K):
            if is_pos[k, m]:
                ious_inf[topk_idxs[k, m], m] = iou[topk_idxs[k, m], m]
    a2g_val = ious_inf.max(1)
    a2g_idx = ious_inf.argmax(1)
    for m in range(M):  # force-match, sequential like torch index_put
        am = iou[:, m].argmax()
        a2g_idx[am] = m
        a2g_val[am] = iou[am, m]
    labels = gt_cls[a2g_idx].copy()
    labels[a2g_val <= -INF] = 0
    targets = np.zeros((A, coder.code_size), np.float32)
    fg = labels > 0
    if fg.any():
        targets[fg] = np.asarray(
            coder.encode(
                jnp.asarray(gt[a2g_idx[fg], :7]), jnp.asarray(anchors[fg])
            )
        )
    return labels, targets, fg.astype(np.float32)


def test_atss_matches_reference_oracle():
    rng = np.random.RandomState(0)
    A, M = 120, 5
    anchors = np.column_stack([
        rng.uniform(0, 20, (A, 2)), np.full((A, 1), -1.0),
        np.tile([3.9, 1.6, 1.56], (A, 1)),
        rng.choice([0.0, 1.57], A)[:, None],
    ]).astype(np.float32)
    gt = np.column_stack([
        rng.uniform(2, 18, (M, 2)), rng.uniform(-1.5, -0.5, (M, 1)),
        rng.uniform(3, 5, (M, 1)), rng.uniform(1.4, 1.9, (M, 1)),
        rng.uniform(1.4, 1.7, (M, 1)), rng.uniform(-3, 3, (M, 1)),
    ]).astype(np.float32)
    gt_cls = rng.randint(1, 4, M)
    coder = ResidualCoder()

    want_lab, want_tgt, want_w = _atss_oracle(anchors, gt, gt_cls, 9, coder)

    # padded batch form: extra zero rows must not perturb the assignment
    gt8 = np.concatenate([gt, gt_cls[:, None].astype(np.float32)], axis=1)
    gt_pad = np.zeros((1, M + 3, 8), np.float32)
    gt_pad[0, :M] = gt8
    out = atss_assign_targets(
        jnp.asarray(anchors), jnp.asarray(gt_pad), 9, coder
    )
    np.testing.assert_array_equal(np.asarray(out["box_cls_labels"][0]),
                                  want_lab)
    np.testing.assert_array_equal(np.asarray(out["reg_weights"][0]), want_w)
    np.testing.assert_allclose(np.asarray(out["box_reg_targets"][0]),
                               want_tgt, atol=1e-4)
    assert want_w.sum() > 0  # scene actually produced positives


def test_second_loss_with_atss():
    import copy

    from tests.test_second import GRID, SECOND_MODEL_CFG, _make_inputs
    from pdanet_tpu.models import build_network
    from pdanet_tpu.utils.easydict import EasyDict

    cfg = EasyDict(copy.deepcopy(SECOND_MODEL_CFG))
    cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG = {
        "NAME": "ATSS", "TOPK": 9, "MATCH_HEIGHT": False,
        "BOX_CODER": "ResidualCoder",
    }
    model = build_network(
        cfg, num_class=2, grid_size=GRID, voxel_size=(0.2, 0.2, 0.5),
        point_cloud_range=(0, -3.2, -3, 6.4, 3.2, 1),
        class_names=("Car", "Pedestrian"),
    )
    voxels, coords, nums = _make_inputs(seed=2)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, nums)
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
        )
        return loss, tb

    (loss, _), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
