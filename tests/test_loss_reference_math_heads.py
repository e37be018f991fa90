"""Reference-math twins for the OTHER heads' loss stacks (anchor, center,
RoI) — companions to tests/test_loss_reference_math.py (IASSD head).

Each test feeds identical synthetic tensors to the flax loss and to a
verbatim numpy transliteration of the reference torch code:

* anchor head — SigmoidFocalClassificationLoss (loss_utils.py:44-73),
  sin-difference smooth-L1 with code weights, direction CE
  (anchor_head_template.py:101-215).
* center head — clamp-sigmoid + CornerNet focal (neg_loss_cornernet,
  loss_utils.py:395-430) and the gathered per-dim L1 (_reg_loss,
  loss_utils.py:445-474) with code weights (center_head.py:222-250).
* RoI template — BCE-on-quality cls (roi_head_template.py:202-218),
  canonical-residual smooth-L1 + the fg corner loss with the
  roi-ry-kept decode quirk (roi_head_template.py:139-199).

Synthetic inputs cover every masking branch: ignore (-1) labels, zero-pos
rows, soft quality labels, NaN regression targets (the centernet isnotnan
guard), and exact-1.0 heatmap peaks.
"""

import numpy as np

import jax.numpy as jnp

from pdanet_tpu.utils.easydict import EasyDict
from pdanet_tpu.utils.box_coder_utils import build_box_coder

NUM_CLASS = 3


def _sigmoid_bce(x, z):
    return np.clip(x, 0, None) - x * z + np.log1p(np.exp(-np.abs(x)))


def _smooth_l1(diff, beta):
    n = np.abs(diff)
    if beta < 1e-5:
        return n
    return np.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def _rotate_z(points, angle):
    c, s = np.cos(angle), np.sin(angle)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    return np.stack([x * c - y * s, x * s + y * c, z], axis=-1)


def _corners_3d(boxes):
    template = np.array(
        [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
         [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]], np.float32) / 2
    corners = boxes[:, None, 3:6] * template[None]
    out = np.stack(
        [_rotate_z(corners[:, j, :], boxes[:, 6]) for j in range(8)], axis=1)
    return out + boxes[:, None, 0:3]


# ---------------------------------------------------------------------------
# anchor head (anchor_head_template.py:101-215)
# ---------------------------------------------------------------------------


def test_anchor_head_loss_matches_reference_math():
    from pdanet_tpu.models.dense_heads.anchor_head import anchor_head_loss

    rng = np.random.RandomState(4)
    B, A = 2, 48
    labels = rng.randint(-1, NUM_CLASS + 1, (B, A)).astype(np.int32)
    labels[1, :40] = 0  # a nearly-empty row exercises the pos clamp
    reg_targets = rng.randn(B, A, 7).astype(np.float32)
    cls_preds = rng.randn(B, A, NUM_CLASS).astype(np.float32)
    box_preds = rng.randn(B, A, 7).astype(np.float32)
    dir_preds = rng.randn(B, A, 2).astype(np.float32)
    anchors = rng.randn(A, 7).astype(np.float32)
    anchors[:, 3:6] = np.abs(anchors[:, 3:6]) + 1.0
    lw = {"cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
          "code_weights": [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]}
    dir_offset, num_bins = 0.78539, 2

    total, tb = anchor_head_loss(
        jnp.asarray(cls_preds), jnp.asarray(box_preds), jnp.asarray(dir_preds),
        {"box_cls_labels": jnp.asarray(labels),
         "box_reg_targets": jnp.asarray(reg_targets)},
        jnp.asarray(anchors), NUM_CLASS, lw,
        dir_offset=dir_offset, num_dir_bins=num_bins)

    # --- numpy twin -------------------------------------------------------
    positives = labels > 0
    negatives = labels == 0
    cls_w = (negatives + positives).astype(np.float32)
    reg_w = positives.astype(np.float32)
    pos_norm = np.clip(positives.sum(1, keepdims=True).astype(np.float32), 1, None)
    cls_w, reg_w = cls_w / pos_norm, reg_w / pos_norm
    oh = np.zeros((B, A, NUM_CLASS + 1), np.float32)
    np.put_along_axis(oh, np.where(labels >= 0, labels, 0)[..., None], 1.0, -1)
    oh = oh[..., 1:]
    # SigmoidFocalClassificationLoss (loss_utils.py:44-73)
    p = 1.0 / (1.0 + np.exp(-cls_preds))
    alpha_w = oh * 0.25 + (1 - oh) * 0.75
    pt = oh * (1 - p) + (1 - oh) * p
    focal = alpha_w * pt**2 * _sigmoid_bce(cls_preds, oh) * cls_w[..., None]
    cls_loss = focal.sum() / B * lw["cls_weight"]

    sin_p = np.sin(box_preds[..., 6:7]) * np.cos(reg_targets[..., 6:7])
    sin_t = np.cos(box_preds[..., 6:7]) * np.sin(reg_targets[..., 6:7])
    bp = np.concatenate([box_preds[..., :6], sin_p], -1)
    rt = np.concatenate([reg_targets[..., :6], sin_t], -1)
    code_w = np.asarray(lw["code_weights"], np.float32)
    loc = _smooth_l1((bp - rt) * code_w, 1.0 / 9.0) * reg_w[..., None]
    loc_loss = loc.sum() / B * lw["loc_weight"]

    rot_gt = reg_targets[..., 6] + anchors[None, :, 6]
    off = rot_gt - dir_offset
    off = off - np.floor(off / (2 * np.pi)) * 2 * np.pi
    dir_t = np.clip(np.floor(off / (2 * np.pi / num_bins)), 0, num_bins - 1)
    sm = dir_preds - dir_preds.max(-1, keepdims=True)
    logp = sm - np.log(np.exp(sm).sum(-1, keepdims=True))
    ce = -np.take_along_axis(logp, dir_t[..., None].astype(np.int64), -1)[..., 0]
    dir_loss = (ce * reg_w).sum() / B * lw["dir_weight"]

    np.testing.assert_allclose(float(tb["rpn_loss_cls"]), cls_loss, rtol=2e-4)
    np.testing.assert_allclose(float(tb["rpn_loss_loc"]), loc_loss, rtol=2e-4)
    np.testing.assert_allclose(float(tb["rpn_loss_dir"]), dir_loss, rtol=2e-4)
    np.testing.assert_allclose(
        float(total), cls_loss + loc_loss + dir_loss, rtol=2e-4)


# ---------------------------------------------------------------------------
# center head (center_head.py:222-250 + loss_utils.py:395-474)
# ---------------------------------------------------------------------------


def test_center_head_loss_matches_reference_math():
    from pdanet_tpu.models.dense_heads.center_head import center_head_loss

    rng = np.random.RandomState(6)
    B, H, W, C, M = 2, 8, 10, 2, 6
    head_order = ["center", "center_z", "dim", "rot"]
    dims = {"center": 2, "center_z": 1, "dim": 3, "rot": 2}
    D = sum(dims.values())

    hm_logits = rng.randn(B, H, W, C).astype(np.float32) * 2
    heatmap = (rng.rand(B, H, W, C) * 0.98).astype(np.float32)
    heatmap[0, 2, 3, 0] = 1.0  # exact peaks drive pos_inds (gt.eq(1))
    heatmap[1, 5, 7, 1] = 1.0
    pred = {"hm": jnp.asarray(hm_logits)}
    for k in head_order:
        pred[k] = jnp.asarray(rng.randn(B, H, W, dims[k]).astype(np.float32))
    inds = rng.randint(0, H * W, (B, M)).astype(np.int32)
    mask = rng.rand(B, M) > 0.4
    mask[1, :] = False  # a zero-pos frame exercises the num clamp
    target_boxes = rng.randn(B, M, D).astype(np.float32)
    target_boxes[0, 1, 3] = np.nan  # the isnotnan guard (loss_utils.py:459)
    lw = {"cls_weight": 1.0, "loc_weight": 0.25,
          "code_weights": [1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 1.0, 1.0]}

    total, tb = center_head_loss(
        [pred],
        [{"heatmap": jnp.asarray(heatmap), "inds": jnp.asarray(inds),
          "mask": jnp.asarray(mask), "target_boxes": jnp.asarray(target_boxes)}],
        head_order, lw)

    # --- numpy twin -------------------------------------------------------
    p = np.clip(1.0 / (1.0 + np.exp(-hm_logits)), 1e-4, 1 - 1e-4)
    pos = (heatmap == 1.0).astype(np.float32)
    neg = (heatmap < 1.0).astype(np.float32)
    pos_loss = (np.log(p) * (1 - p) ** 2 * pos).sum()
    neg_loss = (np.log(1 - p) * p**2 * (1 - heatmap) ** 4 * neg).sum()
    num_pos = pos.sum()
    hm_loss = (-neg_loss if num_pos == 0
               else -(pos_loss + neg_loss) / num_pos) * lw["cls_weight"]

    reg_pred = np.concatenate(
        [np.asarray(pred[k]) for k in head_order], axis=-1).reshape(B, H * W, D)
    gathered = np.take_along_axis(
        reg_pred, np.broadcast_to(inds[..., None], (B, M, D)).astype(np.int64), 1)
    m = mask.astype(np.float32)[..., None] * (~np.isnan(target_boxes)).astype(
        np.float32)
    diff = np.abs(gathered * m - np.nan_to_num(target_boxes) * m)
    per_dim = diff.sum((0, 1)) / np.clip(mask.sum(), 1.0, None)
    loc_loss = (per_dim * np.asarray(lw["code_weights"])).sum() * lw["loc_weight"]

    np.testing.assert_allclose(float(tb["hm_loss_head_0"]), hm_loss, rtol=2e-4)
    np.testing.assert_allclose(float(tb["loc_loss_head_0"]), loc_loss, rtol=2e-4)
    np.testing.assert_allclose(float(total), hm_loss + loc_loss, rtol=2e-4)


# ---------------------------------------------------------------------------
# RoI head template (roi_head_template.py:139-218)
# ---------------------------------------------------------------------------


def _roi_setup():
    rng = np.random.RandomState(9)
    B, R = 2, 12
    rois = rng.randn(B, R, 7).astype(np.float32)
    rois[..., 3:6] = np.abs(rois[..., 3:6]) + 1.0
    gt_ct = rng.randn(B, R, 8).astype(np.float32)  # canonical targets
    gt_ct[..., 3:6] = np.abs(gt_ct[..., 3:6]) + 1.0
    gt_src = rng.randn(B, R, 8).astype(np.float32)
    gt_src[..., 3:6] = np.abs(gt_src[..., 3:6]) + 1.0
    rcnn_reg = (rng.randn(B, R, 7) * 0.2).astype(np.float32)
    rcnn_cls = rng.randn(B, R, 1).astype(np.float32)
    labels = rng.rand(B, R).astype(np.float32)  # soft iou-quality labels
    labels[0, :3] = -1.0  # ignored rows
    reg_valid = (rng.rand(B, R) > 0.5).astype(np.int32)
    return B, R, rois, gt_ct, gt_src, rcnn_reg, rcnn_cls, labels, reg_valid


def test_roi_cls_loss_matches_reference_math():
    from pdanet_tpu.models.roi_heads.roi_head_template import roi_box_cls_loss

    _, _, _, _, _, _, rcnn_cls, labels, _ = _roi_setup()
    cfg = EasyDict({"LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0}})
    loss, tb = roi_box_cls_loss(
        jnp.asarray(rcnn_cls), jnp.asarray(labels), cfg)

    flat = rcnn_cls.reshape(-1)
    lab = labels.reshape(-1)
    bce = _sigmoid_bce(flat, np.clip(lab, 0, None))
    valid = (lab >= 0).astype(np.float32)
    want = (bce * valid).sum() / np.clip(valid.sum(), 1.0, None)
    np.testing.assert_allclose(float(loss), want, rtol=2e-4)


def test_roi_reg_loss_matches_reference_math():
    from pdanet_tpu.models.roi_heads.roi_head_template import roi_box_reg_loss

    B, R, rois, gt_ct, gt_src, rcnn_reg, _, _, reg_valid = _roi_setup()
    coder = build_box_coder("ResidualCoder", {})
    cfg = EasyDict({
        "CORNER_LOSS_REGULARIZATION": True,
        "LOSS_WEIGHTS": {"rcnn_reg_weight": 1.0, "rcnn_corner_weight": 1.0,
                         "code_weights": [1.0] * 7},
    })
    ret = {"reg_valid_mask": jnp.asarray(reg_valid),
           "gt_of_rois": jnp.asarray(gt_ct),
           "gt_of_rois_src": jnp.asarray(gt_src),
           "rois": jnp.asarray(rois),
           "rcnn_reg": jnp.asarray(rcnn_reg)}
    loss, tb = roi_box_reg_loss(ret, coder, cfg)

    # --- numpy twin (roi_head_template.py:151-196) ------------------------
    fg = reg_valid.reshape(-1) > 0
    fg_sum = fg.sum()
    rois_f = rois.reshape(-1, 7)
    gt_f = gt_ct[..., :7].reshape(-1, 7)
    anchors = rois_f.copy()
    anchors[:, 0:3] = 0
    anchors[:, 6] = 0
    # ResidualCoder.encode_torch (box_coder_utils.py:5-43)
    da = np.clip(anchors[:, 3:6], 1e-5, None)
    db = np.clip(gt_f[:, 3:6], 1e-5, None)
    diag = np.sqrt(da[:, 0] ** 2 + da[:, 1] ** 2)
    targets = np.concatenate([
        ((gt_f[:, 0] - anchors[:, 0]) / diag)[:, None],
        ((gt_f[:, 1] - anchors[:, 1]) / diag)[:, None],
        ((gt_f[:, 2] - anchors[:, 2]) / da[:, 2])[:, None],
        np.log(db / da),
        (gt_f[:, 6] - anchors[:, 6])[:, None]], axis=-1)
    per = _smooth_l1(rcnn_reg.reshape(-1, 7) - targets, 1.0 / 9.0)
    reg_loss = (per.sum(-1) * fg).sum() / max(fg_sum, 1)

    # corner branch: decode with roi-ry KEPT in the anchor (:168-185)
    local = rois_f.copy()
    local[:, 0:3] = 0
    dg = np.exp(rcnn_reg.reshape(-1, 7)[:, 3:6]) * local[:, 3:6]
    dl = np.sqrt(local[:, 3] ** 2 + local[:, 4] ** 2)
    xyz = np.stack([rcnn_reg.reshape(-1, 7)[:, 0] * dl,
                    rcnn_reg.reshape(-1, 7)[:, 1] * dl,
                    rcnn_reg.reshape(-1, 7)[:, 2] * local[:, 5]], -1)
    ry = rcnn_reg.reshape(-1, 7)[:, 6] + rois_f[:, 6]
    xyz = _rotate_z(xyz, rois_f[:, 6]) + rois_f[:, 0:3]
    decoded = np.concatenate([xyz, dg, ry[:, None]], -1)
    pc = _corners_3d(decoded[fg])
    gtc = _corners_3d(gt_src[..., :7].reshape(-1, 7)[fg])
    gt_flip = gt_src[..., :7].reshape(-1, 7)[fg].copy()
    gt_flip[:, 6] += np.pi
    gcf = _corners_3d(gt_flip)
    dist = np.minimum(np.linalg.norm(pc - gtc, axis=2),
                      np.linalg.norm(pc - gcf, axis=2))
    corner_loss = _smooth_l1(dist, 1.0).mean(1).mean()

    np.testing.assert_allclose(
        float(tb["rcnn_loss_corner"]), corner_loss, rtol=2e-4)
    np.testing.assert_allclose(
        float(loss), reg_loss + corner_loss, rtol=2e-4)


# ---------------------------------------------------------------------------
# point head template (point_head_template.py:131-195): simple / box / part
# ---------------------------------------------------------------------------


def _focal_cls_twin(labels, preds, n_out):
    """get_cls_layer_loss (point_head_template.py:131-155): focal sum
    normalized per positive count (no /B)."""
    flat = labels.reshape(-1)
    logits = preds.reshape(-1, n_out)
    positives = flat > 0
    cls_w = ((flat == 0) + positives).astype(np.float32)
    pos_norm = positives.sum().astype(np.float32)
    cls_w = cls_w / np.clip(pos_norm, 1.0, None)
    oh = np.zeros((flat.shape[0], n_out + 1), np.float32)
    oh[np.arange(flat.shape[0]),
       (flat * (flat >= 0)).astype(np.int64)] = 1.0
    oh = oh[:, 1:]
    p = 1.0 / (1.0 + np.exp(-logits))
    alpha_w = oh * 0.25 + (1 - oh) * 0.75
    pt = oh * (1 - p) + (1 - oh) * p
    focal = alpha_w * pt**2 * _sigmoid_bce(logits, oh) * cls_w[:, None]
    return focal.sum(), pos_norm


def _point_fixture(seed=11):
    rng = np.random.RandomState(seed)
    B, N = 2, 64
    coords = (rng.rand(B, N, 3).astype(np.float32) - 0.5) * np.array(
        [16.0, 16.0, 4.0], np.float32)
    gt = np.zeros((B, 3, 8), np.float32)
    gt[0, 0] = [1.0, 1.0, 0.0, 4.2, 3.8, 2.4, 0.4, 1.0]
    gt[0, 1] = [-4.0, 3.0, 0.2, 3.0, 2.5, 2.2, -0.8, 2.0]
    gt[1, 0] = [3.0, -2.0, 0.0, 4.0, 3.0, 2.5, 1.1, 3.0]
    # implant fg points (plus near-boundary ones for the ignore ring)
    for b in range(B):
        k = 0
        for m in range(3):
            if gt[b, m, 7] == 0:
                continue
            ctr, dims = gt[b, m, 0:3], gt[b, m, 3:6]
            for frac in (0.0, 0.3, -0.45, 0.52):  # 0.52: ring candidate
                coords[b, k] = ctr + frac * dims
                k += 1
    return B, N, coords, gt


def test_point_head_simple_loss_matches_reference_math():
    from pdanet_tpu.models.dense_heads.iassd_head import assign_stack_targets
    from pdanet_tpu.models.dense_heads.point_head_simple import (
        point_head_simple_loss,
    )
    from pdanet_tpu.utils.box_utils import enlarge_box3d

    B, N, coords, gt = _point_fixture()
    rng = np.random.RandomState(12)
    preds = rng.randn(B, N, 1).astype(np.float32)
    cfg = EasyDict({
        "CLASS_AGNOSTIC": True,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0}},
    })
    loss, tb = point_head_simple_loss(
        jnp.asarray(preds), jnp.asarray(coords), jnp.asarray(gt), cfg)

    ext = np.asarray(enlarge_box3d(
        jnp.asarray(gt.reshape(-1, 8)), [0.2, 0.2, 0.2])).reshape(B, -1, 8)
    t = assign_stack_targets(
        jnp.asarray(coords), jnp.asarray(gt), jnp.asarray(ext),
        set_ignore_flag=True)
    labels = np.asarray(t["point_cls_labels"])
    labels = np.where(labels > 0, 1, labels)  # CLASS_AGNOSTIC
    assert (labels > 0).any() and (labels == -1).any()
    want, pos_num = _focal_cls_twin(labels, preds, 1)
    np.testing.assert_allclose(float(loss), want, rtol=2e-4)
    np.testing.assert_allclose(float(tb["point_pos_num"]), pos_num)


def test_point_head_box_loss_matches_reference_math():
    from pdanet_tpu.models.dense_heads.iassd_head import assign_stack_targets
    from pdanet_tpu.models.dense_heads.point_head_box import (
        point_head_box_loss,
    )
    from pdanet_tpu.utils.box_utils import enlarge_box3d

    B, N, coords, gt = _point_fixture(13)
    rng = np.random.RandomState(14)
    cls_preds = rng.randn(B, N, NUM_CLASS).astype(np.float32)
    box_preds = rng.randn(B, N, 8).astype(np.float32)
    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
    coder = build_box_coder(
        "PointResidualCoder",
        {"angle_bin_num": 12, "use_mean_size": True, "mean_size": mean_size})
    cfg = EasyDict({
        "CLASS_AGNOSTIC": False,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "point_cls_weight": 1.0, "point_box_weight": 1.0,
            "code_weights": [1.0] * 8}},
    })
    loss, tb = point_head_box_loss(
        jnp.asarray(cls_preds), jnp.asarray(box_preds), jnp.asarray(coords),
        jnp.asarray(gt), coder, cfg, NUM_CLASS)

    ext = np.asarray(enlarge_box3d(
        jnp.asarray(gt.reshape(-1, 8)), [0.2, 0.2, 0.2])).reshape(B, -1, 8)
    t = assign_stack_targets(
        jnp.asarray(coords), jnp.asarray(gt), jnp.asarray(ext),
        set_ignore_flag=True)
    labels = np.asarray(t["point_cls_labels"])
    assert (labels > 0).any()
    cls_want, _ = _focal_cls_twin(labels, cls_preds, NUM_CLASS)

    # box labels via the reference PointResidualCoder.encode_torch math
    # (box_coder_utils.py:153-188), zeros on non-fg rows
    gt_of = np.asarray(t["gt_box_of_points"]).reshape(-1, 8)
    pts = coords.reshape(-1, 3)
    cls_of = gt_of[:, 7].astype(np.int64)
    anchor = np.asarray(mean_size, np.float32)[np.clip(cls_of - 1, 0, 2)]
    diag = np.sqrt(anchor[:, 0] ** 2 + anchor[:, 1] ** 2)
    sizes = np.clip(gt_of[:, 3:6], 1e-5, None)
    enc = np.concatenate([
        ((gt_of[:, 0] - pts[:, 0]) / diag)[:, None],
        ((gt_of[:, 1] - pts[:, 1]) / diag)[:, None],
        ((gt_of[:, 2] - pts[:, 2]) / anchor[:, 2])[:, None],
        np.log(sizes / anchor),
        np.cos(gt_of[:, 6])[:, None], np.sin(gt_of[:, 6])[:, None]], -1)
    fg = labels.reshape(-1) > 0
    enc = enc * fg[:, None]
    pos_norm = np.clip(fg.sum().astype(np.float32), 1.0, None)
    per = _smooth_l1(box_preds.reshape(-1, 8) - enc, 1.0 / 9.0)
    box_want = (per.sum(-1) * fg / pos_norm).sum()

    np.testing.assert_allclose(float(tb["point_loss_cls"]), cls_want, rtol=2e-4)
    np.testing.assert_allclose(float(tb["point_loss_box"]), box_want, rtol=2e-4)
    np.testing.assert_allclose(float(loss), cls_want + box_want, rtol=2e-4)


def test_point_intra_part_loss_matches_reference_math():
    from pdanet_tpu.models.dense_heads.iassd_head import assign_stack_targets
    from pdanet_tpu.models.dense_heads.point_intra_part_head import (
        point_intra_part_loss,
    )
    from pdanet_tpu.utils.box_utils import enlarge_box3d

    B, N, coords, gt = _point_fixture(15)
    rng = np.random.RandomState(16)
    cls_preds = rng.randn(B, N, 1).astype(np.float32)
    part_preds = rng.randn(B, N, 3).astype(np.float32)
    valid = np.ones((B, N), bool)
    valid[:, -8:] = False  # padded voxel slots
    cfg = EasyDict({
        "CLASS_AGNOSTIC": True,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "point_cls_weight": 1.0, "point_part_weight": 1.0}},
    })
    loss, tb = point_intra_part_loss(
        jnp.asarray(cls_preds), jnp.asarray(part_preds), jnp.asarray(coords),
        jnp.asarray(valid), jnp.asarray(gt), cfg)

    ext = np.asarray(enlarge_box3d(
        jnp.asarray(gt.reshape(-1, 8)), [0.2, 0.2, 0.2])).reshape(B, -1, 8)
    t = assign_stack_targets(
        jnp.asarray(coords), jnp.asarray(gt), jnp.asarray(ext),
        set_ignore_flag=True)
    labels = np.asarray(t["point_cls_labels"])
    labels = np.where(labels > 0, 1, labels)
    # padded voxel slots do not exist in the reference's stacked layout —
    # restrict the twin to the real rows
    cls_want, pos_num = _focal_cls_twin(
        labels[valid], cls_preds[valid][None], 1)

    # part labels (point_head_template.py:115-122): canonical offset /
    # dims + 0.5 on fg rows; BCE normalized by 3 * pos count (:158-170)
    gt_of = np.asarray(t["gt_box_of_points"]).reshape(-1, 8)
    pts = coords.reshape(-1, 3)
    local = _rotate_z(pts - gt_of[:, 0:3], -gt_of[:, 6])
    part_labels = local / np.clip(gt_of[:, 3:6], 1e-9, None) + 0.5
    fg = (labels > 0).reshape(-1) & valid.reshape(-1)
    part_labels = np.where(fg[:, None], part_labels, 0.0)
    p = 1.0 / (1.0 + np.exp(-part_preds.reshape(-1, 3)))
    eps = 1e-7
    bce = -(part_labels * np.log(np.clip(p, eps, 1.0))
            + (1 - part_labels) * np.log(np.clip(1 - p, eps, 1.0))).sum(-1)
    part_want = (bce * fg).sum() / (3.0 * np.clip(fg.sum(), 1.0, None))

    np.testing.assert_allclose(float(tb["point_loss_cls"]), cls_want, rtol=2e-4)
    np.testing.assert_allclose(
        float(tb["point_loss_part"]), part_want, rtol=2e-4)
    np.testing.assert_allclose(float(loss), cls_want + part_want, rtol=2e-4)
