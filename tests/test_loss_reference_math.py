"""Numeric reference-math twin of the FULL IASSD/PDA-SSD loss stack.

The flax loss path (pdanet_tpu/models/dense_heads/iassd_head.py:209-603)
re-designs the reference's boolean-indexed, variable-shape torch losses
(IASSD_head.py:470-1340) as fixed-shape masked/segment-sum reductions for
XLA.  tests/test_model.py pins vote ver1/ver2 against a per-instance
oracle; this test pins EVERY component of the shipped configs' loss
(vote 'none', per-SA-layer ins-aware loss with the gauss centerness mask,
center cls with box-geometry centerness, binori box regression including
the global-mean ori-residual quirk, corner loss, and the CD_loss tb
metric) against a verbatim-math numpy transliteration of the reference
code that uses the reference's own boolean-indexed variable-shape forms.

Inputs are a REAL forward: the tiny PDA-SSD runs train-mode on random
points, targets come from the real ``assign_targets`` (itself
oracle-tested), and both loss stacks consume the same forward_ret — so a
mismatch in any masked-reduction equivalence shows up as a value delta.

Batch is fixed at 2: the reference's per-batch windowing in
``gauss_fun_once_topk_GT_add_same_size`` advances its slice end by
doubling (IASSD_head.py:965 ``batch_idx_end = batch_idx_end +
batch_idx_end``), which walks [0:N], [N:2N] correctly only for B <= 2 —
at B >= 4 the reference indexes past the tensor.  The TPU rebuild treats
every batch row identically (the B <= 2 behavior, extended uniformly).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from model_cfg import tiny_model_cfg

from pdanet_tpu.models import build_network
from pdanet_tpu.models.dense_heads import iassd_head
from pdanet_tpu.utils.box_coder_utils import build_box_coder

pytestmark = pytest.mark.smoke

NUM_CLASS = 3
BIN_SIZE = 12


# ---------------------------------------------------------------------------
# numpy transliterations of the reference loss math (cited per function)
# ---------------------------------------------------------------------------


def _sigmoid_bce(x, z):
    """loss_utils.py:95-97 (tf-style sigmoid cross entropy)."""
    return np.clip(x, 0, None) - x * z + np.log1p(np.exp(-np.abs(x)))


def _smooth_l1(diff, beta):
    """loss_utils.py:158-165 (fvcore form)."""
    n = np.abs(diff)
    if beta < 1e-5:
        return n
    return np.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def _rotate_z(points, angle):
    """common_utils.rotate_points_along_z: row-vector points @ Rz(angle).

    points (N, 3), angle (N,) -> (N, 3); x' = x c - y s, y' = x s + y c.
    """
    c, s = np.cos(angle), np.sin(angle)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    return np.stack([x * c - y * s, x * s + y * c, z], axis=-1)


def _one_hot_weights(labels_flat, num_class):
    """Shared cls-target assembly (IASSD_head.py:641-649)."""
    positives = labels_flat > 0
    negatives = labels_flat == 0
    cls_weights = (negatives.astype(np.float32)
                   + positives.astype(np.float32))
    pos_normalizer = positives.sum().astype(np.float32)
    cls_weights = cls_weights / np.clip(pos_normalizer, 1.0, None)
    oh = np.zeros((labels_flat.shape[0], num_class + 1), np.float32)
    oh[np.arange(labels_flat.shape[0]),
       (labels_flat * (labels_flat >= 0)).astype(np.int64)] = 1.0
    return oh[:, 1:], cls_weights, pos_normalizer


def ref_vote_none(labels, gt_of_origin, centers_origin, ctr_offsets, w):
    """get_contextual_vote_loss (IASSD_head.py:525-548): per present class,
    torch.F.smooth_l1_loss (beta 1, elementwise mean) of predicted centers
    vs gt centers, then mean over classes."""
    pred = centers_origin + ctr_offsets
    per_class = []
    for k in np.unique(labels):
        if k <= 0:
            continue
        m = labels == k
        diff = pred[m] - gt_of_origin[m][:, 0:3]
        per_class.append(_smooth_l1(diff, 1.0).mean())
    return np.float32(np.mean(per_class) * w)


def ref_centerness_mask(labels_flat, gt_fg, centers_fg):
    """generate_center_ness_mask (IASSD_head.py:795-818)."""
    off = centers_fg - gt_fg[:, 0:3]
    off_c = _rotate_z(off, -gt_fg[:, 6])
    half = gt_fg[:, 3:6] / 2.0
    dist_pos = half - off_c
    dist_neg = half + off_c
    dmin = np.minimum(dist_pos, dist_neg)
    dmax = np.maximum(dist_pos, dist_neg)
    cness = dmin / dmax
    cness = np.clip(cness[:, 0] * cness[:, 1] * cness[:, 2], 1e-6, None)
    cness = cness ** (1.0 / 3.0)
    mask = np.zeros(labels_flat.shape, np.float32)
    mask[labels_flat > 0] = cness
    return mask


def ref_center_cls(ret, lw):
    """get_center_cls_layer_loss (IASSD_head.py:637-664)."""
    labels = np.asarray(ret["center_cls_labels"]).reshape(-1)
    preds = np.asarray(ret["center_cls_preds"]).reshape(-1, NUM_CLASS)
    oh, cls_w, pos_num = _one_hot_weights(labels, NUM_CLASS)
    gt_dense = np.asarray(ret["center_gt_box_of_points"]).reshape(-1, 8)
    centers = np.asarray(ret["centers"]).reshape(-1, 3)
    fg = labels > 0
    mask = ref_centerness_mask(labels, gt_dense[fg], centers[fg])
    oh = oh * mask[:, None]
    loss = (_sigmoid_bce(preds, oh) * cls_w[:, None]).mean(-1).sum()
    return np.float32(loss * lw["point_cls_weight"]), pos_num


def ref_gauss_mask(coords_flat, labels_flat, gt_fg):
    """gauss_fun_once_topk_GT_add_same_size heatmap part
    (IASSD_head.py:889-950): class-multiplied covariances, exp(-0.5 d^2)."""
    fg = labels_flat > 0
    xyz = coords_flat[fg]
    off_c = _rotate_z(xyz - gt_fg[:, 0:3], -gt_fg[:, 6])
    w, l, h = gt_fg[:, 3], gt_fg[:, 4], gt_fg[:, 5]
    c1 = 4.0 / (w**2 + l**2)
    c2 = 4.0 / (w**2 + h**2)
    c3 = 4.0 / (h**2 + l**2)
    cls = gt_fg[:, 7]
    for k, m in ((1, 4.0), (2, 6.0), (3, 5.0)):
        c1 = np.where(cls == k, c1 * m, c1)
        c2 = np.where(cls == k, c2 * m, c2)
        c3 = np.where(cls == k, c3 * m, c3)
    scaled = np.stack([off_c[:, 0] * c1, off_c[:, 1] * c2,
                       off_c[:, 2] * c3], axis=-1)
    hm = np.exp(-0.5 * (scaled * scaled).sum(-1))
    mask = np.zeros(labels_flat.shape, np.float32)
    mask[fg] = hm
    return mask


def ref_topk_set(coords_b, mask_b, gt_fg_b, sample_number):
    """One batch row of the topk reference-set construction
    (IASSD_head.py:955-1021): fg points by descending heatmap, topped up
    with the background points nearest to the fg gt centers."""
    score, order = np.sort(mask_b)[::-1], np.argsort(-mask_b, kind="stable")
    picked = order[:sample_number]
    picked = picked[score[:sample_number] > 0]
    sel = coords_b[picked]
    if len(picked) < sample_number:
        bg = mask_b <= 0
        xyz_bg = coords_b[bg]
        d2 = ((xyz_bg[:, None, :] - gt_fg_b[None, :, 0:3]) ** 2).sum(-1)
        dmin = d2.min(1)
        add = np.argsort(dmin, kind="stable")[: sample_number - len(picked)]
        sel = np.concatenate([sel, xyz_bg[add]], axis=0)
    return sel


def ref_cd_l1(pred, ref_set):
    """cd_loss.cd_loss_L1 AS EXECUTED (cd_loss.py:22-25): sqrt on dist1
    only; the dist2 sqrt is commented out."""
    d2 = ((pred[:, None, :] - ref_set[None, :, :]) ** 2).sum(-1)
    return (np.sqrt(d2.min(1)).mean() + d2.min(0).mean()) / 2.0


def ref_sa_ins_and_cd(ret, loss_cfg):
    """get_sa_ins_layer_loss + the CD metric
    (IASSD_head.py:668-736, 889-1042)."""
    labels_list = [np.asarray(x) for x in ret["sa_ins_labels"]]
    preds_list = ret["sa_ins_preds"]
    coords = [np.asarray(x) for x in ret["encoder_coords"]]
    gts_list = [np.asarray(x) for x in ret["sa_gt_box_of_points"]]
    n = len(labels_list)
    B = labels_list[0].shape[0]

    # heatmaps for every sa entry i (on coords[i+1]) + topk reference sets
    masks, topks = [], []
    for i in range(n):
        lab = labels_list[i].reshape(-1)
        gt_fg = gts_list[i].reshape(-1, 8)[lab > 0]
        hm = ref_gauss_mask(coords[i + 1].reshape(-1, 3), lab, gt_fg)
        masks.append(hm)
        if i + 1 < n:
            Ni = labels_list[i].shape[1]
            sample_number = labels_list[i + 1].shape[1]
            per_b = []
            for b in range(B):
                hm_b = hm[b * Ni:(b + 1) * Ni]
                lab_b = labels_list[i][b]
                gt_fg_b = gts_list[i][b][lab_b > 0]
                per_b.append(ref_topk_set(coords[i + 1][b], hm_b, gt_fg_b,
                                          sample_number))
            topks.append(per_b)
        else:
            topks.append(None)

    weights = loss_cfg.LOSS_WEIGHTS.get("ins_aware_weight", [1.0] * n)
    total, ignored, tb = 0.0, 0, {}
    for i in range(n):
        if preds_list[i] is None:
            ignored += 1
            continue
        logits = np.asarray(preds_list[i]).reshape(-1, NUM_CLASS)
        lab = labels_list[i].reshape(-1)
        oh, cls_w, pos_num = _one_hot_weights(lab, NUM_CLASS)
        if "ctr" in loss_cfg.SAMPLE_METHOD_LIST[i + 1][0]:
            oh = oh * masks[i][:, None]
        li = (_sigmoid_bce(logits, oh) * cls_w[:, None]).mean(-1).sum()
        li = li * weights[i]
        total += li
        tb[f"sa{i}_loss_ins"] = np.float32(li)
        tb[f"sa{i}_pos_num"] = pos_num
    total = np.float32(total / (n - ignored))

    # CD metric (IASSD_head.py:1024-1042): layers whose own method is ctr
    cds = []
    for i in range(4):
        if not ("ctr" in loss_cfg.SAMPLE_METHOD_LIST[i][0]
                if loss_cfg.SAMPLE_METHOD_LIST[i] else False):
            continue
        per_b = [ref_cd_l1(coords[i + 1][b], topks[i - 1][b])
                 for b in range(B)]
        cds.append(np.mean(per_b))
    cd = np.float32(np.mean(cds)) if cds else None
    return total, tb, cd


def ref_binori(ret, lw):
    """get_center_box_binori_layer_loss (IASSD_head.py:1239-1282)."""
    labels = np.asarray(ret["center_cls_labels"]).reshape(-1)
    box_labels = np.asarray(ret["center_box_labels"]).reshape(-1, 8)
    box_preds = np.asarray(ret["center_box_preds"]).reshape(-1, 6 + 2 * BIN_SIZE)
    pos = labels > 0
    reg_w = pos.astype(np.float32)
    reg_w = reg_w / np.clip(pos.sum().astype(np.float32), 1.0, None)

    code_w = np.asarray(lw.get("code_weights", [1.0] * 6), np.float32)
    diff = (box_preds[:, :6] - box_labels[:, :6]) * code_w[None, :]
    xyzwhl = (_smooth_l1(diff, 1.0 / 9.0) * reg_w[:, None]).sum()

    bin_logits = box_preds[:, 6:6 + BIN_SIZE]
    sm = bin_logits - bin_logits.max(-1, keepdims=True)
    logp = sm - np.log(np.exp(sm).sum(-1, keepdims=True))
    bin_id = box_labels[:, 6].astype(np.int64)
    ce = -logp[np.arange(len(bin_id)), bin_id]
    loss_ori_cls = (ce * reg_w).sum()

    res_pred = box_preds[:, 6 + BIN_SIZE:][np.arange(len(bin_id)), bin_id]
    # F.smooth_l1_loss default 'mean' over ALL rows, then x sum(reg_w)
    loss_ori_reg = _smooth_l1(res_pred - box_labels[:, 7], 1.0).mean()
    loss_ori_reg = loss_ori_reg * reg_w.sum()

    loss_ori_cls = loss_ori_cls * lw.get("dir_weight", 1.0)
    total = (xyzwhl + loss_ori_reg + loss_ori_cls) * lw["point_box_weight"]
    return (np.float32(total), np.float32(xyzwhl), np.float32(loss_ori_cls),
            np.float32(loss_ori_reg))


def _corners_3d(boxes):
    """box_utils.boxes_to_corners_3d (box_utils.py:28-53)."""
    template = np.array(
        [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
         [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]], np.float32) / 2
    corners = boxes[:, None, 3:6] * template[None]
    out = np.stack(
        [_rotate_z(corners[:, j, :], boxes[:, 6]) for j in range(8)], axis=1)
    return out + boxes[:, None, 0:3]


def ref_corner(ret, lw):
    """get_corner_layer_loss (IASSD_head.py:1309-1323) +
    loss_utils.get_corner_loss_lidar (loss_utils.py:340-363)."""
    labels = np.asarray(ret["center_cls_labels"]).reshape(-1)
    pos = labels > 0
    gt = np.asarray(ret["center_gt_box_of_points"]).reshape(-1, 8)[pos, :7]
    pred = np.asarray(ret["point_box_preds"]).reshape(-1, 7)[pos]
    pc = _corners_3d(pred)
    gc = _corners_3d(gt)
    gt_flip = gt.copy()
    gt_flip[:, 6] += np.pi
    gcf = _corners_3d(gt_flip)
    dist = np.minimum(np.linalg.norm(pc - gc, axis=2),
                      np.linalg.norm(pc - gcf, axis=2))
    per_box = _smooth_l1(dist, 1.0).mean(1)
    return np.float32(per_box.mean() * lw["corner_weight"])


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def loss_setup():
    cfg = tiny_model_cfg(NUM_CLASS)
    model = build_network(cfg, num_class=NUM_CLASS, input_channels=4)
    rng = jax.random.PRNGKey(3)
    pts = jax.random.normal(rng, (2, 256, 4)) * 4
    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, train=False))(rng, pts)

    box_coder = build_box_coder(
        cfg.POINT_HEAD.TARGET_CONFIG.BOX_CODER,
        cfg.POINT_HEAD.TARGET_CONFIG.BOX_CODER_CONFIG,
    )
    out, _ = model.apply(variables, pts, train=True, mutable=["batch_stats"])

    # place gt boxes around actual predicted centers / early-layer points so
    # every loss branch sees foreground at random init
    centers = np.asarray(out["centers"])
    l1_xyz = np.asarray(out["encoder_xyz"][2])  # conf-carrying layer coords
    gt = np.zeros((2, 5, 8), np.float32)
    for b in range(2):
        gt[b, 0, 0:3] = centers[b, 0]
        gt[b, 0, 3:8] = [4.2, 3.5, 3.0, 0.3, 1.0]
        gt[b, 1, 0:3] = l1_xyz[b, 5]
        gt[b, 1, 3:8] = [3.0, 2.5, 2.5, -0.5, 2.0]
    gt[1, 2, 0:3] = l1_xyz[1, 11]
    gt[1, 2, 3:8] = [2.4, 2.0, 2.0, 1.2, 3.0]
    gt_boxes = jnp.asarray(gt)
    targets = iassd_head.assign_targets(
        out, gt_boxes, cfg.POINT_HEAD.TARGET_CONFIG, box_coder, NUM_CLASS)
    ret = dict(out)
    ret.update(targets)
    total, tb = iassd_head.get_loss(
        ret, cfg.POINT_HEAD, box_coder, NUM_CLASS, gt_boxes.shape[1])
    # the fixture must exercise every branch: fg on the center set and on
    # each conf-carrying SA layer
    assert int(np.asarray(ret["center_pos_mask"]).sum()) > 0
    for i in (1, 2):
        assert int((np.asarray(ret["sa_ins_labels"][i]) > 0).sum()) > 0
    return cfg, ret, total, tb


def test_vote_loss_matches_reference_math(loss_setup):
    cfg, ret, _, tb = loss_setup
    want = ref_vote_none(
        np.asarray(ret["center_origin_cls_labels"]),
        np.asarray(ret["gt_box_of_center_origin"]),
        np.asarray(ret["centers_origin"]),
        np.asarray(ret["ctr_offsets"]),
        cfg.POINT_HEAD.LOSS_CONFIG.LOSS_WEIGHTS["vote_weight"])
    np.testing.assert_allclose(float(tb["vote_loss"]), want, rtol=2e-4)


def test_center_cls_loss_matches_reference_math(loss_setup):
    cfg, ret, _, tb = loss_setup
    want, pos_num = ref_center_cls(ret, cfg.POINT_HEAD.LOSS_CONFIG.LOSS_WEIGHTS)
    np.testing.assert_allclose(float(tb["center_loss_cls"]), want, rtol=2e-4)
    np.testing.assert_allclose(float(tb["center_pos_num"]), pos_num)


def test_sa_ins_loss_and_cd_match_reference_math(loss_setup):
    cfg, ret, _, tb = loss_setup
    want, tb_ref, cd = ref_sa_ins_and_cd(ret, cfg.POINT_HEAD.LOSS_CONFIG)
    np.testing.assert_allclose(float(tb["sa_loss_ins"]), want, rtol=2e-4)
    for k, v in tb_ref.items():
        np.testing.assert_allclose(float(tb[k]), v, rtol=2e-4, err_msg=k)
    assert cd is not None and "CD_loss" in tb
    np.testing.assert_allclose(float(tb["CD_loss"]), cd, rtol=2e-4)


def test_binori_loss_matches_reference_math(loss_setup):
    cfg, ret, _, tb = loss_setup
    box, xyzwhl, ori_bin, ori_res = ref_binori(
        ret, cfg.POINT_HEAD.LOSS_CONFIG.LOSS_WEIGHTS)
    np.testing.assert_allclose(float(tb["center_loss_box"]), box, rtol=2e-4)
    np.testing.assert_allclose(
        float(tb["center_loss_box_xyzwhl"]), xyzwhl, rtol=2e-4)
    np.testing.assert_allclose(
        float(tb["center_loss_box_ori_bin"]), ori_bin, rtol=2e-4)
    np.testing.assert_allclose(
        float(tb["center_loss_box_ori_res"]), ori_res, rtol=2e-4)


def test_corner_loss_matches_reference_math(loss_setup):
    cfg, ret, _, tb = loss_setup
    want = ref_corner(ret, cfg.POINT_HEAD.LOSS_CONFIG.LOSS_WEIGHTS)
    np.testing.assert_allclose(float(tb["corner_loss_reg"]), want, rtol=2e-4)


def test_total_loss_matches_reference_math(loss_setup):
    cfg, ret, total, tb = loss_setup
    lw = cfg.POINT_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
    vote = ref_vote_none(
        np.asarray(ret["center_origin_cls_labels"]),
        np.asarray(ret["gt_box_of_center_origin"]),
        np.asarray(ret["centers_origin"]),
        np.asarray(ret["ctr_offsets"]), lw["vote_weight"])
    sa, _, _ = ref_sa_ins_and_cd(ret, cfg.POINT_HEAD.LOSS_CONFIG)
    cls, _ = ref_center_cls(ret, lw)
    box, _, _, _ = ref_binori(ret, lw)
    corner = ref_corner(ret, lw)
    np.testing.assert_allclose(
        float(total), vote + sa + cls + box + corner, rtol=2e-4)
