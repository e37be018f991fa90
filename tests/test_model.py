"""Model-level tests: PDA-SSD forward shapes, loss stack, target assignment
vs a numpy oracle, and post-processing (SURVEY.md §4b/§4c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from model_cfg import tiny_model_cfg

from pdanet_tpu.models import build_network
from pdanet_tpu.models.dense_heads import iassd_head
from pdanet_tpu.models.detectors.iassd import compute_loss, post_processing
from pdanet_tpu.utils.box_coder_utils import build_box_coder

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_model_cfg()
    model = build_network(cfg, num_class=3, input_channels=4)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.normal(rng, (2, 256, 4)) * 5
    variables = jax.jit(lambda r, p: model.init({"params": r}, p, train=False))(
        rng, pts
    )
    return cfg, model, variables, pts


def _gt_boxes():
    gt = np.zeros((2, 5, 8), np.float32)
    gt[:, 0] = [2.0, 1.0, 0.0, 3.9, 1.6, 1.56, 0.3, 1.0]
    gt[:, 1] = [-3.0, 2.0, 0.2, 0.8, 0.6, 1.73, -0.5, 2.0]
    gt[1, 2] = [4.0, -2.0, 0.0, 1.76, 0.6, 1.73, 1.2, 3.0]
    return jnp.asarray(gt)


def test_forward_shapes(model_and_vars):
    cfg, model, variables, pts = model_and_vars
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pts)
    B = 2
    assert out["centers"].shape == (B, 8, 3)
    assert out["centers_origin"].shape == (B, 8, 3)
    assert out["ctr_offsets"].shape == (B, 8, 3)
    assert out["centers_features"].shape == (B, 8, 128)
    assert out["center_cls_preds"].shape == (B, 8, 3)
    assert out["center_box_preds"].shape == (B, 8, 30)
    assert out["point_box_preds"].shape == (B, 8, 7)
    # encoder pyramid budgets
    sizes = [x.shape[1] for x in out["encoder_xyz"]]
    assert sizes == [256, 64, 32, 16, 8, 8, 8]
    # confidence preds only at layers 1 and 2
    got = [p is not None for p in out["sa_ins_preds"]]
    assert got == [False, True, True, False, False, False]
    # vote offsets are clamped to MAX_TRANSLATE_RANGE
    lim = np.array([3.0, 3.0, 2.0])
    assert np.all(np.abs(np.asarray(out["ctr_offsets"])) <= lim + 1e-5)


def test_loss_finite_and_positive(model_and_vars):
    cfg, model, variables, pts = model_and_vars
    box_coder = build_box_coder(
        cfg.POINT_HEAD.TARGET_CONFIG.BOX_CODER,
        cfg.POINT_HEAD.TARGET_CONFIG.BOX_CODER_CONFIG,
    )

    def f(v, p, g):
        out, _ = model.apply(v, p, train=True, mutable=["batch_stats"])
        return compute_loss(out, g, cfg, box_coder, 3)

    loss, tb = jax.jit(f)(variables, pts, _gt_boxes())
    assert np.isfinite(float(loss)) and float(loss) > 0
    for key in ["vote_loss", "sa_loss_ins", "center_loss_cls", "center_loss_box",
                "corner_loss_reg"]:
        assert key in tb and np.isfinite(float(tb[key])), key


def test_loss_grads_finite(model_and_vars):
    cfg, model, variables, pts = model_and_vars
    box_coder = build_box_coder(
        cfg.POINT_HEAD.TARGET_CONFIG.BOX_CODER,
        cfg.POINT_HEAD.TARGET_CONFIG.BOX_CODER_CONFIG,
    )

    def f(params, p, g):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            p, train=True, mutable=["batch_stats"],
        )
        return compute_loss(out, g, cfg, box_coder, 3)[0]

    grads = jax.jit(jax.grad(f))(variables["params"], pts, _gt_boxes())
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # at least some grads are nonzero
    assert any(np.any(np.asarray(g) != 0) for g in flat)


def test_target_assignment_vs_oracle():
    """assign_stack_targets against a brute-force numpy oracle (ignore ring
    + extended-gt variants, padded gt rows)."""
    from oracles import points_in_boxes_oracle

    rng = np.random.RandomState(7)
    B, N, M = 2, 64, 4
    pts = rng.uniform(-6, 6, (B, N, 3)).astype(np.float32)
    gt = np.zeros((B, M, 8), np.float32)
    gt[0, 0] = [0, 0, 0, 4, 2, 1.5, 0.4, 1]
    gt[0, 1] = [3, 3, 0, 2, 2, 2, -0.7, 2]
    gt[1, 0] = [-2, 1, 0, 3, 1.5, 1.5, 0.0, 3]

    from pdanet_tpu.ops.geometry import enlarge_box3d

    ext = np.asarray(
        enlarge_box3d(jnp.asarray(gt.reshape(-1, 8)), [0.5, 0.5, 0.5])
    ).reshape(B, M, 8)

    t = iassd_head.assign_stack_targets(
        jnp.asarray(pts), jnp.asarray(gt), jnp.asarray(ext), set_ignore_flag=True
    )
    labels = np.asarray(t["point_cls_labels"])

    for b in range(B):
        idx = points_in_boxes_oracle(pts[b : b + 1], gt[b : b + 1, :, :7])[0]
        ext_idx = points_in_boxes_oracle(pts[b : b + 1], ext[b : b + 1, :, :7])[0]
        for n in range(N):
            if idx[n] >= 0:
                expect = int(gt[b, idx[n], 7])
            elif ext_idx[n] >= 0:
                expect = -1
            else:
                expect = 0
            assert labels[b, n] == expect, (b, n, labels[b, n], expect)


def test_binori_coder_roundtrip():
    coder = build_box_coder(
        "PointResidual_BinOri_Coder",
        {
            "angle_bin_num": 12,
            "use_mean_size": True,
            "mean_size": [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]],
        },
    )
    rng = np.random.RandomState(3)
    n = 32
    boxes = np.stack(
        [
            rng.uniform(-20, 20, n), rng.uniform(-20, 20, n), rng.uniform(-2, 1, n),
            rng.uniform(1, 5, n), rng.uniform(0.5, 2.5, n), rng.uniform(1, 2, n),
            rng.uniform(-np.pi + 0.01, np.pi - 0.01, n),
        ],
        axis=-1,
    ).astype(np.float32)
    pts = boxes[:, :3] + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    classes = rng.randint(1, 4, n)

    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(classes))
    # perfect encoding: xyzwhl residuals + one-hot bin logits + residual row
    bin_id = np.asarray(enc[:, 6]).astype(int)
    dec_in = np.zeros((n, coder.code_size), np.float32)
    dec_in[:, :6] = np.asarray(enc[:, :6])
    dec_in[np.arange(n), 6 + bin_id] = 10.0  # winning bin logit
    res = np.zeros((n, 12), np.float32)
    res[np.arange(n), bin_id] = np.asarray(enc[:, 7])
    dec_in[:, 18:] = res
    dec = np.asarray(
        coder.decode(jnp.asarray(dec_in), jnp.asarray(pts), jnp.asarray(classes))
    )
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], rtol=1e-4, atol=1e-4)
    ang_err = np.abs(
        np.angle(np.exp(1j * (dec[:, 6] - boxes[:, 6])))
    )
    assert np.max(ang_err) < 1e-4


def test_post_processing_shapes(model_and_vars):
    cfg, model, variables, pts = model_and_vars
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pts)
    pred = post_processing(
        out["batch_cls_preds"], out["batch_box_preds"], cfg.POST_PROCESSING
    )
    # fixed output size = min(POST_MAXSIZE, candidates)
    post = min(cfg.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE,
               out["batch_box_preds"].shape[1])
    assert pred["pred_boxes"].shape == (2, post, 7)
    assert pred["pred_scores"].shape == (2, post)
    assert pred["pred_labels"].shape == (2, post)
    counts = np.asarray(pred["pred_counts"])
    assert np.all(counts >= 0) and np.all(counts <= post)
    labels = np.asarray(pred["pred_labels"])
    for b in range(2):
        assert np.all(labels[b, : counts[b]] >= 1)
        assert np.all(labels[b, : counts[b]] <= 3)


def test_vote_loss_variants():
    """ver1/ver2 segment-sum vote losses vs a per-instance python oracle."""
    from pdanet_tpu.models.dense_heads.iassd_head import (
        contextual_vote_loss_ver1,
        contextual_vote_loss_ver2,
    )
    from pdanet_tpu.utils.loss_utils import smooth_l1

    rng = np.random.RandomState(11)
    B, N, M = 2, 16, 3
    box_idx = rng.randint(-1, M, (B, N))
    gt = rng.randn(B, N, 8).astype(np.float32)
    origin = rng.randn(B, N, 3).astype(np.float32)
    offs = rng.randn(B, N, 3).astype(np.float32) * 0.1
    fr = {
        "center_origin_box_idxs_of_pts": jnp.asarray(box_idx),
        "gt_box_of_center_origin": jnp.asarray(gt),
        "centers_origin": jnp.asarray(origin),
        "ctr_offsets": jnp.asarray(offs),
    }
    pred = origin + offs

    def sl1(x):
        n = np.abs(x)
        return np.where(n < 1.0, 0.5 * n * n, n - 0.5)

    per_ins_v1, per_ins_v2 = [], []
    for b in range(B):
        for m in range(M):
            mask = box_idx[b] == m
            if not mask.any():
                continue
            l = sl1(pred[b][mask] - gt[b][mask][:, :3]).sum()
            cnt = mask.sum()
            per_ins_v1.append(l / cnt)
            mean_pred = pred[b][mask].mean(0)
            spread = sl1(pred[b][mask] - mean_pred).sum()
            per_ins_v2.append((l + 0.5 * spread) / cnt)

    v1 = float(contextual_vote_loss_ver1(fr, M, 1.0))
    v2 = float(contextual_vote_loss_ver2(fr, M, 1.0))
    np.testing.assert_allclose(v1, np.mean(per_ins_v1), rtol=1e-4)
    np.testing.assert_allclose(v2, np.mean(per_ins_v2), rtol=1e-4)


def test_pointnet2_backbone_forward():
    """PointNet2MSG + FP decoder zoo backbone: shapes + finiteness."""
    from pdanet_tpu.models.backbones_3d.pointnet2_backbone import PointNet2MSG
    from pdanet_tpu.utils.easydict import EasyDict

    cfg = EasyDict(
        {
            "SA_CONFIG": {
                "NPOINTS": [64, 16],
                "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
                "NSAMPLE": [[8, 16], [8, 16]],
                "MLPS": [
                    [[8, 16], [8, 16]],
                    [[16, 32], [16, 32]],
                ],
            },
            "FP_MLPS": [[32, 32], [32, 32]],
        }
    )
    model = PointNet2MSG(model_cfg=cfg, input_channels=4)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.normal(rng, (2, 256, 4)) * 4
    variables = jax.jit(lambda r, p: model.init({"params": r}, p, train=False))(
        rng, pts
    )
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pts)
    assert out["point_features"].shape == (2, 256, 32)
    assert out["point_coords"].shape == (2, 256, 3)
    assert np.all(np.isfinite(np.asarray(out["point_features"])))


def test_bf16_eval_compute_close_to_f32():
    """COMPUTE_DTYPE: bfloat16 only changes eval matmul precision —
    outputs stay close to the f32 path and training is untouched."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from model_cfg import tiny_model_cfg
    from pdanet_tpu.models import build_network
    from pdanet_tpu.utils.easydict import EasyDict

    cfg32 = tiny_model_cfg()
    cfg16 = EasyDict(copy.deepcopy(dict(tiny_model_cfg())))
    cfg16.BACKBONE_3D.COMPUTE_DTYPE = "bfloat16"

    pts = np.random.RandomState(0).rand(1, 128, 4).astype(np.float32) * 4
    m32 = build_network(cfg32, num_class=3, input_channels=4)
    m16 = build_network(cfg16, num_class=3, input_channels=4)
    v = m32.init(jax.random.PRNGKey(0), pts)

    o32 = m32.apply(v, pts, train=False)
    o16 = m16.apply(v, pts, train=False)  # same params, bf16 compute
    a, b = np.asarray(o32["batch_box_preds"]), np.asarray(o16["batch_box_preds"])
    assert np.isfinite(b).all()
    # centers/sizes agree to bf16 tolerance
    assert np.median(np.abs(a - b)) < 0.1, np.median(np.abs(a - b))

    # training path is bit-identical (dtype only applies at eval)
    t32, _ = m32.apply(v, pts, train=True, mutable=["batch_stats"])
    t16, _ = m16.apply(v, pts, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(
        np.asarray(t32["batch_box_preds"]), np.asarray(t16["batch_box_preds"])
    )


def test_recall_record_roi_stage():
    """generate_recall_record with first-stage rois: `roi_%s` counts come
    from the rois, `rcnn_%s` from the final boxes, and the single-stage
    call leaves roi counters at 0 (detector3d_template.py:287-329)."""
    from pdanet_tpu.models.detectors.iassd import generate_recall_record

    gt = np.zeros((4, 8), np.float32)
    gt[0] = [0, 0, 0, 4, 2, 1.5, 0.3, 1]
    gt[1] = [10, 5, -1, 3.8, 1.9, 1.4, -0.2, 1]
    # rows 2-3 stay zero padding

    # final boxes: one matches gt0 exactly, one is far off
    pred = np.zeros((3, 7), np.float32)
    pred[0] = gt[0][:7]
    pred[1] = [50, 50, 0, 4, 2, 1.5, 0.0]
    pred_valid = np.array([True, True, False])

    # rois: both gts covered (gt1 loosely), plus an invalid row that
    # would match gt1 perfectly if its validity mask were ignored
    rois = np.zeros((3, 7), np.float32)
    rois[0] = gt[0][:7]
    rois[1] = [11.2, 5.0, -1, 3.8, 1.9, 1.4, -0.2]  # IoU vs gt1 ~ 0.43
    rois[2] = gt[1][:7]
    roi_valid = np.array([True, True, False])

    rec = jax.tree.map(
        np.asarray,
        generate_recall_record(
            jnp.asarray(pred), jnp.asarray(pred_valid), jnp.asarray(gt),
            [0.3, 0.7], jnp.asarray(rois), jnp.asarray(roi_valid),
        ),
    )
    assert rec["gt"] == 2
    assert rec["rcnn_0.3"] == 1 and rec["rcnn_0.7"] == 1
    assert rec["roi_0.3"] == 2  # the shifted roi still clears IoU 0.3
    assert rec["roi_0.7"] == 1  # but not 0.7

    single = jax.tree.map(
        np.asarray,
        generate_recall_record(
            jnp.asarray(pred), jnp.asarray(pred_valid), jnp.asarray(gt),
            [0.3, 0.7],
        ),
    )
    assert single["rcnn_0.3"] == 1
    assert single["roi_0.3"] == 0 and single["roi_0.7"] == 0


def test_fps_identity_shortcut_matches_real_fps():
    """The tiny PDA config's layer-1 D-FPS qualifies for the identity
    shortcut; forward outputs must be IDENTICAL with it on (default) and
    off (FPS_IDENTITY_SHORTCUT: False)."""
    cfg_on = tiny_model_cfg()
    cfg_off = tiny_model_cfg()
    cfg_off.BACKBONE_3D["FPS_IDENTITY_SHORTCUT"] = False

    m_on = build_network(cfg_on, num_class=3, input_channels=4)
    m_off = build_network(cfg_off, num_class=3, input_channels=4)

    rng = jax.random.PRNGKey(3)
    pts = jax.random.normal(rng, (2, 128, 4)) * 8.0
    variables = jax.jit(
        lambda r, p: m_on.init({"params": r}, p, train=False)
    )(rng, pts)

    o_on = jax.jit(lambda v, p: m_on.apply(v, p, train=False))(variables, pts)
    o_off = jax.jit(lambda v, p: m_off.apply(v, p, train=False))(variables, pts)
    for k in ("batch_cls_preds", "batch_box_preds"):
        np.testing.assert_array_equal(np.asarray(o_on[k]), np.asarray(o_off[k]))
