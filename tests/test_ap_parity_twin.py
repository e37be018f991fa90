"""Fixture-scale END-TO-END AP parity (VERDICT r3 "Next round" #1).

The capstone the trajectory-twin work points at: train the torch
reference twin AND pdanet_tpu SIDE BY SIDE on the mini-KITTI fixture —
same frozen batch stream, identical initial weights (through the
checkpoint converter), the reference optimizer recipe on both sides
(fastai OptimWrapper semantics vs our optax adam_onecycle chain) — for a
few hundred steps, far past the f32 chaos horizon, then evaluate BOTH
through the official KITTI eval port and compare Car 3D AP.

What distinguishes this from the trajectory twin
(test_train_trajectory_twin.py): there the torch side consumed indices
and targets computed from the FLAX forward each step (index discipline —
isolates the continuous math, pinned to 1e-5/step).  Here each side is
INDEPENDENT: the torch twin computes its own sampling (D-FPS through this
repo's CUDA-semantics-pinned kernel, ctr_aware top-k from its OWN
confidence logits), its own ball-query neighborhoods around its OWN
centers, and its own training targets from its OWN votes.  In f32 the
two trainings diverge trajectory-wise within ~8 steps (the Adam-crumb
chaos horizon, documented in the trajectory twin) — exactly like the
reference diverges from itself across CUDA/CPU builds — so the
comparison is STATISTICAL: both recipes must land detections of the same
quality through `kitti_object_eval_python.eval.get_official_eval_result`.

Tolerance justification (r5 redesign — VERDICT r4 next#3): the official
R40 interpolation appends one score threshold per matched gt
(eval.py get_thresholds), so absolute AP floors are meaningless at
fixture scale; every bound is relative to the fixture's MEASURED eval
ceiling (gt fed back as detections).  The r4 fixture (4 frames, 4 cars
at FIXED poses) saturated its 7.5 ceiling on both sides, so its
tolerance never discriminated; the r5 capstone (8 frames, 16 Car +
16 Ped at RANDOM poses and graded point budgets, one unlabeled
car-shaped distractor cluster per frame) keeps at least one class AP
measurably BELOW ceiling — asserted explicitly — and a mutation canary
(one flipped loss semantic) PROVES the Car floor trips on a real bug.
Assertions: ceiling-relative Car AND Pedestrian AP floors on both
sides, a ped center-match-rate floor, parity bounds on all three, and
a non-saturation check.  Constructing this test already paid off once:
it exposed (and its history documents) the missing reference detach
semantics in target assignment / the centerness mask — see
iassd_head.assign_targets and generate_center_ness_mask.

Reference anchors: training loop `tools/train_utils/train_utils.py:45-64`,
eval `tools/test.py:60-69` -> `kitti_object_eval_python/eval.py:639`.
"""

import logging
import os
from functools import partial

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from kitti_fixture import build_mini_kitti

from pdanet_tpu.utils.easydict import EasyDict

torch = pytest.importorskip("torch")

from test_full_model_torch_parity import (  # noqa: E402
    _build_torch_twin,
    _gather_cf,
    _twin_sa_ellipsoid,
    _twin_sa_with,
)
from test_train_trajectory_twin import (  # noqa: E402
    RefOptimWrapper,
    _ref_onecycle,
    torch_loss,
)


# ---------------------------------------------------------------------------
# Torch-side self-sampling: the twin computes ITS OWN discrete indices
# ---------------------------------------------------------------------------


def _make_fps(npoint):
    from pdanet_tpu.ops.sampling import farthest_point_sample

    return jax.jit(partial(farthest_point_sample, npoint=npoint))


def _sample_idx_np(sample_types, sample_ranges, npoints, xyz_np, cls_np,
                   fps_cache):
    """run_sampling (pointnet2_modules.py:1541-1646) on host arrays.

    D-FPS goes through this repo's CUDA-semantics-pinned kernel;
    ctr_aware is max-cls top-k with lowest-index tie-break (sigmoid is
    monotone, so the argsort skips it — torch.topk/lax.top_k order)."""
    outs, last_end = [], 0
    B = xyz_np.shape[0]
    for st, sr, npnt in zip(sample_types, sample_ranges, npoints):
        if npnt <= 0:
            continue
        start = last_end
        stop = xyz_np.shape[1] if sr == -1 else sr
        if sr != -1:
            last_end += sr
        x = xyz_np[:, start:stop]
        N = x.shape[1]
        if N <= npnt:  # no-downsample passthrough (:1562)
            idx = np.broadcast_to(
                np.arange(N, dtype=np.int64), (B, N)).copy()
        elif ("cls" in st) or ("ctr" in st):
            score = cls_np[:, start:stop].max(-1)
            idx = np.argsort(-score, axis=1, kind="stable")[:, :npnt]
        elif "D-FPS" in st:
            if npnt not in fps_cache:
                fps_cache[npnt] = _make_fps(npnt)
            idx = np.asarray(
                fps_cache[npnt](jnp.asarray(x))).astype(np.int64)
        else:  # the tiny recipe uses D-FPS + ctr_aware only
            raise NotImplementedError(st)
        outs.append(idx + start)
    return np.concatenate(outs, axis=-1)


def torch_forward_auto(twin, layer_meta, sa_cfg, points_np, num_class,
                       code_size, fps_cache):
    """The trajectory twin's torch forward, but with every discrete index
    derived from the torch side's OWN running state (detached) instead of
    being fed from the flax forward — the independence that makes the AP
    comparison meaningful.  Gradient flow is identical to torch_forward
    (indices are non-differentiable constants in both frameworks)."""
    from pdanet_tpu.ops.ball_query import ball_query_multi

    xyz = torch.from_numpy(points_np[..., :3].copy())
    feats = torch.from_numpy(points_np[..., 3:].transpose(0, 2, 1).copy())
    n_layers = len(sa_cfg.NSAMPLE_LIST)
    enc_xyz, enc_feat = [xyz], [feats]
    enc_cls = [None]  # per encoder entry: producing layer's cls logits (np)
    centers = centers_origin = ctr_offsets = None
    sa_ins = [None] * n_layers

    for k in range(n_layers):
        mod = twin.backbone_3d.SA_modules[k]
        li = sa_cfg.LAYER_INPUT[k]
        xin, fin = enc_xyz[li], enc_feat[li]
        kind = layer_meta[k][0]
        if kind == "vote":
            h = mod.mlp_modules(fin)
            off = mod.ctr_reg(h).transpose(1, 2)
            lim = torch.tensor(
                sa_cfg.MAX_TRANSLATE_RANGE).view(1, 1, 3).to(xyz.dtype)
            li_xyz = xin + torch.min(torch.max(off, -lim), lim)
            li_feat = fin
            centers, centers_origin, ctr_offsets = li_xyz, xin, off
            enc_xyz.append(li_xyz)
            enc_feat.append(li_feat)
            enc_cls.append(None)
            continue

        # ---- self-computed indices (host, detached) --------------------
        xin_np = xin.detach().numpy()
        if sa_cfg.CTR_INDEX[k] != -1:
            idx = None
            new_xyz_np = enc_xyz[sa_cfg.CTR_INDEX[k]].detach().numpy()
        else:
            idx_np = _sample_idx_np(
                sa_cfg.SAMPLE_METHOD_LIST[k], sa_cfg.SAMPLE_RANGE_LIST[k],
                sa_cfg.NPOINT_LIST[k], xin_np, enc_cls[li], fps_cache)
            idx = torch.from_numpy(idx_np)
            new_xyz_np = np.take_along_axis(xin_np, idx_np[..., None], 1)
        idxl = None
        if len(sa_cfg.RADIUS_LIST[k]) > 0:
            idxl = [torch.from_numpy(np.asarray(i).astype(np.int64))
                    for i in ball_query_multi(
                        tuple(sa_cfg.RADIUS_LIST[k]),
                        tuple(sa_cfg.NSAMPLE_LIST[k]),
                        jnp.asarray(xin_np), jnp.asarray(new_xyz_np))]

        # ---- live module (gradients intact) -----------------------------
        if kind == "gather":
            li_xyz = _gather_cf(torch, xin.transpose(1, 2), idx).transpose(1, 2)
            li_feat = _gather_cf(torch, fin, idx)
            cls = None
        elif kind == "with":
            ctr = (enc_xyz[sa_cfg.CTR_INDEX[k]]
                   if sa_cfg.CTR_INDEX[k] != -1 else None)
            li_xyz, li_feat, cls = _twin_sa_with(
                torch, mod, xin, fin, idx, idxl, sa_cfg.NSAMPLE_LIST[k],
                ctr_xyz=ctr)
        else:
            li_xyz, li_feat, cls = _twin_sa_ellipsoid(
                torch, mod, xin, fin, idx, idxl, sa_cfg.RADIUS_LIST[k],
                sa_cfg.NSAMPLE_LIST[k], layer_meta[k][1])
        sa_ins[k] = cls
        enc_xyz.append(li_xyz)
        enc_feat.append(li_feat)
        enc_cls.append(
            cls.detach().numpy() if cls is not None else None)

    cf = enc_feat[-1]
    B, C, M = cf.shape
    flat = cf.transpose(1, 2).reshape(B * M, C)
    cls_preds = twin.point_head.cls_center_layers(flat).reshape(B, M, num_class)
    box_preds = twin.point_head.box_center_layers(flat).reshape(B, M, code_size)

    vote_pos = list(sa_cfg.LAYER_TYPE).index("Vote_Layer") + 1
    coords = (list(enc_xyz[:vote_pos]) + [centers_origin]
              + list(enc_xyz[vote_pos:]))

    return {
        "_centers_features": cf,
        "center_cls_preds": cls_preds,
        "center_box_preds": box_preds,
        "centers": centers,
        "centers_origin": centers_origin,
        "ctr_offsets": ctr_offsets,
        "sa_ins_preds": sa_ins,
        "encoder_coords": coords,
    }


# ---------------------------------------------------------------------------
# The AP parity test
# ---------------------------------------------------------------------------


def _eval_ceiling(cfg, root):
    """The official eval's MAXIMUM achievable Car AP on this fixture.

    KITTI's R40 interpolation appends one score threshold per matched
    ground truth (``eval.get_thresholds``) and divides by 40, so with
    ``num_gt`` far below 40 the AP of even PERFECT detections is capped
    at ~``num_gt / 40`` (4 cars -> 7.5).  Feeding the ground truth back
    through ``generate_prediction_dicts`` + the official eval port
    measures that ceiling exactly; the parity assertion is then
    ceiling-relative instead of absolute."""
    from pdanet_tpu.datasets import build_dataloader

    ds, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=2, training=False, root_path=root,
    )
    annos = []
    for b in loader:
        B = b["batch_size"]
        preds = []
        for bi in range(B):
            gt = np.asarray(b["gt_boxes"][bi])
            gt = gt[gt[:, 3] > 0]
            preds.append({
                "pred_boxes": gt[:, :7].astype(np.float32),
                "pred_scores": (0.9 - 0.01 * np.arange(len(gt))).astype(
                    np.float32),
                "pred_labels": gt[:, 7].astype(np.int64),
            })
        annos += ds.generate_prediction_dicts(b, preds, cfg.CLASS_NAMES)
    _, ret = ds.evaluation(annos, cfg.CLASS_NAMES)
    return ret


def _eval_ap(cfg, root, model, variables, tag, out_dir):
    """Official-eval one epoch; returns the KITTI result dict."""
    from pdanet_tpu.datasets import build_dataloader
    from pdanet_tpu.eval.eval_utils import eval_one_epoch

    _, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=2, training=False, root_path=root,
    )
    logger = logging.getLogger(f"ap_parity_{tag}")
    logger.setLevel(logging.WARNING)
    full = EasyDict({"MODEL": cfg.MODEL})
    return eval_one_epoch(
        full, model, variables, loader, epoch_id=tag, logger=logger,
        result_dir=out_dir / tag,
    )


def _capstone_fixture(tmp_path):
    """Build the capstone fixture + config (VERDICT r4 next#3 scale-up).

    8 frames x (2 Cars + 2 Pedestrians) = 16 Car + 16 Ped GT at RANDOM
    poses (position + yaw per object per frame — unlike the r4 fixture's
    fixed-pose objects, the model must regress geometry, not memorize
    coordinates), at graded per-object point budgets (130/70 car, 50/30
    ped — the sparse halves make sub-ceiling recall at the official IoU
    bars attainable), PLUS one UNLABELED car-sized 20-pt distractor
    cluster per frame that a confident model can false-positive on.  Clouds land
    at EXACTLY the 512-pt `sample_points` budget: the sampler then never
    subsamples (choice = arange + shuffle) and the `sort_points`
    canonicalizer makes train/eval clouds bit-identical — without this,
    eval redraws a different random subset than the one the model
    memorized and box quality at the 0.7-IoU bar is dominated by that
    draw noise instead of by the training semantics under test."""
    from pdanet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    from test_cli import TINY_CFG

    root = tmp_path / "kitti"
    rng = np.random.RandomState(42)
    CAR_D, PED_D = [3.9, 1.6, 1.56], [0.8, 0.6, 1.73]
    frame_objects, frame_distractors = [], []
    for _fi in range(8):
        placed = []  # (x, y, clearance)

        def place(clear):
            for _ in range(400):
                c = [float(rng.uniform(6.5, 17.5)),
                     float(rng.uniform(-6, 6)),
                     float(rng.uniform(-1.0, -0.6))]
                if all((c[0] - p[0]) ** 2 + (c[1] - p[1]) ** 2
                       > (clear + pc) ** 2 for p, pc in
                       ((p[:2], p[2]) for p in placed)):
                    placed.append((c[0], c[1], clear))
                    return c
            raise RuntimeError("fixture placement failed")

        objs = []
        for npts, dims, cls, clear in (
            (130, CAR_D, "Car", 2.3), (70, CAR_D, "Car", 2.3),
            (70, PED_D, "Pedestrian", 1.1), (45, PED_D, "Pedestrian", 1.1),
        ):
            objs.append((cls, dict(
                center=place(clear), dims=list(dims),
                yaw=float(rng.uniform(-np.pi, np.pi)), npts=npts)))
        dist = [dict(center=place(2.3), dims=CAR_D,
                     yaw=float(rng.uniform(-np.pi, np.pi)), npts=20)]
        frame_objects.append(objs)
        frame_distractors.append(dist)

    # 315 object + 20 distractor + 177 bg = 512 = the sample_points budget
    build_mini_kitti(root, num_frames=8, n_bg=177,
                     bg_box=((4, 20), (-8, 8), (-1.8, 0.5)),
                     frame_objects=frame_objects,
                     frame_distractors=frame_distractors)
    cfg = EasyDict(yaml.safe_load(TINY_CFG.format(data_path=root)))
    cfg.DATA_CONFIG.DATA_AUGMENTOR.DISABLE_AUG_LIST = [
        "random_world_flip", "random_world_rotation", "random_world_scaling"]
    cfg.DATA_CONFIG.DATA_PROCESSOR.append(EasyDict(
        {"NAME": "sort_points", "ENABLED": {"train": True, "test": True}}))
    create_kitti_infos(cfg.DATA_CONFIG, cfg.CLASS_NAMES, root, root,
                       workers=1)
    cfg.MODEL.BACKBONE_3D.SA_CONFIG.NPOINT_LIST = [
        [256], [128], [96], [64], [-1], [64]]
    cfg.OPTIMIZATION.LR = 0.003
    return cfg, root


def _twin_init(cfg, num_class=3, code_size=30):
    """Torch twin with off-kink norm init + converted flax variables."""
    from ckpt_converter import convert_checkpoint

    sa_cfg = EasyDict(cfg.MODEL.BACKBONE_3D).SA_CONFIG
    torch.manual_seed(7)
    twin, layer_meta = _build_torch_twin(
        torch, sa_cfg, cfg.MODEL.POINT_HEAD, num_class, code_size)
    with torch.no_grad():  # off-kink norm biases (trajectory-twin note)
        for m in twin.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                              torch.nn.LayerNorm)):
                m.bias.uniform_(-0.3, 0.3)
                m.weight.uniform_(0.9, 1.1)
    twin.train()
    sd0 = {k: v.detach().numpy().copy() for k, v in twin.state_dict().items()
           if "num_batches" not in k}
    variables0 = convert_checkpoint(
        sd0, EasyDict(cfg.MODEL), num_class=num_class, input_channels=4)
    variables0 = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), variables0)
    return twin, layer_meta, variables0


def _train_flax(cfg, model, batches, variables0, epochs, tag="flax"):
    from pdanet_tpu.parallel import make_data_mesh, replicate, shard_batch
    from pdanet_tpu.train import (
        build_optimizer_and_schedule,
        create_train_state,
        jit_train_step,
        make_train_step,
    )
    from pdanet_tpu.train.train_utils import select_device_batch

    tx, _ = build_optimizer_and_schedule(
        cfg.OPTIMIZATION, len(batches), epochs)
    state = create_train_state(model, dict(variables0), tx)
    mesh = make_data_mesh(jax.devices()[:1])
    step = jit_train_step(make_train_step(model, tx), mesh)
    state = replicate(mesh, state)
    loss_j = None
    for ep in range(epochs):
        for b in batches:
            dev = shard_batch(mesh, select_device_batch(b, model))
            state, loss_j, tb = step(state, dev)
        if ep % 50 == 0 or ep == epochs - 1:
            print(f"[{tag}] ep {ep} loss {float(loss_j):.3f}")
    assert np.isfinite(float(loss_j))
    return {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }


# Calibration (committed r5 probe runs on this fixture, CPU).  This
# capstone EARNED ITS KEEP during construction: the pre-fix code (live
# gradient paths through the centerness mask and the box-label
# residuals into the votes — both DETACHED in the reference,
# IASSD_head.py:799 and :313,400-457) trained Cars fine but pinned
# Pedestrian vote precision at 0.3-0.4 m -> Ped AP 0.00, and drove the
# reference-faithful torch twin into a vote-suppression collapse
# (positives -> 0, all scores ~1e-3) on every run.  With the detach
# semantics fixed on both sides: flax 800-epoch run -> Car 37.5
# (= ceiling), Ped 35.0 / ceiling 37.5, every gt center matched within
# 0.07 m.  Floors keep margin for twin-vs-flax trajectory spread
# (pre-fix flax-only spread at 800 ep was ~+-3 AP).
_CAR_FLOOR_BELOW_CEIL = 20.0   # assert ap_car >= ceil_car - this
_PED_FLOOR_BELOW_CEIL = 20.0
_CAR_PARITY_TOL = 10.0
_PED_PARITY_TOL = 12.0
_PED_RATE_FLOOR = 0.6          # nearest-center-within-0.8m + ped argmax
# secondary signal (Ped AP carries the primary parity bound): measured
# 1.00 vs 0.75 on the committed run — 0.4 leaves ~2-ped headroom
_PED_RATE_PARITY_TOL = 0.4


def _ped_center_rate(cfg, root, model, variables):
    """Fraction of GT Pedestrians whose nearest predicted center is
    within 0.8 m and whose argmax class at that center is Pedestrian."""
    from pdanet_tpu.datasets import build_dataloader

    _, eloader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=4, training=False, root_path=root,
    )
    matched = total = 0
    for b in eloader:
        pts = jnp.asarray(np.asarray(b["points"], np.float32))
        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            {"points": pts},
            method=lambda m, bb: m.forward_batch(bb, train=False))
        centers = np.asarray(out["centers"])
        cls = np.asarray(out["batch_cls_preds"])  # (B, M, 3) logits
        gt = np.asarray(b["gt_boxes"])
        for bi in range(int(b["batch_size"])):
            g = gt[bi][gt[bi][:, 3] > 0]
            peds = g[g[:, 7] == 2]  # class ids are 1-based
            for p in peds:
                total += 1
                d = np.linalg.norm(centers[bi] - p[None, :3], axis=-1)
                j = int(np.argmin(d))
                if d[j] < 0.8 and int(np.argmax(cls[bi, j])) == 1:
                    matched += 1
    return matched / max(total, 1), total


@pytest.mark.slow
def test_fixture_scale_ap_parity(tmp_path):
    from pdanet_tpu.datasets import build_dataloader
    from pdanet_tpu.models import build_network
    from pdanet_tpu.models.dense_heads import iassd_head
    from pdanet_tpu.utils.box_coder_utils import build_box_coder
    from ckpt_converter import convert_checkpoint

    cfg, root = _capstone_fixture(tmp_path)
    # full run: 800 epochs x 2 batches = 1600 steps/side (at 400 one side can
    # still lag the 0.7-IoU Car bar by trajectory luck — measured 19.3 vs 37.5)
    # point); the env override
    # exists for mechanics-only smoke debugging (AP asserts then fail)
    epochs = int(os.environ.get("AP_PARITY_EPOCHS", "800"))

    num_class, code_size = 3, 30
    sa_cfg = EasyDict(cfg.MODEL.BACKBONE_3D).SA_CONFIG
    head_cfg = EasyDict(cfg.MODEL.POINT_HEAD)
    box_coder = build_box_coder(
        head_cfg.TARGET_CONFIG.BOX_CODER,
        head_cfg.TARGET_CONFIG.BOX_CODER_CONFIG)
    mean_size_t = torch.tensor(
        np.asarray(head_cfg.TARGET_CONFIG.BOX_CODER_CONFIG["mean_size"],
                   np.float32))
    bin_size = box_coder.bin_size

    # ---- identical init on both sides (through the converter) -----------
    twin, layer_meta, variables0 = _twin_init(cfg, num_class, code_size)

    # ---- frozen shared batch stream (aug disabled by the fixture) -------
    np.random.seed(0)
    ds, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=4, training=True, root_path=root,
    )
    model = build_network(cfg.MODEL, num_class=num_class, dataset=ds)
    batches = list(loader)

    # ---- flax side: the real training chain ------------------------------
    trained_ours = _train_flax(cfg, model, batches, variables0, epochs,
                               tag="flax")

    # ---- torch side: reference recipe, self-computed indices ------------
    total_steps = len(batches) * epochs
    ref_lr, ref_mom = _ref_onecycle(
        total_steps, cfg.OPTIMIZATION.LR,
        list(cfg.OPTIMIZATION.MOMS), cfg.OPTIMIZATION.DIV_FACTOR,
        cfg.OPTIMIZATION.PCT_START)
    t_opt = RefOptimWrapper(twin, wd=cfg.OPTIMIZATION.WEIGHT_DECAY)
    fps_cache = {}
    n_layers = len(sa_cfg.NSAMPLE_LIST)
    target_cfg = head_cfg.TARGET_CONFIG
    # [input, L0..L3, centers_origin, centers, L5]: n_layers + input +
    # the vote layer's centers_origin insert (iassd_backbone.py:537-546)
    coords_len = n_layers + 2

    @jax.jit
    def targets_fn(centers, centers_origin, coords, gt):
        out = {
            "centers": centers, "centers_origin": centers_origin,
            "encoder_coords": list(coords),
            "sa_ins_preds": [None] * n_layers,
        }
        return iassd_head.assign_targets(
            out, gt, target_cfg, box_coder, num_class)

    it = 0
    loss_t = None
    for ep in range(epochs):
        for b in batches:
            pts_np = np.asarray(b["points"], np.float32)
            gt_np = np.asarray(b["gt_boxes"], np.float32)
            lr, mom = ref_lr(it), ref_mom(it)  # stepped BEFORE forward (:34)
            t_opt.set_schedule(lr, mom)
            t_opt.zero_grad()
            fr = torch_forward_auto(
                twin, layer_meta, sa_cfg, pts_np, num_class, code_size,
                fps_cache)
            coords_np = tuple(
                jnp.asarray(c.detach().numpy()) for c in fr["encoder_coords"])
            assert len(coords_np) == coords_len
            targets = targets_fn(
                jnp.asarray(fr["centers"].detach().numpy()),
                jnp.asarray(fr["centers_origin"].detach().numpy()),
                coords_np, jnp.asarray(gt_np))
            tgt = {}
            for key in ("center_cls_labels", "center_box_labels",
                        "center_gt_box_of_points", "center_pos_mask",
                        "center_origin_cls_labels",
                        "gt_box_of_center_origin"):
                tgt[key] = torch.from_numpy(np.asarray(targets[key]).copy())
            for key in ("sa_ins_labels", "sa_gt_box_of_points",
                        "sa_pos_masks"):
                tgt[key] = [torch.from_numpy(np.asarray(x).copy())
                            for x in targets[key]]
            loss_t, _parts = torch_loss(
                fr, tgt, head_cfg, num_class, mean_size_t, bin_size)
            loss_t.backward()
            torch.nn.utils.clip_grad_norm_(
                twin.parameters(), cfg.OPTIMIZATION.GRAD_NORM_CLIP)
            t_opt.step()
            it += 1
        if ep % 50 == 0 or ep == epochs - 1:
            print(f"[torch] ep {ep} loss {float(loss_t.detach()):.3f}")
    assert np.isfinite(float(loss_t.detach()))

    # ---- eval BOTH through the official KITTI eval port ------------------
    sd1 = {k: v.detach().numpy().copy() for k, v in twin.state_dict().items()
           if "num_batches" not in k}
    trained_twin = convert_checkpoint(
        sd1, EasyDict(cfg.MODEL), num_class=num_class, input_channels=4)
    trained_twin = jax.tree.map(
        lambda x: np.asarray(x, np.float32), trained_twin)

    ret_ours = _eval_ap(cfg, root, model, trained_ours, "ours", tmp_path)
    ret_twin = _eval_ap(cfg, root, model, trained_twin, "twin", tmp_path)
    ret_ceil = _eval_ceiling(cfg, root)

    keys = sorted(
        k for k in set(ret_ours) | set(ret_twin)
        if k.startswith(("Car_3d", "Car_bev", "Pedestrian_3d", "recall/"))
    )
    print(f"\nAP parity table (capstone fixture, 8 frames, 40 GT, "
          f"{epochs} epochs):")
    print(f"{'metric':28s} {'pdanet_tpu':>12s} {'torch twin':>12s} "
          f"{'eval-max':>9s} {'delta':>8s}")
    for k in keys:
        a, b = ret_ours.get(k, float("nan")), ret_twin.get(k, float("nan"))
        c = ret_ceil.get(k, float("nan"))
        print(f"{k:28s} {a:12.2f} {b:12.2f} {c:9.2f} {a - b:8.2f}")

    import pickle

    for tag in ("ours", "twin"):
        with open(tmp_path / tag / "result.pkl", "rb") as f:
            annos = pickle.load(f)
        for a in annos:
            order = np.argsort(-a["score"])
            print(f"[{tag}] frame {a['frame_id']}: "
                  + ", ".join(
                      f"{a['name'][i]}:{a['score'][i]:.2f}"
                      f"@bbox_h={a['bbox'][i][3]-a['bbox'][i][1]:.0f}px"
                      for i in order[:8]))

    car_ours = ret_ours["Car_3d/moderate_R40"]
    car_twin = ret_twin["Car_3d/moderate_R40"]
    car_max = ret_ceil["Car_3d/moderate_R40"]
    ped_ours = ret_ours["Pedestrian_3d/moderate_R40"]
    ped_twin = ret_twin["Pedestrian_3d/moderate_R40"]

    ped_max = ret_ceil["Pedestrian_3d/moderate_R40"]
    rate_ours, n_ped = _ped_center_rate(cfg, root, model, trained_ours)
    rate_twin, _ = _ped_center_rate(cfg, root, model, trained_twin)
    print(f"ped center-match rate (of {n_ped} GT): ours {rate_ours:.2f} "
          f"twin {rate_twin:.2f}")

    assert car_max > 0.0 and ped_max > 0.0
    # (a) quality floors: a systematic training-semantics bug
    # (mis-regressed sizes, broken heading bins, background-equilibrium
    # collapse) drops one side far below these — the mutation canary
    # below PROVES the Car floor trips on a single flipped loss
    # semantic, and the capstone's construction history (see the
    # calibration note) proves the Ped floor trips on a real
    # detach-semantics bug
    for tag, ap in (("ours", car_ours), ("twin", car_twin)):
        assert ap >= car_max - _CAR_FLOOR_BELOW_CEIL, (
            f"{tag} Car AP {ap:.2f} below floor "
            f"{car_max - _CAR_FLOOR_BELOW_CEIL:.2f} (ceiling {car_max:.2f})")
    for tag, ap in (("ours", ped_ours), ("twin", ped_twin)):
        assert ap >= ped_max - _PED_FLOOR_BELOW_CEIL, (
            f"{tag} Ped AP {ap:.2f} below floor "
            f"{ped_max - _PED_FLOOR_BELOW_CEIL:.2f} (ceiling {ped_max:.2f})")
    for tag, rate in (("ours", rate_ours), ("twin", rate_twin)):
        assert rate >= _PED_RATE_FLOOR, (
            f"{tag} ped center-match rate {rate:.2f} below floor "
            f"{_PED_RATE_FLOOR}")
    # (b) parity between the two independent trainings
    assert abs(car_ours - car_twin) <= _CAR_PARITY_TOL, (
        f"Car-moderate 3D AP diverged: ours={car_ours:.2f} "
        f"twin={car_twin:.2f}")
    assert abs(ped_ours - ped_twin) <= _PED_PARITY_TOL, (
        f"Ped-moderate 3D AP diverged: ours={ped_ours:.2f} "
        f"twin={ped_twin:.2f}")
    assert abs(rate_ours - rate_twin) <= _PED_RATE_PARITY_TOL, (
        f"ped center-match rate diverged: ours={rate_ours:.2f} "
        f"twin={rate_twin:.2f}")
    # (c) the fixture discriminates: EVERY asserted class AP has its
    # weaker side measurably below ceiling (sparse objects at the
    # official IoU bars + unlabeled distractors keep fully-converged
    # runs from pinning the whole table at the ceiling the way the r4
    # fixed-pose fixture did), so the floors and tolerances above are
    # doing real work.  Committed 800-epoch run: Car 33.59/37.50 vs
    # ceiling 37.50 (gap 3.91), Ped 37.50/27.50 (gap 10.00) — which
    # side lags which class varies by trajectory luck, so the check is
    # on the per-class minimum, not on one fixed side.
    car_gap = car_max - min(car_ours, car_twin)
    ped_gap = ped_max - min(ped_ours, ped_twin)
    assert car_gap > 0.5 and ped_gap > 0.5, (
        f"fixture saturates its eval ceilings (car gap {car_gap:.2f}, "
        f"ped gap {ped_gap:.2f}) — the parity tolerances are not being "
        f"exercised")


@pytest.mark.slow
def test_ap_parity_mutation_canary(tmp_path, monkeypatch):
    """Proof the capstone's floors catch a real loss-semantics bug: train
    ONLY the flax side with ONE mutated loss term — an off-by-one in the
    orientation-bin target (``center_box_labels[..., 6]`` rotated by one
    bin; the classic angle-bin indexing bug against
    IASSD_head.py:1255-1265) — and assert the trained model lands BELOW
    the Car floor the parity test asserts.  Every decoded heading comes
    out one 30-degree bin off, which drags elongated Car boxes under the
    official 0.7-IoU bar.  (A SIGN-FLIPPED in-bin residual was measured
    too weak to trip: mean |yaw error| ~15 degrees keeps most cars above
    0.7 IoU — mutated Car AP 34.7 vs ceiling 37.5, committed run.)"""
    from pdanet_tpu.datasets import build_dataloader
    from pdanet_tpu.models import build_network
    from pdanet_tpu.models.dense_heads import iassd_head

    cfg, root = _capstone_fixture(tmp_path)
    epochs = int(os.environ.get("AP_PARITY_EPOCHS", "800"))
    num_class = 3
    _twin, _meta, variables0 = _twin_init(cfg, num_class, 30)

    np.random.seed(0)
    ds, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=4, training=True, root_path=root,
    )
    model = build_network(cfg.MODEL, num_class=num_class, dataset=ds)
    batches = list(loader)

    orig = iassd_head.center_box_binori_layer_loss

    def mutated(forward_ret, loss_cfg, box_coder):
        fr = dict(forward_ret)
        lbl = fr["center_box_labels"]
        shifted = jnp.mod(lbl[..., 6] + 1.0, float(box_coder.bin_size))
        fr["center_box_labels"] = lbl.at[..., 6].set(shifted)
        return orig(fr, loss_cfg, box_coder)

    monkeypatch.setattr(
        iassd_head, "center_box_binori_layer_loss", mutated)
    trained_mut = _train_flax(cfg, model, batches, variables0, epochs,
                              tag="mutated")
    monkeypatch.setattr(iassd_head, "center_box_binori_layer_loss", orig)

    ret_mut = _eval_ap(cfg, root, model, trained_mut, "mut", tmp_path)
    ret_ceil = _eval_ceiling(cfg, root)
    car_mut = ret_mut["Car_3d/moderate_R40"]
    car_max = ret_ceil["Car_3d/moderate_R40"]
    print(f"[canary] mutated Car AP {car_mut:.2f} vs ceiling {car_max:.2f} "
          f"(floor {car_max - _CAR_FLOOR_BELOW_CEIL:.2f})")
    assert car_mut < car_max - _CAR_FLOOR_BELOW_CEIL, (
        f"mutation canary did NOT trip: mutated Car AP {car_mut:.2f} "
        f">= floor {car_max - _CAR_FLOOR_BELOW_CEIL:.2f} — the parity "
        f"test could not catch this bug class")
