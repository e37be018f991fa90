"""End-to-end learning regressions: overfit a detector on a fixture and
require actual DETECTIONS out of post-processing (not just a falling loss),
one test per head paradigm (point-based PDA-SSD, anchor PointPillar,
heatmap CenterPoint).

Round-2 finding (PDA-SSD): the original tiny fixture (70x30 m scene,
512-pt budget) gives a D-FPS sample spacing of ~3.5 m at the ctr_aware
entry layer, so a 4 m car keeps ~1 sample and center-aware sampling can
never bootstrap — training then converges to the all-background
equilibrium (loss falls, zero predictions, center_pos_num = 0).  The
reference would behave the same: D-FPS allocates samples by space, not
density, so the *absolute* sample spacing must resolve the objects (real
KITTI: 4096 samples over a ~70x80 m scene ~= 1 m).  The compact-scene
fixture below restores real-data-like sample density at test scale.
Two further stabilizers, both inherent to the formulation (reference
included), matter only at fixture scale: full-coverage batches keep
center positives present from step one (a zero-positive step's
1/max(pos,1) cls normalization hammers everything toward background),
and a 0.003 peak LR avoids the mid-schedule vote blow-up seen at 0.01.

The car must be found in EVERY frame with a confident score; the 0.8 x
0.6 m pedestrian is excluded from the assertions (tight-box regression
at these point budgets is genuinely borderline).
"""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from kitti_fixture import build_mini_kitti

from pdanet_tpu.utils.easydict import EasyDict


def _build_fixture(tmp_path, cfg_text):
    from pdanet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos

    root = tmp_path / "kitti"
    build_mini_kitti(root, num_frames=4, n_bg=400, n_car=500, n_ped=250,
                     bg_box=((4, 20), (-8, 8), (-1.8, 0.5)))
    cfg = EasyDict(yaml.safe_load(cfg_text.format(data_path=root)))
    # pure overfit: no augmentation
    cfg.DATA_CONFIG.DATA_AUGMENTOR.DISABLE_AUG_LIST = [
        "random_world_flip", "random_world_rotation", "random_world_scaling"]
    create_kitti_infos(cfg.DATA_CONFIG, cfg.CLASS_NAMES, root, root, workers=1)
    return root, cfg


def _overfit(cfg, root, epochs):
    """Train on full-coverage batches; return the trained model state."""
    from pdanet_tpu.datasets import build_dataloader
    from pdanet_tpu.models import build_network
    from pdanet_tpu.parallel import make_data_mesh, replicate, shard_batch
    from pdanet_tpu.train import (
        build_optimizer_and_schedule,
        create_train_state,
        jit_train_step,
        make_train_step,
    )
    from pdanet_tpu.train.train_utils import select_device_batch

    np.random.seed(0)
    ds, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=4, training=True, root_path=root,
    )
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=ds)
    batches = list(loader)
    example = select_device_batch(batches[0], model)
    variables = jax.jit(
        lambda r, b: model.init(
            {"params": r}, b, train=False, method=model.forward_batch
        )
    )(jax.random.PRNGKey(0), example)
    tx, _ = build_optimizer_and_schedule(
        cfg.OPTIMIZATION, len(batches), epochs
    )
    state = create_train_state(model, variables, tx)
    mesh = make_data_mesh(jax.devices()[:1])
    step = jit_train_step(make_train_step(model, tx), mesh)
    state = replicate(mesh, state)
    loss, tb = None, {}
    for ep in range(epochs):
        for b in batches:
            dev = shard_batch(mesh, select_device_batch(b, model))
            state, loss, tb = step(state, dev)
        if ep % 50 == 0 or ep == epochs - 1:
            print(f"ep {ep} loss {float(loss):.3f}")
    assert np.isfinite(float(loss))
    trained = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }
    return model, trained, float(loss), tb


def _detect_cars(cfg, root, model, trained, score_thresh=0.3):
    """Eval every fixture frame; count frames with a confident car hit."""
    from pdanet_tpu.datasets import build_dataloader
    from pdanet_tpu.models.detectors import get_post_processor
    from pdanet_tpu.ops.rotated_iou import boxes_iou3d
    from pdanet_tpu.train.train_utils import select_device_batch

    post_fn = get_post_processor(cfg.MODEL.NAME)
    ds_e, loader_e, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=2, training=False, root_path=root,
    )

    @jax.jit
    def forward(variables, dev_batch):
        out = model.apply(
            variables, dev_batch, train=False, method=model.forward_batch
        )
        return post_fn(out, cfg.MODEL)

    car_frames, total_frames = 0, 0
    for b in loader_e:
        dev = select_device_batch(b, model)
        dev.pop("gt_boxes", None)
        pred = jax.tree.map(np.asarray, forward(trained, dev))
        gt = np.asarray(b["gt_boxes"])
        for bi in range(gt.shape[0]):
            total_frames += 1
            n = int(pred["pred_counts"][bi])
            g = gt[bi][gt[bi][:, 3] > 0]
            car_gt = g[g[:, 7] == 1.0]
            if n == 0 or len(car_gt) == 0:
                continue
            iou = np.asarray(boxes_iou3d(
                jnp.asarray(pred["pred_boxes"][bi][:n, :7]),
                jnp.asarray(car_gt[:, :7]),
            ))
            confident = (
                (pred["pred_scores"][bi][:n] > score_thresh)
                & (pred["pred_labels"][bi][:n] == 1)
            )
            hit = (iou * confident[:, None]).max(axis=0) >= 0.3
            if hit.any():
                car_frames += 1
    return car_frames, total_frames


@pytest.mark.slow
def test_pda_ssd_overfit_produces_detections(tmp_path):
    from test_cli import TINY_CFG

    root, cfg = _build_fixture(tmp_path, TINY_CFG)
    # gentler downsampling: keep D-FPS sample spacing ~the car scale
    cfg.MODEL.BACKBONE_3D.SA_CONFIG.NPOINT_LIST = [
        [256], [128], [96], [64], [-1], [64]]
    # peak LR 0.01 destabilizes the tiny setup mid-schedule (votes blow
    # up, positives vanish into the all-background equilibrium)
    cfg.OPTIMIZATION.LR = 0.003
    model, trained, loss, tb = _overfit(cfg, root, epochs=250)
    # the bootstrap must be alive: positives at the final centers
    assert float(tb["center_pos_num"]) > 0, tb
    car_frames, total = _detect_cars(cfg, root, model, trained)
    assert total == 4
    assert car_frames == 4, f"car found in {car_frames}/4 frames"


@pytest.mark.slow
def test_pointpillar_overfit_produces_detections(tmp_path):
    from test_cli import PP_TINY_CFG

    root, cfg = _build_fixture(tmp_path, PP_TINY_CFG)
    # 120 epochs overfits the loss (~0.78) but anchor cls confidence is
    # still ~0.27; 300 epochs clears the 0.3 score gate with margin
    model, trained, loss, tb = _overfit(cfg, root, epochs=300)
    car_frames, total = _detect_cars(cfg, root, model, trained)
    assert total == 4
    assert car_frames == 4, f"car found in {car_frames}/4 frames"


@pytest.mark.slow
def test_centerpoint_overfit_produces_detections(tmp_path):
    """Round-2 finding: at default (spconv-parity) BN momentum 0.99 the
    running statistics settle over ~500 steps, so a short fixture run
    evals through stats that are still ~20% at their init — train-mode
    predictions match targets exactly while eval-mode dims come out 3x
    off (the torch reference behaves identically at momentum 0.01).  The
    tiny config sets BN_MOMENTUM 0.9 so eval statistics converge at
    fixture step counts."""
    from test_cli import CP_TINY_CFG

    root, cfg = _build_fixture(tmp_path, CP_TINY_CFG)
    model, trained, loss, tb = _overfit(cfg, root, epochs=150)
    car_frames, total = _detect_cars(cfg, root, model, trained)
    assert total == 4
    assert car_frames == 4, f"car found in {car_frames}/4 frames"


@pytest.mark.slow
def test_voxel_rcnn_overfit_produces_detections(tmp_path):
    """Two-stage paradigm: the RPN must learn proposals AND the RoI head
    must learn iou-quality scores + refinements that clear the 0.3 score
    gate — end-to-end validation of the proposal/target-sampling/
    refinement training dynamic the forward/loss tests cannot see."""
    from test_cli import VR_TINY_CFG

    root, cfg = _build_fixture(tmp_path, VR_TINY_CFG)
    model, trained, loss, tb = _overfit(cfg, root, epochs=300)
    car_frames, total = _detect_cars(cfg, root, model, trained)
    assert total == 4
    assert car_frames == 4, f"car found in {car_frames}/4 frames"
