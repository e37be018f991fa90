"""End-to-end learning regression: overfit PDA-SSD on a fixture and require
actual DETECTIONS out of post-processing (not just a falling loss).

Round-2 finding: the original tiny fixture (70x30 m scene, 512-pt budget)
gives a D-FPS sample spacing of ~3.5 m at the ctr_aware entry layer, so a
4 m car keeps ~1 sample and center-aware sampling can never bootstrap —
training then converges to the all-background equilibrium (loss falls,
zero predictions, center_pos_num = 0).  The reference would behave the
same: D-FPS allocates samples by space, not density, so the *absolute*
sample spacing must resolve the objects (real KITTI: 4096 samples over a
~70x80 m scene ~= 1 m).  The compact-scene fixture below restores
real-data-like sample density at test scale.

The car must be found in EVERY frame with a confident score; the 0.8 x
0.6 m pedestrian is excluded from the assertion (at 32 final centers the
vote rarely lands inside so tight a box on so few epochs).
"""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from kitti_fixture import build_mini_kitti

from pdanet_tpu.utils.easydict import EasyDict


@pytest.mark.slow
def test_overfit_produces_detections(tmp_path):
    from test_cli import TINY_CFG

    from pdanet_tpu.datasets import build_dataloader
    from pdanet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    from pdanet_tpu.models import build_network
    from pdanet_tpu.models.detectors.iassd import post_processing
    from pdanet_tpu.ops.rotated_iou import boxes_iou3d
    from pdanet_tpu.parallel import make_data_mesh, replicate, shard_batch
    from pdanet_tpu.train import (
        build_optimizer_and_schedule,
        create_train_state,
        jit_train_step,
        make_train_step,
    )
    from pdanet_tpu.train.train_utils import select_device_batch

    root = tmp_path / "kitti"
    build_mini_kitti(root, num_frames=4, n_bg=400, n_car=500, n_ped=250,
                     bg_box=((4, 20), (-8, 8), (-1.8, 0.5)))

    cfg = EasyDict(yaml.safe_load(TINY_CFG.format(data_path=root)))
    # gentler downsampling: keep D-FPS sample spacing ~the car scale
    cfg.MODEL.BACKBONE_3D.SA_CONFIG.NPOINT_LIST = [
        [256], [128], [96], [64], [-1], [64]]
    # pure overfit: no augmentation
    cfg.DATA_CONFIG.DATA_AUGMENTOR.DISABLE_AUG_LIST = [
        "random_world_flip", "random_world_rotation", "random_world_scaling"]
    create_kitti_infos(cfg.DATA_CONFIG, cfg.CLASS_NAMES, root, root, workers=1)

    epochs = 250
    # seed the host pipeline (shuffle_points / sample_points use np.random)
    # and put ALL frames in every batch: at fixture scale the ctr_aware
    # bootstrap collapses to all-background if an unlucky early step has
    # zero center positives (the 1/max(pos,1) cls normalization then
    # hammers everything down, reference formulation included) — full-batch
    # steps keep positives present from step one
    np.random.seed(0)
    ds, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=4, training=True, root_path=root,
    )
    model = build_network(cfg.MODEL, num_class=3, input_channels=4)
    batches = list(loader)
    rng = jax.random.PRNGKey(0)
    pts0 = jnp.asarray(batches[0]["points"])
    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, train=False)
    )(rng, pts0)
    # peak LR 0.01 destabilizes the tiny setup mid-schedule (votes blow up,
    # positives vanish into the all-background equilibrium); 0.003 overfits
    # cleanly and is robust across trajectories
    cfg.OPTIMIZATION.LR = 0.003
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, epochs, len(batches))
    state = create_train_state(model, variables, tx)
    mesh = make_data_mesh(jax.devices()[:1])
    step = jit_train_step(make_train_step(model, tx, cfg.MODEL, 3), mesh)
    state = replicate(mesh, state)

    for ep in range(epochs):
        for b in batches:
            dev = shard_batch(mesh, select_device_batch(b))
            state, loss, tb = step(state, dev)
        if ep % 50 == 0 or ep == epochs - 1:
            print("ep", ep, "loss", float(loss),
                  "center_pos", float(tb["center_pos_num"]),
                  "vote", float(tb["vote_loss"]))
    assert np.isfinite(float(loss))
    # the bootstrap must be alive: positives at the final centers
    assert float(tb["center_pos_num"]) > 0, tb

    trained = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }
    ds_e, loader_e, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=2, training=False, root_path=root,
    )
    car_frames, total_frames = 0, 0
    for b in loader_e:
        out = model.apply(trained, jnp.asarray(b["points"]), train=False)
        sel = post_processing(
            out["batch_cls_preds"], out["batch_box_preds"],
            cfg.MODEL.POST_PROCESSING,
        )
        boxes = np.asarray(sel["pred_boxes"])
        scores = np.asarray(sel["pred_scores"])
        labels = np.asarray(sel["pred_labels"])
        counts = np.asarray(sel["pred_counts"])
        gt = np.asarray(b["gt_boxes"])
        for bi in range(gt.shape[0]):
            total_frames += 1
            n = int(counts[bi])
            g = gt[bi][gt[bi][:, 3] > 0]
            car_gt = g[g[:, 7] == 1.0]
            if n == 0 or len(car_gt) == 0:
                continue
            iou = np.asarray(boxes_iou3d(
                jnp.asarray(boxes[bi][:n, :7]), jnp.asarray(car_gt[:, :7])
            ))
            hit = (iou.max(axis=0) >= 0.3) if iou.size else np.zeros(1, bool)
            confident = (scores[bi][:n] > 0.3) & (labels[bi][:n] == 1)
            if hit.any() and confident.any():
                car_frames += 1
    assert total_frames == 4
    # the car must be detected confidently in every frame
    assert car_frames == 4, f"car found in {car_frames}/4 frames"
