"""MFU / roofline accounting for the tracked PDA-SSD configs (VERDICT r2
next#6).

Computes analytic FLOP/byte totals for the KITTI b1 forward, the e2e
(+NMS) forward, and the b2 train step via XLA's cost analysis on the
lowered computation, then states achieved FLOP/s and %-of-peak against
v5e peak numbers for the MEASURED on-chip times (pass them on the CLI or
accept the bench defaults).

Usage:
  python tools/probes/mfu_probe.py [fwd_ms] [e2e_ms] [train_ms] [once_ms]

Peaks (TPU v5e, public spec): 197 TFLOP/s bf16, ~98.5 TFLOP/s f32 MXU,
819 GB/s HBM.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import jax._src.xla_bridge as _xb

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")

V5E_F32_PEAK = 98.5e12  # FLOP/s (MXU f32 via bf16x3 ~ half bf16 peak)
V5E_BF16_PEAK = 197e12
V5E_HBM_BW = 819e9  # bytes/s


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    fwd_ms = float(sys.argv[1]) if len(sys.argv) > 1 else 5.48  # 182.6 fps
    e2e_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 6.03  # 165.9 fps
    train_ms = float(sys.argv[3]) if len(sys.argv) > 3 else 27.2
    once_ms = float(sys.argv[4]) if len(sys.argv) > 4 else 75.8

    from bench import build_model, lidar_like_cloud
    from pdanet_tpu.models.detectors.iassd import post_processing
    from pdanet_tpu.train import (
        build_optimizer_and_schedule,
        create_train_state,
        make_train_step,
    )

    cfg, model = build_model("tools/cfgs/kitti_models/PDA-SSD.yaml")
    rng = jax.random.PRNGKey(0)
    pts = jnp.asarray(lidar_like_cloud(7, 1, 16384))
    variables = jax.jit(lambda r, p: model.init({"params": r}, p, train=False))(
        rng, pts
    )

    def fwd(v, p):
        out = model.apply(v, p, train=False)
        return out["batch_cls_preds"], out["batch_box_preds"]

    def e2e(v, p):
        out = model.apply(v, p, train=False)
        return post_processing(
            out["batch_cls_preds"], out["batch_box_preds"],
            cfg.MODEL.POST_PROCESSING,
        )

    f_fwd, b_fwd = cost(fwd, variables, pts)
    f_e2e, b_e2e = cost(e2e, variables, pts)

    pts2 = jnp.asarray(lidar_like_cloud(13, 2, 16384))
    v2 = jax.jit(lambda r, p: model.init({"params": r}, p, train=False))(
        rng, pts2
    )
    gt = jnp.zeros((2, 40, 8)).at[:, 0].set(
        jnp.array([10.0, 1.0, -1.0, 3.9, 1.6, 1.56, 0.3, 1.0])
    )
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, 100, 80)
    state = create_train_state(model, v2, tx)
    step = make_train_step(model, tx)
    f_tr, b_tr = cost(lambda s, b: step(s, b)[1], state,
                      {"points": pts2, "gt_boxes": gt})

    ocfg, omodel = build_model("tools/cfgs/once_models/PDA-SSD.yaml")
    opts = jnp.asarray(lidar_like_cloud(11, 2, 60000, x_range=(0.0, 75.0)))
    ovars = jax.jit(
        lambda r, p: omodel.init({"params": r}, p, train=False)
    )(rng, opts)

    def ofwd(v, p):
        out = omodel.apply(v, p, train=False)
        return out["batch_cls_preds"], out["batch_box_preds"]

    f_once, b_once = cost(ofwd, ovars, opts)

    rows = [
        ("KITTI b1 forward", f_fwd, b_fwd, fwd_ms),
        ("KITTI b1 e2e(+NMS)", f_e2e, b_e2e, e2e_ms),
        ("KITTI b2 train step", f_tr, b_tr, train_ms),
        ("ONCE b2 forward", f_once, b_once, once_ms),
    ]
    print(f"{'workload':22s} {'GFLOP':>8s} {'GB':>7s} {'ms':>7s} "
          f"{'TFLOP/s':>8s} {'%f32peak':>8s} {'GB/s':>7s} {'%HBM':>6s} "
          f"{'AI(F/B)':>8s}")
    for name, f, b, ms in rows:
        fs = f / (ms * 1e-3)
        bs = b / (ms * 1e-3)
        print(f"{name:22s} {f/1e9:8.2f} {b/1e9:7.3f} {ms:7.2f} "
              f"{fs/1e12:8.3f} {100*fs/V5E_F32_PEAK:7.1f}% "
              f"{bs/1e9:7.1f} {100*bs/V5E_HBM_BW:5.1f}% {f/max(b,1):8.1f}")
    print("\nnotes: FLOP/bytes from XLA cost_analysis of the CPU-lowered "
          "computation (platform-independent op math); times are the "
          "measured on-chip numbers. v5e peaks: 197 TFLOP/s bf16 / ~98.5 "
          "f32, 819 GB/s HBM.")


if __name__ == "__main__":
    main()
