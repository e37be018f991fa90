"""Per-op device-time profiler for any config's forward / e2e / train step.

The reference has no profiler integration beyond `--infer_time`; this tool
captures a `jax.profiler` trace on the real chip and prints the XLA
per-op device-time split (kernel families + top single ops) from the
xplane proto — the workflow that drove the round-3 batch-scaling work
(see tools/probes/b8_profile_probe.py for its origin).

Usage:
  python tools/profiler.py --cfg_file tools/cfgs/kitti_models/PDA-SSD.yaml \
      [--batch_size 8] [--mode forward|e2e|train] [--repeats 3] [--top 20]

Requires the TPU (the axon plugin); parsing needs
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (set automatically by
re-exec when the fast-proto runtime rejects the plugin's generated code).
"""

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _family(name):
    if "farthest" in name:
        return "fps-kernel"
    if "ball" in name:
        return "ball-query"
    if "attention" in name:
        return "attention-kernel"
    if "nms" in name or "greedy" in name:
        return "nms-kernel"
    if "fusion" in name:
        return "fusion"
    if "copy" in name or "transpose" in name:
        return "copy/layout"
    if "slice" in name:
        return "slice"
    if "convolution" in name or name.startswith("%dot"):
        return "matmul/conv"
    return "other"


def aggregate_xplane(logdir):
    """{op_name: seconds} from the sync 'XLA Ops' line of the TPU plane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not files:
        raise FileNotFoundError(f"no xplane under {logdir}")
    space = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(float)
            for ev in line.events:
                agg[emeta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e12
            return dict(agg)
    raise RuntimeError("no TPU 'XLA Ops' line in trace")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--mode", choices=("forward", "e2e", "train"),
                    default="forward")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
        os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
        os.execv(sys.executable, [sys.executable] + sys.argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_model, lidar_like_cloud

    cfg, model = build_model(args.cfg_file)
    n_points = 16384
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p["NAME"] == "sample_points":
            v = p["NUM_POINTS"]
            n_points = int(v["test"] if isinstance(v, dict) else v)
    pts = jnp.asarray(lidar_like_cloud(7, args.batch_size, n_points))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, train=False)
    )(rng, pts)

    if args.mode == "forward":
        fn = jax.jit(
            lambda v, p: model.apply(v, p, train=False)["batch_box_preds"]
        )
        call = lambda i: np.asarray(fn(variables, pts + i * 1e-7))
    elif args.mode == "e2e":
        from pdanet_tpu.models.detectors.iassd import post_processing

        def _e2e(v, p):
            out = model.apply(v, p, train=False)
            return post_processing(
                out["batch_cls_preds"], out["batch_box_preds"],
                cfg.MODEL.POST_PROCESSING)

        fn = jax.jit(_e2e)
        call = lambda i: np.asarray(
            fn(variables, pts + i * 1e-7)["pred_scores"])
    else:
        from pdanet_tpu.train import (
            build_optimizer_and_schedule,
            create_train_state,
            make_train_step,
        )

        gt = jnp.zeros((args.batch_size, 40, 8)).at[:, 0].set(
            jnp.array([10.0, 1.0, -1.0, 3.9, 1.6, 1.56, 0.3, 1.0]))
        tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, 100, 80)
        state = create_train_state(model, variables, tx)
        step = jax.jit(make_train_step(model, tx))
        call = lambda i: float(
            step(state, {"points": pts + i * 1e-7, "gt_boxes": gt})[1])

    call(0)  # compile
    logdir = tempfile.mkdtemp(prefix="pdanet_profile_")
    with jax.profiler.trace(logdir):
        for i in range(args.repeats):
            call(i + 1)

    agg = aggregate_xplane(logdir)
    fam = defaultdict(float)
    for k, v in agg.items():
        fam[_family(k)] += v
    tot = sum(agg.values())
    n = args.repeats
    print(f"\n{args.mode} b{args.batch_size} {os.path.basename(args.cfg_file)}"
          f": {tot * 1e3 / n:.2f} ms device time per call")
    print("-- by family:")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
        print(f"  {v * 1e3 / n:9.3f} ms  {100 * v / tot:5.1f}%  {k}")
    print(f"-- top {args.top} ops:")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {v * 1e3 / n:9.3f} ms  {k[:100]}")


if __name__ == "__main__":
    main()
