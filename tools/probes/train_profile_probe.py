"""Per-kernel device-time split of the KITTI b2 fused TRAIN step.

VERDICT r3 next#3: itemize the backward's gather/scatter share before
attacking train-step MFU (9.3%).  Captures a jax.profiler trace of a few
fused train steps (fwd + bwd + optax) on the real chip and aggregates
XLA-op durations from the xplane proto, bucketing into kernel families
(matmul, scatter(-add), gather, fps, ball-query, fusion, copy/layout).

Usage: python tools/probes/train_profile_probe.py [f32|bf16] [B] [kitti|once]
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ds = sys.argv[3] if len(sys.argv) > 3 else "kitti"

    from bench import build_model, lidar_like_cloud
    from pdanet_tpu.train import (
        build_optimizer_and_schedule,
        create_train_state,
        make_train_step,
    )

    cfg_path = (
        "tools/cfgs/once_models/PDA-SSD.yaml" if ds == "once"
        else "tools/cfgs/kitti_models/PDA-SSD.yaml"
    )
    cfg, model = build_model(cfg_path)
    # the shipped yamls default TRAIN_COMPUTE_DTYPE: bf16 (r5) — set the
    # requested mode explicitly either way and rebuild
    from pdanet_tpu.models import build_network

    if mode == "bf16":
        cfg.MODEL.BACKBONE_3D.TRAIN_COMPUTE_DTYPE = "bf16"
    else:
        cfg.MODEL.BACKBONE_3D.pop("TRAIN_COMPUTE_DTYPE", None)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          input_channels=4)
    if ds == "once":
        points = jnp.asarray(
            lidar_like_cloud(11, B, 60000, x_range=(0.0, 75.0)))
    else:
        points = jnp.asarray(lidar_like_cloud(13, B, 16384))
    rng = np.random.RandomState(0)
    gt = np.zeros((B, 40, 8), np.float32)
    for b in range(B):
        for m in range(12):
            gt[b, m] = [rng.uniform(5, 60), rng.uniform(-20, 20),
                        rng.uniform(-1.2, -0.4), 3.9, 1.6, 1.56,
                        rng.uniform(-np.pi, np.pi), 1.0]
    gt = jnp.asarray(gt)

    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, train=False)
    )(jax.random.PRNGKey(0), points)
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, 100, 80)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=())

    state2, loss, _ = step(state, {"points": points, "gt_boxes": gt})
    print(f"compiled ({mode}); loss {float(loss):.3f}")

    logdir = f"/tmp/train_trace_{ds}_{mode}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        st = state
        for i in range(N_STEPS):
            st, loss, _ = step(
                st, {"points": points + i * 1e-7, "gt_boxes": gt})
        jax.block_until_ready(loss)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {logdir}"
    space = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = defaultdict(float)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                agg[emeta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e12
        if not agg:
            continue
        fam = defaultdict(float)
        for k, v in agg.items():
            # The event name is the FULL HLO instruction text; classify on
            # the DEFINED name only, else fusions whose operand lists
            # mention %copy.N / %bitcast.N land in "copy/layout" (this bug
            # inflated the r4 copy number 19.8 -> true ~7 ms; see
            # copy_decomp_probe.py for the opcode-exact split).
            lk = k.split(" = ")[0].strip().lstrip("%").lower()
            if "fps" in lk or "farthest" in lk:
                key = "fps-kernel"
            elif "ball" in lk or "bq_" in lk:
                key = "ball-query"
            elif "fusion" in lk:
                # fusion names carry their root descriptor
                if "conv" in lk or "dot" in lk:
                    key = "matmul/conv(fused)"
                elif "scatter" in lk:
                    key = "scatter(-add)"
                else:
                    key = "fusion(elementwise+)"
            elif "scatter" in lk:
                key = "scatter(-add)"
            elif "gather" in lk or "dynamic-slice" in lk:
                key = "gather/slice"
            elif "dot" in lk or "conv" in lk:
                key = "matmul/conv"
            elif "sort" in lk:
                key = "sort"
            elif "copy" in lk or "transpose" in lk or "bitcast" in lk:
                key = "copy/layout"
            elif "all-reduce" in lk or "reduce" in lk:
                key = "reduce"
            else:
                key = "other"
            fam[key] += v
        tot = sum(agg.values())
        print(f"== {plane.name}: total {tot*1e3:.2f} ms "
              f"({tot*1e3/N_STEPS:.2f} ms/step, ds={ds}, mode={mode}, B={B})")
        for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
            print(f"  {v*1e3/N_STEPS:9.3f} ms/step  {k}")
        print("-- top single ops:")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:24]:
            print(f"  {v*1e3/N_STEPS:9.3f} ms/step  {k[:100]}")
        break


if __name__ == "__main__":
    main()
