"""Per-kernel device-time split of the KITTI b8 eval forward.

Captures a jax.profiler trace of a few b8 forwards on the real chip and
aggregates XLA op durations from the xplane proto (tensorboard profile
plugin), grouping by op-name prefix.  Used to target VERDICT r2 next#2
(b8 per-frame <= 1.15x b1).
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

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _load_cfg
    from pdanet_tpu.models import build_network

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = _load_cfg()
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          input_channels=4)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-35, 35, (B, 16384, 4)).astype(np.float32)
    pts[..., 2] = pts[..., 2] / 12.0
    pts = np.take_along_axis(pts, np.argsort(pts[..., 0], axis=1)[..., None], 1)
    points = jnp.asarray(pts)
    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, train=False)
    )(jax.random.PRNGKey(0), points)

    fwd = jax.jit(lambda v, p: model.apply(v, p, train=False)["batch_box_preds"])
    np.asarray(fwd(variables, points))  # compile

    logdir = "/tmp/b8_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(3):
            np.asarray(fwd(variables, points + i * 1e-7))

    # aggregate xplane op durations by parsing the proto directly
    # (the tensorboard-plugin wrapper is incompatible with this TF build)
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
            if line.name != "XLA Ops":  # sync op timeline only (async
                continue                # lines double-count module spans)
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                agg[name] += ev.duration_ps / 1e12
        if not agg:
            continue
        print(f"== plane: {plane.name} (lines: "
              f"{[l.name for l in plane.lines][:6]})")
        # bucket by coarse kernel family
        fam = defaultdict(float)
        for k, v in agg.items():
            key = k.split(".")[0].split("_")[0]
            if "fps" in k or "farthest" in k:
                key = "fps-kernel"
            elif "ball" in k or "bq" in k:
                key = "ball-query"
            elif "fusion" in k:
                key = "fusion"
            elif "copy" in k or "transpose" in k:
                key = "copy/layout"
            elif "dot" in k or "conv" in k:
                key = "matmul/conv"
            fam[key] += v
        tot = sum(agg.values())
        print(f"total device time: {tot*1e3:.2f} ms ({tot*1e3/3:.2f} ms/fwd)")
        for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:14]:
            print(f"  {v*1e3/3:9.3f} ms/fwd  {k}")
        print("-- top single ops:")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:18]:
            print(f"  {v*1e3/3:9.3f} ms/fwd  {k[:90]}")
        break


if __name__ == "__main__":
    main()
