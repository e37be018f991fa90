"""On-chip KITTI batch-8 eval forward timing (the tracked b8 eval config).

Same in-graph amortization as bench.py; points x-sorted per frame like
the pipeline's sort_points step emits.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

K_INNER = 25


def main():
    from __graft_entry__ import _load_cfg
    from pdanet_tpu.models import build_network

    cfg = _load_cfg()
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          input_channels=4)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-35, 35, (8, 16384, 4)).astype(np.float32)
    pts[..., 2] = pts[..., 2] / 12.0
    pts = np.take_along_axis(pts, np.argsort(pts[..., 0], axis=1)[..., None], 1)
    points = jnp.asarray(pts)
    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, train=False)
    )(jax.random.PRNGKey(0), points)

    def k_forwards(variables, points):
        def body(i, acc):
            out = model.apply(
                variables, points + i.astype(points.dtype) * 1e-7, train=False
            )
            return acc + jnp.sum(out["batch_cls_preds"]) + jnp.sum(
                out["batch_box_preds"][..., 0]
            )

        return jax.lax.fori_loop(0, K_INNER, body, jnp.float32(0.0))

    fn = jax.jit(k_forwards)
    np.asarray(fn(variables, points))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(variables, points))
        best = min(best, (time.perf_counter() - t0) / K_INNER)
    print(f"KITTI b8 eval forward: {best * 1e3:.2f} ms/batch "
          f"({best * 1e3 / 8:.2f} ms/frame)")


if __name__ == "__main__":
    main()
