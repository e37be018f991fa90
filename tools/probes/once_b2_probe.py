"""On-chip ONCE batch-2 forward timing (the tracked ONCE inference config).

Mirrors bench.py's in-graph amortization (K reps in one fori_loop, inputs
perturbed to defeat CSE).  Points are x-sorted like the pipeline's
``sort_points`` step emits, so the streamed ball query's chunk-skip is
exercised as deployed.
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

K_INNER = 20


def main():
    from pdanet_tpu.config import cfg_from_yaml_file
    from pdanet_tpu.models import build_network
    from pdanet_tpu.utils.easydict import EasyDict

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cfg = cfg_from_yaml_file(
        os.path.join(repo, "tools/cfgs/once_models/PDA-SSD.yaml"), EasyDict()
    )
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), input_channels=4)
    rng = jax.random.PRNGKey(0)
    pts = np.random.RandomState(0).uniform(-75, 75, (2, 60000, 4)).astype(np.float32)
    pts[..., 2] = pts[..., 2] / 25.0  # lidar-like flat z
    pts = np.take_along_axis(pts, np.argsort(pts[..., 0], axis=1)[..., None], 1)
    points = jnp.asarray(pts)
    variables = jax.jit(lambda r, p: model.init({"params": r}, p, train=False))(
        rng, points
    )

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
    print(f"ONCE b2 forward: {best * 1e3:.1f} ms/batch ({best * 500:.1f} ms/frame)")


if __name__ == "__main__":
    main()
