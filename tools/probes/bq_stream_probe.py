"""On-chip shootout: grid-axis vs streamed (in-kernel DMA) ball query.

Times both Pallas variants at the shipped multi-chunk geometries (ONCE
L0/L1, KITTI L0) with the bench.py idiom: K in-graph reps inside one
jitted fori_loop (inputs perturbed per step to defeat CSE) amortize the
relay's ~35 ms per-dispatch RPC.

Two point distributions per geometry:
  * iid uniform over the scene — worst case for the AABB chunk-skip mask
    (every chunk spans the scene, mask stays all-ones);
  * x-sorted points + x-sorted centers — the spatial-coherence best case
    (raw lidar scan order is ring/azimuth-coherent, between these two).
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

from pdanet_tpu.ops.pallas.ball_query import (
    ball_query_multi_pallas,
    ball_query_multi_pallas_streamed,
)

K_INNER = 50

GEOMETRIES = [
    # (name, B, N, M, radii, ks, half_extent)
    ("ONCE_L0", 2, 60000, 16384, (0.2, 0.8), (16, 32), 75.0),
    ("ONCE_L1", 2, 16384, 4096, (0.8, 1.6), (16, 32), 75.0),
    ("KITTI_L0", 1, 16384, 4096, (0.2, 0.8), (16, 32), 35.0),
]


def time_fn(fn, radii, ks, xyz, ctr):
    def k_reps(xyz, ctr):
        def body(i, acc):
            outs = fn(radii, ks, xyz, ctr + i.astype(ctr.dtype) * 1e-7)
            return acc + sum(jnp.sum(o[:, 0, :]) for o in outs)

        return jax.lax.fori_loop(0, K_INNER, body, jnp.int32(0))

    jitted = jax.jit(k_reps)
    np.asarray(jitted(xyz, ctr))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jitted(xyz, ctr))
        best = min(best, (time.perf_counter() - t0) / K_INNER)
    return best * 1e3  # ms


def main():
    print("backend:", jax.default_backend())
    for name, B, N, M, radii, ks, ext in GEOMETRIES:
        rng = np.random.RandomState(42)
        pts = rng.uniform(-ext, ext, (B, N, 3)).astype(np.float32)
        pts[..., 2] = pts[..., 2] / ext * 3.0  # lidar-like flat z
        ctr = pts[:, :M].copy()
        for order in ("iid", "sorted"):
            if order == "sorted":
                xyz_o = np.take_along_axis(
                    pts, np.argsort(pts[..., 0], axis=1)[..., None], 1
                )
                ctr_o = np.take_along_axis(
                    ctr, np.argsort(ctr[..., 0], axis=1)[..., None], 1
                )
            else:
                xyz_o, ctr_o = pts, ctr
            xyz_j, ctr_j = jnp.asarray(xyz_o), jnp.asarray(ctr_o)
            t_grid = time_fn(ball_query_multi_pallas, radii, ks, xyz_j, ctr_j)
            t_str = time_fn(
                ball_query_multi_pallas_streamed, radii, ks, xyz_j, ctr_j
            )
            print(
                f"{name:9s} {order:6s}: grid-axis {t_grid:8.3f} ms | "
                f"streamed {t_str:8.3f} ms | speedup {t_grid / t_str:5.2f}x"
            )


if __name__ == "__main__":
    main()
