"""On-chip grouped-FPS shootout: G in {2, 4, 8} at KITTI b8 (16384->4096)
and ONCE b2 (60000->16384), plus output-equality checks vs the per-frame
kernel.  (VERDICT r2 next#2/#3 groundwork.)"""

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

from pdanet_tpu.ops.pallas.fps import (
    farthest_point_sample_pallas,
    farthest_point_sample_pallas_grouped,
)

K = 20


def timeit(fn, *args):
    def k_loop(*a):
        def body(i, acc):
            out = fn(a[0] + i.astype(a[0].dtype) * 1e-7, *a[1:])
            return acc + jnp.sum(out)

        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    f = jax.jit(k_loop)
    np.asarray(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def main():
    rng = np.random.RandomState(0)
    for name, B, N, m in (("KITTI b8 16384->4096", 8, 16384, 4096),
                          ("ONCE b2 60000->16384", 2, 60032, 16384)):
        pts = rng.uniform(-35, 35, (B, N, 3)).astype(np.float32)
        pts = np.take_along_axis(
            pts, np.argsort(pts[..., 0], axis=1)[..., None], 1)
        xyz = jnp.asarray(pts)
        ref = np.asarray(farthest_point_sample_pallas(xyz, m))
        t1 = timeit(lambda x: farthest_point_sample_pallas(x, m), xyz)
        line = f"{name}: single {t1:.2f} ms"
        for G in (2, 4, 8):
            if B % G and G > B:
                continue
            got = np.asarray(
                farthest_point_sample_pallas_grouped(xyz, m, group=G))
            ok = np.array_equal(got, ref)
            tg = timeit(
                lambda x, G=G: farthest_point_sample_pallas_grouped(
                    x, m, group=G), xyz)
            line += f" | G={G} {tg:.2f} ms ({'ok' if ok else 'MISMATCH'})"
        print(line)


if __name__ == "__main__":
    main()
