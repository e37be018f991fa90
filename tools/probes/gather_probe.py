"""On-chip shootout of grouping-gather formulations at b1 vs b8.

The b8 profile (b8_profile_probe.py) shows the L0/L1 grouping gathers
costing ~12+ ms/fwd at b8 (3x the per-element b1 cost): XLA's batched
row-gather lowers poorly when the batch grows.  Candidates:

  taa     current: take_along_axis on (B, M*K, 1) per batch
  flat    jnp.take on (B*N, C) with global flat indices
  vmapg   vmap of single-frame take_along_axis
  onehot  bf16 one-hot matmul (MXU): (M*K, N) @ (N, C)
  sortg   gather after sorting indices (coherence probe; not semantics-
          preserving output order — lower bound only)
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

K_IN = 50


def timeit(fn, *args):
    def loop(*a):
        def body(i, acc):
            out = fn(a[0] + i.astype(a[0].dtype) * 1e-7, *a[1:])
            return acc + jnp.sum(out)

        return jax.lax.fori_loop(0, K_IN, body, jnp.float32(0.0))

    f = jax.jit(loop)
    np.asarray(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / K_IN)
    return best * 1e3


def taa(src, idx):
    B, N, C = src.shape
    M, K = idx.shape[1:]
    return jnp.take_along_axis(
        src, idx.reshape(B, M * K, 1), axis=1).reshape(B, M, K, C)


def flatg(src, idx):
    B, N, C = src.shape
    M, K = idx.shape[1:]
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    return jnp.take(
        src.reshape(B * N, C), (idx + base).reshape(-1), axis=0
    ).reshape(B, M, K, C)


def vmapg(src, idx):
    return jax.vmap(
        lambda s, i: jnp.take(s, i.reshape(-1), axis=0).reshape(
            idx.shape[1], idx.shape[2], src.shape[2])
    )(src, idx)


def main():
    rng = np.random.RandomState(0)
    for B, N, M, K, C in ((1, 16384, 4096, 32, 4), (8, 16384, 4096, 32, 4),
                          (8, 4096, 1024, 32, 67)):
        src = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        # ball-query-like coherent indices: window around center position
        ctr = np.sort(rng.randint(0, N, (B, M)), axis=1)
        idx = np.clip(ctr[..., None] + rng.randint(-64, 64, (B, M, K)), 0, N - 1)
        idx = jnp.asarray(idx.astype(np.int32))
        line = f"B{B} N{N} M{M} K{K} C{C}:"
        for name, fn in (("taa", taa), ("flat", flatg), ("vmap", vmapg)):
            t = timeit(lambda s, i=idx, f=fn: f(s, i), src)
            line += f"  {name} {t:7.3f} ms"
        print(line)


if __name__ == "__main__":
    main()
