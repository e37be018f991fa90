"""Point sampling ops (farthest-point sampling family).

FPS is the one irreducibly sequential op in the pipeline (iteration j needs
the argmax of the running min-distance field).  The TPU formulation keeps
the N dimension fully vectorized on the VPU and runs the m-step outer loop
as ``lax.fori_loop``; for typical budgets (16384 -> 4096) this is a dense
O(N) distance update + argmax per step that XLA fuses into a couple of
kernels per iteration.

Reference semantics matched (``pcdet/ops/pointnet2/pointnet2_batch/src/
sampling_gpu.cu:94-209``):

* the first sampled index is always 0,
* the running min-distance buffer starts at 1e10,
* ties in the argmax resolve to the first (lowest) index — the CUDA tree
  reduction resolves ties by thread id, which coincides with lowest-index
  for exact ties in real data up to duplicated points; this implementation
  always takes the lowest index.
"""

from functools import partial

import jax
import jax.numpy as jnp


def farthest_point_sample(xyz, npoint):
    """Distance-FPS (D-FPS).

    Dispatches to the Pallas VMEM-resident kernel on TPU (the XLA loop
    costs ~16 us/step in loop overhead; the kernel runs the whole m-loop
    on-chip) and to the XLA ``fori_loop`` elsewhere — identical outputs
    (first index 0, lowest-index tie-break).

    Args:
        xyz: (B, N, 3) float32
        npoint: number of points to sample
    Returns:
        (B, npoint) int32 indices.
    """
    if jax.default_backend() == "tpu":
        from .pallas.fps import (
            farthest_point_sample_pallas,
            farthest_point_sample_pallas_grouped,
        )

        # index outputs carry no tangents; stop_gradient keeps AD from
        # requesting a (nonexistent) JVP rule for the Pallas call inside
        # the jitted train step
        xyz = jax.lax.stop_gradient(xyz)
        if xyz.shape[0] > 1:
            # batch: group frames per program so their independent
            # argmax dependency chains interleave (-22% at b8, identical
            # outputs)
            return farthest_point_sample_pallas_grouped(
                xyz, npoint, group=min(8, xyz.shape[0])
            )
        return farthest_point_sample_pallas(xyz, npoint)
    return _farthest_point_sample_xla(xyz, npoint)


@partial(jax.jit, static_argnames=("npoint",))
def _farthest_point_sample_xla(xyz, npoint):
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def body(j, state):
        temp, idxs, old = state
        cur = jnp.take_along_axis(xyz, old[:, None, None], axis=1)  # (B, 1, 3)
        dx = xyz[..., 0] - cur[..., 0]
        dy = xyz[..., 1] - cur[..., 1]
        dz = xyz[..., 2] - cur[..., 2]
        d = dx * dx + dy * dy + dz * dz  # (B, N)
        temp = jnp.minimum(temp, d)
        best = jnp.argmax(temp, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, j].set(best)
        return temp, idxs, best

    temp0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    idxs0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    old0 = jnp.zeros((B,), dtype=jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (temp0, idxs0, old0))
    return idxs


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_with_dist(dist, npoint):
    """FPS over a precomputed (B, N, N) distance matrix (F-FPS).

    Reference: ``furthest_point_sampling_with_dist_wrapper``
    (sampling_gpu.cu / sampling.cpp:46).
    """
    B, N, _ = dist.shape
    dist = dist.astype(jnp.float32)

    def body(j, state):
        temp, idxs, old = state
        d = jnp.take_along_axis(dist, old[:, None, None], axis=1)[:, 0, :]  # (B, N)
        temp = jnp.minimum(temp, d)
        best = jnp.argmax(temp, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, j].set(best)
        return temp, idxs, best

    temp0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    idxs0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    old0 = jnp.zeros((B,), dtype=jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (temp0, idxs0, old0))
    return idxs


def farthest_point_sample_features(feats, npoint):
    """F-FPS over feature-space distances WITHOUT materialising the
    (B, N, N) matrix: each step recomputes the one needed distance row
    ``d(last_picked, ·)`` on the fly — O(N·C) per step, O(N) memory.

    Equivalent to ``farthest_point_sample_with_dist(calc_square_dist(f, f))``
    (the reference precomputes the full matrix,
    ``IASSD_backbone``/``pointnet2_modules.py:1560-1585``); at ONCE scale
    (60k points x 131 feats) the matrix would be 14.4 GB, the stream is
    31 MB.
    """
    B, N, C = feats.shape
    feats = feats.astype(jnp.float32)

    def body(j, state):
        temp, idxs, old = state
        cur = jnp.take_along_axis(feats, old[:, None, None], axis=1)  # (B,1,C)
        d = jnp.sum(jnp.square(feats - cur), axis=-1)  # (B, N)
        temp = jnp.minimum(temp, d)
        best = jnp.argmax(temp, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, j].set(best)
        return temp, idxs, best

    temp0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    idxs0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    old0 = jnp.zeros((B,), dtype=jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (temp0, idxs0, old0))
    return idxs


def calc_square_dist(a, b):
    """Pairwise squared L2 distances: (B, n, c) x (B, m, c) -> (B, n, m).

    Mirrors ``_PointnetSAModuleBase.calc_square_dist``
    (pointnet2_modules.py:21-45): ||a||^2 + ||b||^2 - 2 a.b (un-rooted).
    """
    a_sq = jnp.sum(a * a, axis=-1)[..., :, None]
    b_sq = jnp.sum(b * b, axis=-1)[..., None, :]
    inner = jnp.einsum("bnc,bmc->bnm", a, b)
    return a_sq + b_sq - 2.0 * inner


def _sector_fps(xyz, npoint, key_fn, part_num=4):
    """Shared body for ds_FPS / ry_FPS (pointnet2_modules.py:1595-1642).

    Sorts each cloud by ``key_fn``, splits it into ``part_num`` contiguous
    sectors, runs FPS with npoint // part_num per sector, and maps the
    sampled per-sector indices back to the original ordering.
    """
    B, N, _ = xyz.shape
    keys = key_fn(xyz)  # (B, N)
    order = jnp.argsort(keys, axis=-1, stable=True)  # ascending
    xyz_sorted = jnp.take_along_axis(xyz, order[..., None], axis=1)
    xyz_div = xyz_sorted.reshape(B * part_num, N // part_num, 3)
    idx_div = order.reshape(B * part_num, N // part_num)
    sampled = farthest_point_sample(xyz_div, npoint // part_num)
    picked = jnp.take_along_axis(idx_div, sampled.astype(jnp.int32), axis=1)
    return picked.reshape(B, npoint).astype(jnp.int32)


def ds_fps(xyz, npoint):
    """Radial-sector FPS ('ds_FPS'): sort by range norm - 5."""
    return _sector_fps(xyz, npoint, lambda p: jnp.linalg.norm(p, axis=-1) - 5.0)


def ry_fps(xyz, npoint):
    """Azimuth-sector FPS ('ry_FPS'): sort by atan(x / y)."""
    return _sector_fps(xyz, npoint, lambda p: jnp.arctan(p[..., 0] / p[..., 1]))
