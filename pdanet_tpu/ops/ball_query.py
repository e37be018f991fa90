"""Ball query with exact CUDA first-hit padding semantics.

Reference kernel (``pcdet/ops/pointnet2/pointnet2_batch/src/
ball_query_gpu.cu:9-45``): for each center, scan the N points in order and
collect the first ``nsample`` indices with d^2 < r^2.  On the first hit all
slots are prefilled with that index; zero hits leave the zero-initialized
buffer (index 0).

TPU formulation: per center build a priority vector ``prio[n] = n`` if the
point is inside the ball else ``N``; the first-K hits in scan order are
exactly the K smallest priorities, recovered with ``lax.top_k`` on the
negated priorities (masked slots then padded with the first hit).  The
(M, N) distance field is evaluated in M-chunks so the working set stays
bounded for large clouds (ONCE: 60k points).
"""

from functools import partial

import jax
import jax.numpy as jnp

# Max number of (center x point) distance entries materialized at once per
# batch row; keeps the working set ~tens of MB.
_CHUNK_BUDGET = 8 * 1024 * 1024


def _chunked_query(xyz, new_xyz, nsample, prio_fn, sentinel):
    """Run the first-K selection over M in chunks."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]

    def select(prio):  # (B, mc, N') -> (B, mc, nsample)
        # Scan-order first-K via prefix counts + binary search: priorities
        # are already index-ordered, so the k-th smallest valid priority
        # sits at the first position whose running hit-count reaches k.
        # O(N) cumsum + K searchsorted gathers beats lax.top_k over N by
        # ~4x at the L0 scale (4096 centers x 16384 points).
        hit = prio < sentinel
        csum = jnp.cumsum(hit.astype(jnp.int32), axis=-1)
        total = csum[..., -1:]
        Nn = prio.shape[-1]
        ks = jnp.arange(1, nsample + 1, dtype=jnp.int32)
        pos = jax.vmap(
            lambda c: jnp.searchsorted(c, ks, side="left")
        )(csum.reshape(-1, Nn)).reshape(csum.shape[:-1] + (nsample,))
        vals = jnp.take_along_axis(prio, jnp.minimum(pos, Nn - 1), axis=-1)
        valid = ks[None, None, :] <= total
        fill = jnp.where(valid[..., 0:1], vals[..., 0:1], 0)
        return jnp.where(valid, vals, fill)

    chunk = max(1, min(M, _CHUNK_BUDGET // max(N, 1)))
    while M % chunk != 0:
        chunk -= 1

    if chunk == M:
        return select(prio_fn(new_xyz)).astype(jnp.int32)

    centers = new_xyz.reshape(B, M // chunk, chunk, 3).swapaxes(0, 1)

    def body(c):
        return select(prio_fn(c))

    out = jax.lax.map(body, centers)  # (M//chunk, B, chunk, nsample)
    return out.swapaxes(0, 1).reshape(B, M, nsample).astype(jnp.int32)


@partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query(radius, nsample, xyz, new_xyz):
    """First-K-in-scan-order ball query.

    Args:
        radius: ball radius; nsample: group size K.
        xyz: (B, N, 3) support points; new_xyz: (B, M, 3) centers.
    Returns:
        (B, M, nsample) int32 indices with CUDA padding semantics.
    """
    B, N, _ = xyz.shape
    iota = jnp.arange(N, dtype=jnp.int32)
    r2 = jnp.float32(radius * radius)

    def prio_fn(centers):
        d2 = jnp.sum(
            jnp.square(centers[:, :, None, :] - xyz[:, None, :, :]), axis=-1
        )
        return jnp.where(d2 < r2, iota[None, None, :], jnp.int32(N))

    return _chunked_query(xyz, new_xyz, nsample, prio_fn, N)


@partial(jax.jit, static_argnames=("max_radius", "min_radius", "nsample"))
def ball_query_dilated(max_radius, min_radius, nsample, xyz, new_xyz):
    """Annulus query (``ball_query_dilated_kernel_fast``,
    ball_query_gpu.cu:70-117).

    The CUDA kernel admits a point twice when d == 0 AND the annulus
    condition also holds (only possible when min_radius == 0); that is
    replicated by assigning each point two priority slots (2n for the exact
    self-match branch, 2n+1 for the annulus branch).
    """
    B, N, _ = xyz.shape
    iota = jnp.arange(N, dtype=jnp.int32)
    rmax2 = jnp.float32(max_radius * max_radius)
    rmin2 = jnp.float32(min_radius * min_radius)
    sentinel = 2 * N

    def prio_fn(centers):
        d2 = jnp.sum(
            jnp.square(centers[:, :, None, :] - xyz[:, None, :, :]), axis=-1
        )
        zero_hit = d2 == 0
        ann_hit = (d2 >= rmin2) & (d2 < rmax2)
        p_zero = jnp.where(zero_hit, 2 * iota[None, None, :], jnp.int32(sentinel))
        p_ann = jnp.where(ann_hit, 2 * iota[None, None, :] + 1, jnp.int32(sentinel))
        # interleave so the axis stays priority-ordered (the first-K
        # selection walks positions in order): slot 2n = exact-self branch,
        # slot 2n+1 = annulus branch, matching the CUDA per-point order.
        return jnp.stack([p_zero, p_ann], axis=-1).reshape(
            p_zero.shape[:-1] + (2 * p_zero.shape[-1],)
        )

    idx2 = _chunked_query(xyz, new_xyz, nsample, prio_fn, sentinel)
    return (idx2 // 2).astype(jnp.int32)
