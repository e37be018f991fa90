"""Ball query with exact CUDA first-hit padding semantics.

Reference kernel (``pcdet/ops/pointnet2/pointnet2_batch/src/
ball_query_gpu.cu:9-45``): for each center, scan the N points in order and
collect the first ``nsample`` indices with d^2 < r^2.  On the first hit all
slots are prefilled with that index; zero hits leave the zero-initialized
buffer (index 0).

TPU formulation (hierarchical first-K): the hit mask is reshaped to
(chunks, 128) lanes; a lane-local cumsum + a chunk-level prefix locate the
k-th hit with only masked sums over 128-wide axes — no sort, no top_k, no
binary search.  The (M, N) distance field is evaluated in M-chunks so the
working set stays bounded for large clouds (ONCE: 60k points), and
multi-radius queries share one distance computation per chunk
(``ball_query_multi``) — the MSG layers always query 2-3 radii around the
same centers.
"""

from functools import partial

import jax
import jax.numpy as jnp

# Max number of (center x point) distance entries materialized at once
# across the WHOLE batch.  Measured on v5e: each sequential lax.map step
# costs hundreds of ms regardless of chunk size, so the budget favors the
# fewest, largest chunks that still fit HBM (512M entries = 2 GB per i32
# intermediate; a handful are live at once).  KITTI-scale queries run
# unchunked; ONCE L0 (B=2: 16384 x 60000) runs in 4 chunks.
_CHUNK_BUDGET = 256 * 1024 * 1024
_LANES = 128


def _first_k_hits(hit, nsample):
    """Positions of the first K True lanes per row, scan order.

    Args:
        hit: (..., N') bool.
    Returns:
        pos (..., nsample) int32 (clamped to N'-1 on overflow),
        valid (..., nsample) bool.
    """
    n = hit.shape[-1]
    pad = (-n) % _LANES
    if pad:
        hit = jnp.pad(hit, [(0, 0)] * (hit.ndim - 1) + [(0, pad)])
        n += pad
    C = n // _LANES
    h = hit.reshape(hit.shape[:-1] + (C, _LANES)).astype(jnp.int32)
    inner = jnp.cumsum(h, axis=-1)  # lane-local inclusive prefix
    chunk_counts = inner[..., -1]  # (..., C)
    incl = jnp.cumsum(chunk_counts, axis=-1)  # chunk-level inclusive prefix
    total = incl[..., -1:]

    ks = jnp.arange(1, nsample + 1, dtype=jnp.int32)  # (K,)
    # chunk holding the k-th hit: number of chunks whose inclusive count < k
    ck = jnp.sum(
        incl[..., None, :] < ks[..., :, None], axis=-1
    )  # (..., K) in [0, C]
    ck_safe = jnp.minimum(ck, C - 1)
    start = incl - chunk_counts  # exclusive chunk prefix
    start_k = jnp.take_along_axis(start, ck_safe, axis=-1)  # (..., K)
    j = ks - start_k  # 1-based hit rank within the chunk
    rows = jnp.take_along_axis(
        inner, ck_safe[..., None], axis=-2
    )  # (..., K, 128)
    pos_in_chunk = jnp.sum(rows < j[..., None], axis=-1)  # (..., K)
    pos = ck_safe * _LANES + pos_in_chunk
    valid = ks <= total
    return jnp.minimum(pos, hit.shape[-1] - 1).astype(jnp.int32), valid


def _select(prio, nsample, sentinel):
    """First-K valid priorities in scan order with first-hit padding.

    ``prio`` must be position-ordered (slot i holds a priority <= any
    priority at slot > i when valid).
    """
    pos, valid = _first_k_hits(prio < sentinel, nsample)
    vals = jnp.take_along_axis(prio, pos, axis=-1)
    fill = jnp.where(valid[..., 0:1], vals[..., 0:1], 0)
    return jnp.where(valid, vals, fill)


def _chunk_centers(B, M, N):
    # budget covers the whole (B, chunk, N) intermediate: batch rows beyond
    # one must shrink the chunk or the transients blow past HBM and the
    # runtime spills (ONCE B=2 ran 50x slower than B=1 before this).
    chunk = max(1, min(M, _CHUNK_BUDGET // max(B * N, 1)))
    while M % chunk != 0:
        chunk -= 1
    return chunk


def _run_chunked(xyz, new_xyz, body):
    """map ``body(centers_chunk)`` over M-chunks of centers."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    chunk = _chunk_centers(B, M, N)
    if chunk == M:
        return body(new_xyz)
    centers = new_xyz.reshape(B, M // chunk, chunk, 3).swapaxes(0, 1)
    out = jax.lax.map(body, centers)  # (M//chunk, ...) stacked pytree
    return jax.tree.map(
        lambda o: o.swapaxes(0, 1).reshape((B, M) + o.shape[3:]), out
    )


@partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query(radius, nsample, xyz, new_xyz):
    """First-K-in-scan-order ball query.

    Args:
        radius: ball radius; nsample: group size K.
        xyz: (B, N, 3) support points; new_xyz: (B, M, 3) centers.
    Returns:
        (B, M, nsample) int32 indices with CUDA padding semantics.
    """
    return ball_query_multi((radius,), (nsample,), xyz, new_xyz)[0]


def ball_query_multi(radii, nsamples, xyz, new_xyz):
    """Multi-scale ball query sharing one distance field.

    Dispatches to the fused Pallas kernel on TPU (8x the XLA formulation
    at KITTI L0 scale: the (M, N) field and its cumsum hierarchy stay in
    VMEM) and to the XLA formulation elsewhere — identical outputs.

    Args:
        radii: tuple of radii; nsamples: tuple of K per radius.
    Returns:
        tuple of (B, M, nsample_i) int32 index tensors.
    """
    import os

    impl = os.environ.get("PDANET_BALLQUERY_IMPL")
    if impl == "grid":  # probe/opt-in: grid-hash candidates (same outputs)
        from .grid_ball_query import ball_query_multi_grid

        return ball_query_multi_grid(
            tuple(radii), tuple(nsamples),
            jax.lax.stop_gradient(xyz), jax.lax.stop_gradient(new_xyz),
        )
    if jax.default_backend() == "tpu" and impl != "xla":
        from .pallas import ball_query as bq_pallas

        # multi-chunk fields (N > one VMEM chunk) take the streamed kernel:
        # in-kernel DMA loop + AABB chunk skip + internal center sort —
        # never slower, 6.6x at ONCE L0 when the support is coherent
        # (see ball_query_multi_pallas_streamed's v5e shootout note)
        if xyz.shape[1] > bq_pallas._NC and impl != "grid-axis":
            kernel = bq_pallas.ball_query_multi_pallas_streamed
        else:
            kernel = bq_pallas.ball_query_multi_pallas
        # index outputs carry no tangents; stop_gradient keeps AD from
        # requesting a (nonexistent) JVP rule for the Pallas call
        return kernel(
            tuple(radii), tuple(nsamples),
            jax.lax.stop_gradient(xyz), jax.lax.stop_gradient(new_xyz),
        )
    return _ball_query_multi_xla(tuple(radii), tuple(nsamples), xyz, new_xyz)


@partial(jax.jit, static_argnames=("radii", "nsamples"))
def _ball_query_multi_xla(radii, nsamples, xyz, new_xyz):
    """XLA fallback (chunked hierarchical first-K; CPU/GPU path)."""
    B, N, _ = xyz.shape
    iota = jnp.arange(N, dtype=jnp.int32)
    # hoist one transpose: contiguous (B, 3, N) planes; per-component reads
    # of the interleaved (N, 3) layout inside the chunk loop are stride-3
    # loads and were 10x slower at ONCE scale
    xt = jnp.transpose(xyz, (0, 2, 1))

    def body(centers):
        # component-wise (M, N) broadcasts: a fused (M, N, 3) form would
        # put the 3-vector on the lane axis (padded to 128 -> 42x waste)
        dx = centers[..., :, 0:1] - xt[:, None, 0, :]
        dy = centers[..., :, 1:2] - xt[:, None, 1, :]
        dz = centers[..., :, 2:3] - xt[:, None, 2, :]
        d2 = dx * dx + dy * dy + dz * dz
        outs = []
        for radius, nsample in zip(radii, nsamples):
            r2 = jnp.float32(radius * radius)
            prio = jnp.where(d2 < r2, iota[None, None, :], jnp.int32(N))
            outs.append(_select(prio, nsample, N).astype(jnp.int32))
        return tuple(outs)

    return _run_chunked(xyz, new_xyz, body)


@partial(jax.jit, static_argnames=("max_radius", "min_radius", "nsample"))
def ball_query_dilated(max_radius, min_radius, nsample, xyz, new_xyz):
    """Annulus query (``ball_query_dilated_kernel_fast``,
    ball_query_gpu.cu:70-117).

    The CUDA kernel admits a point twice when d == 0 AND the annulus
    condition also holds (only possible when min_radius == 0); that is
    replicated by interleaving two priority slots per point (2n for the
    exact-self branch, 2n+1 for the annulus branch) so the axis stays
    position-ordered.
    """
    B, N, _ = xyz.shape
    iota = jnp.arange(N, dtype=jnp.int32)
    rmax2 = jnp.float32(max_radius * max_radius)
    rmin2 = jnp.float32(min_radius * min_radius)
    sentinel = 2 * N
    xt = jnp.transpose(xyz, (0, 2, 1))

    def body(centers):
        dx = centers[..., :, 0:1] - xt[:, None, 0, :]
        dy = centers[..., :, 1:2] - xt[:, None, 1, :]
        dz = centers[..., :, 2:3] - xt[:, None, 2, :]
        d2 = dx * dx + dy * dy + dz * dz
        zero_hit = d2 == 0
        ann_hit = (d2 >= rmin2) & (d2 < rmax2)
        p_zero = jnp.where(zero_hit, 2 * iota[None, None, :], jnp.int32(sentinel))
        p_ann = jnp.where(ann_hit, 2 * iota[None, None, :] + 1, jnp.int32(sentinel))
        prio = jnp.stack([p_zero, p_ann], axis=-1).reshape(
            p_zero.shape[:-1] + (2 * N,)
        )
        return (_select(prio, nsample, sentinel),)

    (idx2,) = _run_chunked(xyz, new_xyz, body)
    return (idx2 // 2).astype(jnp.int32)
