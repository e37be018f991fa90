"""Grid-hash ball query: O(M * 27C) candidates instead of the O(M * N)
distance field.

ON-CHIP VERDICT (v5e shootout, 2026-08-19 — see docs/STATUS.md): this
formulation LOSES to the dense Pallas kernel at every shipped geometry,
by 15-100x (e.g. KITTI L0 132 vs 2.3 ms; ONCE L1 361 vs 3.9 ms), and the
ONCE L0 instance (M=16384, 27*64 candidate slots) fails TPU compilation
outright.  The costs the O-analysis ignored dominate on TPU: the
(M, 27*cap, 3) candidate gather is a giant dynamic-index load the VPU
serializes, the per-center searchsorted/sort trees don't vectorize across
the lane axis, and the dense kernel it was meant to beat streams its
distance field through VMEM at near VPU speed-of-light.  Kept as an
opt-in (``PDANET_BALLQUERY_IMPL=grid``) oracle-tested negative result so
the approach is not re-tried; it may still win on CPU-class backends
where the dense O(M*N) field blows cache.

The dense formulations (ops/ball_query.py XLA path, ops/pallas/ball_query.py
TPU kernel) evaluate every (center, point) pair — at ONCE L0 scale
(16384 x 60000 x B) that is the single most expensive op in the forward
(~64 ms of the 121.8 ms b2 batch).  This module buckets the cloud into a
uniform grid with cell side = max(radii): every point within any queried
radius of a center lies in the 3x3x3 cell window around the center's cell,
so each center only has to look at its window's occupants.

Exactness (CUDA scan-order parity, ball_query_gpu.cu:9-45) is preserved:

  - candidates are re-sorted BY ORIGINAL POINT INDEX per center, which
    restores the reference kernel's 0..N-1 scan order, and the existing
    hierarchical first-K selector (ops/ball_query._select) picks the first
    nsample hits with the same first-hit/zero-hit padding,
  - squared distances use the same component-wise subtract/FMA shape as the
    dense path, on the same f32 inputs, so the d^2 < r^2 predicate agrees,
  - per-bucket candidate slots are capped at a static ``cap``; if ANY
    bucket inside a queried window holds more than ``cap`` points the whole
    call falls back to the dense path via ``lax.cond`` (both branches are
    compiled once; the flag is data-dependent).  Candidate sets are then a
    superset of the true in-radius sets in every non-fallback execution, so
    the result is bit-identical to the dense path by construction.

The cell side is inflated by 1e-5 so f32 rounding of ``floor(x / side)``
can never push a genuinely in-radius point out of the window.

Batched clouds go through ``vmap``; the grid key space is built per batch
row (dynamic min/extent VALUES are fine — all shapes stay static).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .ball_query import _ball_query_multi_xla, _select

_WINDOW = 3  # +-1 cells per axis


def _cell_keys(xyz, side):
    """Integer cell coordinates and an injective linear key per point.

    Returns (cells (N, 3) int32, keys (N,) int32, dims (3,) int32, mins).
    Keys of out-of-bound probes (centers outside the cloud's cell hull)
    are handled by the callers via clipping-free comparison: a neighbor
    cell that does not exist simply finds an empty searchsorted range.
    """
    cells = jnp.floor(xyz / side).astype(jnp.int32)  # (N, 3)
    mins = jnp.min(cells, axis=0)  # dynamic values, static shape
    rel = cells - mins
    dims = jnp.max(rel, axis=0) + 1
    # +2 margin per axis so center windows (cell +- 1) stay injective
    dy = dims[1] + 2
    dz = dims[2] + 2
    keys = ((rel[:, 0] + 1) * dy + (rel[:, 1] + 1)) * dz + (rel[:, 2] + 1)
    return rel, keys, (dy, dz), mins


def _first_k_smallest(prio, nsample, sentinel):
    """First-K hits by VALUE order (smallest original indices) with the
    CUDA first-hit/zero-hit padding — equivalent to sorting the candidate
    row and running the positional selector, but via one ``lax.top_k`` of
    size K instead of a full 27*cap-wide row sort."""
    neg = sentinel - prio  # invalid (prio == sentinel) -> 0, never top-K'd
    top, _ = jax.lax.top_k(neg, nsample)  # descending neg = ascending prio
    vals = sentinel - top
    valid = vals < sentinel
    fill = jnp.where(valid[..., 0:1], vals[..., 0:1], 0)
    return jnp.where(valid, vals, fill)


def _grid_one(radii, nsamples, cap, selector, xyz, new_xyz):
    """Single-cloud grid ball query. xyz (N, 3), new_xyz (M, 3)."""
    N = xyz.shape[0]
    M = new_xyz.shape[0]
    side = jnp.float32(max(radii) * (1.0 + 1e-5))

    rel, keys, (dy, dz), mins = _cell_keys(xyz, side)
    order = jnp.argsort(keys)  # ties in arbitrary order: re-sorted below
    skeys = keys[order]

    # center cells in the SAME key space
    ccells = jnp.floor(new_xyz / side).astype(jnp.int32) - mins
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)  # (27, 3)
    ncells = ccells[:, None, :] + offs[None, :, :] + 1  # (M, 27, 3)
    nkeys = (ncells[..., 0] * dy + ncells[..., 1]) * dz + ncells[..., 2]

    start = jnp.searchsorted(skeys, nkeys, side="left")  # (M, 27)
    end = jnp.searchsorted(skeys, nkeys, side="right")
    count = end - start
    overflow = jnp.any(count > cap)

    # candidate slots: first `cap` occupants of each window bucket
    slot = jnp.arange(cap, dtype=jnp.int32)
    spos = jnp.minimum(start[..., None] + slot, N - 1)  # (M, 27, cap)
    svalid = slot < count[..., None]
    cand = order[spos.reshape(M, -1)]  # (M, 27*cap) original indices
    cvalid = svalid.reshape(M, -1)

    prio0 = jnp.where(cvalid, cand, jnp.int32(N))
    if selector == "sort":
        # restore CUDA scan order up front: sort candidates by original
        # index (invalid slots pushed to the end with sentinel N), then the
        # positional first-K selector runs unchanged
        cidx = jax.lax.sort(prio0, dimension=-1)
    else:  # "topk": leave candidates in bucket order; select by value
        cidx = prio0
    safe = jnp.minimum(cidx, N - 1)
    pts = xyz[safe]  # (M, 27*cap, 3)

    # same component-wise f32 arithmetic as the dense path
    dx = new_xyz[:, None, 0] - pts[..., 0]
    dyc = new_xyz[:, None, 1] - pts[..., 1]
    dzc = new_xyz[:, None, 2] - pts[..., 2]
    d2 = dx * dx + dyc * dyc + dzc * dzc

    outs = []
    for radius, nsample in zip(radii, nsamples):
        r2 = jnp.float32(radius * radius)
        hit = (d2 < r2) & (cidx < N)
        prio = jnp.where(hit, cidx, jnp.int32(N))
        if selector == "sort":
            sel = _select(prio, nsample, N)
        else:
            sel = _first_k_smallest(prio, nsample, N)
        outs.append(sel.astype(jnp.int32))
    return tuple(outs), overflow


@partial(jax.jit, static_argnames=("radii", "nsamples", "cap", "selector"))
def ball_query_multi_grid(radii, nsamples, xyz, new_xyz, cap=64,
                          selector="topk"):
    """Grid-hash multi-radius ball query with dense-path fallback.

    Args:
        radii: tuple of radii (window sized by max); nsamples: K per radius.
        xyz: (B, N, 3); new_xyz: (B, M, 3).
        cap: static per-bucket candidate budget.  Any queried-window bucket
            exceeding it triggers the exact dense fallback for the whole
            call (lax.cond, data-dependent).
        selector: "topk" (default) selects the first-K hits by smallest
            original index via one K-deep ``lax.top_k`` per radius; "sort"
            sorts the candidate row by index once and reuses the
            positional hierarchical selector.  Identical outputs.
    Returns:
        tuple of (B, M, nsample_i) int32, bit-identical to
        ``ops.ball_query._ball_query_multi_xla``.
    """
    radii = tuple(radii)
    nsamples = tuple(nsamples)

    grid = jax.vmap(partial(_grid_one, radii, nsamples, cap, selector))
    outs, overflow = grid(xyz, new_xyz)
    any_overflow = jnp.any(overflow)

    def fallback(_):
        return _ball_query_multi_xla(radii, nsamples, xyz, new_xyz)

    def keep(o):
        return o

    return jax.lax.cond(any_overflow, fallback, keep, outs)
