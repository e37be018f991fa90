"""Pallas TPU kernel: fused multi-radius ball query.

Replaces the XLA formulation in ``ops/ball_query.py`` on TPU.  The XLA
version materializes the (M, N) distance field plus several same-sized
cumsum/priority intermediates in HBM — ~6 x 256 MB of traffic for the
KITTI L0 query (16384 pts x 4096 centers), measured at ~17 ms on v5e.
This kernel keeps everything in VMEM: per 128-center block it streams the
support points once, computes the distance field, and runs the
hierarchical first-K selection on-chip, writing only the (M, K) index
tensors back to HBM.

Semantics are bit-identical to the XLA/CUDA reference
(``ball_query_gpu.cu:9-45``): for each center, the first ``nsample``
support indices in scan order with d^2 < r^2; all slots prefilled with the
first hit; zero hits leave index 0.

Mosaic notes (probed on v5e):
  * no ``cumsum`` primitive -> lane-local inclusive prefixes are matmuls
    with a triangular ones matrix (exact: 0/1 inputs and sums <= 128 are
    integers, exact in bf16 operands with f32 accumulation),
  * batched ``dot_general`` IS supported -> the "row gather" of the
    hierarchy (pick the boundary 128-lane sub-chunk per (center, k)) is a
    one-hot batched matmul on the MXU,
  * layout is chosen so NO large vector relayout is needed: the support
    points arrive pre-reshaped as (B, 3, C, 128) sub-chunk planes (a free
    row-major host reshape), so the distance field is computed directly in
    the (Mb, C, 128) shape whose collapse to (Mb*C, 128) for the prefix
    matmul is also free.  v1 of this kernel computed d2 as (Mb, NC) lanes
    and reshaped the hit mask per radius — a ~1M-element lane->sublane
    relayout per radius per program that dominated the runtime at KITTI
    L0 shapes (measured ~1.9 ms; see git history).

Large N (ONCE: 60k) is processed in sub-chunk groups of ``_NC`` lanes with
a cross-chunk merge: per-radius scratch keeps the selected indices and a
running count, and each chunk's local first-K candidates are shifted into
the free slots with a one-hot K x K selection.

Tried and rejected: replacing the hierarchical k-th-hit extraction with
full-rank counting (pos_k = #{n: rank_n < k}, K compare+reduce passes) —
bit-identical but 1.3-3.6x SLOWER at every shipped shape (serial
reduction latency dominates; the one-hot batched matmuls pipeline better
on the MXU).  Also tried (2026-08-18): slicing the distance field into
S-row strips merged in-kernel with the cross-chunk shift logic, to fit
bigger (mb, nc) blocks and quarter the program count — (mb=256,
nc=16384) still fails remote compile, and the working (mb=128,
nc=16384, S=16) variant is bit-identical but ~1.5x SLOWER (the
per-slice shift-merge matmuls outweigh the saved ~7 us/program fixed
cost).  128 x 8192 with one whole-block prefix matmul stays optimal.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MB = 128  # centers per block (lane-aligned: block last dims must be 128)
_NC = 8192  # support-point lanes per in-kernel chunk (VMEM budget)
_SENTINEL = 1e17  # padded support points: d2 ~ 1e34, never a hit


def _tri_incl(n, dtype):
    """(n, n) ones matrix with L[j, i] = 1 iff j <= i: contracting the row
    axis gives inclusive prefix sums along the lane axis."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r <= c).astype(dtype)


def _first_k_in_chunk(hit3, K):
    """Lane positions of the first K hits within one chunk, scan order.

    Args:
        hit3: (Mb, C, 128) bool — sub-chunk-major hit planes (point index
            of [m, c, j] is c * 128 + j).
    Returns:
        lpos (Mb, K) float32 position of the k-th hit (garbage when k >=
        total), total (Mb, 1) float32 hit count.
    """
    Mb, C, _ = hit3.shape
    # cast BEFORE reshaping: Mosaic cannot shape-cast i1 vectors; the
    # (Mb, C, 128) -> (Mb*C, 128) collapse of leading dims is layout-free
    hb = hit3.astype(jnp.bfloat16)
    h3 = hb.reshape(Mb * C, _LANES)
    L = _tri_incl(_LANES, jnp.bfloat16)
    # lane-local inclusive prefix: values <= 128, exact in bf16 -> f32
    # (Mosaic requires 32-bit matmul accumulators; a bf16 accumulator was
    # tried and rejected by the verifier)
    # stored bf16: prefix values are integers <= 128, exact in bf16, and
    # halving this (Mb*C, 128) intermediate is what lets the big-Mb
    # ONCE-scale blocks fit the scoped-VMEM budget
    inner = jax.lax.dot_general(
        h3, L, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16).reshape(Mb, C, _LANES)
    counts = jnp.sum(hb.astype(jnp.float32), axis=-1)  # (Mb, C)
    # sub-chunk-level inclusive prefix (counts <= 128, exact in bf16)
    Lc = _tri_incl(C, jnp.bfloat16)
    incl = jax.lax.dot_general(
        counts.astype(jnp.bfloat16), Lc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Mb, C)
    start = incl - counts
    total = incl[:, C - 1 : C]  # (Mb, 1)

    ks = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2).astype(jnp.float32) + 1.0  # 1..K
    # sub-chunk holding the k-th hit = #sub-chunks with inclusive count < k
    ck = jnp.sum(
        (incl[:, :, None] < ks).astype(jnp.float32), axis=1
    )  # (Mb, K) in [0, C]
    ck = jnp.minimum(ck, float(C - 1))
    cks = jax.lax.broadcasted_iota(jnp.int32, (Mb, K, C), 2).astype(jnp.float32)
    onehot = (cks == ck[:, :, None]).astype(jnp.bfloat16)  # (Mb, K, C)
    start_k = jnp.sum(onehot.astype(jnp.float32) * start[:, None, :], axis=2)
    # boundary sub-chunk rows of the lane prefix, via batched one-hot matmul
    rows = jax.lax.dot_general(
        onehot, inner,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (Mb, K, 128)
    j_in = ks.reshape(1, K, 1) - start_k[:, :, None]  # 1-based in-chunk rank
    pos_in = jnp.sum((rows < j_in).astype(jnp.float32), axis=2)  # (Mb, K)
    lpos = ck * float(_LANES) + pos_in
    return lpos, total


def _emit(out_ref, sel, cnt):
    """Apply CUDA padding semantics and write the final (Mb, K) block."""
    Mb, K = sel.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (Mb, K), 1).astype(jnp.float32)
    valid = slot < cnt
    fill = jnp.where(cnt > 0.0, sel[:, 0:1], 0)
    out_ref[0, :, :] = jnp.where(valid, sel, fill)


def _merge_chunk(sel0, cnt0, lpos, total, K):
    """Shift a chunk's local first-K candidates into the free slots.

    Slot ``s`` takes local hit ``s - cnt0``; garbage beyond the running
    count is masked at emit.  Returns the updated (sel, cnt).
    """
    Mb = sel0.shape[0]
    ss = jax.lax.broadcasted_iota(jnp.int32, (Mb, K, K), 1).astype(jnp.float32)
    kk = jax.lax.broadcasted_iota(jnp.int32, (Mb, K, K), 2).astype(jnp.float32)
    take = (kk == ss - cnt0[:, :, None]).astype(jnp.float32)
    shifted = jnp.sum(
        take * lpos[:, None, :].astype(jnp.float32), axis=2
    ).astype(jnp.int32)  # (Mb, K)
    slot = jax.lax.broadcasted_iota(jnp.int32, (Mb, K), 1).astype(jnp.float32)
    sel = jnp.where(slot < cnt0, sel0, shifted)
    cnt = jnp.minimum(cnt0 + total, float(K))
    return sel, cnt


def _lane_to_major(row, MB):
    """(1, MB) lane vector -> (MB, 1, 1) column broadcast.

    Formulated as select+reduce instead of ``transpose().reshape()``:
    the lane->sublane relayout shape cast compiles on the live remote
    path but is rejected by the chipless AOT Mosaic pipeline that
    recompiles exported serving artifacts (``infer-vector-layout:
    unsupported shape cast (1x1x128) -> (128x1x1)``) — and serving
    artifacts must recompile anywhere.  Cost is an (MB, 1, MB)
    elementwise+reduce, noise next to the (MB, C, 128) distance field."""
    v = row.reshape(1, 1, MB)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (MB, 1, MB), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (MB, 1, MB), 2)
    )
    return jnp.sum(jnp.where(sel, v, 0.0), axis=2, keepdims=True)


def _bq_kernel(radii, nsamples, n_chunks, ctr_ref, sup_ref, *rest):
    n_r = len(radii)
    out_refs = rest[:n_r]
    sel_refs = rest[n_r : 2 * n_r]
    cnt_refs = rest[2 * n_r : 3 * n_r]
    C = sup_ref.shape[2]
    NC = C * _LANES
    MB = ctr_ref.shape[2]
    nc_id = pl.program_id(2) if n_chunks > 1 else 0
    base = (nc_id * NC).astype(jnp.float32) if n_chunks > 1 else 0.0

    # centers: (1, Mb) lane rows -> (Mb, 1, 1) columns
    cxs = _lane_to_major(ctr_ref[0, 0:1, :], MB)
    cys = _lane_to_major(ctr_ref[0, 1:2, :], MB)
    czs = _lane_to_major(ctr_ref[0, 2:3, :], MB)
    xs = sup_ref[0, 0, :, :].reshape(1, C, _LANES)
    ys = sup_ref[0, 1, :, :].reshape(1, C, _LANES)
    zs = sup_ref[0, 2, :, :].reshape(1, C, _LANES)
    dx = cxs - xs
    dy = cys - ys
    dz = czs - zs
    d2 = dx * dx + dy * dy + dz * dz  # (Mb, C, 128)

    for i, (radius, K) in enumerate(zip(radii, nsamples)):
        hit3 = d2 < (radius * radius)
        lpos, total = _first_k_in_chunk(hit3, K)
        lpos = (lpos + base).astype(jnp.int32)
        Mb = lpos.shape[0]

        if n_chunks == 1:
            _emit(out_refs[i], lpos, jnp.minimum(total, float(K)))
            continue

        @pl.when(nc_id == 0)
        def _init(i=i, Mb=Mb, K=K):
            cnt_refs[i][:, :] = jnp.zeros((Mb, 1), jnp.float32)
            sel_refs[i][:, :] = jnp.zeros((Mb, K), jnp.int32)

        cnt0 = cnt_refs[i][:, :]  # (Mb, 1) selected so far
        sel0 = sel_refs[i][:, :]  # (Mb, K)
        sel, cnt = _merge_chunk(sel0, cnt0, lpos, total, K)
        cnt_refs[i][:, :] = cnt
        sel_refs[i][:, :] = sel

        @pl.when(nc_id == n_chunks - 1)
        def _final(i=i, sel=sel, cnt=cnt):
            _emit(out_refs[i], sel, cnt)


def _pad_to(x, axis, mult, value):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _bq_stream_kernel(radii, nsamples, n_chunks, ctr_ref, mask_ref, sup_hbm,
                      *rest):
    """One program per (batch, center-block): all support chunks are looped
    in-kernel with double-buffered manual DMA, so the per-program fixed
    cost (~7 us on v5e) is paid once per center block instead of once per
    (center block, chunk).  ``mask_ref`` (SMEM) carries a conservative
    AABB pre-test per chunk: 0 means no point of the chunk can be within
    max(radii) of any center in this block, so its compute is skipped
    (bit-exact — a skipped chunk provably contributes zero hits)."""
    n_r = len(radii)
    out_refs = rest[:n_r]
    sel_refs = rest[n_r : 2 * n_r]
    cnt_refs = rest[2 * n_r : 3 * n_r]
    buf = rest[3 * n_r]  # (2, 3, C, 128) chunk double-buffer
    sems = rest[3 * n_r + 1]
    b = pl.program_id(0)
    m_id = pl.program_id(1)
    MB = ctr_ref.shape[2]
    C = buf.shape[2]
    NC = C * _LANES

    cxs = _lane_to_major(ctr_ref[0, 0:1, :], MB)
    cys = _lane_to_major(ctr_ref[0, 1:2, :], MB)
    czs = _lane_to_major(ctr_ref[0, 2:3, :], MB)

    for i, K in enumerate(nsamples):
        cnt_refs[i][:, :] = jnp.zeros((MB, 1), jnp.float32)
        sel_refs[i][:, :] = jnp.zeros((MB, K), jnp.int32)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            sup_hbm.at[b, :, c], buf.at[slot], sems.at[slot]
        )

    get_dma(0, 0).start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _prefetch():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        get_dma(slot, c).wait()

        @pl.when(mask_ref[b, m_id, c] > 0)
        def _compute():
            xs = buf[slot, 0].reshape(1, C, _LANES)
            ys = buf[slot, 1].reshape(1, C, _LANES)
            zs = buf[slot, 2].reshape(1, C, _LANES)
            dx = cxs - xs
            dy = cys - ys
            dz = czs - zs
            d2 = dx * dx + dy * dy + dz * dz  # (MB, C, 128)
            base = (c * NC).astype(jnp.float32)
            for i, (radius, K) in enumerate(zip(radii, nsamples)):
                hit3 = d2 < (radius * radius)
                lpos, total = _first_k_in_chunk(hit3, K)
                lpos = (lpos + base).astype(jnp.int32)
                sel, cnt = _merge_chunk(
                    sel_refs[i][:, :], cnt_refs[i][:, :], lpos, total, K
                )
                cnt_refs[i][:, :] = cnt
                sel_refs[i][:, :] = sel

        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    for i in range(n_r):
        _emit(out_refs[i], sel_refs[i][:, :], cnt_refs[i][:, :])


@partial(jax.jit,
         static_argnames=("radii", "nsamples", "interpret", "nc", "mb"))
def ball_query_multi_pallas_streamed(radii, nsamples, xyz, new_xyz,
                                     interpret=False, nc=_NC, mb=None):
    """Streamed multi-chunk variant of :func:`ball_query_multi_pallas`.

    Grid is (B, M-blocks) only; support chunks are DMA'd HBM->VMEM inside
    the kernel (double-buffered) and chunks whose AABB is farther than
    max(radii) from the center block's AABB are skipped.  Identical
    outputs to the grid-axis variant.

    Centers are sorted by x internally and the outputs scattered back —
    bit-exact (each center's result depends only on its own position and
    the support scan order) and it makes center blocks spatially tight, so
    the chunk-skip test fires whenever the SUPPORT is coherent.  Raw-cloud
    layers get coherent support from the pipeline's ``sort_points``
    processor step.  v5e shootout (2026-08-19, iid vs x-sorted support):
    ONCE L0 49.0 -> 48.0 / 7.5 ms, ONCE L1 3.56 -> 3.54 / 2.17 ms,
    KITTI L0 2.02 -> 2.03 / 1.35 ms — never slower, 6.6x at ONCE L0 when
    the support is sorted.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    # internal center sort (see docstring); stable argsort keeps ties in
    # input order, irrelevant to outputs but deterministic
    order = jnp.argsort(new_xyz[..., 0], axis=1)  # (B, M)
    inv = jnp.argsort(order, axis=1)
    new_xyz = jnp.take_along_axis(new_xyz, order[..., None], axis=1)
    sup = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    sup = _pad_to(sup, 2, nc if N > nc else _LANES, _SENTINEL)
    Np = sup.shape[2]
    NC = min(Np, nc)
    n_chunks = Np // NC
    C = NC // _LANES
    if mb is None:
        mb = _MB
    sup5 = sup.reshape(B, 3, n_chunks, C, _LANES)

    ctr = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, M)
    ctr = _pad_to(ctr, 2, mb, 0.0)
    Mp = ctr.shape[2]
    n_mb = Mp // mb

    # conservative chunk-skip pre-test: per-axis AABB gap between each
    # center block and each support chunk; sentinel pads only weaken the
    # bound (lo is real, hi is excluded below), never unsound
    max_r = max(radii)
    sup_c = sup.reshape(B, 3, n_chunks, NC)
    s_lo = jnp.min(sup_c, axis=3)  # (B, 3, n_chunks)
    s_hi = jnp.max(jnp.where(sup_c >= _SENTINEL, -jnp.inf, sup_c), axis=3)
    ctr_b = ctr.reshape(B, 3, n_mb, mb)
    c_lo = jnp.min(ctr_b, axis=3)  # (B, 3, n_mb)
    c_hi = jnp.max(ctr_b, axis=3)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(s_lo[:, :, None, :] - c_hi[:, :, :, None],
                    c_lo[:, :, :, None] - s_hi[:, :, None, :]),
    )  # (B, 3, n_mb, n_chunks)
    process = (jnp.sum(gap * gap, axis=1) <= max_r * max_r).astype(jnp.int32)

    grid = (B, n_mb)
    outs = pl.pallas_call(
        partial(_bq_stream_kernel, radii, nsamples, n_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, mb), lambda b, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
            # whole-array SMEM residency: Mosaic requires partial blocks to
            # tile (8, 128); the mask is tiny (B * n_mb * n_chunks scalars)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, mb, K), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM)
            for K in nsamples
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, Mp, K), jnp.int32) for K in nsamples
        ),
        scratch_shapes=(
            [pltpu.VMEM((mb, K), jnp.int32) for K in nsamples]
            + [pltpu.VMEM((mb, 1), jnp.float32) for _ in nsamples]
            + [pltpu.VMEM((2, 3, C, _LANES), jnp.float32),
               pltpu.SemaphoreType.DMA((2,))]
        ),
        # the AOT (serving-artifact) compile path defaults to a 16 MB
        # scoped-vmem limit; this kernel's working set at the tuned
        # (mb=128, nc=8192) block is ~16.6 MB (fine for the 128 MB VMEM,
        # and what the live path already runs with)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(ctr, process, sup5)
    # undo the internal center sort
    return tuple(
        jnp.take_along_axis(o[:, :M, :], inv[..., None], axis=1) for o in outs
    )


@partial(jax.jit,
         static_argnames=("radii", "nsamples", "interpret", "nc", "mb"))
def ball_query_multi_pallas(radii, nsamples, xyz, new_xyz, interpret=False,
                            nc=_NC, mb=None):
    """Multi-radius first-K ball query (TPU kernel).

    Args:
        radii / nsamples: tuples (shared distance field).
        xyz: (B, N, 3) support; new_xyz: (B, M, 3) centers.
        mb: centers per block (lane multiple), default 128.  Probed on
            v5e (2026-08): the per-program fixed cost is ~7 us (ONCE L0
            runs 2048 programs = ~14 ms of its 51 ms), but every larger
            (mb, nc) block — mb=256 or nc=16384, even with the bf16
            prefix storage — exceeds the scoped-VMEM budget and fails to
            compile, so 128 x 8192 is the practical optimum.
    Returns:
        tuple of (B, M, nsample_i) int32, CUDA padding semantics.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    sup = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    sup = _pad_to(sup, 2, nc if N > nc else _LANES, _SENTINEL)
    Np = sup.shape[2]
    NC = min(Np, nc)
    n_chunks = Np // NC
    C = NC // _LANES
    if mb is None:
        mb = _MB
    # free row-major reshape: sub-chunk planes (B, 3, Np/128, 128) so the
    # kernel's distance field lives directly in (Mb, C, 128) layout
    sup4 = sup.reshape(B, 3, Np // _LANES, _LANES)

    ctr = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, M)
    ctr = _pad_to(ctr, 2, mb, 0.0)
    Mp = ctr.shape[2]

    grid = (B, Mp // mb, n_chunks)
    outs = pl.pallas_call(
        partial(_bq_kernel, radii, nsamples, n_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, mb), lambda b, m, n: (b, 0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, C, _LANES), lambda b, m, n: (b, 0, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, mb, K), lambda b, m, n: (b, m, 0),
                         memory_space=pltpu.VMEM)
            for K in nsamples
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, Mp, K), jnp.int32) for K in nsamples
        ),
        scratch_shapes=(
            [pltpu.VMEM((mb, K), jnp.int32) for K in nsamples]
            + [pltpu.VMEM((mb, 1), jnp.float32) for _ in nsamples]
        ),
        # see ball_query_multi_pallas_streamed: the AOT compile path's
        # default scoped-vmem limit is tighter than the live path's
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(ctr, sup4)
    return tuple(o[:, :M, :] for o in outs)
