"""Pallas TPU kernel: fused block-diagonal neighbor attention.

The PDA transformer (PointFormer.py:7-39) attends over the K<=64 ball-query
neighbors of each center — thousands of independent tiny (K, K) attentions.
flax's einsum formulation is numerically ideal but its head-split
rearrangements ('...qhd,...khd->...hqk') cost ~0.8 ms of pure layout copies
per KITTI b1 forward (device profile, docs/STATUS.md).  XLA-level
reformulations (packed block-diagonal, heads-into-batch) were probed SLOWER
than the einsum form — the copies only disappear inside one kernel.

This kernel receives q/k/v exactly as flax's DenseGeneral emits them —
``(batch..., K, H, hd)``, i.e. rows = flattened (batch, K) tokens and lanes
= H*hd channels, which is ALREADY the layout the projection matmul produces
(no transpose on entry) — and computes softmax(q k^T / sqrt(hd)) v per head
entirely in VMEM:

  - 128-row tiles hold 128/K whole centers (K must divide 128); the (128,
    128) score matrix is masked block-diagonally so centers never attend
    across each other,
  - heads are processed per 128-lane *panel*: with hd=128 a panel is one
    head; with hd=64 two heads share a panel and per-head contraction is
    recovered by lane-masking k (and v) — q's foreign lanes then multiply
    zeros, so one full-width MXU matmul per head yields the exact per-head
    scores with no sub-128 lane slicing,
  - softmax runs in f32 rows (off-block lanes at -1e9 vanish under exp),
  - the attended values accumulate per panel and are written back in the
    same (rows, H*hd) layout flax's out-projection consumes directly.

The grid streams row blocks (default 1024 rows = 32-64 centers) with the
128-row tile loop unrolled inside each program, so per-program fixed costs
amortize.  ``neighbor_attention_flat_trainable`` adds a fused Pallas VJP
(softmax recomputed in-kernel) so training can use the kernel too; the
module-level auto dispatch (models/blocks.py `_pallas_impl`) currently
enables it at **eval on TPU** where profitability is measured, with train
selectable via ``PDANET_ATTENTION_IMPL=pallas``.  Parity (forward and
grads) is oracle-tested in interpret mode.

Measured and rejected (v5e 2026-08-19, tools/probes/train_step_probe.py):
dispatching the kernel + fused VJP at TRAIN time — 29.0 vs flax's 27.2
ms/step at full KITTI b2 shapes.  XLA fuses the einsum backward into the
surrounding graph better than the standalone backward kernel's extra
custom-call boundary + softmax recompute pay for; eval-only dispatch
stands.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG = -1e9


def _attn_kernel(K, hd, n_sub, q_ref, k_ref, v_ref, o_ref):
    """Blocks: q/k/v/o (TR, D) with TR = n_sub*128, D = H*hd."""
    D = q_ref.shape[1]
    scale = 1.0 / math.sqrt(hd)
    ri = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    blk = (ri // K) == (ci // K)  # center-local attention only
    lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    heads_per_panel = _LANES // hd
    for s in range(n_sub):
        r = slice(s * _LANES, (s + 1) * _LANES)
        for p in range(D // _LANES):
            c = slice(p * _LANES, (p + 1) * _LANES)
            qp = q_ref[r, c]
            kp = k_ref[r, c]
            vp = v_ref[r, c]
            qp = qp * jnp.asarray(scale, qp.dtype)
            acc = jnp.zeros((_LANES, _LANES), jnp.float32)
            for h in range(heads_per_panel):
                if heads_per_panel == 1:
                    kh, vh = kp, vp  # panel == head: no lane masking needed
                else:
                    lm = (lane >= h * hd) & (lane < (h + 1) * hd)
                    kh = jnp.where(lm, kp, jnp.zeros_like(kp))
                    vh = jnp.where(lm, vp, jnp.zeros_like(vp))
                sc = jax.lax.dot_general(
                    qp, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sc = jnp.where(blk, sc, _NEG)
                sc = sc - jnp.max(sc, axis=1, keepdims=True)
                e = jnp.exp(sc)
                prob = e / jnp.sum(e, axis=1, keepdims=True)
                acc = acc + jax.lax.dot_general(
                    prob.astype(vp.dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[r, c] = acc.astype(o_ref.dtype)


def _attn_bwd_kernel(K, hd, n_sub, q_ref, k_ref, v_ref, do_ref,
                     dq_ref, dk_ref, dv_ref):
    """Gradient twin of :func:`_attn_kernel` — same blocking, recomputes the
    softmax (cheaper than storing (rows, 128) probability panels in HBM) and
    emits dq/dk/dv in the flat layout.  Per head the standard identities:

        dV = P^T dO,   dP = dO V^T,   dS = P * (dP - rowsum(dP * P)),
        dQ = scale * dS K,   dK = scale * dS^T Q.

    Off-block entries of P are exactly 0 (exp(-1e9 - max) underflows), so
    every cross-center term vanishes without extra masking; with two heads
    per 128-lane panel the dK/dV panels are lane-masked per head (q and dO
    enter unmasked, so their foreign-lane products must not accumulate)."""
    D = q_ref.shape[1]
    scale = 1.0 / math.sqrt(hd)
    ri = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    blk = (ri // K) == (ci // K)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    heads_per_panel = _LANES // hd
    for s in range(n_sub):
        r = slice(s * _LANES, (s + 1) * _LANES)
        for p in range(D // _LANES):
            c = slice(p * _LANES, (p + 1) * _LANES)
            qp = q_ref[r, c]
            kp = k_ref[r, c]
            vp = v_ref[r, c]
            dop = do_ref[r, c]
            qs = qp * jnp.asarray(scale, qp.dtype)
            dq_acc = jnp.zeros((_LANES, _LANES), jnp.float32)
            dk_acc = jnp.zeros((_LANES, _LANES), jnp.float32)
            dv_acc = jnp.zeros((_LANES, _LANES), jnp.float32)
            for h in range(heads_per_panel):
                if heads_per_panel == 1:
                    kh, vh = kp, vp
                    lm = None
                else:
                    lm = (lane >= h * hd) & (lane < (h + 1) * hd)
                    kh = jnp.where(lm, kp, jnp.zeros_like(kp))
                    vh = jnp.where(lm, vp, jnp.zeros_like(vp))
                sc = jax.lax.dot_general(
                    qs, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sc = jnp.where(blk, sc, _NEG)
                sc = sc - jnp.max(sc, axis=1, keepdims=True)
                e = jnp.exp(sc)
                prob = e / jnp.sum(e, axis=1, keepdims=True)
                pl_ = prob.astype(vp.dtype)
                # dV = P^T dO  (contract rows; foreign dO lanes masked below)
                dv_h = jax.lax.dot_general(
                    pl_, dop, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # dP = dO V^T  (v lane-masked -> foreign dO lanes drop out)
                dp = jax.lax.dot_general(
                    dop, vh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = prob * (dp - jnp.sum(dp * prob, axis=1, keepdims=True))
                dss = (ds * scale).astype(qp.dtype)
                dq_acc = dq_acc + jax.lax.dot_general(
                    dss, kh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # kh masked -> dq foreign lanes already zero
                dk_h = jax.lax.dot_general(
                    dss, qp, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if lm is None:
                    dk_acc = dk_acc + dk_h
                    dv_acc = dv_acc + dv_h
                else:
                    dk_acc = dk_acc + jnp.where(lm, dk_h, 0.0)
                    dv_acc = dv_acc + jnp.where(lm, dv_h, 0.0)
            dq_ref[r, c] = dq_acc.astype(dq_ref.dtype)
            dk_ref[r, c] = dk_acc.astype(dk_ref.dtype)
            dv_ref[r, c] = dv_acc.astype(dv_ref.dtype)


def supported_shape(K, H, hd):
    """Kernel eligibility: whole centers per 128-row tile, whole heads per
    128-lane panel.  Every shipped PDA config qualifies (K in {16, 32},
    hd in {64, 128})."""
    return (
        K >= 1 and _LANES % K == 0
        and hd >= 1 and hd <= _LANES and _LANES % hd == 0
        and (H * hd) % _LANES == 0
    )


def profitable_shape(K, H, hd):
    """Dispatch policy (measured on v5e, 2026-08-18): the kernel wins only
    when hd < 128, i.e. when flax's einsum head-split forces sub-128-lane
    relayouts (module-level 0.555->0.451 / 0.937->0.714 ms at the KITTI
    layer-1 geometry, d_model 256).  At hd = 128 the head slices are
    already lane-tile aligned, XLA emits no copies, and flax's compact
    (K, K) softmax beats this kernel's 128-wide masked softmax
    (0.411 vs 0.426 / 0.549 vs 0.629 ms) — so hd=128 stays on flax."""
    return supported_shape(K, H, hd) and hd < _LANES


@partial(jax.jit, static_argnames=("K", "H", "hd", "interpret", "block_rows"))
def neighbor_attention_flat(q2, k2, v2, K, H, hd, interpret=False,
                            block_rows=1024):
    """Fused per-center attention on the FLAT (rows, H*hd) layout.

    This is the layout the q/k/v projection matmuls naturally emit and the
    out projection naturally consumes — rows = flattened (batch..., K)
    tokens.  Entering the kernel flat matters as much as the kernel itself:
    a (batch, M, K, H, hd) tensor has trailing dims (H, hd) which XLA tiles
    to (8, 128), so with H=4, hd=64 every materialization is 4x-padded and
    the custom-call boundary pays ~0.7 ms of relayout copies at KITTI b1
    (measured 2026-08-18; that sank the first, 5-D-interface version of
    this kernel from +0.33 ms saved to -0.3 ms net).

    Args:
        q2, k2, v2: (R, H*hd) with R a multiple of K; rows of one center
            contiguous.
    Returns:
        (R, H*hd) attended values, flax dot_product_attention semantics
        (no mask/bias/dropout).
    """
    R, D = q2.shape
    assert D == H * hd and R % K == 0
    # pad with whole fake centers (zero q/k -> uniform softmax over zero v)
    Rp = -(-R // _LANES) * _LANES
    if Rp != R:
        pad = ((0, Rp - R), (0, 0))
        q2 = jnp.pad(q2, pad)
        k2 = jnp.pad(k2, pad)
        v2 = jnp.pad(v2, pad)
    TR = block_rows
    # scoped-VMEM ceiling (measured on v5e 2026-08-19): at D=512 (hd=128)
    # a 1024-row block compiles to 16.18 MB of stack — 184K over the 16 MB
    # limit.  Scale the block so TR*D stays at the D=256 optimum's budget.
    while TR * D > 1024 * 256 and TR > _LANES:
        TR //= 2
    while Rp % TR:
        TR //= 2
    n_sub = TR // _LANES
    out = pl.pallas_call(
        partial(_attn_kernel, K, hd, n_sub),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec(
            (TR, D), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, D), q2.dtype),
        interpret=interpret,
    )(q2, k2, v2)
    return out[:R]


@partial(jax.jit,
         static_argnames=("K", "H", "hd", "interpret", "block_rows"))
def _neighbor_attention_flat_bwd(q2, k2, v2, do2, K, H, hd, interpret=False,
                                 block_rows=1024):
    """dq/dk/dv of :func:`neighbor_attention_flat` (one fused kernel).
    Padding rows carry zero cotangents, so their gradients are exactly
    zero and the [:R] slice below loses nothing."""
    R, D = q2.shape
    assert D == H * hd and R % K == 0 and do2.shape == q2.shape
    Rp = -(-R // _LANES) * _LANES
    if Rp != R:
        pad = ((0, Rp - R), (0, 0))
        q2, k2, v2, do2 = (jnp.pad(a, pad) for a in (q2, k2, v2, do2))
    TR = block_rows
    # same scoped-VMEM scaling as the forward; the caller already halved
    # block_rows for the backward's 7-vs-4 block tensors
    while TR * D > 1024 * 256 and TR > _LANES:
        TR //= 2
    while Rp % TR:
        TR //= 2
    n_sub = TR // _LANES
    spec = pl.BlockSpec((TR, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_attn_bwd_kernel, K, hd, n_sub),
        grid=(Rp // TR,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((Rp, D), q2.dtype)] * 3,
        interpret=interpret,
    )(q2, k2, v2, do2)
    return tuple(o[:R] for o in outs)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def neighbor_attention_flat_trainable(q2, k2, v2, K, H, hd, interpret=False,
                                      block_rows=1024):
    """:func:`neighbor_attention_flat` with a fused Pallas VJP — the forward
    is byte-identical; under ``jax.grad`` the backward runs
    :func:`_attn_bwd_kernel` (softmax recomputed in-kernel, dq/dk/dv emitted
    in the flat layout) instead of XLA differentiating the einsum form.
    custom_vjp demands positional arguments."""
    return neighbor_attention_flat(
        q2, k2, v2, K=K, H=H, hd=hd,
        interpret=interpret, block_rows=block_rows,
    )


def _nat_fwd(q2, k2, v2, K, H, hd, interpret, block_rows):
    out = neighbor_attention_flat(
        q2, k2, v2, K=K, H=H, hd=hd,
        interpret=interpret, block_rows=block_rows,
    )
    return out, (q2, k2, v2)


def _nat_bwd(K, H, hd, interpret, block_rows, res, g):
    # 7 block tensors live in VMEM (q/k/v/do/dq/dk/dv) vs the forward's 4;
    # halve the row block so the backward stays inside the same ~4-6 MB
    # scoped-VMEM budget the ball-query kernel measured on v5e
    return _neighbor_attention_flat_bwd(
        *res, g, K=K, H=H, hd=hd,
        interpret=interpret, block_rows=max(block_rows // 2, _LANES),
    )


neighbor_attention_flat_trainable.defvjp(_nat_fwd, _nat_bwd)


def neighbor_attention(q, k, v, interpret=False, block_rows=1024):
    """5-D convenience wrapper (oracle tests): (batch..., K, H, hd) in the
    flax MultiHeadDotProductAttention post-projection layout.  Production
    code should use :func:`neighbor_attention_flat` — see its layout note."""
    *batch, K, H, hd = q.shape
    D = H * hd
    out = neighbor_attention_flat(
        q.reshape(-1, D), k.reshape(-1, D), v.reshape(-1, D),
        K=K, H=H, hd=hd, interpret=interpret, block_rows=block_rows,
    )
    return out.reshape(q.shape)
