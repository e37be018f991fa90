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
amortize.  Wired in as ``nn.MultiHeadDotProductAttention(attention_fn=...)``
at **eval on TPU only** — training keeps flax's differentiable path (the
kernel carries no VJP), and parity is oracle-tested in interpret mode.
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
