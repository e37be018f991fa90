"""Pallas TPU kernel for the greedy NMS walk.

The XLA ``fori_loop`` greedy selection costs ~130 us per candidate in loop
overhead (34.9 ms for 256 candidates — more than the whole PDA-SSD
forward).  This kernel runs the walk on-chip in running-suppression form:

    keep[i] = valid[i] & !suppressed[i]
    if keep[i]: suppressed |= (iou_row_i > thresh)

which is exactly the score-sorted greedy semantics (a candidate is
suppressed iff some EARLIER kept candidate overlaps it).  The (K, K) IoU
matrix stays in HBM and is streamed through VMEM in 128-row blocks (K can
be the eval NMS_PRE_MAXSIZE=4096 -> the full matrix is 67 MB, far beyond
VMEM); keep/valid/suppressed live as (1, K) lane vectors, and all scalar
reads are lane-masked sums (Mosaic forbids dynamic lane offsets).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 128  # rows per streamed block


def _nms_kernel(thresh, K, iou_ref, valid_ref, keep_ref, blk_ref, sup_ref,
                sem):
    b = pl.program_id(0)  # iou stays a full (B, K, K) HBM ref
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    sup_ref[0, :] = jnp.zeros((K,), jnp.float32)
    keep_ref[0, 0, :] = jnp.zeros((K,), jnp.int32)

    num_blocks = K // _ROWS

    def block_body(blk, _):
        dma = pltpu.make_async_copy(
            iou_ref.at[b, pl.ds(blk * _ROWS, _ROWS), :],
            blk_ref,
            sem,
        )
        dma.start()
        dma.wait()

        def step(r, _):
            i = blk * _ROWS + r
            sup_i = jnp.sum(jnp.where(lin == i, sup_ref[0, :][None, :], 0.0))
            valid_i = jnp.sum(
                jnp.where(lin == i, valid_ref[0, 0, :][None, :], 0)
            )
            keep_i = jnp.where((valid_i > 0) & (sup_i == 0.0), 1, 0)
            keep_ref[0, 0, :] = jnp.where(
                (lin == i)[0], keep_i, keep_ref[0, 0, :]
            )
            row = blk_ref[pl.ds(r, 1), :]  # (1, K)
            new_sup = jnp.maximum(
                sup_ref[0, :], jnp.where(row[0] > thresh, 1.0, 0.0)
            )
            sup_ref[0, :] = jnp.where(keep_i > 0, new_sup, sup_ref[0, :])
            return 0

        jax.lax.fori_loop(0, _ROWS, step, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, num_blocks, block_body, 0, unroll=False)


@partial(jax.jit, static_argnames=("thresh",))
def greedy_nms_mask_pallas(iou, valid, thresh):
    """(B, K, K) f32 x (B, K) bool -> (B, K) bool keep; K % 128 == 0."""
    B, K, _ = iou.shape
    assert K % _ROWS == 0, K
    valid_i = valid.astype(jnp.int32).reshape(B, 1, K)

    keep = pl.pallas_call(
        partial(_nms_kernel, float(thresh), K),
        grid=(B,),
        in_specs=[
            # ANY-space refs must be whole-array with a trivial index map;
            # the kernel slices the batch row itself via program_id.
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, K), jnp.float32),
            pltpu.VMEM((1, K), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(iou.astype(jnp.float32), valid_i)
    return keep.reshape(B, K) > 0
