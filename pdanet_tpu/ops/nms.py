"""Rotated greedy NMS on device (static shapes).

Replaces the CUDA bitmask NMS (``iou3d_nms_kernel.cu:267-311`` + the CPU
walk in ``iou3d_nms.cpp:43-188``) and its wrapper ``nms_gpu``
(``iou3d_nms_utils.py:84-99``).  The candidate set after score threshold +
top-k is small (<= NMS_PRE_MAXSIZE), so the TPU-native design computes the
full (K, K) rotated BEV IoU with the vectorized polygon kernel and runs the
sequential greedy selection as a ``lax.fori_loop`` over a keep mask —
identical outputs to the reference's score-sorted greedy walk.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .rotated_iou import boxes_iou_bev

import numpy as np

# numpy scalar: module import must not initialize the JAX backend
NEG_INF = np.float32(-np.inf)


def greedy_nms_mask(iou, valid, thresh):
    """Greedy suppression over boxes already sorted by descending score.

    Dispatches to the VMEM-resident Pallas walk on TPU (the XLA loop costs
    ~130 us per candidate); both give identical keep masks.

    Args:
        iou: (K, K) pairwise BEV IoU, row/col in score order.
        valid: (K,) bool — candidate mask (score threshold etc.).
        thresh: IoU suppression threshold (keep iff iou <= thresh with all
            previously-kept boxes; the reference suppresses on ``>``).
    Returns:
        keep: (K,) bool mask.
    """
    return greedy_nms_mask_batched(iou[None], valid[None], thresh)[0]


def greedy_nms_mask_batched(iou, valid, thresh):
    """Batched greedy walk: (B, K, K) x (B, K) -> (B, K).

    Dispatches to the Pallas kernel on TPU.  NOTE: the Pallas path cannot
    be called under vmap (its HBM-resident IoU ref forbids batched block
    specs) — batch frames into the leading axis instead.
    """
    if jax.default_backend() == "tpu":
        from .pallas.nms import greedy_nms_mask_pallas

        B, K, _ = iou.shape
        pad = (-K) % 128
        if pad:
            iou = jnp.pad(iou, ((0, 0), (0, pad), (0, pad)))
            valid = jnp.pad(valid, ((0, 0), (0, pad)))
        # keep-mask is discrete: stop_gradient avoids AD requesting a JVP
        # rule for the Pallas call if NMS is ever reached under grad
        keep = greedy_nms_mask_pallas(
            jax.lax.stop_gradient(iou), jax.lax.stop_gradient(valid),
            float(thresh),
        )
        return keep[:, :K]
    return jax.vmap(
        lambda i, v: _greedy_nms_mask_xla(i, v, thresh)
    )(iou, valid)


@partial(jax.jit, static_argnames=("thresh",))
def _greedy_nms_mask_xla(iou, valid, thresh):
    K = iou.shape[0]
    suppress = iou > thresh  # (K, K)
    idx = jnp.arange(K)

    def body(i, keep):
        earlier = idx < i
        hit = jnp.any(keep & earlier & suppress[:, i])
        return keep.at[i].set(valid[i] & ~hit)

    keep0 = jnp.zeros((K,), dtype=bool)
    return jax.lax.fori_loop(0, K, body, keep0)


def nms_rotated(boxes, scores, thresh, pre_maxsize=None, post_maxsize=None,
                score_thresh=None):
    """Score-sorted rotated NMS with fixed-size outputs.

    Mirrors ``model_nms_utils.class_agnostic_nms`` (model_nms_utils.py:6-25)
    fused with ``nms_gpu``: score threshold -> topk(pre_maxsize) -> greedy
    rotated-BEV NMS -> first post_maxsize survivors.

    Args:
        boxes: (N, 7); scores: (N,).
    Returns:
        selected: (post_maxsize,) int32 indices into the input, -1 padded.
        count: () int32 number of valid selections.
        scores_out: (post_maxsize,) selected scores (0 padded).
    """
    N = boxes.shape[0]
    pre = min(pre_maxsize or N, N)
    post = min(post_maxsize or pre, pre)

    valid = jnp.isfinite(scores)
    if score_thresh is not None:
        valid = valid & (scores >= score_thresh)
    masked_scores = jnp.where(valid, scores, NEG_INF)

    order = jnp.argsort(-masked_scores, stable=True)[:pre]
    cand_boxes = boxes[order]
    cand_valid = valid[order]

    iou = boxes_iou_bev(cand_boxes, cand_boxes)
    keep = greedy_nms_mask(iou, cand_valid, float(thresh))

    # Stable-compact the kept candidates (they are already in score order).
    rank = jnp.cumsum(keep) - 1
    sel = jnp.full((post,), -1, dtype=jnp.int32)
    # scatter candidate positions into their compacted slot; non-kept and
    # overflow entries target index `post`, which is dropped
    src = jnp.where(keep & (rank < post), rank, post)
    sel = sel.at[src].set(order.astype(jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(keep), post).astype(jnp.int32)
    sel_scores = jnp.where(sel >= 0, scores[jnp.maximum(sel, 0)], 0.0)
    return sel, count, sel_scores
