"""VMEM-tiled rotated BEV self-IoU — the NMS matrix kernel.

The XLA formulation (``ops/rotated_iou.py``) materializes the
24-candidate intersection tensors in HBM and angular-sorts them with a
multi-operand ``lax.sort`` — at NMS scale (ONCE: 1024 candidates/frame)
that is ~100 MB per intermediate and the sort alone costs 6.2 ms of the
87.9 ms e2e (xplane, docs/STATUS.md r4 floor table).  This kernel
computes the same math per (TR, 128) pair tile entirely in VMEM: the
candidate planes never touch HBM and the angular ordering is an unrolled
Batcher odd-even merge network, so only the (K, K) IoU tile is written.

Two kernel-local substitutions, both order/value-preserving:

* ``atan2`` (no Mosaic lowering) -> the **diamond pseudo-angle**
  ``p = dy/(|dx|+|dy|)`` quadrant-folded to [-2, 2): strictly monotone in
  the true angle with the SAME -pi branch cut as atan2, so the sorted
  order matches the XLA path's up to fp rounding of exact ties (ties are
  duplicate vertices — area-neutral either way).
* the stable ``lax.sort`` -> a compare-exchange network (Batcher
  odd-even mergesort over 32 slots, comparators touching the 8 virtual
  +inf slots pruned — a valid simplification because a min-to-lower
  comparator never moves +inf down).

Geometry formulas are the same CUDA-semantics set as the XLA kernel
(``iou3d_nms_kernel.cu:15-265``: check_rect_cross + s-product validity +
fast/slow intersection with the FMA guard, corner containment with the
1e-2 margin, centroid fan).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8
MARGIN = 1e-2
_INVALID_KEY = 8.0  # > max pseudo-angle (2.0): sorts after every valid


def _oddeven_pairs(n_real, n_pow2=32):
    """Batcher odd-even mergesort comparator list for the first
    ``n_real`` slots of an ``n_pow2`` network (virtual +inf tail pruned)."""
    pairs = []

    def merge(lo, n, r):
        step = r * 2
        if step < n:
            merge(lo, n, step)
            merge(lo + r, n, step)
            for i in range(lo + r, lo + n - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, n):
        if n > 1:
            m = n // 2
            sort(lo, m)
            sort(lo + m, m)
            merge(lo, n, 1)

    sort(0, n_pow2)
    return [(i, j) for (i, j) in pairs if i < n_real and j < n_real]


def _pseudo_angle(dy, dx):
    """Monotone atan2 surrogate on [-2, 2) with the same -pi branch cut.

    The half-plane fold uses ``signbit`` rather than ``dy >= 0`` so that
    ``dy == -0.0`` lands on the lower branch (-2.0), exactly matching
    ``atan2(-0.0, dx < 0) == -pi`` — ``-0.0 >= 0`` is True and would
    otherwise map signed-zero ties to +2.0."""
    denom = jnp.abs(dx) + jnp.abs(dy)
    r = dy / jnp.where(denom > 0, denom, 1.0)
    return jnp.where(
        dx >= 0, r, jnp.where(jnp.signbit(dy), -2.0 - r, 2.0 - r)
    )


def _corners(cx, cy, hx, hy, cos_t, sin_t):
    """Reference corner ordering (iou3d_nms_kernel.cu:124-134)."""
    out = []
    for sxs, sys in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        sx = sxs * hx
        sy = sys * hy
        out.append((sx * cos_t - sy * sin_t + cx,
                    sx * sin_t + sy * cos_t + cy))
    return out


def _iou_tile_kernel(thresh_unused, a_ref, b_ref, out_ref):
    a = a_ref[0]  # (TR, 7)
    b = b_ref[0]  # (7, 128)

    def ac(c):
        return a[:, c:c + 1]  # (TR, 1)

    def bc(c):
        return b[c:c + 1, :]  # (1, 128)

    a_cos = jnp.cos(ac(6))
    a_sin = jnp.sin(ac(6))
    b_cos = jnp.cos(bc(6))
    b_sin = jnp.sin(bc(6))
    A = _corners(ac(0), ac(1), ac(3) / 2.0, ac(4) / 2.0, a_cos, a_sin)
    Bv = _corners(bc(0), bc(1), bc(3) / 2.0, bc(4) / 2.0, b_cos, b_sin)

    cand = []  # (x, y, valid) planes, i-major j-minor reference order

    def cross3(x1, y1, x2, y2, x0, y0):
        return (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)

    for i in range(4):
        p0x, p0y = A[i]
        p1x, p1y = A[(i + 1) % 4]
        for j in range(4):
            q0x, q0y = Bv[j]
            q1x, q1y = Bv[(j + 1) % 4]
            rect = (
                (jnp.minimum(p0x, p1x) <= jnp.maximum(q0x, q1x))
                & (jnp.minimum(q0x, q1x) <= jnp.maximum(p0x, p1x))
                & (jnp.minimum(p0y, p1y) <= jnp.maximum(q0y, q1y))
                & (jnp.minimum(q0y, q1y) <= jnp.maximum(p0y, p1y))
            )
            s1 = cross3(q0x, q0y, p1x, p1y, p0x, p0y)
            s2 = cross3(p1x, p1y, q1x, q1y, p0x, p0y)
            s3 = cross3(p0x, p0y, q1x, q1y, q0x, q0y)
            s4 = cross3(q1x, q1y, p1x, p1y, q0x, q0y)
            valid = rect & (s1 * s2 > 0) & (s3 * s4 > 0)

            s5 = cross3(q1x, q1y, p1x, p1y, p0x, p0y)
            use_fast = jnp.abs(s5 - s1) > EPS
            denom_fast = jnp.where(use_fast, s5 - s1, 1.0)
            fast_x = (s5 * q0x - s1 * q1x) / denom_fast
            fast_y = (s5 * q0y - s1 * q1y) / denom_fast

            a0 = p0y - p1y
            b0 = p1x - p0x
            c0 = p0x * p1y - p1x * p0y
            a1 = q0y - q1y
            b1 = q1x - q0x
            c1 = q0x * q1y - q1x * q0y
            D = a0 * b1 - a1 * b0
            D_safe = jnp.where(jnp.abs(D) > 0, D, 1.0)
            slow_x = (b0 * c1 - b1 * c0) / D_safe
            slow_y = (a1 * c0 - a0 * c1) / D_safe
            # relative |D| threshold: rejects the FMA-residue
            # determinants of exactly-coincident edges in every
            # recompute (same rationale as ops/rotated_iou.py)
            D_scale = jnp.abs(a0 * b1) + jnp.abs(a1 * b0)
            valid = valid & (use_fast | (jnp.abs(D) > 1e-5 * D_scale))

            ix = jnp.where(use_fast, fast_x, slow_x)
            iy = jnp.where(use_fast, fast_y, slow_y)
            # on-segment guard against FMA-noise garbage points on
            # exactly-overlapping edges (same guard + rationale as
            # ops/rotated_iou.py)
            GM = 1e-3
            on_seg = (
                (ix >= jnp.minimum(p0x, p1x) - GM)
                & (ix <= jnp.maximum(p0x, p1x) + GM)
                & (iy >= jnp.minimum(p0y, p1y) - GM)
                & (iy <= jnp.maximum(p0y, p1y) + GM)
                & (ix >= jnp.minimum(q0x, q1x) - GM)
                & (ix <= jnp.maximum(q0x, q1x) + GM)
                & (iy >= jnp.minimum(q0y, q1y) - GM)
                & (iy <= jnp.maximum(q0y, q1y) + GM)
            )
            valid = valid & on_seg

            cand.append((
                jnp.where(valid, ix, 0.0),
                jnp.where(valid, iy, 0.0),
                valid,
            ))

    for k in range(4):
        qx, qy = Bv[k]
        dx = qx - ac(0)
        dy = qy - ac(1)
        rx = dx * a_cos + dy * a_sin  # rotate by -angle
        ry = -dx * a_sin + dy * a_cos
        inside = (jnp.abs(rx) < ac(3) / 2.0 + MARGIN) & (
            jnp.abs(ry) < ac(4) / 2.0 + MARGIN)
        zeros = jnp.zeros(inside.shape, jnp.float32)
        cand.append((jnp.where(inside, qx + zeros, 0.0),
                     jnp.where(inside, qy + zeros, 0.0), inside))
        px, py = A[k]
        dx = px - bc(0)
        dy = py - bc(1)
        rx = dx * b_cos + dy * b_sin
        ry = -dx * b_sin + dy * b_cos
        inside = (jnp.abs(rx) < bc(3) / 2.0 + MARGIN) & (
            jnp.abs(ry) < bc(4) / 2.0 + MARGIN)
        cand.append((jnp.where(inside, px + zeros, 0.0),
                     jnp.where(inside, py + zeros, 0.0), inside))

    cnt = sum(v.astype(jnp.float32) for _, _, v in cand)
    cnt_safe = jnp.maximum(cnt, 1.0)
    cx0 = sum(x for x, _, _ in cand) / cnt_safe
    cy0 = sum(y for _, y, _ in cand) / cnt_safe

    keys = [jnp.where(v, _pseudo_angle(y - cy0, x - cx0), _INVALID_KEY)
            for x, y, v in cand]
    xs = [x for x, _, _ in cand]
    ys = [y for _, y, _ in cand]

    for i, j in _oddeven_pairs(len(cand)):
        swap = keys[j] < keys[i]
        keys[i], keys[j] = (jnp.where(swap, keys[j], keys[i]),
                            jnp.where(swap, keys[i], keys[j]))
        xs[i], xs[j] = (jnp.where(swap, xs[j], xs[i]),
                        jnp.where(swap, xs[i], xs[j]))
        ys[i], ys[j] = (jnp.where(swap, ys[j], ys[i]),
                        jnp.where(swap, ys[i], ys[j]))

    vsorted = [k < _INVALID_KEY / 2 for k in keys]
    x0 = xs[0]
    y0 = ys[0]
    area2 = jnp.zeros(x0.shape, jnp.float32)
    vx_prev = jnp.zeros_like(x0)
    vy_prev = jnp.zeros_like(y0)
    for i in range(1, len(cand)):
        vx = jnp.where(vsorted[i], xs[i], x0) - x0
        vy = jnp.where(vsorted[i], ys[i], y0) - y0
        area2 = area2 + (vx_prev * vy - vx * vy_prev)
        vx_prev, vy_prev = vx, vy
    area = jnp.where(cnt > 0, jnp.abs(area2) / 2.0, 0.0)

    sa = ac(3) * ac(4)
    sb = bc(3) * bc(4)
    # min-area clamp: bounds IoU <= 1 under exact-duplicate vertex ties
    # (same guard as ops/rotated_iou.py — true overlap never exceeds
    # either box's own area)
    area = jnp.minimum(area, jnp.minimum(sa, sb))
    out_ref[0] = area / jnp.maximum(sa + sb - area, EPS)


@partial(jax.jit, static_argnames=("tr",))
def boxes_iou_bev_self_pallas(boxes, tr=128):
    """(B, K, 7) -> (B, K, K) pairwise rotated BEV self-IoU (NMS matrix).

    Non-differentiable by use (NMS); zero-padded rows produce IoU 0.
    """
    B, K, _ = boxes.shape
    boxes = boxes.astype(jnp.float32)
    pad = (-K) % 128
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
    Kp = boxes.shape[1]
    tr = min(tr, Kp)
    bT = jnp.transpose(boxes, (0, 2, 1))  # (B, 7, Kp)

    out = pl.pallas_call(
        partial(_iou_tile_kernel, None),
        grid=(B, Kp // tr, Kp // 128),
        in_specs=[
            pl.BlockSpec((1, tr, 7), lambda b, m, n: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, 128), lambda b, m, n: (b, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, 128), lambda b, m, n: (b, m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Kp, Kp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(boxes, bT)
    return out[:, :K, :K]
