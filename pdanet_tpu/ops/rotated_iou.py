"""Rotated BEV overlap / IoU as a branch-free vectorized XLA kernel.

Replaces the CUDA polygon-clip kernels
(``pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:15-265``).  The reference
enumerates up to 16 edge-pair intersections + 8 contained corners per box
pair, sorts them around the polygon centroid, and sums a triangle fan.

TPU layout: every per-pair quantity lives on an (N, M) plane (pairs ride
the lane dimension) and the 24-candidate axis is a leading, statically
unrolled dimension — the earlier (N, M, 24, 2) form put tiny axes on the
lanes (padded to 128) and ran ~40x slower.  The angular ordering is a
multi-operand stable ``lax.sort`` along the major candidate axis.

Numerics match the CUDA code (float32, EPS = 1e-8, corner-containment
margin 1e-2, strict/inclusive comparisons preserved), so per-pair results
agree with the reference to float rounding.
"""

from functools import partial

import jax
import jax.numpy as jnp

EPS = 1e-8


def box_corners_bev(boxes):
    """(K, 7) -> x (K, 4), y (K, 4) BEV corners, reference ordering.

    Corner order before rotation: (x1,y1), (x2,y1), (x2,y2), (x1,y2)
    (iou3d_nms_kernel.cu:124-134), then rotated around the box center by
    the heading angle (rotate_around_center, :94-98).
    """
    cx = boxes[..., 0]
    cy = boxes[..., 1]
    hx = boxes[..., 3] / 2.0
    hy = boxes[..., 4] / 2.0
    sx = jnp.stack([-hx, hx, hx, -hx], axis=-1)
    sy = jnp.stack([-hy, -hy, hy, hy], axis=-1)
    c = jnp.cos(boxes[..., 6])[..., None]
    s = jnp.sin(boxes[..., 6])[..., None]
    px = sx * c - sy * s + cx[..., None]
    py = sx * s + sy * c + cy[..., None]
    return px, py


def _pair_overlap_planes(boxes_a, boxes_b, self_pair=False):
    """(N, 7) x (M, 7) -> (N, M) rotated BEV overlap areas.

    ``self_pair=True`` (N == M, boxes_a and boxes_b the same set, e.g.
    the NMS suppression matrix) computes the corner/trig tensors ONCE
    and reuses exact views for the b side.  Under jit the two operands
    are distinct parameters, so the two corner computations can never
    be CSE-merged and may be FMA-contracted differently — leaving
    "identical" boxes with corners an ulp apart, whose near-coincident
    edges then have genuinely ill-conditioned crossing points that land
    anywhere (observed: deterministic self-IoU 0.85 on the CPU
    backend).  With shared tensors, coincident corners subtract to
    IEEE-exact zeros, which survive any contraction (0*x - y*0 == 0),
    so every degenerate cross product is exactly 0 as in the serial
    CUDA reference."""
    ax, ay = box_corners_bev(boxes_a)  # (N, 4)
    if self_pair:
        bx, by = ax, ay
    else:
        bx, by = box_corners_bev(boxes_b)  # (M, 4)
    # Pin the corner tensors to a single evaluation: XLA's fusion may
    # otherwise duplicate the corner math into different consumers with
    # different FMA-contraction choices, leaving bitwise-identical boxes
    # with corners an ulp apart — which turns the exactly-zero cross
    # products of coincident edges into sign-random noise that the
    # strict s1*s2 > 0 crossing test then admits as garbage
    # intersection points (batch-shape-dependent!).  With ONE pinned
    # evaluation, coincident corners subtract to exact zeros and every
    # degenerate cross product is exactly 0, as in the serial CUDA
    # reference.  Cost: four (K, 4) tensors — negligible.
    ax, ay, bx, by = jax.lax.optimization_barrier((ax, ay, bx, by))

    # XLA:CPU additionally duplicates the per-pair product arithmetic
    # itself into each consumer fusion with different contraction
    # choices, so even pinned corners leave a*b - c*d on coincident
    # edges as sign-random FMA residue instead of exact 0, admitting
    # deterministic garbage polygon points (observed: identical boxes
    # scoring IoU 0.85/1.70 depending on batch shape).  On CPU — the
    # test/fallback backend, where throughput is irrelevant — pin every
    # product pair so each difference-of-products is computed from one
    # rounded evaluation of each product: bitwise-equal operands then
    # subtract to exact 0 in EVERY consumer, restoring the serial CUDA
    # reference's exact-zero degenerate behavior.  The TPU path keeps
    # the fused arithmetic (measured correct there; additionally
    # bounded by the min-area clamp below).
    _pin = jax.default_backend() == "cpu"

    def dprod(a, b, c, d):
        """a*b - c*d with contraction-safe exact-tie zeros on CPU."""
        p = a * b
        q = c * d
        if _pin:
            p, q = jax.lax.optimization_barrier((p, q))
        return p - q

    def A(c):  # corner c of a as (N, 1)
        return ax[:, c : c + 1], ay[:, c : c + 1]

    def Bc(c):  # corner c of b as (1, M)
        return bx[None, :, c], by[None, :, c]

    cand_x, cand_y, cand_v = [], [], []

    # 16 edge-pair intersections (check_rect_cross + intersection,
    # iou3d_nms_kernel.cu:43-92), i-major j-minor order (:160-174)
    for i in range(4):
        p0x, p0y = A(i)
        p1x, p1y = A((i + 1) % 4)
        for j in range(4):
            q0x, q0y = Bc(j)
            q1x, q1y = Bc((j + 1) % 4)

            rect = (
                (jnp.minimum(p0x, p1x) <= jnp.maximum(q0x, q1x))
                & (jnp.minimum(q0x, q1x) <= jnp.maximum(p0x, p1x))
                & (jnp.minimum(p0y, p1y) <= jnp.maximum(q0y, q1y))
                & (jnp.minimum(q0y, q1y) <= jnp.maximum(p0y, p1y))
            )

            def cross3(x1, y1, x2, y2, x0, y0):
                return dprod(x1 - x0, y2 - y0, x2 - x0, y1 - y0)

            s1 = cross3(q0x, q0y, p1x, p1y, p0x, p0y)
            s2 = cross3(p1x, p1y, q1x, q1y, p0x, p0y)
            s3 = cross3(p0x, p0y, q1x, q1y, q0x, q0y)
            s4 = cross3(q1x, q1y, p1x, p1y, q0x, q0y)
            valid = rect & (s1 * s2 > 0) & (s3 * s4 > 0)

            s5 = cross3(q1x, q1y, p1x, p1y, p0x, p0y)
            use_fast = jnp.abs(s5 - s1) > EPS
            denom_fast = jnp.where(use_fast, s5 - s1, 1.0)
            fast_x = dprod(s5, q0x, s1, q1x) / denom_fast
            fast_y = dprod(s5, q0y, s1, q1y) / denom_fast

            a0 = p0y - p1y
            b0 = p1x - p0x
            c0 = dprod(p0x, p1y, p1x, p0y)
            a1 = q0y - q1y
            b1 = q1x - q0x
            c1 = dprod(q0x, q1y, q1x, q0y)
            D = dprod(a0, b1, a1, b0)
            D_safe = jnp.where(jnp.abs(D) > 0, D, 1.0)
            slow_x = dprod(b0, c1, b1, c0) / D_safe
            slow_y = dprod(a1, c0, a0, c1) / D_safe

            # FMA-contraction guard: in exact arithmetic a valid crossing
            # (s-products > 0) implies non-parallel edges, i.e. a usable
            # denominator.  Under jit the compiler may contract the cross
            # products into FMAs, flipping exact zeros on touching/parallel
            # edges to tiny +/- noise and admitting garbage slow-path
            # points.  The threshold must be RELATIVE: on exactly
            # coincident edges (identical boxes) D = a0*b1 - a1*b0 with
            # bitwise-equal products, whose FMA residue (~6e-8 relative
            # to the product scale) exceeds the absolute EPS at KITTI
            # coordinate scale while the slow numerators contract to
            # exact 0 — a deterministic off-line (0, 0) garbage point.
            # Any evaluation of a pure residue stays below 1e-5 of the
            # product scale, so this test is False in EVERY fusion's
            # recompute; a true crossing with relative determinant
            # below 1e-5 is beyond f32 conditioning anyway (the CUDA
            # reference's serial exact zeros fail s1*s2 > 0 there).
            D_scale = jnp.abs(a0 * b1) + jnp.abs(a1 * b0)
            valid = valid & (use_fast | (jnp.abs(D) > 1e-5 * D_scale))

            ix = jnp.where(use_fast, fast_x, slow_x)
            iy = jnp.where(use_fast, fast_y, slow_y)
            # Second FMA guard: EXACTLY-overlapping edges (identical
            # boxes) can still pass both tests on contraction noise with
            # a garbage noise/noise-ratio point, and which pairs slip
            # through varies with batch shape (fusion-dependent codegen
            # — XLA freely duplicates this arithmetic into each
            # consumer with different contraction choices, so a filter
            # computed from a RErun of ix would not see the value that
            # gets stored).  Pin one evaluation, then reject pinned
            # points outside the two segments' AABBs: a true crossing
            # always lies inside both (fp32 rounding at KITTI
            # coordinate scale is ~1e-5, margin 1e-3), so only
            # geometrically impossible candidates are removed.
            ix, iy, valid = jax.lax.optimization_barrier(
                (ix, iy, valid))
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

            cand_x.append(jnp.where(valid, ix, 0.0))
            cand_y.append(jnp.where(valid, iy, 0.0))
            cand_v.append(valid)

    # contained corners (check_in_box2d, :51-61), per corner k: b_k-in-a
    # then a_k-in-b (:176-194)
    MARGIN = 1e-2
    a_cx = boxes_a[:, 0:1]
    a_cy = boxes_a[:, 1:2]
    a_hx = boxes_a[:, 3:4] / 2.0
    a_hy = boxes_a[:, 4:5] / 2.0
    a_cos = jnp.cos(-boxes_a[:, 6:7])
    a_sin = jnp.sin(-boxes_a[:, 6:7])
    if self_pair:  # exact transposed views of the a-side tensors
        b_cx, b_cy, b_hx, b_hy, b_cos, b_sin = (
            t[:, 0][None, :]
            for t in (a_cx, a_cy, a_hx, a_hy, a_cos, a_sin)
        )
    else:
        b_cx = boxes_b[None, :, 0]
        b_cy = boxes_b[None, :, 1]
        b_hx = boxes_b[None, :, 3] / 2.0
        b_hy = boxes_b[None, :, 4] / 2.0
        b_cos = jnp.cos(-boxes_b[None, :, 6])
        b_sin = jnp.sin(-boxes_b[None, :, 6])

    for k in range(4):
        # corner k of b inside box a
        px, py = Bc(k)
        dx = px - a_cx
        dy = py - a_cy
        rx = dx * a_cos - dy * a_sin
        ry = dx * a_sin + dy * a_cos
        inside = (jnp.abs(rx) < a_hx + MARGIN) & (jnp.abs(ry) < a_hy + MARGIN)
        cand_x.append(jnp.where(inside, jnp.broadcast_to(px, inside.shape), 0.0))
        cand_y.append(jnp.where(inside, jnp.broadcast_to(py, inside.shape), 0.0))
        cand_v.append(inside)
        # corner k of a inside box b
        px, py = A(k)
        dx = px - b_cx
        dy = py - b_cy
        rx = dx * b_cos - dy * b_sin
        ry = dx * b_sin + dy * b_cos
        inside = (jnp.abs(rx) < b_hx + MARGIN) & (jnp.abs(ry) < b_hy + MARGIN)
        cand_x.append(jnp.where(inside, jnp.broadcast_to(px, inside.shape), 0.0))
        cand_y.append(jnp.where(inside, jnp.broadcast_to(py, inside.shape), 0.0))
        cand_v.append(inside)

    xs = jnp.stack(cand_x, axis=0)  # (24, N, M)
    ys = jnp.stack(cand_y, axis=0)
    vs = jnp.stack(cand_v, axis=0)

    cnt = jnp.sum(vs, axis=0)
    cnt_safe = jnp.maximum(cnt, 1).astype(xs.dtype)
    cx0 = jnp.sum(jnp.where(vs, xs, 0.0), axis=0) / cnt_safe
    cy0 = jnp.sum(jnp.where(vs, ys, 0.0), axis=0) / cnt_safe

    ang = jnp.arctan2(ys - cy0[None], xs - cx0[None])
    ang = jnp.where(vs, ang, jnp.inf)
    # stable sort along the candidate axis (major dim: lane-parallel on
    # TPU).  The multi-operand lax.sort is ~20x faster than argsort +
    # 3 gathers on TPU, but produced wrong co-sorting for batched operands
    # on the CPU backend (XLA:CPU variadic-sort bug) — dispatch per backend.
    if jax.default_backend() == "tpu":
        _, xs_s, ys_s, vs_i = jax.lax.sort(
            (ang, xs, ys, vs.astype(jnp.int32)), dimension=0, num_keys=1,
            is_stable=True,
        )
        vs_s = vs_i > 0
    else:
        order = jnp.argsort(ang, axis=0, stable=True)
        xs_s = jnp.take_along_axis(xs, order, axis=0)
        ys_s = jnp.take_along_axis(ys, order, axis=0)
        vs_s = jnp.take_along_axis(vs, order, axis=0)

    x0 = xs_s[0:1]
    y0 = ys_s[0:1]
    xf = jnp.where(vs_s, xs_s, x0)
    yf = jnp.where(vs_s, ys_s, y0)
    vx = xf - x0
    vy = yf - y0
    tri = vx[:-1] * vy[1:] - vx[1:] * vy[:-1]
    area = jnp.abs(jnp.sum(tri, axis=0)) / 2.0
    # Degenerate-tie guard: identical boxes make every candidate an exact
    # duplicate vertex, and backend-dependent tie ordering in the angular
    # sort can fan the duplicated polygon into a larger one (the CPU
    # argsort fallback produced overlap > area, i.e. IoU > 1).  The true
    # rotated intersection can never exceed either box's own area, so
    # clamping to min(area_a, area_b) is exact on every non-degenerate
    # pair and bounds the public op (IoU <= 1) on every backend.  The
    # CUDA reference (iou3d_nms_kernel.cu:236-265) needs no clamp only
    # because its serial scalar ordering never splits exact ties.
    cap = jnp.minimum(
        (boxes_a[:, 3] * boxes_a[:, 4])[:, None],
        (boxes_b[None, :, 3] * boxes_b[None, :, 4]),
    )
    return jnp.where(cnt > 0, jnp.minimum(area, cap), 0.0)


@partial(jax.jit, static_argnames=("self_pair",))
def boxes_overlap_bev(boxes_a, boxes_b, self_pair=False):
    """Pairwise rotated BEV overlap area.

    Args:
        boxes_a: (N, 7), boxes_b: (M, 7)
        self_pair: static flag — boxes_a and boxes_b are the same box
            set (exact degenerate-tie handling on the diagonal; see
            ``_pair_overlap_planes``).  Auto-detected by
            ``boxes_iou_bev`` when both arguments are the same array.
    Returns:
        (N, M) float32 overlap areas.
    """
    boxes_a = boxes_a.astype(jnp.float32)
    boxes_b = boxes_a if self_pair else boxes_b.astype(jnp.float32)
    return _pair_overlap_planes(boxes_a, boxes_b, self_pair=self_pair)


def boxes_iou_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV IoU (iou_bev, iou3d_nms_kernel.cu:227-234)."""
    self_pair = boxes_a is boxes_b
    sa = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    sb = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    overlap = boxes_overlap_bev(boxes_a, boxes_b, self_pair=self_pair)
    return overlap / jnp.maximum(sa + sb - overlap, EPS)


def boxes_iou_bev_batched_self(boxes):
    """(B, K, 7) -> (B, K, K) self-IoU — the NMS suppression matrix.

    Dispatches to the VMEM-tiled Pallas kernel on TPU at NMS scale
    (K >= 256: r4 measured the ONCE K=1024 win — e2e 87.9 -> 66.7 ms;
    r5 measured KITTI's K=256 — b1 e2e 6.44 -> 6.11 ms, b8 53.1 -> 50.4
    ms, outputs bitwise identical — so the gate sits at the kernel's
    K-tile floor), and to the vmapped XLA kernel elsewhere.  NMS
    consumption is discrete, hence the stop_gradient."""
    import os

    impl = os.environ.get("PDANET_IOU_IMPL")
    if (
        jax.default_backend() == "tpu"
        and (boxes.shape[1] >= 256 or impl == "pallas")
        and impl != "xla"
    ):
        from .pallas.rotated_iou import boxes_iou_bev_self_pallas

        return boxes_iou_bev_self_pallas(jax.lax.stop_gradient(boxes))
    return jax.vmap(lambda b: boxes_iou_bev(b, b))(boxes)


def boxes_iou3d(boxes_a, boxes_b):
    """Pairwise 3-D IoU = BEV overlap x height overlap
    (``iou3d_nms_utils.boxes_iou3d_gpu``, iou3d_nms_utils.py:48-81)."""
    a_hmax = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_hmin = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_hmax = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_hmin = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]

    overlaps_bev = boxes_overlap_bev(
        boxes_a, boxes_b, self_pair=boxes_a is boxes_b)
    overlaps_h = jnp.clip(
        jnp.minimum(a_hmax, b_hmax) - jnp.maximum(a_hmin, b_hmin), min=0
    )
    overlaps_3d = overlaps_bev * overlaps_h

    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlaps_3d / jnp.clip(vol_a + vol_b - overlaps_3d, min=1e-6)


def paired_boxes_iou3d(boxes_a, boxes_b):
    """Row-aligned 3-D IoU: (N, 7) x (N, 7) -> (N,).

    The reference exposes this as ``loss_utils.generate_iou3d`` (paired
    boxes_iou3d over matched rows) for the IoU3D head loss; a vmapped 1x1
    pairwise call keeps one geometry implementation."""
    f = jax.vmap(lambda a, b: boxes_iou3d(a[None, :], b[None, :])[0, 0])
    return f(boxes_a, boxes_b)
