"""Pure-numpy oracles implementing the reference CUDA kernels literally.

Each function transcribes the scan-order / tie-break / padding semantics of
the corresponding reference kernel with plain Python loops, to serve as the
ground truth for the vectorized XLA/Pallas implementations.
"""

import math

import numpy as np


def fps_oracle(xyz, npoint):
    """sampling_gpu.cu:94-209 (first index 0, temp=1e10, first-max ties)."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        temp = np.full(N, 1e10, dtype=np.float32)
        old = 0
        for j in range(1, npoint):
            d = np.sum((xyz[b] - xyz[b, old]) ** 2, axis=-1).astype(np.float32)
            temp = np.minimum(temp, d)
            old = int(np.argmax(temp))
            out[b, j] = old
    return out


def fps_with_dist_oracle(dist, npoint):
    B, N, _ = dist.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        temp = np.full(N, 1e10, dtype=np.float32)
        old = 0
        for j in range(1, npoint):
            temp = np.minimum(temp, dist[b, old].astype(np.float32))
            old = int(np.argmax(temp))
            out[b, j] = old
    return out


def ball_query_oracle(radius, nsample, xyz, new_xyz):
    """ball_query_gpu.cu:9-45 (first-hit prefill, zero-hit -> 0)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), dtype=np.int32)
    r2 = radius * radius
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d2 = float(np.sum((new_xyz[b, m] - xyz[b, k]) ** 2))
                if d2 < r2:
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


def ball_query_dilated_oracle(max_radius, min_radius, nsample, xyz, new_xyz):
    """ball_query_gpu.cu:70-117 (double-count at d2==0 when min_radius==0)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), dtype=np.int32)
    r1 = max_radius * max_radius
    r2 = min_radius * min_radius
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d2 = float(np.sum((new_xyz[b, m] - xyz[b, k]) ** 2))
                if d2 == 0:
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
                if r2 <= d2 < r1:
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


def points_in_boxes_oracle(points, boxes):
    """roiaware_pool3d_kernel.cu:313-336 (first hit, -1 background)."""
    B, N, _ = points.shape
    M = boxes.shape[1]
    out = np.full((B, N), -1, dtype=np.int32)
    for b in range(B):
        for n in range(N):
            x, y, z = points[b, n]
            for m in range(M):
                cx, cy, cz, dx, dy, dz, rz = boxes[b, m, :7]
                if abs(z - cz) > dz / 2.0:
                    continue
                cosa, sina = math.cos(-rz), math.sin(-rz)
                lx = (x - cx) * cosa + (y - cy) * (-sina)
                ly = (x - cx) * sina + (y - cy) * cosa
                if abs(lx) < dx / 2.0 + 1e-5 and abs(ly) < dy / 2.0 + 1e-5:
                    out[b, n] = m
                    break
    return out


# ----- rotated BEV overlap (iou3d_nms_kernel.cu:15-234), literal port -----

_EPS = 1e-8


def _cross(p1, p2, p0):
    return (p1[0] - p0[0]) * (p2[1] - p0[1]) - (p2[0] - p0[0]) * (p1[1] - p0[1])


def _check_rect_cross(p1, p2, q1, q2):
    return (
        min(p1[0], p2[0]) <= max(q1[0], q2[0])
        and min(q1[0], q2[0]) <= max(p1[0], p2[0])
        and min(p1[1], p2[1]) <= max(q1[1], q2[1])
        and min(q1[1], q2[1]) <= max(p1[1], p2[1])
    )


def _intersection(p1, p0, q1, q0):
    if not _check_rect_cross(p0, p1, q0, q1):
        return None
    s1 = _cross(q0, p1, p0)
    s2 = _cross(p1, q1, p0)
    s3 = _cross(p0, q1, q0)
    s4 = _cross(q1, p1, q0)
    if not (s1 * s2 > 0 and s3 * s4 > 0):
        return None
    s5 = _cross(q1, p1, p0)
    if abs(s5 - s1) > _EPS:
        x = (s5 * q0[0] - s1 * q1[0]) / (s5 - s1)
        y = (s5 * q0[1] - s1 * q1[1]) / (s5 - s1)
    else:
        a0, b0 = p0[1] - p1[1], p1[0] - p0[0]
        c0 = p0[0] * p1[1] - p1[0] * p0[1]
        a1, b1 = q0[1] - q1[1], q1[0] - q0[0]
        c1 = q0[0] * q1[1] - q1[0] * q0[1]
        D = a0 * b1 - a1 * b0
        x = (b0 * c1 - b1 * c0) / D
        y = (a1 * c0 - a0 * c1) / D
    return np.array([x, y])


def _check_in_box2d(box, p):
    MARGIN = 1e-2
    cx, cy, angle = box[0], box[1], box[6]
    c, s = math.cos(-angle), math.sin(-angle)
    rx = (p[0] - cx) * c + (p[1] - cy) * (-s)
    ry = (p[0] - cx) * s + (p[1] - cy) * c
    return abs(rx) < box[3] / 2 + MARGIN and abs(ry) < box[4] / 2 + MARGIN


def _corners(box):
    cx, cy, a = box[0], box[1], box[6]
    hx, hy = box[3] / 2, box[4] / 2
    base = [(-hx, -hy), (hx, -hy), (hx, hy), (-hx, hy)]
    c, s = math.cos(a), math.sin(a)
    return [np.array([dx * c - dy * s + cx, dx * s + dy * c + cy]) for dx, dy in base]


def box_overlap_oracle(box_a, box_b):
    ca = _corners(box_a)
    cb = _corners(box_b)
    ca.append(ca[0])
    cb.append(cb[0])
    pts = []
    for i in range(4):
        for j in range(4):
            ans = _intersection(ca[i + 1], ca[i], cb[j + 1], cb[j])
            if ans is not None:
                pts.append(ans)
    for k in range(4):
        if _check_in_box2d(box_a, cb[k]):
            pts.append(cb[k])
        if _check_in_box2d(box_b, ca[k]):
            pts.append(ca[k])
    cnt = len(pts)
    if cnt == 0:
        return 0.0
    center = np.mean(np.stack(pts), axis=0)
    # bubble sort by atan2 (stable, strict >)
    for j in range(cnt - 1):
        for i in range(cnt - j - 1):
            ai = math.atan2(pts[i][1] - center[1], pts[i][0] - center[0])
            aj = math.atan2(pts[i + 1][1] - center[1], pts[i + 1][0] - center[0])
            if ai > aj:
                pts[i], pts[i + 1] = pts[i + 1], pts[i]
    area = 0.0
    for k in range(cnt - 1):
        v1 = pts[k] - pts[0]
        v2 = pts[k + 1] - pts[0]
        area += v1[0] * v2[1] - v1[1] * v2[0]
    return abs(area) / 2.0


def boxes_overlap_bev_oracle(boxes_a, boxes_b):
    out = np.zeros((len(boxes_a), len(boxes_b)), dtype=np.float64)
    for i, a in enumerate(boxes_a):
        for j, b in enumerate(boxes_b):
            out[i, j] = box_overlap_oracle(a, b)
    return out


def boxes_iou_bev_oracle(boxes_a, boxes_b):
    ov = boxes_overlap_bev_oracle(boxes_a, boxes_b)
    sa = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    sb = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return ov / np.maximum(sa + sb - ov, _EPS)


def nms_oracle(boxes, scores, thresh, pre_maxsize=None):
    """iou3d_nms_utils.nms_gpu: sort desc, greedy BEV-IoU suppression."""
    order = np.argsort(-scores, kind="stable")
    if pre_maxsize is not None:
        order = order[:pre_maxsize]
    keep = []
    for i in order:
        ok = True
        for j in keep:
            if boxes_iou_bev_oracle(boxes[i:i + 1], boxes[j:j + 1])[0, 0] > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return np.array(keep, dtype=np.int64)
