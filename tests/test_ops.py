"""Kernel unit tests: each XLA op vs the literal numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from pdanet_tpu import ops
from tests import oracles

pytestmark = pytest.mark.smoke


def _cloud(B=2, N=128, seed=0, scale=4.0):
    rng = np.random.RandomState(seed)
    return (rng.rand(B, N, 3).astype(np.float32) - 0.5) * scale


class TestFPS:
    def test_matches_oracle(self):
        xyz = _cloud(B=2, N=96, seed=1)
        got = np.array(ops.farthest_point_sample(jnp.asarray(xyz), 24))
        want = oracles.fps_oracle(xyz, 24)
        np.testing.assert_array_equal(got, want)

    def test_with_duplicate_points(self):
        # sample_points pads short clouds by duplication — FPS must handle
        # exact duplicates deterministically.
        xyz = _cloud(B=1, N=64, seed=2)
        xyz[0, 32:] = xyz[0, :32]
        got = np.array(ops.farthest_point_sample(jnp.asarray(xyz), 16))
        want = oracles.fps_oracle(xyz, 16)
        np.testing.assert_array_equal(got, want)

    def test_with_dist(self):
        xyz = _cloud(B=2, N=48, seed=3)
        d = np.linalg.norm(xyz[:, :, None] - xyz[:, None, :], axis=-1) ** 2
        d = d.astype(np.float32)
        got = np.array(ops.farthest_point_sample_with_dist(jnp.asarray(d), 12))
        want = oracles.fps_with_dist_oracle(d, 12)
        np.testing.assert_array_equal(got, want)

    def test_streaming_features_matches_with_dist(self):
        # the O(N)-memory feature-space F-FPS must pick the same indices
        # as the precomputed (B, N, N) matrix form it replaces
        rng = np.random.RandomState(9)
        feats = rng.randn(2, 48, 7).astype(np.float32)
        d = np.sum(
            (feats[:, :, None] - feats[:, None, :]) ** 2, axis=-1
        ).astype(np.float32)
        want = np.array(
            ops.farthest_point_sample_with_dist(jnp.asarray(d), 12)
        )
        got = np.array(
            ops.farthest_point_sample_features(jnp.asarray(feats), 12)
        )
        np.testing.assert_array_equal(got, want)

    def test_first_index_zero(self):
        xyz = _cloud(B=3, N=32, seed=4)
        got = np.array(ops.farthest_point_sample(jnp.asarray(xyz), 8))
        assert (got[:, 0] == 0).all()


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.5, 8), (1.0, 4), (0.1, 16)])
    def test_matches_oracle(self, radius, nsample):
        xyz = _cloud(B=2, N=128, seed=5)
        new_xyz = _cloud(B=2, N=32, seed=6)
        got = np.array(
            ops.ball_query_op(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz))
        )
        want = oracles.ball_query_oracle(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_zero_hits_gives_zero(self):
        xyz = _cloud(B=1, N=16, seed=7) + 100.0
        new_xyz = _cloud(B=1, N=4, seed=8)
        got = np.array(
            ops.ball_query_op(0.5, 8, jnp.asarray(xyz), jnp.asarray(new_xyz))
        )
        assert (got == 0).all()

    def test_first_hit_padding(self):
        xyz = np.full((1, 8, 3), 50.0, np.float32)
        xyz[0, 5] = [0.1, 0.0, 0.0]  # only point near the probe center
        new_xyz = np.array([[[0.1, 0.0, 0.05]]], np.float32)
        got = np.array(ops.ball_query_op(0.2, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        assert (got == 5).all()

    @pytest.mark.parametrize(
        "B,N,M,radii,ks,nc",
        [
            (2, 512, 128, (0.5, 1.5), (8, 16), 16384),  # single chunk
            (1, 700, 100, (0.8,), (16,), 16384),  # N lane-padded
            (2, 1024, 96, (0.5, 1.5), (8, 16), 256),  # multi-chunk merge
            (1, 2000, 130, (1.0,), (32,), 512),  # merge + M pad
        ],
    )
    def test_pallas_kernel_interpret(self, B, N, M, radii, ks, nc):
        """Pallas TPU kernel (interpret mode) is bit-identical to the XLA
        formulation, incl. the cross-chunk merge path (small ``nc``)."""
        from pdanet_tpu.ops.pallas.ball_query import ball_query_multi_pallas

        rng = np.random.RandomState(B * N)
        xyz = rng.randn(B, N, 3).astype(np.float32) * 2.0
        new_xyz = xyz[:, :M]
        ref = ops.ball_query.ball_query_multi(
            radii, ks, jnp.asarray(xyz), jnp.asarray(new_xyz)
        )
        got = ball_query_multi_pallas(
            radii, ks, jnp.asarray(xyz), jnp.asarray(new_xyz),
            interpret=True, nc=nc,
        )
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize(
        "B,N,M,radii,ks,nc,spread",
        [
            (2, 1024, 96, (0.5, 1.5), (8, 16), 256, 2.0),  # multi-chunk
            (1, 2000, 130, (1.0,), (32,), 512, 2.0),  # merge + M pad
            (1, 4096, 256, (0.4,), (16,), 512, 40.0),  # sparse: AABB skips
            (2, 700, 64, (0.8,), (16,), 16384, 2.0),  # single chunk
        ],
    )
    def test_pallas_streamed_interpret(self, B, N, M, radii, ks, nc, spread):
        """Streamed (in-kernel DMA loop + AABB chunk skip) variant is
        bit-identical to the XLA formulation.  The ``spread=40`` case makes
        balls tiny relative to the scene so the skip mask actually fires."""
        from pdanet_tpu.ops.pallas.ball_query import (
            ball_query_multi_pallas_streamed,
        )

        rng = np.random.RandomState(B * N + 1)
        xyz = rng.randn(B, N, 3).astype(np.float32) * spread
        new_xyz = xyz[:, :M]
        ref = ops.ball_query.ball_query_multi(
            radii, ks, jnp.asarray(xyz), jnp.asarray(new_xyz)
        )
        got = ball_query_multi_pallas_streamed(
            radii, ks, jnp.asarray(xyz), jnp.asarray(new_xyz),
            interpret=True, nc=nc,
        )
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dilated_matches_oracle(self):
        xyz = _cloud(B=2, N=96, seed=9)
        new_xyz = xyz[:, :16].copy()  # include exact self matches
        got = np.array(
            ops.ball_query.ball_query_dilated(
                1.0, 0.0, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)
            )
        )
        want = oracles.ball_query_dilated_oracle(1.0, 0.0, 8, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)


class TestPointsInBoxes:
    def test_matches_oracle(self):
        rng = np.random.RandomState(10)
        B, N, M = 2, 256, 12
        points = (rng.rand(B, N, 3).astype(np.float32) - 0.5) * 20
        boxes = np.zeros((B, M, 7), np.float32)
        boxes[..., 0:3] = (rng.rand(B, M, 3) - 0.5) * 16
        boxes[..., 3:6] = rng.rand(B, M, 3) * 4 + 0.5
        boxes[..., 6] = (rng.rand(B, M) - 0.5) * 2 * np.pi
        boxes[:, -2:] = 0.0  # zero padding rows, like padded gt
        got = np.array(ops.points_in_boxes(jnp.asarray(points), jnp.asarray(boxes)))
        want = oracles.points_in_boxes_oracle(points, boxes)
        np.testing.assert_array_equal(got, want)


class TestGrouping:
    def test_gather(self):
        rng = np.random.RandomState(11)
        feats = rng.randn(2, 32, 5).astype(np.float32)
        idx = rng.randint(0, 32, size=(2, 7)).astype(np.int32)
        got = np.array(ops.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
        want = np.stack([feats[b][idx[b]] for b in range(2)])
        np.testing.assert_allclose(got, want)

    def test_group(self):
        rng = np.random.RandomState(12)
        feats = rng.randn(2, 32, 5).astype(np.float32)
        idx = rng.randint(0, 32, size=(2, 7, 3)).astype(np.int32)
        got = np.array(ops.group_points(jnp.asarray(feats), jnp.asarray(idx)))
        want = np.stack([feats[b][idx[b]] for b in range(2)])
        np.testing.assert_allclose(got, want)


class TestRotatedIoU:
    def _boxes(self, n, seed):
        rng = np.random.RandomState(seed)
        boxes = np.zeros((n, 7), np.float32)
        boxes[:, 0:2] = (rng.rand(n, 2) - 0.5) * 10
        boxes[:, 2] = (rng.rand(n) - 0.5) * 2
        boxes[:, 3:6] = rng.rand(n, 3) * 3 + 0.3
        boxes[:, 6] = (rng.rand(n) - 0.5) * 2 * np.pi
        return boxes

    def test_overlap_matches_oracle(self):
        a = self._boxes(24, 13)
        b = self._boxes(16, 14)
        got = np.array(ops.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
        want = oracles.boxes_overlap_bev_oracle(a, b)
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    def test_axis_aligned_exact(self):
        a = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
        b = np.array([[1, 1, 0, 2, 2, 2, 0]], np.float32)
        got = float(ops.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b))[0, 0])
        assert abs(got - 1.0) < 1e-5

    def test_identical_boxes(self):
        a = self._boxes(8, 15)
        got = np.array(ops.boxes_iou_bev(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-4)

    def test_iou3d(self):
        a = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
        b = np.array([[0, 0, 1, 2, 2, 2, 0]], np.float32)
        got = float(ops.boxes_iou3d(jnp.asarray(a), jnp.asarray(b))[0, 0])
        # overlap volume 2*2*1=4, union 8+8-4=12
        assert abs(got - 4.0 / 12.0) < 1e-5

    def test_disjoint(self):
        a = np.array([[0, 0, 0, 1, 1, 1, 0.3]], np.float32)
        b = np.array([[10, 10, 0, 1, 1, 1, 0.7]], np.float32)
        got = float(ops.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b))[0, 0])
        assert got == 0.0


class TestNMS:
    def test_matches_oracle(self):
        rng = np.random.RandomState(16)
        n = 64
        boxes = np.zeros((n, 7), np.float32)
        boxes[:, 0:2] = (rng.rand(n, 2) - 0.5) * 8
        boxes[:, 3:6] = rng.rand(n, 3) * 2 + 0.5
        boxes[:, 6] = (rng.rand(n) - 0.5) * np.pi
        scores = rng.rand(n).astype(np.float32)
        sel, count, _ = ops.nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), thresh=0.1,
            pre_maxsize=n, post_maxsize=n,
        )
        got = np.array(sel)[: int(count)]
        want = oracles.nms_oracle(boxes, scores, 0.1, pre_maxsize=n)
        np.testing.assert_array_equal(got, want)

    def test_score_threshold_and_post_max(self):
        rng = np.random.RandomState(17)
        n = 32
        boxes = np.zeros((n, 7), np.float32)
        boxes[:, 0:2] = rng.rand(n, 2) * 100  # disjoint -> nothing suppressed
        boxes[:, 3:6] = 1.0
        scores = np.linspace(0, 1, n).astype(np.float32)
        sel, count, sel_scores = ops.nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), thresh=0.01,
            pre_maxsize=n, post_maxsize=5, score_thresh=0.5,
        )
        assert int(count) == 5
        np.testing.assert_allclose(
            np.sort(np.array(sel_scores))[::-1], np.sort(scores)[::-1][:5]
        )


class TestGeometry:
    def test_corners_roundtrip(self):
        boxes = np.array([[1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.4]], np.float32)
        corners = np.array(ops.boxes_to_corners_3d(jnp.asarray(boxes)))
        assert corners.shape == (1, 8, 3)
        np.testing.assert_allclose(corners.mean(axis=1), boxes[:, :3], atol=1e-5)

    def test_rotate_points(self):
        pts = jnp.asarray(np.array([[[1.0, 0.0, 0.0]]], np.float32))
        ang = jnp.asarray(np.array([np.pi / 2], np.float32))
        out = np.array(ops.rotate_points_along_z(pts, ang))
        np.testing.assert_allclose(out[0, 0], [0.0, 1.0, 0.0], atol=1e-6)

    def test_enlarge(self):
        boxes = jnp.asarray(np.ones((3, 7), np.float32))
        out = np.array(ops.enlarge_box3d(boxes, [0.2, 0.2, 0.2]))
        np.testing.assert_allclose(out[:, 3:6], 1.2)
        np.testing.assert_allclose(out[:, :3], 1.0)
        np.testing.assert_allclose(out[:, 6], 1.0)


class TestInterpolate:
    def test_three_nn(self):
        rng = np.random.RandomState(18)
        unknown = rng.randn(1, 10, 3).astype(np.float32)
        known = rng.randn(1, 6, 3).astype(np.float32)
        d2, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        full = np.sum((unknown[:, :, None] - known[:, None]) ** 2, axis=-1)
        want_idx = np.argsort(full, axis=-1, kind="stable")[..., :3]
        np.testing.assert_array_equal(np.array(idx), want_idx)
        np.testing.assert_allclose(
            np.array(d2), np.take_along_axis(full, want_idx, -1), rtol=1e-4, atol=1e-5
        )


def test_chamfer_distance_vs_numpy():
    from pdanet_tpu.ops.chamfer import cd_loss_l1, chamfer_distance

    rng = np.random.RandomState(5)
    a = rng.randn(2, 33, 3).astype(np.float32)
    b = rng.randn(2, 21, 3).astype(np.float32)
    d1, d2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    ref = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d1), ref.min(2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), ref.min(1), rtol=1e-5, atol=1e-6)
    l1 = float(cd_loss_l1(jnp.asarray(a), jnp.asarray(b)))
    # the reference's as-executed quirk (cd_loss.py:24): dist2 stays squared
    ref_l1 = (np.sqrt(ref.min(2)).mean() + ref.min(1).mean()) / 2
    np.testing.assert_allclose(l1, ref_l1, rtol=1e-5)


class TestRoiPool:
    @staticmethod
    def _rois(n, seed):
        rng = np.random.RandomState(seed)
        r = np.zeros((n, 7), np.float32)
        r[:, 0:2] = rng.uniform(-5, 5, (n, 2))
        r[:, 2] = rng.uniform(-1, 1, n)
        r[:, 3:6] = rng.uniform(1.0, 4.0, (n, 3))
        r[:, 6] = rng.uniform(-np.pi, np.pi, n)
        return r

    @staticmethod
    def _oracle(rois, points, feats, out_size, method):
        """Port of roiaware_pool3d_kernel.cu:39-311 (per-box loops)."""
        ox, oy, oz = out_size
        R, C = len(rois), feats.shape[-1]
        pooled = np.zeros((R, ox, oy, oz, C), np.float32)
        counts = np.zeros((R, ox, oy, oz), np.int64)
        for r in range(R):
            cx, cy, cz, dx, dy, dz, ry = rois[r]
            for p in range(len(points)):
                x, y, z = points[p]
                if abs(z - cz) > dz / 2:
                    continue
                ca, sa = np.cos(-ry), np.sin(-ry)
                lx = (x - cx) * ca - (y - cy) * sa
                ly = (x - cx) * sa + (y - cy) * ca
                if not (abs(lx) < dx / 2 + 1e-5 and abs(ly) < dy / 2 + 1e-5):
                    continue
                lz = z - cz
                xi = min(max(int((lx + dx / 2) / (dx / ox)), 0), ox - 1)
                yi = min(max(int((ly + dy / 2) / (dy / oy)), 0), oy - 1)
                zi = min(max(int((lz + dz / 2) / (dz / oz)), 0), oz - 1)
                if method == "max":
                    if counts[r, xi, yi, zi] == 0:
                        pooled[r, xi, yi, zi] = feats[p]
                    else:
                        pooled[r, xi, yi, zi] = np.maximum(
                            pooled[r, xi, yi, zi], feats[p]
                        )
                else:
                    pooled[r, xi, yi, zi] += feats[p]
                counts[r, xi, yi, zi] += 1
        if method == "avg":
            pooled = pooled / np.maximum(counts[..., None], 1)
        return pooled

    @pytest.mark.parametrize("method", ["max", "avg"])
    def test_roiaware_vs_oracle(self, method):
        rng = np.random.RandomState(11)
        rois = self._rois(6, 12)
        points = rng.uniform(-6, 6, (256, 3)).astype(np.float32)
        feats = rng.randn(256, 5).astype(np.float32)
        got = np.asarray(ops.roiaware_pool3d(
            jnp.asarray(rois), jnp.asarray(points), jnp.asarray(feats),
            (4, 4, 2), pool_method=method,
        ))
        want = self._oracle(rois, points, feats, (4, 4, 2), method)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_roipoint_scan_order_and_duplication(self):
        rng = np.random.RandomState(13)
        rois = self._rois(4, 14)
        rois[3, 0:3] = 100.0  # empty roi
        points = rng.uniform(-6, 6, (128, 3)).astype(np.float32)
        # plant interior points so rois 0-2 are non-empty (random uniform
        # points rarely land inside a specific rotated box)
        for r in range(3):
            sl = slice(10 + r * 20, 10 + r * 20 + 8)
            points[sl] = rois[r, 0:3] + rng.uniform(-0.3, 0.3, (8, 3))
        feats = rng.randn(128, 3).astype(np.float32)
        K = 16
        pooled, empty = ops.roipoint_pool3d(
            jnp.asarray(rois), jnp.asarray(points), jnp.asarray(feats), K
        )
        pooled, empty = np.asarray(pooled), np.asarray(empty)
        assert empty[3] and not empty[:3].any()
        assert (pooled[3] == 0).all()
        # oracle: first-K in scan order with cyclic duplication
        for r in range(3):
            cx, cy, cz, dx, dy, dz, ry = rois[r]
            ca, sa = np.cos(-ry), np.sin(-ry)
            lx = (points[:, 0] - cx) * ca - (points[:, 1] - cy) * sa
            ly = (points[:, 0] - cx) * sa + (points[:, 1] - cy) * ca
            inside = (
                (np.abs(points[:, 2] - cz) <= dz / 2)
                & (np.abs(lx) < dx / 2 + 1e-5)
                & (np.abs(ly) < dy / 2 + 1e-5)
            )
            idx = np.where(inside)[0]
            want = np.array([idx[k % len(idx)] for k in range(K)])
            np.testing.assert_allclose(
                pooled[r, :, 0:3], points[want], rtol=1e-6
            )
            np.testing.assert_allclose(
                pooled[r, :, 3:], feats[want], rtol=1e-6
            )


class TestStackedFPSIdentity:
    def test_fps_on_selection_ordered_set_is_identity_prefix(self):
        """FPS over a D-FPS selection-ordered point set returns the
        identity prefix [0..m) — the theorem behind the backbone's
        FPS_IDENTITY_SHORTCUT (see iassd_backbone setup note)."""
        from pdanet_tpu import ops

        rng = np.random.RandomState(11)
        xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 10)
        idx = ops.sampling.farthest_point_sample(xyz, 128)
        ordered = jnp.take_along_axis(xyz, np.asarray(idx)[..., None], axis=1)
        for m in (1, 7, 64, 128):
            got = np.asarray(ops.sampling.farthest_point_sample(ordered, m))
            want = np.broadcast_to(np.arange(m, dtype=np.int32), (2, m))
            np.testing.assert_array_equal(got, want)
