"""Ellipsoid-query oracle tests (ellipsoid_query_gpu.cu:311-513 semantics).

The numpy oracle below is a scan-order transliteration of the CUDA
kernel's behavior contract (sphere query with first-hit padding ->
covariance of the queried points with the centroid/mean centering switch
-> ascending eigendecomposition -> reoriented (r, 2r, r) ellipsoid union
appended in scan order), with np.linalg.eigh standing in for the FSU
Jacobi solver (same convention: ascending eigenvalues, column
eigenvectors; sign differences are squared away by the membership test).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pdanet_tpu.ops.ellipsoid_query import (
    ellipsoid_query,
    query_and_group_ellipsoid,
)


def ellipsoid_query_oracle(radius, nsample, xyz, new_xyz):
    """Scan-order oracle, one center at a time (f64)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    out = np.zeros((B, M, nsample), np.int32)
    aa = radius * radius
    bb = 4.0 * radius * radius
    cc = radius * radius
    for b in range(B):
        for j in range(M):
            c = new_xyz[b, j]
            idx = out[b, j]
            cnt = 0
            for k in range(N):
                if cnt >= nsample:
                    break
                d2 = np.sum((xyz[b, k] - c) ** 2)
                if d2 < cc:
                    if cnt == 0:
                        idx[:] = k
                    idx[cnt] = k
                    cnt += 1
            if cnt < 3:
                continue
            pts = xyz[b, idx[:cnt]].astype(np.float64)
            if np.any(np.all(pts == 0.0, axis=1)):
                cov = np.zeros((3, 3))
                vecs = np.eye(3)
            else:
                mean = pts.mean(0)
                sub = c if np.linalg.norm(mean - c) >= radius / 4.0 else mean
                mc = pts - sub
                cov = mc.T @ mc / (cnt - 1)
                _, vecs = np.linalg.eigh(cov)  # ascending, column vectors
            in_slots = set(idx.tolist())
            for k in range(N):
                if cnt == nsample:
                    break
                p = xyz[b, k].astype(np.float64) - c
                proj = vecs.T @ p  # rows = eigvec components, ascending
                val = (proj[2] ** 2 / aa + proj[1] ** 2 / bb
                       + proj[0] ** 2 / cc)
                if val < 1.0 and k not in in_slots:
                    idx[cnt] = k
                    in_slots.add(k)
                    cnt += 1
    return out


def _cloud(B, N, seed, scale=3.0):
    rs = np.random.RandomState(seed)
    return (rs.randn(B, N, 3) * scale).astype(np.float32)


class TestEllipsoidQuery:
    def test_vs_oracle_random(self):
        xyz = _cloud(2, 256, 0, scale=1.5)
        new_xyz = xyz[:, ::16].copy()  # 16 centers
        got = np.asarray(ellipsoid_query(
            0.8, 16, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        want = ellipsoid_query_oracle(0.8, 16, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_vs_oracle_anisotropic(self):
        """Elongated clusters: well-separated eigenvalues, so the
        reoriented long axis actually changes the result vs ball query."""
        rs = np.random.RandomState(3)
        B, M = 1, 8
        centers = rs.randn(B, M, 3).astype(np.float32) * 2.0
        pts = []
        for j in range(M):
            d = rs.randn(3)
            d /= np.linalg.norm(d)
            t = rs.randn(64, 1) * 1.2  # spread along one direction
            off = rs.randn(64, 3) * 0.08
            pts.append(centers[0, j] + t * d + off)
        xyz = np.concatenate(pts, 0)[None].astype(np.float32)
        got = np.asarray(ellipsoid_query(
            0.5, 24, jnp.asarray(xyz), jnp.asarray(centers)))
        want = ellipsoid_query_oracle(0.5, 24, xyz, centers)
        np.testing.assert_array_equal(got, want)
        # the union stage must have appended something beyond the sphere
        sphere_only = ellipsoid_query_oracle(0.5, 24, xyz, centers)
        d2 = np.sum((xyz[0][None] - centers[0][:, None]) ** 2, -1)
        cnt_sphere = np.minimum((d2 < 0.25).sum(-1), 24)
        got_cnt = np.array([
            len({*got[0, j].tolist()}) for j in range(M)])
        assert (got_cnt > np.minimum(cnt_sphere, 24)).any(), (
            "no center gained ellipsoid-only neighbors; test is inert")
        del sphere_only

    def test_degenerate_paths(self):
        """cnt<3 (pure ball result), zero hits (index 0), exact-origin
        point (identity-rotation flag path), cnt==nsample (no appends)."""
        xyz = np.zeros((1, 8, 3), np.float32)
        xyz[0, 0] = [5, 5, 5]      # far
        xyz[0, 1] = [0.1, 0, 0]    # near center A
        xyz[0, 2] = [0, 0.1, 0]    # near center A
        xyz[0, 3] = [0, 0, 0]      # exact origin (flag) & near center A
        xyz[0, 4] = [0.3, 0.3, 0]  # inside identity ellipsoid of A
        xyz[0, 5] = [9, 9, 9]
        xyz[0, 6] = [9.1, 9, 9]
        xyz[0, 7] = [-9, -9, -9]
        centers = np.array([[[0.0, 0, 0],     # >=3 hits + origin flag
                             [9.0, 9, 9],     # 2 hits -> cnt<3
                             [50.0, 50, 50]]],  # zero hits
                           np.float32)
        got = np.asarray(ellipsoid_query(
            0.5, 4, jnp.asarray(xyz), jnp.asarray(centers)))
        want = ellipsoid_query_oracle(0.5, 4, xyz, centers)
        np.testing.assert_array_equal(got, want)
        assert (got[0, 2] == 0).all()  # zero hits -> zero-filled slots

    def test_full_slots_no_append(self):
        xyz = _cloud(1, 64, 7, scale=0.2)  # dense: sphere fills all slots
        centers = np.zeros((1, 1, 3), np.float32)
        got = np.asarray(ellipsoid_query(
            0.6, 8, jnp.asarray(xyz), jnp.asarray(centers)))
        want = ellipsoid_query_oracle(0.6, 8, xyz, centers)
        np.testing.assert_array_equal(got, want)

    def test_grouper_shapes(self):
        xyz = _cloud(2, 64, 1, scale=0.5)
        centers = xyz[:, ::8].copy()
        feats = _cloud(2, 64, 2)[..., :2]
        g = query_and_group_ellipsoid(
            0.7, 8, jnp.asarray(xyz), jnp.asarray(centers),
            jnp.asarray(feats))
        assert g.shape == (2, 8, 8, 5)
        g2 = query_and_group_ellipsoid(
            0.7, 8, jnp.asarray(xyz), jnp.asarray(centers))
        np.testing.assert_allclose(np.asarray(g[..., :3]),
                                   np.asarray(g2), rtol=1e-6)


@pytest.mark.smoke
def test_ellipsoid_query_smoke():
    xyz = _cloud(1, 128, 5, scale=0.8)
    centers = xyz[:, ::32].copy()
    got = np.asarray(ellipsoid_query(
        0.6, 8, jnp.asarray(xyz), jnp.asarray(centers)))
    want = ellipsoid_query_oracle(0.6, 8, xyz, centers)
    np.testing.assert_array_equal(got, want)
