"""Oracle tests for the grid-hash ball query (ops/grid_ball_query.py).

The contract is BIT-IDENTICAL output vs the dense XLA formulation
(`_ball_query_multi_xla`, itself oracle-tested against the CUDA scan-order
semantics in test_ops.py) — on every input, including bucket-overflow
inputs where the grid path must take its dense fallback branch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdanet_tpu.ops.ball_query import _ball_query_multi_xla
from pdanet_tpu.ops.grid_ball_query import ball_query_multi_grid


def _assert_same(radii, nsamples, xyz, new_xyz, cap=64):
    want = _ball_query_multi_xla(tuple(radii), tuple(nsamples), xyz, new_xyz)
    for selector in ("topk", "sort"):
        got = ball_query_multi_grid(
            tuple(radii), tuple(nsamples), xyz, new_xyz, cap=cap,
            selector=selector,
        )
        for g, w in zip(got, want):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=selector
            )


class TestGridBallQuery:
    def test_uniform_cloud_multi_radius(self):
        k = jax.random.split(jax.random.PRNGKey(0), 2)
        xyz = jax.random.uniform(k[0], (2, 512, 3), minval=-20, maxval=20)
        new_xyz = jax.random.uniform(k[1], (2, 96, 3), minval=-20, maxval=20)
        _assert_same((0.8, 1.6), (8, 16), xyz, new_xyz)

    def test_centers_from_cloud(self):
        """FPS-style centers (subset of the cloud): self-hit at d=0 must
        come first like the CUDA scan does."""
        xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 400, 3)) * 5.0
        new_xyz = xyz[:, ::4][:, :64]
        _assert_same((1.0,), (16,), xyz, new_xyz)

    def test_clustered_cloud(self):
        """Dense gaussian clumps: buckets near the clump centers are full;
        with the default cap this must still be exact (fallback or not)."""
        k = jax.random.split(jax.random.PRNGKey(2), 3)
        clumps = jax.random.uniform(k[0], (8, 3), minval=-10, maxval=10)
        pts = (
            clumps[None, :, None, :]
            + jax.random.normal(k[1], (1, 8, 64, 3)) * 0.3
        ).reshape(1, 512, 3)
        new_xyz = pts[:, ::8][:, :48]
        _assert_same((0.5, 2.0), (8, 32), pts, new_xyz)

    def test_duplicate_points_force_fallback(self):
        """sample_points pads short clouds by duplicating points — a single
        coordinate repeated > cap times overflows its bucket and must take
        the exact dense fallback."""
        xyz = jax.random.normal(jax.random.PRNGKey(3), (1, 256, 3)) * 4.0
        xyz = xyz.at[0, 128:].set(xyz[0, 7])  # 129 copies of one point
        new_xyz = xyz[:, :32]
        _assert_same((1.0,), (16,), xyz, new_xyz, cap=64)

    def test_tiny_cap_still_exact(self):
        """cap=1 overflows almost everywhere -> permanent fallback, output
        still bit-identical."""
        xyz = jax.random.normal(jax.random.PRNGKey(4), (2, 200, 3)) * 3.0
        new_xyz = xyz[:, :40]
        _assert_same((0.7, 1.4), (4, 8), xyz, new_xyz, cap=1)

    def test_far_centers_zero_hits(self):
        """Centers with no point in radius keep the zero-initialized index
        buffer (CUDA semantics)."""
        xyz = jax.random.normal(jax.random.PRNGKey(5), (1, 128, 3))
        new_xyz = jnp.full((1, 16, 3), 500.0)
        got = ball_query_multi_grid((1.0,), (8,), xyz, new_xyz)
        np.testing.assert_array_equal(np.asarray(got[0]), 0)
        _assert_same((1.0,), (8,), xyz, new_xyz)

    def test_boundary_distances(self):
        """Points laid exactly at r and just inside/outside it: the strict
        d^2 < r^2 predicate must agree with the dense path bit-for-bit."""
        r = 1.0
        eps = np.float32(1e-6)
        xs = jnp.asarray(
            [[r, 0, 0], [r - eps, 0, 0], [r + eps, 0, 0],
             [0, r, 0], [0, 0, r - eps], [0.5, 0.5, 0.5]],
            dtype=jnp.float32,
        )[None]
        new_xyz = jnp.zeros((1, 4, 3), dtype=jnp.float32)
        _assert_same((r,), (4,), xs, new_xyz)

    def test_negative_coordinates(self):
        xyz = jax.random.uniform(
            jax.random.PRNGKey(6), (1, 300, 3), minval=-50, maxval=-30
        )
        new_xyz = xyz[:, :50]
        _assert_same((1.2,), (12,), xyz, new_xyz)

    def test_fuzz_seed_sweep(self):
        """Randomized sweep over cloud shapes, scales, offsets and radii —
        every draw must match the dense path exactly (hunts cell-key
        collision and window-margin corner cases)."""
        # radii/shapes are static args — reuse ONE jit by drawing the
        # geometry (scale/offset/duplication) per seed, not the signature
        for seed in range(10):
            ks = jax.random.split(jax.random.PRNGKey(100 + seed), 4)
            scale = float(jax.random.uniform(ks[0], (), minval=0.3, maxval=40))
            off = jax.random.uniform(ks[1], (3,), minval=-100, maxval=100)
            n = int(jax.random.randint(ks[2], (), 64, 384))
            xyz = jax.random.normal(ks[3], (1, 384, 3)) * scale + off
            xyz = xyz.at[:, n:].set(xyz[:, :1])  # duplicate-pad tail
            new_xyz = xyz[:, :96]
            _assert_same((1.0, 2.0), (4, 8), xyz, new_xyz, cap=16)

    def test_kitti_like_scale(self):
        """KITTI L0 geometry (shrunk 4x): 4096-pt cloud, 1024 centers, the
        shipped radii/nsamples."""
        k = jax.random.split(jax.random.PRNGKey(7), 2)
        pts = jax.random.uniform(
            k[0], (1, 4096, 3),
            minval=jnp.asarray([0.0, -40.0, -3.0]),
            maxval=jnp.asarray([70.0, 40.0, 1.0]),
        )
        new_xyz = pts[:, ::4]
        _assert_same((0.2, 0.8), (16, 32), pts, new_xyz)
