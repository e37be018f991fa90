"""Gather / grouping ops — pure XLA gathers, differentiable for free.

Replaces ``gather_operation`` (sampling_gpu.cu:8-88) and
``grouping_operation`` (group_points_gpu.cu:14-92).  On TPU these are plain
``take_along_axis`` gathers; JAX autodiff gives the deterministic
scatter-add backward that the CUDA kernels hand-roll with atomicAdd.

Layout note: this framework is channels-last — features are (B, N, C)
rather than the reference's (B, C, N) — which maps C onto TPU lanes.
"""

import jax.numpy as jnp


# Batched row gathers lower much better as ONE flat gather over the
# (B*N, C) table with globalized indices than as per-batch
# take_along_axis: identical at B=1, but at B=8 XLA's batched gather
# emitter costs ~2.3x more per element (on-chip shootout
# tools/probes/gather_probe.py: L0-scale 7.38 -> 3.23 ms, L1-scale
# 2.23 -> 1.22 ms).  Backward is the same deterministic scatter-add.


def gather_points(features, idx):
    """(B, N, C) x (B, M) int -> (B, M, C)."""
    B, N, C = features.shape
    M = idx.shape[1]
    # NOTE: the clip CHANGES stray-index behavior vs per-batch
    # take_along_axis (which fills OOB with NaN and wraps negatives):
    # an out-of-range index now silently reads a clamped in-range row.
    # The clip is still required so a stray index can never cross into a
    # neighboring frame's rows through the flat (B*N, C) table; callers
    # only ever pass in-range indices (ball query / FPS outputs).
    safe = jnp.clip(idx.astype(jnp.int32), 0, N - 1)
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    return jnp.take(
        features.reshape(B * N, C), (safe + base).reshape(-1), axis=0,
    ).reshape(B, M, C)


def group_points(features, idx):
    """(B, N, C) x (B, M, K) int -> (B, M, K, C)."""
    B, N, C = features.shape
    M, K = idx.shape[1], idx.shape[2]
    safe = jnp.clip(idx.astype(jnp.int32), 0, N - 1)  # see gather_points
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    return jnp.take(
        features.reshape(B * N, C), (safe + base).reshape(-1), axis=0,
    ).reshape(B, M, K, C)


def gaussian_density(grouped_xyz, centers, radius):
    """Gaussian point density of each neighbor w.r.t. its center.

    Matches ``QueryAndGroup_alone_grouped_density_directional``
    (pointnet2_utils.py:594-597): exp(-d^2 / (2 r^2)) / (2.5 r).

    Args:
        grouped_xyz: (B, M, K, 3) absolute neighbor coordinates.
        centers: (B, M, 3).
    Returns:
        (B, M, K) densities.
    """
    d2 = jnp.sum(jnp.square(grouped_xyz - centers[:, :, None, :]), axis=-1)
    return jnp.exp(-d2 / (2.0 * radius * radius)) / (2.5 * radius)
