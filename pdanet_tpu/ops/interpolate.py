"""Three-NN feature interpolation (FP decoder path).

Replaces ``three_nn`` / ``three_interpolate``
(``pcdet/ops/pointnet2/pointnet2_batch/src/interpolate_gpu.cu:16-175``).
Not on the PDA-SSD path (used by PointNet2 FP decoders,
pointnet2_modules.py:1776-1824) but part of the pcdet op surface.
"""

import jax
import jax.numpy as jnp




def three_nn(unknown, known):
    """3 nearest neighbors of each unknown point among known points.

    Args:
        unknown: (B, N, 3); known: (B, M, 3)
    Returns:
        dist2: (B, N, 3) squared distances (the CUDA kernel also returns
            squared distances); idx: (B, N, 3) int32.
    """
    # Direct squared distance (matches the CUDA kernel's arithmetic; the
    # ||a||^2+||b||^2-2ab expansion would reorder near-ties).  Computed
    # component-wise so lanes ride M, not a padded 3-vector axis.
    dx = unknown[:, :, 0:1] - known[:, None, :, 0]
    dy = unknown[:, :, 1:2] - known[:, None, :, 1]
    dz = unknown[:, :, 2:3] - known[:, None, :, 2]
    d2 = dx * dx + dy * dy + dz * dz  # (B, N, M)
    neg, idx = jax.lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


def three_interpolate(features, idx, weight):
    """(B, M, C) x (B, N, 3) x (B, N, 3) -> (B, N, C) weighted gather."""
    B, M, C = features.shape
    N = idx.shape[1]
    gathered = jnp.take_along_axis(
        features, idx.reshape(B, N * 3, 1).astype(jnp.int32), axis=1
    ).reshape(B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)
