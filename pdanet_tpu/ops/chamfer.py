"""Chamfer distance (bidirectional nearest-neighbor) as plain XLA.

Counterpart of the reference CUDA op (``pointnet2_batch/src/
chamferthreed.cu:12-195`` + wrapper ``chamfer_distance.py:31-87``) and the
L1 loss flavor used by ``cd_loss.cd_loss_L1`` (cd_loss.py:14-44).  On the
live PDA-SSD path the CD term is computed each step but weighted out of
the total loss (IASSD_head.py:730); here it is an optional metric behind
``LOSS_CONFIG.COMPUTE_CD_METRIC`` — the op is differentiable for free.
"""

import jax.numpy as jnp


def chamfer_distance(xyz1, xyz2):
    """Squared-L2 bidirectional NN distances.

    Args:
        xyz1: (B, N, 3); xyz2: (B, M, 3).
    Returns:
        (dist1 (B, N), dist2 (B, M)) — min squared distance to the other set.
    """
    # component-wise (N, M) broadcasts: keeps lanes on M instead of a
    # padded 3-vector axis
    dx = xyz1[:, :, 0:1] - xyz2[:, None, :, 0]
    dy = xyz1[:, :, 1:2] - xyz2[:, None, :, 1]
    dz = xyz1[:, :, 2:3] - xyz2[:, None, :, 2]
    d = dx * dx + dy * dy + dz * dz  # (B, N, M)
    return jnp.min(d, axis=2), jnp.min(d, axis=1)


def cd_loss_l1(pcs1, pcs2):
    """L1 chamfer loss AS EXECUTED by the reference (cd_loss.py:22-25):
    ``dist1`` is sqrt'd but the ``dist2`` sqrt is commented out
    (cd_loss.py:24 ``# dist2 = torch.sqrt(dist2) # choice``), so the
    returned value is (mean(sqrt d1) + mean(d2_SQUARED)) / 2 — the
    asymmetric quirk is preserved for tb-metric parity."""
    d1, d2 = chamfer_distance(pcs1, pcs2)
    d1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    return (jnp.mean(d1) + jnp.mean(d2)) / 2.0


def cd_loss_l2(pcs1, pcs2):
    """L2 chamfer loss: mean of the two mean squared-NN distances."""
    d1, d2 = chamfer_distance(pcs1, pcs2)
    return jnp.mean(d1) + jnp.mean(d2)
