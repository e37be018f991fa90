"""Ellipsoid query — data-adaptive neighborhood search.

Counterpart of ``ellipsoid_query_gpu.cu:311-513`` (+ the embedded FSU
Jacobi eigen-solver :1-305) and the ``EllipsoidQuery`` wrapper
(``pointnet2_utils.py:292-324``, always called as ``(r, 2r, r)`` axes).
Unreachable from the shipped PDA-SSD configs (the "Ellipsoid" SA modules
actually use ball query — SURVEY.md §2.1), built for 100% op-surface
coverage; correspondingly it is an XLA formulation, not a Pallas kernel.

Reference semantics reproduced exactly (oracle-pinned in
tests/test_ellipsoid_query.py):

1. **Stage 1 — sphere query**: first ``nsample`` points (scan order) with
   d^2 < e3^2, CUDA first-hit padding (all slots prefilled with the first
   hit; zero hits leave index 0).  ``cnt`` = number of slots filled.
2. **Group statistics** (only when ``cnt >= 3``): mean of the ``cnt``
   queried points; if ANY queried point is exactly (0,0,0) the covariance
   is left at its zero initialization (the kernel's ``flag`` path —
   the CUDA buffers are torch.zeros, ellipsoid_query.cpp:36-48).
   Otherwise points are centered on the *query center* when
   ``|mean - center| >= e1/4`` else on the *mean*, and the covariance is
   ``M^T M / (cnt - 1)``.
3. **Eigendecomposition**: eigenvalues ascending, eigenvectors as columns
   (the FSU ``jacobi_eigenvalue`` convention).  Implemented with
   ``jnp.linalg.eigh`` — identical convention; for the zero-covariance
   ``flag`` path the eigenvector matrix is pinned to identity (what the
   reference's Jacobi returns for a zero input).
4. **Stage 2 — reoriented-ellipsoid union**: each point p is projected on
   (v_largest, v_middle, v_smallest) and tested against axis lengths
   (e1, e2, e3) = (r, 2r, r) — i.e. the LONG 2r axis rides the *middle*
   eigenvector (faithful to the kernel's row indexing, :467-489).  Points
   inside that are not already in the slot list are appended in scan
   order until ``nsample``.  The kernel's determinant/handedness branch
   (:456, an exact ``== 1.0`` float compare) only flips the sign of all
   three projections, which the membership test then squares away — it
   cannot affect the returned indices and is omitted.

Only ``idx`` is returned (the cpp wrapper discards v/d/counts,
ellipsoid_query.cpp:76).  Non-differentiable, like the reference
(``ctx.mark_non_differentiable``).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .ball_query import _first_k_hits, _run_chunked
from .grouping import group_points


def _eigvecs_3x3(cov, flag):
    """Eigenvectors (columns, ascending eigenvalues) of (..., 3, 3)."""
    _, vecs = jnp.linalg.eigh(cov)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), vecs.shape)
    return jnp.where(flag[..., None, None], eye, vecs)


@partial(jax.jit, static_argnames=("radius", "nsample"))
def ellipsoid_query(radius, nsample, xyz, new_xyz):
    """(B, N, 3) x (B, M, 3) -> (B, M, nsample) int32 indices.

    Axis lengths fixed to (e1, e2, e3) = (radius, 2*radius, radius), the
    only instantiation the reference ever makes (pointnet2_utils.py:314).
    """
    e1 = e2 = e3 = None  # documented below; kept symbolic for clarity
    del e1, e2, e3

    def body(centers):
        # ---- stage 1: sphere query, first-hit padding ------------------
        d2 = jnp.sum(
            jnp.square(xyz[:, None, :, :] - centers[:, :, None, :]), axis=-1
        )  # (B, m, N)
        hit = d2 < radius * radius
        pos, valid = _first_k_hits(hit, nsample)
        fill = jnp.where(valid[..., 0:1], pos[..., 0:1], 0)
        idx1 = jnp.where(valid, pos, fill).astype(jnp.int32)
        cnt = jnp.sum(valid, axis=-1).astype(jnp.int32)  # (B, m)

        # ---- group statistics over the first `cnt` points --------------
        grouped = group_points(xyz, idx1)  # (B, m, K, 3)
        memb = valid  # slot carries a distinct stage-1 hit
        cntf = jnp.maximum(cnt, 1).astype(xyz.dtype)[..., None]
        mean = jnp.sum(
            jnp.where(memb[..., None], grouped, 0.0), axis=-2
        ) / cntf  # (B, m, 3)
        flag = jnp.any(
            memb & jnp.all(grouped == 0.0, axis=-1), axis=-1
        )  # (B, m) — kernel's exact-origin guard (:384-386)
        dist_mc = jnp.linalg.norm(mean - centers, axis=-1)
        sub = jnp.where(  # centroid vs mean centering (:405-425)
            (dist_mc >= radius / 4.0)[..., None], centers, mean
        )
        mc = jnp.where(memb[..., None], grouped - sub[..., None, :], 0.0)
        cov = jnp.einsum("...ki,...kj->...ij", mc, mc) / jnp.maximum(
            cnt - 1, 1
        ).astype(xyz.dtype)[..., None, None]
        cov = jnp.where(flag[..., None, None], 0.0, cov)
        vecs = _eigvecs_3x3(cov, flag)  # (B, m, 3, 3) columns, ascending

        # ---- stage 2: reoriented-ellipsoid union -----------------------
        p = xyz[:, None, :, :] - centers[:, :, None, :]  # (B, m, N, 3)
        # projections onto (largest, middle, smallest) eigenvectors
        proj = jnp.einsum("...nc,...ck->...nk", p, vecs)  # cols asc
        val = (
            jnp.square(proj[..., 2]) / (radius * radius)
            + jnp.square(proj[..., 1]) / (4.0 * radius * radius)
            + jnp.square(proj[..., 0]) / (radius * radius)
        )
        # dedupe: a point is already in the slots iff it is a stage-1 hit
        # with scan rank < nsample (padding repeats the first hit)
        rank1 = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1
        already = hit & (rank1 < nsample)
        gate = (cnt >= 3)[..., None]
        cand = (val < 1.0) & ~already & gate

        pos2, valid2 = _first_k_hits(cand, nsample)
        slots = jnp.arange(nsample, dtype=jnp.int32)
        take = slots - cnt[..., None]  # candidate rank wanted per slot
        take_safe = jnp.clip(take, 0, nsample - 1)
        appended = jnp.take_along_axis(pos2, take_safe, axis=-1)
        use = (take >= 0) & jnp.take_along_axis(valid2, take_safe, axis=-1)
        return jnp.where(use, appended.astype(jnp.int32), idx1)

    return _run_chunked(xyz, new_xyz, body)


def query_and_group_ellipsoid(radius, nsample, xyz, new_xyz, features=None,
                              use_xyz=True):
    """``QueryAndGroup_Ellipsoid`` (pointnet2_utils.py:329-364), dense
    channels-last: returns (B, M, K, 3 + C) center-relative xyz ++ grouped
    features (or just one of the two, per ``features``/``use_xyz``)."""
    idx = ellipsoid_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_features = group_points(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
        return grouped_features
    assert use_xyz, "cannot have no features and use_xyz=False"
    return grouped_xyz
