"""Gather-matmul sparse 3D convolution — the TPU-native counterpart of
spconv's submanifold / strided sparse convs
(``pcdet/models/backbones_3d/spconv_backbone.py`` uses SubMConv3d /
SparseConv3d; kernels live in the spconv wheel).

Design (fixed budgets, no host rulebooks):

* Active sites are the (B, V, 3) zyx coord lists the voxelizer already
  produces (-1 padded).  Neighbor lookup is a **sorted-key binary
  search**: flat keys are sorted once per level, each kernel offset
  resolves with ``searchsorted`` — O(27 V log V) index work, no dense
  index grid, so full-res 0.05 m KITTI levels (~16k actives in a 92M
  cell grid) cost kilobytes instead of the 370 MB/frame a dense scatter
  grid would.
* The conv itself is ONE MXU contraction per layer: gathered neighbor
  features (B, V, 27, C) reshape to (B, V, 27*C) and multiply a
  (27*C, C_out) kernel — exactly the "gather-matmul" formulation.
* Submanifold convs preserve the active set (spconv SubMConv3d).
  Strided convs emit, by default, EVERY output site whose tap window
  contains an active input — spconv SparseConv3d's exact output sets
  (``downsample_coords(dilate=True)``) — under a static per-level
  budget (overflow truncates in scan order; raise ACTIVE_BUDGETS in
  the config for dense scenes).  The cheaper containment policy
  (center-tap site only, a subset) remains available
  (``SPCONV_ACTIVE_SETS: False`` / ``dilate=False``).
* BatchNorm over sparse rows is masked: padding rows contribute to
  neither the statistics nor the running averages.
"""

from functools import partial

import jax
import jax.numpy as jnp

import numpy as np

# numpy scalar: module import must not initialize the JAX backend
INVALID = np.int32(2**30)


def stage_grids(grid_size):
    """The reference backbone's 4-level stage-grid chain
    (spconv_backbone.py:75-115): sparse_shape carries an empty top z
    plane (+1); conv2/conv3 downsample with pad 1 (ceil-div dims);
    conv4 uses z padding 0 (``padding=(0, 1, 1)``), i.e.
    ``z4 = (z3 - 1) // 2``, with a pad-1 fallback for degenerate tiny
    test grids (z3 < 3 — shapes the reference itself cannot run).

    Returns:
        (grids, conv4_pad): grids = [(nx, ny, nz)] for strides 1/2/4/8;
        conv4_pad = (0, 1, 1) zyx, or None when the fallback applies.
    """
    nx, ny, nz = (int(g) for g in grid_size)
    g0 = (nx, ny, nz + 1)
    g1 = tuple((d + 1) // 2 for d in g0)
    g2 = tuple((d + 1) // 2 for d in g1)
    z4_ref = g2[2] >= 3
    z4 = (g2[2] - 1) // 2 if z4_ref else (g2[2] + 1) // 2
    g3 = ((g2[0] + 1) // 2, (g2[1] + 1) // 2, max(z4, 1))
    return [g0, g1, g2, g3], ((0, 1, 1) if z4_ref else None)


def _flat_key(coords, grid_size):
    """(..., 3) zyx -> flat scan key; invalid (negative) -> INVALID."""
    nx, ny, nz = (int(g) for g in grid_size)
    valid = jnp.all(coords >= 0, axis=-1) & (
        (coords[..., 0] < nz) & (coords[..., 1] < ny) & (coords[..., 2] < nx)
    )
    key = (
        coords[..., 0] * (ny * nx) + coords[..., 1] * nx + coords[..., 2]
    )
    return jnp.where(valid, key, INVALID), valid


def _kernel_offsets(kernel=(3, 3, 3)):
    kz, ky, kx = kernel
    oz, oy, ox = jnp.meshgrid(
        jnp.arange(kz) - kz // 2,
        jnp.arange(ky) - ky // 2,
        jnp.arange(kx) - kx // 2,
        indexing="ij",
    )
    return jnp.stack(
        [oz.reshape(-1), oy.reshape(-1), ox.reshape(-1)], axis=-1
    )  # (K, 3) zyx


@partial(jax.jit,
         static_argnames=("grid_size", "kernel", "stride", "padding"))
def build_neighbor_table(coords, grid_size, kernel=(3, 3, 3),
                         query_coords=None, stride=(1, 1, 1),
                         padding=None):
    """Per-site neighbor slot indices.

    Args:
        coords: (B, V, 3) zyx active sites (-1 padded) — the SUPPORT set.
        query_coords: optional (B, Q, 3) query sites on the OUTPUT
            lattice; neighbors are looked up at
            ``query * stride + offset`` (strided conv); defaults to
            ``coords`` with stride 1 (submanifold).
        padding: optional per-axis zyx conv padding; default k//2
            (centered taps == spconv padding=1 for k=3).  The reference
            uses padding=(0, 1, 1) at conv4 and last_pad=0 at conv_out
            (spconv_backbone.py:105,110) — a pad below k//2 shifts the
            tap window by (k//2 - pad) toward higher input coords.
    Returns:
        (B, Q, K) int32 slot indices into the support axis, -1 = absent.
    """
    offs = _kernel_offsets(kernel)  # (K, 3)
    if padding is not None:
        shift = jnp.asarray(
            [int(k) // 2 - int(p) for k, p in zip(kernel, padding)],
            jnp.int32,
        )
        offs = offs + shift[None, :]
    keys, _ = _flat_key(coords, grid_size)  # (B, V)
    order = jnp.argsort(keys, axis=-1)
    sorted_keys = jnp.take_along_axis(keys, order, axis=-1)

    if query_coords is None:
        query_coords = coords
    q_valid = jnp.all(query_coords >= 0, axis=-1)
    base = query_coords * jnp.asarray(stride, jnp.int32)
    nbr = base[:, :, None, :] + offs[None, None]  # (B, Q, K, 3)
    nbr_keys, nbr_ok = _flat_key(nbr, grid_size)

    V = coords.shape[1]

    def per_frame(skeys, ord_, qk):
        pos = jnp.searchsorted(skeys, qk.reshape(-1)).clip(0, V - 1)
        found = skeys[pos] == qk.reshape(-1)
        slot = jnp.where(found, ord_[pos], -1)
        return slot.reshape(qk.shape)

    slots = jax.vmap(per_frame)(sorted_keys, order, nbr_keys)
    return jnp.where(
        nbr_ok & (nbr_keys != INVALID) & q_valid[:, :, None], slots, -1
    ).astype(jnp.int32)


def gather_matmul_conv(features, nbr_idx, weight):
    """The sparse conv contraction.

    Args:
        features: (B, V, C_in) support features (padding rows zero);
        nbr_idx: (B, Q, K) slots (-1 absent); weight: (K, C_in, C_out).
    Returns:
        (B, Q, C_out).
    """
    B_, V, C_in = features.shape
    # two-sided clip (like ops/grouping.py): a stray slot >= V must not
    # read a neighboring batch's rows through the flat (B*V, C) table
    safe = jnp.clip(nbr_idx, 0, V - 1)
    # one flat gather over the (B*V, C) table: XLA's batched row-gather
    # emitter costs ~2.3x more per element at B>1 (ops/grouping.py note)
    base = (jnp.arange(B_, dtype=jnp.int32) * V)[:, None, None]
    g = jnp.take(
        features.reshape(B_ * V, C_in),
        (safe.astype(jnp.int32) + base).reshape(-1),
        axis=0,
    ).reshape(safe.shape + (C_in,))  # (B, Q, K, C)
    g = jnp.where((nbr_idx >= 0)[..., None], g, 0.0)
    B, Q, K, C = g.shape
    return jax.lax.dot_general(
        g.reshape(B, Q, K * C),
        weight.reshape(K * C, -1),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit,
         static_argnames=("grid_size", "kernel", "stride", "padding"))
def build_inverse_neighbor_table(coords, grid_size, query_coords,
                                 kernel=(3, 3, 3), stride=(2, 2, 2),
                                 padding=None):
    """Transposed (inverse) conv table — spconv SparseInverseConv3d.

    For each FINE-lattice query site ``q`` (the pre-downsample active set
    the forward strided conv consumed), find the COARSE support slots
    ``d`` whose forward footprint covered it: ``d * stride + off == q``,
    i.e. ``d = (q - off) / stride`` where the division is exact.

    Args:
        coords: (B, V, 3) zyx coarse support sites (-1 padded), in
            COARSE-lattice units; ``grid_size`` is the coarse grid.
        query_coords: (B, Q, 3) zyx fine-lattice output sites (-1 padded).
        padding: per-axis zyx padding of the FORWARD conv being
            inverted (default k//2) — the inverse replays the same
            shifted tap windows.
    Returns:
        (B, Q, K) int32 slots into the coarse support axis, -1 = absent.
    """
    offs = _kernel_offsets(kernel)  # (K, 3)
    if padding is not None:
        shift = jnp.asarray(
            [int(k) // 2 - int(p) for k, p in zip(kernel, padding)],
            jnp.int32,
        )
        offs = offs + shift[None, :]
    keys, _ = _flat_key(coords, grid_size)
    order = jnp.argsort(keys, axis=-1)
    sorted_keys = jnp.take_along_axis(keys, order, axis=-1)

    q_valid = jnp.all(query_coords >= 0, axis=-1)
    st = jnp.asarray(stride, jnp.int32)
    t = query_coords[:, :, None, :] - offs[None, None]  # (B, Q, K, 3)
    # jnp.mod is non-negative for a positive divisor, so negative t
    # (off-lattice) fails the exactness test without a separate sign check
    exact = jnp.all(t % st == 0, axis=-1)
    d = t // st
    nbr_keys, nbr_ok = _flat_key(d, grid_size)

    V = coords.shape[1]

    def per_frame(skeys, ord_, qk):
        pos = jnp.searchsorted(skeys, qk.reshape(-1)).clip(0, V - 1)
        found = skeys[pos] == qk.reshape(-1)
        slot = jnp.where(found, ord_[pos], -1)
        return slot.reshape(qk.shape)

    slots = jax.vmap(per_frame)(sorted_keys, order, nbr_keys)
    keep = exact & nbr_ok & (nbr_keys != INVALID) & q_valid[:, :, None]
    return jnp.where(keep, slots, -1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("out_budget", "stride", "out_grid",
                                   "dilate", "kernel", "padding"))
def downsample_coords(coords, out_budget, stride=(2, 2, 2), out_grid=None,
                      dilate=False, kernel=(3, 3, 3), padding=None):
    """Strided-conv output active set (-1 padded, first `out_budget`
    unique sites in scan order).

    Two policies:

    * ``dilate=False`` (containment): sites ``floor(coords / stride)``
      only — the center-tap site per input.  Clamped into ``out_grid``
      (zyx dims) when given: on pad-0 axes (reference conv4 z /
      conv_out) the output grid is ``(n-1)//2`` and the last input
      plane folds onto the last output site (still inside its pad-0 tap
      window ``[2o, 2o+2]``).
    * ``dilate=True`` (spconv SparseConv3d semantics): EVERY output
      site whose tap window ``[o*s - p, o*s - p + k - 1]`` contains an
      active input — per axis that is ``(i + p) // s`` and the site
      below it, masked by the window test and the ``out_grid`` bound.
      This reproduces the reference's output active sets exactly (up to
      the budget cap), where containment is a subset.

    Uses sort + neighbor-difference dedup — fixed shapes throughout.
    """
    valid = jnp.all(coords >= 0, axis=-1)
    st = jnp.asarray(stride, jnp.int32)
    if dilate:
        if padding is None:
            padding = tuple(int(k) // 2 for k in kernel)
        p = jnp.asarray([int(x) for x in padding], jnp.int32)
        kk = jnp.asarray([int(x) for x in kernel], jnp.int32)
        hi = (coords + p) // st  # (B, V, 3) upper candidate per axis
        # 8 combos: choose hi or hi-1 per axis
        combo = jnp.asarray(
            [[(c >> a) & 1 for a in range(3)] for c in range(8)],
            jnp.int32,
        )  # (8, 3) in {0, 1}; 1 -> hi, 0 -> hi - 1
        cand = hi[:, :, None, :] - (1 - combo)[None, None]  # (B,V,8,3)
        start = cand * st - p
        in_win = (start <= coords[:, :, None, :]) & (
            coords[:, :, None, :] <= start + kk - 1
        )
        ok = jnp.all(in_win & (cand >= 0), axis=-1)
        if out_grid is not None:
            og = jnp.asarray(out_grid, jnp.int32)
            ok &= jnp.all(cand < og[None, None, None], axis=-1)
        ok &= valid[:, :, None]
        B, V = coords.shape[:2]
        half = jnp.where(ok[..., None], cand, -1).reshape(B, V * 8, 3)
        valid = ok.reshape(B, V * 8)
    else:
        half = coords // st
        if out_grid is not None:
            half = jnp.minimum(
                half, jnp.asarray(out_grid, jnp.int32)[None, None] - 1
            )
        half = jnp.where(valid[..., None], half, -1)
    # order by a flat key on a virtual (2048^2 x 256) grid for dedup —
    # covers full-res KITTI (1600 x 1408 x 41) pre-halving coords
    BIG = jnp.int32(1 << 22)
    key = jnp.where(
        valid, half[..., 0] * BIG + half[..., 1] * 2048 + half[..., 2],
        INVALID,
    )
    skey = jnp.sort(key, axis=-1)
    first = jnp.concatenate(
        [jnp.ones_like(skey[:, :1], bool), skey[:, 1:] != skey[:, :-1]],
        axis=-1,
    ) & (skey != INVALID)

    def compact(sk, fm):
        rank = jnp.cumsum(fm) - 1
        out = jnp.full((out_budget,), INVALID, sk.dtype)
        src = jnp.where(fm & (rank < out_budget), rank, out_budget)
        out = out.at[src].set(sk, mode="drop")
        return out

    ukeys = jax.vmap(compact)(skey, first)  # (B, out_budget)
    ok = ukeys != INVALID
    z = jnp.where(ok, ukeys // BIG, -1)
    rem = ukeys % BIG
    y = jnp.where(ok, rem // 2048, -1)
    x = jnp.where(ok, rem % 2048, -1)
    return jnp.stack([z, y, x], axis=-1).astype(jnp.int32)
