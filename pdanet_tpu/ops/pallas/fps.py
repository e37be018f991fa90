"""Pallas TPU kernel for farthest-point sampling.

FPS is the one irreducibly sequential hot op (SURVEY.md §7 hard-part 1):
iteration j needs the argmax of the running min-distance field.  The XLA
``fori_loop`` formulation pays per-iteration loop overhead + HBM traffic
(~16 us/step -> 67 ms for the 16384->4096 KITTI layer, 95% of the whole
forward).  This kernel runs the entire m-step loop inside ONE Pallas
program per batch row with everything resident in VMEM:

  - points live as three (R, 128) planes (x, y, z), lanes along N,
  - the running min-distance field ``temp`` is a VMEM scratch,
  - per step: vectorized distance update + two-stage argmax (max, then
    first-match linear index via masked min over an iota) — ties resolve
    to the lowest index, identical to the CUDA tree reduction for real
    data and to the XLA fallback (sampling_gpu.cu:94-209 semantics:
    first index 0, temp init 1e10),
  - selected indices are written with a masked vector update into the
    (npoint_r, 128) output plane (Mosaic cannot store scalars to VMEM).

N must be a multiple of 128 (every shipped config's budget is); npoint is
padded up to a lane multiple and sliced by the caller.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BIG = 1e10  # python literal: jnp constants would be captured by the kernel

# Tried and rejected (same outputs, no speedup -- the kernel is bound by
# the per-step argmax dependency chain, not by pass count or loop
# overhead): dynamic-sublane coordinate fetch instead of field-masked
# sums, a (1, 128) row output buffer instead of the masked (P, 128)
# rewrite, and manual loop unrolling (Mosaic lowers fori_loop only at
# unroll 1/full).  16384->4096 sits at ~3.0 ms / ~740 ns a step.


def _fps_kernel(npoint, xs_ref, ys_ref, zs_ref, out_ref, temp_ref):
    # blocks: xs/ys/zs (1, R, 128); out (1, P, 128) int32; temp (R, 128)
    R = xs_ref.shape[1]
    N = R * _LANES
    P = out_ref.shape[1]
    lin = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0) * _LANES + \
        jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    lin_out = jax.lax.broadcasted_iota(jnp.int32, (P, _LANES), 0) * _LANES + \
        jax.lax.broadcasted_iota(jnp.int32, (P, _LANES), 1)

    temp_ref[:, :] = jnp.full((R, _LANES), _BIG, dtype=jnp.float32)
    out_ref[0, :, :] = jnp.zeros((P, _LANES), dtype=jnp.int32)

    def body(j, last):
        # Mosaic has no dynamic-lane scalar loads; select the current
        # point's coordinates with a masked reduction instead.
        sel = lin == last
        xs = xs_ref[0, :, :]
        ys = ys_ref[0, :, :]
        zs = zs_ref[0, :, :]
        cx = jnp.sum(jnp.where(sel, xs, 0.0))
        cy = jnp.sum(jnp.where(sel, ys, 0.0))
        cz = jnp.sum(jnp.where(sel, zs, 0.0))
        dx = xs - cx
        dy = ys - cy
        dz = zs - cz
        d = dx * dx + dy * dy + dz * dz
        t = jnp.minimum(temp_ref[:, :], d)
        temp_ref[:, :] = t
        m = jnp.max(t)
        # first linear index attaining the max (lowest-index tie-break)
        best = jnp.min(jnp.where(t >= m, lin, N))
        out_ref[0, :, :] = jnp.where(lin_out == j, best, out_ref[0, :, :])
        return best

    jax.lax.fori_loop(1, npoint, body, 0, unroll=False)


def _fps_kernel_grouped(npoint, G, xs_ref, ys_ref, zs_ref, out_ref,
                        temp_ref):
    """G frames per program, stepped side by side.

    FPS is latency-bound (~740 ns/step: the argmax reduction chain), so
    one frame leaves the VPU mostly idle.  G independent frames inside
    one loop body give the Mosaic scheduler G parallel dependency chains
    to interleave — batch throughput without touching the per-frame
    semantics (each frame's field/argmax/output is its own row block).
    """
    R = xs_ref.shape[1] // G
    N = R * _LANES
    P = out_ref.shape[1] // G
    lin = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0) * _LANES + \
        jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    lin_out = jax.lax.broadcasted_iota(jnp.int32, (P, _LANES), 0) * _LANES + \
        jax.lax.broadcasted_iota(jnp.int32, (P, _LANES), 1)

    temp_ref[:, :] = jnp.full((G * R, _LANES), _BIG, dtype=jnp.float32)
    out_ref[0, :, :] = jnp.zeros((G * P, _LANES), dtype=jnp.int32)

    def body(j, lasts):
        new_lasts = []
        for g in range(G):
            last = lasts[g]
            sel = lin == last
            xs = xs_ref[0, g * R:(g + 1) * R, :]
            ys = ys_ref[0, g * R:(g + 1) * R, :]
            zs = zs_ref[0, g * R:(g + 1) * R, :]
            cx = jnp.sum(jnp.where(sel, xs, 0.0))
            cy = jnp.sum(jnp.where(sel, ys, 0.0))
            cz = jnp.sum(jnp.where(sel, zs, 0.0))
            dx = xs - cx
            dy = ys - cy
            dz = zs - cz
            d = dx * dx + dy * dy + dz * dz
            t = jnp.minimum(temp_ref[g * R:(g + 1) * R, :], d)
            temp_ref[g * R:(g + 1) * R, :] = t
            m = jnp.max(t)
            best = jnp.min(jnp.where(t >= m, lin, N))
            out_ref[0, g * P:(g + 1) * P, :] = jnp.where(
                lin_out == j, best, out_ref[0, g * P:(g + 1) * P, :]
            )
            new_lasts.append(best)
        return tuple(new_lasts)

    jax.lax.fori_loop(1, npoint, body, (jnp.int32(0),) * G, unroll=False)


@partial(jax.jit, static_argnames=("npoint", "group"))
def farthest_point_sample_pallas_grouped(xyz, npoint, group=4):
    """(B, N, 3) -> (B, npoint) — identical outputs to the per-frame
    kernel; `group` frames share each program for latency hiding.  B is
    padded to a multiple of `group` with copies of frame 0."""
    B, N, _ = xyz.shape
    G = min(group, B)
    padB = (-B) % G
    if padB:
        xyz = jnp.concatenate(
            [xyz, jnp.broadcast_to(xyz[0:1], (padB,) + xyz.shape[1:])], 0
        )
    Bp = B + padB
    pad = (-N) % _LANES
    if pad:
        xyz = jnp.concatenate(
            [xyz, jnp.broadcast_to(xyz[:, 0:1, :], (Bp, pad, 3))], axis=1
        )
        N += pad
    R = N // _LANES
    P = (npoint + _LANES - 1) // _LANES
    planes = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1)).reshape(
        Bp, 3, R, _LANES
    )
    # group frames into the row axis: (Bp/G, G*R, 128)
    xs = planes[:, 0].reshape(Bp // G, G * R, _LANES)
    ys = planes[:, 1].reshape(Bp // G, G * R, _LANES)
    zs = planes[:, 2].reshape(Bp // G, G * R, _LANES)

    out = pl.pallas_call(
        partial(_fps_kernel_grouped, npoint, G),
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((1, G * R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G * P, _LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp // G, G * P, _LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((G * R, _LANES), jnp.float32)],
    )(xs, ys, zs)
    return out.reshape(Bp, P * _LANES)[:B, :npoint]


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_pallas(xyz, npoint):
    """(B, N, 3) -> (B, npoint) int32.

    N is padded to a lane multiple with copies of point 0: a duplicate's
    running min-distance is pinned at 0 from the first selection (index 0
    is always picked first), so pads can never win the argmax and the
    sampled indices always reference real points.
    """
    B, N, _ = xyz.shape
    pad = (-N) % _LANES
    if pad:
        xyz = jnp.concatenate(
            [xyz, jnp.broadcast_to(xyz[:, 0:1, :], (B, pad, 3))], axis=1
        )
        N += pad
    R = N // _LANES
    P = (npoint + _LANES - 1) // _LANES  # output rows (lane-padded)
    planes = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1)).reshape(
        B, 3, R, _LANES
    )
    xs, ys, zs = planes[:, 0], planes[:, 1], planes[:, 2]

    out = pl.pallas_call(
        partial(_fps_kernel, npoint),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, _LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, _LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, _LANES), jnp.float32)],
    )(xs, ys, zs)
    return out.reshape(B, P * _LANES)[:, :npoint]
