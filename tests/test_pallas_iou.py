"""VMEM-tiled Pallas self-IoU (the NMS matrix kernel) vs the XLA
rotated-IoU oracle.

The kernel substitutes a pseudo-angle for atan2 and a compare-exchange
network for the stable lax.sort (ops/pallas/rotated_iou.py docstring);
both are order-preserving up to fp ties on duplicate vertices, so IoU
values must match the XLA path to ~1e-5 and the downstream greedy NMS
keep masks must agree exactly on non-degenerate candidate sets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdanet_tpu.ops.rotated_iou import boxes_iou_bev


def _boxes(B, K, seed, spread=12.0):
    rs = np.random.RandomState(seed)
    b = np.zeros((B, K, 7), np.float32)
    b[..., 0:2] = rs.uniform(-spread, spread, (B, K, 2))
    b[..., 2] = rs.uniform(-1.5, 0.5, (B, K))
    b[..., 3:5] = rs.uniform(0.5, 4.5, (B, K, 2))
    b[..., 5] = rs.uniform(1.0, 2.0, (B, K))
    b[..., 6] = rs.uniform(-np.pi, np.pi, (B, K))
    return b


def _kernel_interpret(boxes, tr=128):
    """Run the tile kernel in interpret mode (CPU)."""
    import pdanet_tpu.ops.pallas.rotated_iou as pr
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, _ = boxes.shape
    boxes = jnp.asarray(boxes, jnp.float32)
    pad = (-K) % 128
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
    Kp = boxes.shape[1]
    tr = min(tr, Kp)
    bT = jnp.transpose(boxes, (0, 2, 1))
    out = pl.pallas_call(
        partial(pr._iou_tile_kernel, None),
        grid=(B, Kp // tr, Kp // 128),
        in_specs=[
            pl.BlockSpec((1, tr, 7), lambda b, m, n: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, 128), lambda b, m, n: (b, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, 128), lambda b, m, n: (b, m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Kp, Kp), jnp.float32),
        interpret=True,
    )(boxes, bT)
    return np.asarray(out[:, :K, :K])


class TestPallasSelfIoU:
    def test_vs_xla_random(self):
        # full matrices INCLUDING the identical-box diagonal: the
        # min-area overlap clamp in ops/rotated_iou.py bounds the XLA
        # path's degenerate-tie artifact (was IoU 1.70 on the CPU
        # argsort fallback), so the public op is IoU <= 1 everywhere
        boxes = _boxes(2, 128, seed=0)
        got = _kernel_interpret(boxes)
        want = np.asarray(jax.vmap(
            lambda b: boxes_iou_bev(b, b))(jnp.asarray(boxes)))
        assert want.max() <= 1.0 + 1e-6
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
        # the kernel's self-IoU is exactly right
        for b in range(2):
            np.testing.assert_allclose(
                np.diagonal(got[b]), 1.0, rtol=1e-5)

    def test_vs_xla_dense_overlaps(self):
        # tight cluster: most pairs genuinely overlap, exercising the
        # full 24-candidate + sort path
        boxes = _boxes(1, 128, seed=3, spread=3.0)
        got = _kernel_interpret(boxes)
        want = np.asarray(jax.vmap(
            lambda b: boxes_iou_bev(b, b))(jnp.asarray(boxes)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_zero_padding_rows(self):
        # zero boxes (the K-padding rows) must give IoU 0, not NaN
        boxes = _boxes(1, 130, seed=5)  # pads to 256 internally
        boxes[0, 100:] = 0.0
        got = _kernel_interpret(boxes)
        assert np.isfinite(got).all()
        assert (got[0, 100:, :] == 0).all()
        assert (got[0, :, 100:] == 0).all()

    def test_nms_keep_mask_agreement(self):
        from pdanet_tpu.ops.nms import _greedy_nms_mask_xla

        boxes = _boxes(1, 128, seed=7, spread=5.0)
        scores = np.random.RandomState(8).rand(128).astype(np.float32)
        order = np.argsort(-scores)
        cand = jnp.asarray(boxes[0][order])
        iou_k = jnp.asarray(_kernel_interpret(boxes[:, order])[0])
        iou_x = boxes_iou_bev(cand, cand)
        valid = jnp.ones((128,), bool)
        keep_k = np.asarray(_greedy_nms_mask_xla(iou_k, valid, 0.1))
        keep_x = np.asarray(_greedy_nms_mask_xla(iou_x, valid, 0.1))
        np.testing.assert_array_equal(keep_k, keep_x)
