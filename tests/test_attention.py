"""Oracle tests for the fused Pallas neighbor-attention kernel.

The kernel (ops/pallas/attention.py) must reproduce flax's
``nn.dot_product_attention`` exactly for the PDA transformer's shapes —
it substitutes only the attention core between the q/k/v and out
projections of ``nn.MultiHeadDotProductAttention`` (PointFormer.py:7-39
semantics are otherwise untouched).  Runs in interpret mode on CPU.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdanet_tpu.models.blocks import TransformerEncoderLayerPreNorm
from pdanet_tpu.ops.pallas.attention import (
    neighbor_attention,
    supported_shape,
)


def _rand_qkv(rng, batch, K, H, hd, dtype=jnp.float32):
    ks = jax.random.split(rng, 3)
    shape = tuple(batch) + (K, H, hd)
    return tuple(
        jax.random.normal(k, shape, dtype=jnp.float32).astype(dtype)
        for k in ks
    )


class TestNeighborAttentionKernel:
    @pytest.mark.parametrize(
        "batch,K,H,hd,block_rows",
        [
            ((2, 12), 16, 4, 64, 1024),   # layer-1 geometry (d_model 256)
            ((1, 8), 32, 4, 128, 1024),   # layer-2 geometry (d_model 512)
            ((2, 16), 32, 4, 128, 256),   # multi-program grid, n_sub=2
            ((2, 12), 16, 4, 32, 1024),   # d_model 128: 4 heads per panel
            ((1, 3), 16, 4, 64, 1024),    # R=48: fake-center padding path
            ((4,), 8, 2, 64, 128),        # single-dim batch, K=8
        ],
    )
    def test_matches_flax_dot_product_attention(
        self, batch, K, H, hd, block_rows
    ):
        assert supported_shape(K, H, hd)
        q, k, v = _rand_qkv(jax.random.PRNGKey(0), batch, K, H, hd)
        ref = nn.dot_product_attention(q, k, v)
        got = neighbor_attention(
            q, k, v, interpret=True, block_rows=block_rows
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_bf16_inputs(self):
        q, k, v = _rand_qkv(
            jax.random.PRNGKey(1), (1, 8), 32, 4, 128, dtype=jnp.bfloat16
        )
        ref = nn.dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32),
        )
        got = neighbor_attention(q, k, v, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float32), np.asarray(ref),
            rtol=5e-2, atol=5e-2,
        )

    def test_unsupported_shapes_flagged(self):
        assert not supported_shape(24, 4, 64)    # 24 does not divide 128
        assert not supported_shape(16, 4, 96)    # 96 does not divide 128
        assert not supported_shape(16, 1, 64)    # H*hd=64 < one lane panel
        assert supported_shape(64, 4, 128)

    def test_dispatch_policy(self):
        from pdanet_tpu.ops.pallas.attention import profitable_shape

        # measured on v5e: the kernel only beats flax when the head split
        # is sub-128-lane (hd < 128 forces XLA relayout copies)
        assert profitable_shape(16, 4, 64)
        assert profitable_shape(32, 4, 64)
        assert not profitable_shape(16, 4, 128)
        assert not profitable_shape(32, 4, 128)


class TestNeighborAttentionGrads:
    """Op- and module-level VJP parity vs flax autodiff.

    These ARE the gradient ground truth for the kernel: full-MODEL grad
    comparisons are chaotic at random weights (measured 2026-08-18: a 1e-6
    perturbation of one weight on the pure-flax path moves the full-model
    grad-max by ~130 while the loss moves <1e-5 — discrete ctr-aware
    sampling / target-assignment ties flip on fp noise), so end-to-end
    validation asserts loss equality instead (the verify drive does)."""
    @pytest.mark.parametrize(
        "batch,K,H,hd",
        [
            ((2, 12), 16, 4, 64),   # two heads per lane panel
            ((1, 8), 32, 4, 128),   # one head per panel
            ((2, 12), 16, 4, 32),   # d_model 128: four heads per panel
            ((1, 3), 16, 4, 64),    # R=48: fake-center padding path
        ],
    )
    def test_vjp_matches_flax_grads(self, batch, K, H, hd):
        from pdanet_tpu.ops.pallas.attention import (
            neighbor_attention_flat_trainable,
        )

        q, k, v = _rand_qkv(jax.random.PRNGKey(8), batch, K, H, hd)
        D = H * hd
        q2, k2, v2 = (a.reshape(-1, D) for a in (q, k, v))
        w = jax.random.normal(jax.random.PRNGKey(9), q2.shape)

        def f_ref(a, b, c):
            o = nn.dot_product_attention(
                a.reshape(q.shape), b.reshape(q.shape), c.reshape(q.shape)
            )
            return jnp.sum(o.reshape(-1, D) * w)

        def f_ker(a, b, c):
            o = neighbor_attention_flat_trainable(a, b, c, K, H, hd, True)
            return jnp.sum(o * w)

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q2, k2, v2)
        g_ker = jax.grad(f_ker, argnums=(0, 1, 2))(q2, k2, v2)
        for got, want in zip(g_ker, g_ref):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
            )

    def test_module_train_grads_match_flax(self):
        """Full-layer parameter gradients through the Pallas VJP equal the
        flax einsum path's (shared params, train mode)."""
        x = jax.random.normal(jax.random.PRNGKey(10), (2, 6, 16, 256))
        mk = lambda impl: TransformerEncoderLayerPreNorm(
            d_model=256, nhead=4, dim_feedforward=128, attention_impl=impl
        )
        params = mk("flax").init(jax.random.PRNGKey(11), x, train=True)

        def loss(impl, p):
            out = mk(impl).apply(p, x, train=True)
            return jnp.sum(out * out)

        g_ref = jax.grad(lambda p: loss("flax", p))(params)
        g_ker = jax.grad(lambda p: loss("pallas_interpret", p))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            ),
            g_ker, g_ref,
        )


class TestModuleWiring:
    def test_pallas_path_matches_flax_path(self):
        """TransformerEncoderLayerPreNorm with the kernel forced on equals
        the flax einsum path with identical params."""
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 16, 256))
        mk = lambda impl: TransformerEncoderLayerPreNorm(
            d_model=256, nhead=4, dim_feedforward=128, attention_impl=impl
        )
        params = mk("flax").init(jax.random.PRNGKey(3), x, train=False)
        ref = mk("flax").apply(params, x, train=False)
        got = mk("pallas_interpret").apply(params, x, train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_auto_mode_on_cpu_uses_flax(self):
        """No TPU here: auto mode must not touch the Pallas path (non-
        interpret pallas_call would fail on CPU)."""
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 16, 256))
        mod = TransformerEncoderLayerPreNorm(
            d_model=256, nhead=4, dim_feedforward=128
        )
        params = mod.init(jax.random.PRNGKey(5), x, train=False)
        out = mod.apply(params, x, train=False)
        assert out.shape == x.shape

    def test_param_trees_interchangeable(self):
        """Both branches declare the SAME parameter tree (names, shapes) —
        a checkpoint trained through the flax path loads into the Pallas
        path and vice versa."""
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 16, 256))
        mk = lambda impl: TransformerEncoderLayerPreNorm(
            d_model=256, nhead=4, dim_feedforward=128, attention_impl=impl
        )
        pf = mk("flax").init(jax.random.PRNGKey(7), x, train=False)
        pp = mk("pallas_interpret").init(jax.random.PRNGKey(7), x, train=False)
        sf = jax.tree.map(lambda a: a.shape, pf)
        sp = jax.tree.map(lambda a: a.shape, pp)
        assert sf == sp
        # identical init draws too (flax inits DenseGeneral kernels on the
        # flat shape; _DenseGeneralParams replicates that)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=0
            ),
            pf, pp,
        )
