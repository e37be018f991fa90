"""Max reduction with torch's tie-break GRADIENT semantics.

torch ``F.max_pool2d`` and ``Tensor.max(dim=...)`` — the forms the
reference uses for every K-neighborhood pooling
(``pointnet2_modules.py:1667``, the transformer pooling ``:931``) and for
the density normalization (``PointConvDensitySetAbstraction.forward``,
``:996-1001``) — route the backward gradient to the FIRST maximal slot
only.  ``jnp.max`` splits the gradient equally among tied slots.

Ties are not a measure-zero corner case here: the CUDA ball query's
first-hit padding semantics (``ball_query_gpu.cu:35-39``) duplicate the
first in-radius neighbor into every unfilled slot, so most groups carry
exact duplicates and the two frameworks' gradients genuinely diverge
(discovered by the round-3 training-trajectory twin,
tests/test_train_trajectory_twin.py — per-leaf gradient deltas up to 2x
concentrated around pooling sites).

``max_first`` keeps the cheap ``jnp.max`` forward and installs a
custom VJP that scatters the cotangent to the first argmax slot,
matching torch bit-for-bit on duplicated-slot ties.
"""

import jax
import jax.numpy as jnp


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_first(x, axis):
    return jnp.max(x, axis=axis)


def _max_first_fwd(x, axis):
    idx = jnp.argmax(x, axis=axis)  # first occurrence on ties
    # residuals must be jax types: carry the reduced-axis size/dtype in a
    # zero-length-cost dummy
    dummy = jnp.zeros((x.shape[axis % x.ndim],), x.dtype)
    return jnp.max(x, axis=axis), (idx, dummy)


def _max_first_bwd(axis, res, g):
    idx, dummy = res
    axis = axis % (g.ndim + 1)
    shape = g.shape[:axis] + (dummy.shape[0],) + g.shape[axis:]
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    mask = iota == jnp.expand_dims(idx, axis)
    return (jnp.where(mask, jnp.expand_dims(g, axis),
                      jnp.zeros((), dummy.dtype)),)


max_first.defvjp(_max_first_fwd, _max_first_bwd)


def max_first_keepdims(x, axis):
    return jnp.expand_dims(max_first(x, axis), axis)
