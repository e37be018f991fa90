"""BatchNorm with the reference's torch running-statistics semantics.

torch ``nn.BatchNorm*`` (used throughout the reference model zoo, e.g.
``pointnet2_modules.py``, ``spconv_backbone.py``) stores the **unbiased**
(Bessel-corrected, divisor ``n-1``) batch variance into ``running_var``
while normalizing the activations with the **biased** (divisor ``n``)
variance.  ``flax.linen.BatchNorm`` stores the biased variance for both,
so the two frameworks' running stats drift apart by a constant factor
``n/(n-1)`` per feature even when every activation matches — which breaks

* exact training-trajectory parity against the reference (the round-3
  trajectory-twin test trains both stacks side by side and compares
  ``batch_stats`` at every step), and
* continued training from a converted torch checkpoint (our updates would
  mix biased batch variances into an unbiased running estimate).

This subclass reproduces flax's ``__call__`` with one change: the value
folded into ``ra_var`` is ``var * n/(n-1)`` where ``n`` is the number of
elements reduced over (torch ``_batch_norm`` semantics).  Normalization
still uses the biased ``var`` — identical activations to stock flax.

All model code imports ``BatchNorm`` from here; the class name matches
flax's, so auto-generated flax scope names (``BatchNorm_0`` …) and
therefore every existing checkpoint/converter key are unchanged.
"""

import jax
import jax.numpy as jnp
from flax.linen import module
from flax.linen.normalization import (
    _canonicalize_axes,
    _compute_stats,
    _normalize,
)
import flax.linen as nn


class BatchNorm(nn.BatchNorm):
    """flax BatchNorm with torch running/variance numerics.

    Beyond the unbiased running variance (module docstring), the batch
    variance is computed two-pass (``use_fast_variance=False`` →
    ``E[(x-mean)^2]``) like torch's native_batch_norm.  flax's default
    one-pass ``E[x^2]-E[x]^2`` suffers catastrophic cancellation on
    near-constant channels — dead-ReLU channels and ball-query
    duplicate-padded slots make those common here, and the resulting
    ``x_hat`` noise was a measurable gradient-divergence seed in the
    round-3 trajectory twin (e.g. a constant channel gets x_hat exactly 0
    in torch but cancellation noise / sqrt(eps) in fast-variance flax).
    """

    use_fast_variance: bool = False

    @module.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        use_running_average = module.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes
        )
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable(
            "batch_stats",
            "mean",
            lambda s: jnp.zeros(
                s,
                jnp.float32
                if self.force_float32_reductions
                else self.param_dtype,
            ),
            feature_shape,
        )
        ra_var = self.variable(
            "batch_stats",
            "var",
            lambda s: jnp.ones(
                s,
                jnp.float32
                if self.force_float32_reductions
                else self.param_dtype,
            ),
            feature_shape,
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            mean, var = _compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name
                if not self.is_initializing()
                else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions,
            )

            if not self.is_initializing():
                # torch stores the Bessel-corrected variance in running_var
                # (aten native_batch_norm: var_sum / (n - 1)); n counts the
                # reduced elements.  Under pjit/GSPMD x.shape is the global
                # shape, matching a cross-replica (SyncBN-like) n.
                if mask is not None:
                    # masked stats: n is the per-feature masked count
                    n_arr = jnp.sum(
                        jnp.broadcast_to(mask, x.shape).astype(jnp.float32),
                        axis=reduction_axes,
                    )
                    unbiased = var * (n_arr / jnp.maximum(n_arr - 1.0, 1.0))
                else:
                    n = 1
                    for ax in reduction_axes:
                        n *= x.shape[ax]
                    unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )

        return _normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )
