"""BatchNorm with torch running-stat semantics.

flax.linen.BatchNorm and torch.nn.BatchNorm2d agree on the *normalisation*
(both use the biased batch variance in train mode) but disagree on the
*running-stat update*: torch accumulates the UNBIASED batch variance
(``var * n / (n - 1)``, see torch BatchNorm docs / Normalization.cpp), flax
accumulates the biased one. Forward parity tests can't see the difference;
N-step training equivalence can (tests/test_train_equivalence.py). This
module is a drop-in replacement for the subset of flax.linen.BatchNorm this
framework uses, with the torch update rule.

Reference semantics: torch.nn.BatchNorm2d(momentum=0.1) as constructed all
over /root/reference/models/ctrgcn.py (e.g. :191,240-244) and
models/stgcn.py. Our ``momentum`` follows the flax convention
(keep-fraction; flax 0.9 == torch 0.1).

Variable collection layout ('batch_stats': {'mean','var'}; 'params':
{'scale','bias'}) matches flax.linen.BatchNorm exactly, so checkpoints and
the torch-import shims are unaffected.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class BatchNorm(nn.Module):
    """Drop-in flax BatchNorm with torch-style unbiased running variance.

    Feature axis is the last axis; stats are computed over all other axes in
    float32 regardless of ``dtype`` (matching flax, which promotes stat
    accumulation to f32).
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    use_bias: bool = True
    use_scale: bool = True
    bias_init: Callable = nn.initializers.zeros
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feats = x.shape[-1]
        # stats accumulate in at least f32 (flax behaviour), but follow the
        # input upward so float64 equivalence runs stay exact end-to-end
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, stat_dtype), (feats,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, stat_dtype), (feats,)
        )

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(stat_dtype)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            # fast-variance formulation (mean of squares), like flax default
            var = jnp.maximum(
                0.0, jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            )
            if not self.is_initializing():
                n = x.size // feats
                m = self.momentum
                bessel = n / max(n - 1, 1)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                # torch: running_var accumulates the unbiased batch variance
                ra_var.value = m * ra_var.value + (1.0 - m) * var * bessel

        dtype = self.dtype or x.dtype
        scale = (
            self.param("scale", self.scale_init, (feats,), self.param_dtype)
            if self.use_scale
            else None
        )
        bias = (
            self.param("bias", self.bias_init, (feats,), self.param_dtype)
            if self.use_bias
            else None
        )
        mul = lax.rsqrt(var.astype(dtype) + jnp.asarray(self.epsilon, dtype))
        if scale is not None:
            mul = mul * scale.astype(dtype)
        y = (x.astype(dtype) - mean.astype(dtype)) * mul
        if bias is not None:
            y = y + bias.astype(dtype)
        return y
