"""Shared numerics helpers for cross-compilation comparison tests."""
import jax
import numpy as np


def perturb_offset_convs(params, scale: float = 0.02, seed: int = 0):
    """Move the TAM offset branch (and alpha) off its degenerate zero init.

    At init, offset_conv kernels are exactly zero, so offset_bn normalises
    an all-zero tensor: batch variance 0, and the backward through
    x * rsqrt(var + eps) carries a 1/sqrt(eps) ~ 316x amplifier. Any two
    DIFFERENTLY-COMPILED programs (sharded vs replicated, packed vs
    unpacked) then disagree on gradients at the percent level from pure
    reduction-order noise, drowning one-step equivalence checks. Giving the
    offset kernels a small random value makes the offset-BN variance
    O(scale^2) >> eps and restores fp-noise-level comparisons. Semantics
    tests against the reference keep the true zero init (f64 kills the
    noise there instead).
    """
    rs = np.random.RandomState(seed)

    def f(path, leaf):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        if ("offset_conv" in keys and keys.endswith("kernel")) or \
                keys.endswith("alpha"):
            return leaf + scale * rs.standard_normal(leaf.shape).astype(
                np.asarray(leaf).dtype
            )
        return leaf

    return jax.tree_util.tree_map_with_path(f, params)
