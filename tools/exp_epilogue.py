#!/usr/bin/env python
"""UnitGCN train-epilogue cost probe (round 4).

Measures, per backbone layer shape, the fwd and fwd+bwd cost of the
non-aggregation UnitGCN chain that follows the fused CTR-GC kernel
(reference models/ctrgcn.py:246-263):

    ybn    = BN1_train(y)                      # batch stats over (N,T,V)
    diff   = res - ybn
    u      = diff @ W_off + b_off              # zero-init 1x1 offset conv
    offset = tanh(BN3_train(u))
    out    = relu(ybn + offset + res)

Variants:
  xla        the chain exactly as the flax model traces it
  xla2       restructured: single-pass sum/sumsq stats; BN1 affine folded
             into the offset matmul (u = res@W - y@(s1*W) + const) so the
             diff tensor is never materialised
  floor      HBM byte floor for a 3-pass fused schedule (analytic)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_epilogue.py
"""
from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tamgcn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tamgcn_tpu.utils.timing import time_chained  # noqa: E402

EPS = 1e-5
N = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def epi_xla(y, res, g1, b1, W, bo, g3, b3):
    """The epilogue as the model currently traces it (ops/norm.py BatchNorm)."""
    sd = jnp.promote_types(y.dtype, jnp.float32)
    yf = y.astype(sd)
    mu = jnp.mean(yf, (0, 1, 2))
    var = jnp.maximum(0.0, jnp.mean(jnp.square(yf), (0, 1, 2)) - jnp.square(mu))
    mul = jax.lax.rsqrt(var.astype(y.dtype) + jnp.asarray(EPS, y.dtype)) * g1.astype(y.dtype)
    ybn = (y - mu.astype(y.dtype)) * mul + b1.astype(y.dtype)
    diff = res - ybn
    u = jnp.einsum("ntvc,cd->ntvd", diff, W.astype(diff.dtype),
                   preferred_element_type=sd) + bo
    uf = u.astype(sd)
    mu3 = jnp.mean(uf, (0, 1, 2))
    var3 = jnp.maximum(0.0, jnp.mean(jnp.square(uf), (0, 1, 2)) - jnp.square(mu3))
    mul3 = jax.lax.rsqrt(var3.astype(u.dtype) + jnp.asarray(EPS, u.dtype)) * g3.astype(u.dtype)
    off = jnp.tanh((u - mu3.astype(u.dtype)) * mul3 + b3.astype(u.dtype))
    return jax.nn.relu(ybn + off.astype(ybn.dtype) + res)


def epi_xla2(y, res, g1, b1, W, bo, g3, b3):
    """Restructured pure-XLA epilogue: fold BN1's affine into the offset
    matmul so `diff` is never formed; one-pass stats."""
    sd = jnp.promote_types(y.dtype, jnp.float32)
    yf = y.astype(sd)
    s = jnp.sum(yf, (0, 1, 2))
    s2 = jnp.sum(jnp.square(yf), (0, 1, 2))
    n = y.shape[0] * y.shape[1] * y.shape[2]
    mu = s / n
    var = jnp.maximum(0.0, s2 / n - jnp.square(mu))
    inv = jax.lax.rsqrt(var + EPS)
    s1 = (inv * g1).astype(sd)            # ybn = y*s1 + t1
    t1 = (b1 - mu * inv * g1).astype(sd)
    # u = (res - ybn) @ W + bo = res@W - y@(s1*W) + (bo - t1@W)
    Wf = W.astype(sd)
    Ws = (s1[:, None] * Wf)
    cst = bo.astype(sd) - t1 @ Wf
    u = (
        jnp.einsum("ntvc,cd->ntvd", res, W.astype(res.dtype),
                   preferred_element_type=sd)
        - jnp.einsum("ntvc,cd->ntvd", y, Ws.astype(y.dtype),
                     preferred_element_type=sd)
        + cst
    )
    su = jnp.sum(u, (0, 1, 2))
    su2 = jnp.sum(jnp.square(u), (0, 1, 2))
    mu3 = su / n
    var3 = jnp.maximum(0.0, su2 / n - jnp.square(mu3))
    inv3 = jax.lax.rsqrt(var3 + EPS)
    s3 = inv3 * g3
    t3 = b3 - mu3 * inv3 * g3
    off = jnp.tanh(u * s3 + t3)
    ybn = y.astype(sd) * s1 + t1
    return jax.nn.relu(ybn + off + res.astype(sd)).astype(y.dtype)


SHAPES = [
    # (name, T, C, n_layers_with_this_shape)
    ("l2-4", 52, 64, 3),
    ("l5", 52, 128, 1),
    ("l6-7", 26, 128, 2),
    ("l8", 26, 256, 1),
    ("l9-10", 13, 256, 2),
]

HBM_GBPS = 819e9  # v5e


def main():
    log("backend:", jax.default_backend(), jax.devices())
    key = jax.random.PRNGKey(0)
    total = {"xla": 0.0, "xla2": 0.0, "xla_tr": 0.0, "xla2_tr": 0.0,
             "floor": 0.0, "floor_tr": 0.0}
    for dtype in (jnp.float32, jnp.bfloat16):
        log(f"==== dtype {dtype.__name__} ====")
        for name, T, C, nl in SHAPES:
            ks = jax.random.split(key, 8)
            y = jax.random.normal(ks[0], (N, T, 20, C), dtype)
            res = jax.random.normal(ks[1], (N, T, 20, C), dtype)
            g1 = jax.random.normal(ks[2], (C,)) * 0.1 + 1.0
            b1 = jax.random.normal(ks[3], (C,)) * 0.1
            W = jax.random.normal(ks[4], (C, C)) * 0.05
            bo = jax.random.normal(ks[5], (C,)) * 0.1
            g3 = jax.random.normal(ks[6], (C,)) * 0.1 + 1.0
            b3 = jax.random.normal(ks[7], (C,)) * 0.1
            args = (y, res, g1, b1, W, bo, g3, b3)

            def feed(out, a):
                return (out, a[0]) + a[2:]

            bytes_el = np.dtype(dtype).itemsize
            tbytes = N * T * 20 * C * bytes_el
            # fused floor: y w(by agg) excluded; fwd passes: y r x2, res r x2,
            # u w+r, out w = 7 tensor passes
            floor_f = 7 * tbytes / HBM_GBPS
            # bwd: ~2 passes over {dout,y,res,u} + dy,dres w = ~10 passes
            floor_b = 10 * tbytes / HBM_GBPS
            for label, fn in (("xla", epi_xla), ("xla2", epi_xla2)):
                dt = time_chained(fn, feed, args, chain=40, iters=10)

                def loss_fn(yy, rr, *p):
                    return jnp.sum(fn(yy, rr, *p) ** 2)

                grad_fn = jax.grad(loss_fn, argnums=(0, 1, 4, 5))

                def feed_g(out, a):
                    return (out[0], out[1]) + a[2:]

                dtg = time_chained(grad_fn, feed_g, args, chain=40, iters=10)
                log(
                    f"{name:6s} T={T:3d} C={C:3d} {label:5s} "
                    f"fwd {dt*1e6:8.1f} us  fwd+bwd {dtg*1e6:8.1f} us  "
                    f"(floor {floor_f*1e6:6.1f} / {(floor_f+floor_b)*1e6:6.1f} us)"
                )
                if dtype == jnp.float32:
                    total[label] += nl * dt
                    total[label + "_tr"] += nl * dtg
            if dtype == jnp.float32:
                total["floor"] += nl * floor_f
                total["floor_tr"] += nl * (floor_f + floor_b)
        if dtype == jnp.float32:
            log(
                f"TOTAL 9 layers f32: xla fwd {total['xla']*1e3:.2f} ms, "
                f"fwd+bwd {total['xla_tr']*1e3:.2f} ms | xla2 fwd "
                f"{total['xla2']*1e3:.2f} ms, fwd+bwd {total['xla2_tr']*1e3:.2f} ms"
                f" | floor {total['floor']*1e3:.2f} / {total['floor_tr']*1e3:.2f} ms"
            )


if __name__ == "__main__":
    main()
