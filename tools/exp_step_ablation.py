#!/usr/bin/env python
"""Round-4 train-step cost attribution by surgical ablation.

Times the production packed train step (exactly bench.py's
bench_train_step) for model variants with pieces replaced by cheap
stand-ins, so each difference vs 'full' attributes the removed piece's
fwd+bwd cost *in context* (fusion/overlap effects included):

  full        production model (auto Pallas dispatch)
  no_tcn      MultiScaleTCN -> strided slice (removes all temporal convs)
  no_epi      UnitGCN epilogue (BN1 + offset branch + BN3) -> relu(y + res)
  no_agg      unit_ctr_gc -> conv3's first C channels pass-through
              (removes the aggregation kernels, keeps conv3/conv12)
  fwd_only    value (no grad/optimiser) of the full model, train=True

Also times the unit-level aggregation op fwd and fwd+bwd standalone at the
four backbone shapes, both Pallas and XLA.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_step_ablation.py
"""
from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tamgcn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from flax import linen as nn  # noqa: E402

import tamgcn_tpu.models.ctrgcn as ctrgcn_mod  # noqa: E402
from tamgcn_tpu.utils.timing import time_chained, time_step_chained  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_train_step(model, batch=64, dtype=None, iters=30):
    from tamgcn_tpu.parallel.mesh import make_mesh
    from tamgcn_tpu.parallel.sharded import (
        init_sharded_state,
        make_packed_train_step,
    )
    from tamgcn_tpu.train.optim import make_optimizer

    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 3, 52, 20, 1), jnp.float32
    )
    labels = jnp.asarray(np.arange(batch) % 10, jnp.int32)
    mesh = make_mesh()
    tx = make_optimizer("SGD", 0.1, steps_per_epoch=50, step=[50])
    state = init_sharded_state(model, tx, mesh, x, jax.random.PRNGKey(0))
    packed_step, flat, _ = make_packed_train_step(model, tx, state)
    step = jax.jit(packed_step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    with mesh:
        return time_step_chained(step, flat, (x, labels, rng), iters=iters)


def time_fwd_only(model, batch=64, dtype=None):
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 3, 52, 20, 1), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    def fwd(v, xx):
        out, _ = model.apply(v, xx, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
        return out

    def feed(out, args):
        return (args[0], args[1] + out.mean() * 1e-9)

    return time_chained(fwd, feed, (variables, x), chain=20, iters=10)


def bench_agg_standalone():
    """Unit-level aggregation op fwd / fwd+bwd at backbone shapes."""
    from tamgcn_tpu.ops.aggregation import unit_ctr_gc

    s = 3
    for (t, c, r, nl) in ((52, 64, 8, 4), (52, 128, 16, 1),
                          (26, 128, 16, 2), (26, 256, 32, 1),
                          (13, 256, 32, 2)):
        n, v = 64, 20
        rs = np.random.RandomState(0)
        args = (
            jnp.asarray(rs.randn(n, s, v, r), jnp.float32),
            jnp.asarray(rs.randn(n, s, v, r), jnp.float32),
            jnp.asarray(rs.randn(n, t, v, s * c), jnp.float32),
            jnp.asarray(rs.randn(s, r, c) * 0.1, jnp.float32),
            jnp.asarray(rs.randn(s, c) * 0.1, jnp.float32),
            jnp.asarray([0.1], jnp.float32),
            jnp.asarray(rs.rand(s, v, v) * 0.02, jnp.float32),
        )

        def feed(out, a):
            return a[:2] + (jnp.concatenate([out] * s, -1) * 0.3,) + a[3:]

        for up in (True, False):
            fwd = lambda *a: unit_ctr_gc(*a, use_pallas=up)  # noqa: E731
            dt_f = time_chained(fwd, feed, args, chain=60, iters=10)

            def lossf(x1, x2, x3, w4, b4, alpha, A):
                return jnp.sum(unit_ctr_gc(
                    x1, x2, x3, w4, b4, alpha, A, use_pallas=up) ** 2)

            g = jax.grad(lossf, argnums=(0, 1, 2, 3, 4, 5))

            def feed_g(out, a):
                return (a[0], a[1], a[2] + out[2] * 1e-9) + a[3:]

            dt_g = time_chained(g, feed_g, args, chain=40, iters=10)
            tag = "pallas" if up else "xla"
            log(f"agg T={t:3d} C={c:3d} x{nl} {tag:6s} "
                f"fwd {dt_f*1e6:8.1f} us  fwd+bwd {dt_g*1e6:8.1f} us")


def main():
    sel = set(sys.argv[1:]) or {"agg", "full", "fwd", "tcn", "epi", "noagg"}
    log("backend:", jax.default_backend(), jax.devices())
    if "agg" in sel:
        bench_agg_standalone()

    make = ctrgcn_mod.create_ctrgcn_nucla

    # ---- full ----
    full = 38.07e-3
    if "full" in sel:
        full = time_train_step(make(use_pallas=None))
        log(f"step full:    {full*1e3:8.2f} ms")

    if "fwd" in sel:
        fwd = time_fwd_only(make(use_pallas=None))
        log(f"fwd_only:     {fwd*1e3:8.2f} ms")

    # ---- no_tcn: strided slice ----
    class TCNSlice(ctrgcn_mod.MultiScaleTCN):
        def __call__(self, x, *, train):
            return x[:, ::self.stride]

    if "tcn" in sel:
        orig_tcn = ctrgcn_mod.MultiScaleTCN
        ctrgcn_mod.MultiScaleTCN = TCNSlice
        try:
            no_tcn = time_train_step(make(use_pallas=None))
        finally:
            ctrgcn_mod.MultiScaleTCN = orig_tcn
        log(f"step no_tcn:  {no_tcn*1e3:8.2f} ms  (tcn cost ~{(full-no_tcn)*1e3:.2f} ms)")

    # ---- TCN sub-ablations: replace single branch groups with slices ----
    if "tcnsub" in sel:
        orig_tcn = ctrgcn_mod.MultiScaleTCN

        def make_variant(skip):
            def call(self, x, *, train):
                num_branches = len(self.dilations) + 2
                bc = self.out_channels // num_branches
                ks = self.kernel_size
                if not isinstance(ks, (list, tuple)):
                    ks = [ks] * len(self.dilations)
                from tamgcn_tpu.ops.norm import BatchNorm
                from tamgcn_tpu.ops.inits import (
                    kaiming_normal_fan_out, kaiming_normal_fan_out_blocked,
                )
                n_dil = len(self.dilations)
                prefix = nn.Conv((n_dil + 1) * bc, (1, 1),
                                 kernel_init=kaiming_normal_fan_out_blocked(n_dil + 1),
                                 bias_init=nn.initializers.zeros,
                                 name="prefix_conv")(x)
                prefix = BatchNorm(use_running_average=not train,
                                   scale_init=ctrgcn_mod._bn_weights_init,
                                   **ctrgcn_mod.BN, name="prefix_bn")(prefix)
                prefix = nn.relu(prefix)
                outs = []
                for i, (k, dil) in enumerate(zip(ks, self.dilations)):
                    b = prefix[..., i * bc:(i + 1) * bc]
                    if skip == "dil":
                        b = b[:, ::self.stride]
                    else:
                        pad = (k + (k - 1) * (dil - 1) - 1) // 2
                        b = nn.Conv(bc, (k, 1), strides=(self.stride, 1),
                                    kernel_dilation=(dil, 1),
                                    padding=[(pad, pad), (0, 0)],
                                    kernel_init=kaiming_normal_fan_out,
                                    bias_init=nn.initializers.zeros,
                                    name=f"branch{i}_tconv_conv")(b)
                    outs.append(b)
                b = prefix[..., n_dil * bc:]
                if skip == "max":
                    b = b[:, ::self.stride]
                else:
                    b = nn.max_pool(b, window_shape=(3, 1),
                                    strides=(self.stride, 1),
                                    padding=[(1, 1), (0, 0)])
                outs.append(b)
                b = nn.Conv(bc, (1, 1), strides=(self.stride, 1),
                            kernel_init=kaiming_normal_fan_out,
                            bias_init=nn.initializers.zeros,
                            name="pw_conv")(x)
                outs.append(b)
                out = jnp.concatenate(outs, axis=-1)
                out = BatchNorm(use_running_average=not train,
                                scale_init=ctrgcn_mod._bn_weights_init,
                                **ctrgcn_mod.BN, name="out_bn")(out)
                return out
            return call

        for skip in ("dil", "max"):
            Var = type(f"TCNNo{skip}", (orig_tcn,),
                       {"__call__": nn.compact(make_variant(skip))})
            ctrgcn_mod.MultiScaleTCN = Var
            try:
                dt = time_train_step(make(use_pallas=None))
            finally:
                ctrgcn_mod.MultiScaleTCN = orig_tcn
            log(f"step tcn-no-{skip}: {dt*1e3:8.2f} ms "
                f"(cost ~{(full-dt)*1e3:.2f} ms)")

    # ---- no_epi: UnitGCN epilogue -> relu(y + res-ish) ----
    orig_unit = ctrgcn_mod.UnitGCN

    def unit_no_epi(self, x, *, train):
        import numpy as _np
        A0 = _np.asarray(self.A, _np.float32)
        num_subset = A0.shape[0]
        A = self.param("PA", lambda key, shape: jnp.asarray(A0), A0.shape)
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        R = ctrgcn_mod._rel_channels(self.in_channels)
        C = self.out_channels
        from tamgcn_tpu.ops.inits import (
            kaiming_normal_fan_out_blocked, kaiming_normal_fan_out_dense,
        )

        def packed_conv(features, blocks, name):
            return nn.Conv(features, kernel_size=(1, 1),
                           kernel_init=kaiming_normal_fan_out_blocked(blocks),
                           bias_init=nn.initializers.zeros, name=name)

        xm = jnp.mean(x, axis=1, keepdims=True)
        e12 = packed_conv(2 * num_subset * R, 2 * num_subset, "conv12")(xm)[:, 0]
        N, V = e12.shape[0], e12.shape[1]
        x1s = jnp.transpose(
            e12[..., : num_subset * R].reshape(N, V, num_subset, R), (0, 2, 1, 3))
        x2s = jnp.transpose(
            e12[..., num_subset * R:].reshape(N, V, num_subset, R), (0, 2, 1, 3))
        x3s = packed_conv(num_subset * C, num_subset, "conv3")(x)
        w4s = self.param("conv4_kernel", kaiming_normal_fan_out_dense,
                         (num_subset, R, C))
        b4s = self.param("conv4_bias", nn.initializers.zeros, (num_subset, C))
        from tamgcn_tpu.ops.aggregation import unit_ctr_gc
        y = unit_ctr_gc(x1s, x2s, x3s, w4s, b4s, alpha, A,
                        use_pallas=self.use_pallas)
        if self.in_channels == self.out_channels:
            y = y + x
        return nn.relu(y)

    if "epi" in sel:
        UnitNoEpi = type("UnitNoEpi", (ctrgcn_mod.UnitGCN,),
                         {"__call__": nn.compact(unit_no_epi)})
        ctrgcn_mod.UnitGCN = UnitNoEpi
        try:
            no_epi = time_train_step(make(use_pallas=None))
        finally:
            ctrgcn_mod.UnitGCN = orig_unit
        log(f"step no_epi:  {no_epi*1e3:8.2f} ms  (epilogue cost ~{(full-no_epi)*1e3:.2f} ms)")

    # ---- no_agg: keep convs, skip the aggregation op ----
    def unit_no_agg(self, x, *, train):
        import numpy as _np
        A0 = _np.asarray(self.A, _np.float32)
        num_subset = A0.shape[0]
        self.param("PA", lambda key, shape: jnp.asarray(A0), A0.shape)
        self.param("alpha", nn.initializers.zeros, (1,))
        R = ctrgcn_mod._rel_channels(self.in_channels)
        C = self.out_channels
        from tamgcn_tpu.ops.inits import (
            kaiming_normal_fan_out_blocked, kaiming_normal_fan_out_dense,
        )

        def packed_conv(features, blocks, name):
            return nn.Conv(features, kernel_size=(1, 1),
                           kernel_init=kaiming_normal_fan_out_blocked(blocks),
                           bias_init=nn.initializers.zeros, name=name)

        xm = jnp.mean(x, axis=1, keepdims=True)
        e12 = packed_conv(2 * num_subset * R, 2 * num_subset, "conv12")(xm)[:, 0]
        x3s = packed_conv(num_subset * C, num_subset, "conv3")(x)
        self.param("conv4_kernel", kaiming_normal_fan_out_dense,
                   (num_subset, R, C))
        self.param("conv4_bias", nn.initializers.zeros, (num_subset, C))
        y = x3s[..., :C] + e12.mean() * 1e-9
        from tamgcn_tpu.ops.norm import BatchNorm
        y = BatchNorm(use_running_average=not train,
                      scale_init=nn.initializers.constant(1e-6),
                      **ctrgcn_mod.BN, name="bn")(y)
        if self.in_channels != self.out_channels:
            res = nn.Conv(self.out_channels, (1, 1),
                          bias_init=nn.initializers.zeros, name="down_conv")(x)
            res = BatchNorm(use_running_average=not train,
                            **ctrgcn_mod.BN, name="down_bn")(res)
        else:
            res = x
        diff = res - y
        offset = nn.Conv(self.out_channels, (1, 1),
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros, name="offset_conv")(diff)
        offset = BatchNorm(use_running_average=not train,
                           **ctrgcn_mod.BN, name="offset_bn")(offset)
        return nn.relu(y + jnp.tanh(offset) + res)

    # ---- epi2: BN1 affine folded into the offset matmul (exp_epilogue
    # xla2 form: diff never materialised, one-pass stats) ----
    if "epi2" in sel:
        def unit_epi2(self, x, *, train):
            import numpy as _np
            A0 = _np.asarray(self.A, _np.float32)
            num_subset = A0.shape[0]
            A = self.param("PA", lambda key, shape: jnp.asarray(A0), A0.shape)
            alpha = self.param("alpha", nn.initializers.zeros, (1,))
            R = ctrgcn_mod._rel_channels(self.in_channels)
            C = self.out_channels
            from tamgcn_tpu.ops.inits import (
                kaiming_normal_fan_out,
                kaiming_normal_fan_out_blocked, kaiming_normal_fan_out_dense,
            )

            def packed_conv(features, blocks, name):
                return nn.Conv(features, kernel_size=(1, 1),
                               kernel_init=kaiming_normal_fan_out_blocked(blocks),
                               bias_init=nn.initializers.zeros, name=name)

            xm = jnp.mean(x, axis=1, keepdims=True)
            e12 = packed_conv(2 * num_subset * R, 2 * num_subset, "conv12")(xm)[:, 0]
            N, V = e12.shape[0], e12.shape[1]
            x1s = jnp.transpose(
                e12[..., : num_subset * R].reshape(N, V, num_subset, R), (0, 2, 1, 3))
            x2s = jnp.transpose(
                e12[..., num_subset * R:].reshape(N, V, num_subset, R), (0, 2, 1, 3))
            x3s = packed_conv(num_subset * C, num_subset, "conv3")(x)
            w4s = self.param("conv4_kernel", kaiming_normal_fan_out_dense,
                             (num_subset, R, C))
            b4s = self.param("conv4_bias", nn.initializers.zeros,
                             (num_subset, C))
            from tamgcn_tpu.ops.aggregation import unit_ctr_gc
            y = unit_ctr_gc(x1s, x2s, x3s, w4s, b4s, alpha, A,
                            use_pallas=self.use_pallas)
            # --- folded epilogue (stats in one pass; BN1 affine into Wo) ---
            g1 = self.param("bn_scale", nn.initializers.constant(1e-6), (C,))
            b1 = self.param("bn_bias", nn.initializers.zeros, (C,))
            Wo = self.param("offset_kernel", nn.initializers.zeros, (C, C))
            bo = self.param("offset_bias", nn.initializers.zeros, (C,))
            g3 = self.param("obn_scale", nn.initializers.ones, (C,))
            b3 = self.param("obn_bias", nn.initializers.zeros, (C,))
            if self.in_channels != self.out_channels:
                res = nn.Conv(self.out_channels, (1, 1),
                              kernel_init=kaiming_normal_fan_out,
                              bias_init=nn.initializers.zeros,
                              name="down_conv")(x)
                from tamgcn_tpu.ops.norm import BatchNorm
                res = BatchNorm(use_running_average=not train,
                                **ctrgcn_mod.BN, name="down_bn")(res)
            else:
                res = x
            n_ = y.shape[0] * y.shape[1] * y.shape[2]
            s = jnp.sum(y, (0, 1, 2)); s2 = jnp.sum(jnp.square(y), (0, 1, 2))
            mu = s / n_
            var = jnp.maximum(0.0, s2 / n_ - jnp.square(mu))
            inv = jax.lax.rsqrt(var + 1e-5)
            s1 = inv * g1
            t1 = b1 - mu * s1
            Ws = s1[:, None] * Wo
            cst = bo - t1 @ Wo
            u = (jnp.einsum("ntvc,cd->ntvd", res, Wo)
                 - jnp.einsum("ntvc,cd->ntvd", y, Ws) + cst)
            su = jnp.sum(u, (0, 1, 2)); su2 = jnp.sum(jnp.square(u), (0, 1, 2))
            mu3 = su / n_
            var3 = jnp.maximum(0.0, su2 / n_ - jnp.square(mu3))
            inv3 = jax.lax.rsqrt(var3 + 1e-5)
            off = jnp.tanh(u * (inv3 * g3) + (b3 - mu3 * inv3 * g3))
            return nn.relu(y * s1 + t1 + off + res)

        UnitEpi2 = type("UnitEpi2", (ctrgcn_mod.UnitGCN,),
                        {"__call__": nn.compact(unit_epi2)})
        orig_unit2 = ctrgcn_mod.UnitGCN
        ctrgcn_mod.UnitGCN = UnitEpi2
        try:
            dt = time_train_step(make(use_pallas=None))
        finally:
            ctrgcn_mod.UnitGCN = orig_unit2
        log(f"step epi2:    {dt*1e3:8.2f} ms  (saves ~{(full-dt)*1e3:.2f} ms)")

    if "noagg" in sel:
        UnitNoAgg = type("UnitNoAgg", (ctrgcn_mod.UnitGCN,),
                         {"__call__": nn.compact(unit_no_agg)})
        ctrgcn_mod.UnitGCN = UnitNoAgg
        try:
            no_agg = time_train_step(make(use_pallas=None))
        finally:
            ctrgcn_mod.UnitGCN = orig_unit
        log(f"step no_agg:  {no_agg*1e3:8.2f} ms  (agg cost ~{(full-no_agg)*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
