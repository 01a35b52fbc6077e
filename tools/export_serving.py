#!/usr/bin/env python
"""AOT serving export: serialize a trained model's eval forward to StableHLO.

The deployment path the reference does not have: `jax.export` lowers the
jitted eval forward ONCE (no device needed beyond tracing) and serializes
the result — weights baked in — to a single portable artifact that any
later process (a serving binary, a different host, a newer jax) can
deserialize and `.call()` without the framework, the model code, or the
Python config stack. TPU-idiomatic by construction: the artifact is the
same StableHLO XLA compiles on-chip, so serving runs the exact bytes
training validated.

Features:
  * --poly_batch exports with a symbolic batch dimension, so one artifact
    serves any batch size (the serving binary picks it at call time).
    Tradeoff: Pallas kernel grids need static shapes, so poly-batch
    artifacts use the XLA aggregation lowering; FIXED-batch artifacts
    (the default) embed the production Pallas kernels.
  * --platforms cpu,tpu produces one multi-platform artifact (e.g. CPU
    canary + TPU fleet from the same file).
  * --data_parallel N exports a dp-sharded artifact for an N-chip mesh:
    inputs batch-sharded on the 'data' axis via shard_map, so the
    per-shard shapes are static and the production Pallas kernels run
    unchanged on each chip's slice. The artifact records the shardings
    and device count (jax.export nr_devices).
  * --weights loads an orbax checkpoint dir (the trainer's own format,
    best/epochN) before export; omitted = freshly-initialized params
    (pipeline validation).
  * The tool round-trips its own artifact (deserialize + call) and
    verifies the logits match the live model before reporting success.

Usage:
    python tools/export_serving.py -c configs/nucla/gcn.yaml \
        [--weights work_dir/checkpoints] [--batch 64] [--time 52] \
        [--poly_batch] [--platforms tpu,cpu] --out /tmp/ctrgcn.stablehlo

Reference parity anchor: the reference's only deployment story is
`processor/recognition.py` test-phase pickles (no export of any kind);
this is a net-new serving capability.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SKELETON_MODELS = ("ctrgcn", "stgcn", "models.ctrgcn.Model", "models.stgcn.Model")
RGB_MODELS = ("resnet_only", "models.resnet_only.Model")
FUSION_MODELS = ("resnet_gcn_attention",
                 "models.resnet_gcn_attention.ResNet_GCN_Attention")


def example_inputs(arg, batch: int, time_steps: int):
    """Example (zero) inputs matching the config's model family."""
    ma = dict(arg.model_args or {})
    if arg.model in SKELETON_MODELS:
        shape = (batch, ma.get("in_channels", 3), time_steps,
                 ma.get("num_point", 25), ma.get("num_person", 2))
        return (np.zeros(shape, np.float32),)
    if arg.model in RGB_MODELS:
        frames = int(dict(arg.test_feeder_args or {}).get(
            "temporal_rgb_frames", 1))
        size = int(dict(arg.test_feeder_args or {}).get("size", 224))
        return (np.zeros((batch, 3 * frames, size, size), np.float32),)
    if arg.model in FUSION_MODELS:
        fa = dict(arg.test_feeder_args or {})
        skel = (batch, ma.get("in_channels_gcn", 3), time_steps,
                ma.get("num_point", 20), ma.get("num_person", 1))
        size = int(fa.get("image_size", fa.get("size", 224)))
        rgb = (batch, ma.get("in_channels_rgb", 15), size, size)
        return (np.zeros(skel, np.float32), np.zeros(rgb, np.float32))
    raise SystemExit(
        f"export_serving: no example-input rule for model {arg.model!r} "
        f"(supported: {SKELETON_MODELS + RGB_MODELS + FUSION_MODELS})")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True, help="output artifact path")
    ap.add_argument("--weights", default=None,
                    help="orbax checkpoint dir (trainer format); "
                         "default: fresh init")
    ap.add_argument("--batch", type=int, default=None,
                    help="example batch size (default: config "
                         "test_batch_size)")
    ap.add_argument("--time", type=int, default=52,
                    help="skeleton time steps (NW-UCLA resample length)")
    ap.add_argument("--poly_batch", action="store_true",
                    help="export with a symbolic batch dimension")
    ap.add_argument("--platforms", default=None,
                    help="comma list (cpu,tpu,cuda); default: current "
                         "backend")
    ap.add_argument("--fast_eval", action="store_true",
                    help="export the folded-affine inference engine "
                         "(CTRGCN only; measured 1.14x at NTU V=25) "
                         "instead of the flax eval forward")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="export a dp-sharded artifact for an N-chip mesh "
                         "(inputs batch-sharded on the 'data' axis; the "
                         "artifact records the shardings and device count). "
                         "Requires N visible devices at export AND serve "
                         "time; validate on the 8-device CPU mesh via "
                         "JAX_PLATFORMS=cpu XLA_FLAGS="
                         "--xla_force_host_platform_device_count=8")
    ns, rest = ap.parse_known_args(argv)
    if ns.fast_eval and ns.poly_batch:
        raise SystemExit("--fast_eval artifacts embed static-shape Pallas "
                         "kernels; use a fixed batch (drop --poly_batch)")

    import jax

    # the axon sitecustomize overrides jax_platforms at import time in every
    # interpreter; when the caller asked for the CPU mesh, force it back so
    # the virtual devices actually appear (same as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import export as jexport

    from tamgcn_tpu.models import get_model
    from tamgcn_tpu.train.config import base_parser, load_config

    arg = load_config(rest, parser=base_parser(add_help=False))
    model_args = dict(arg.model_args or {})
    if ns.poly_batch and arg.model in SKELETON_MODELS + FUSION_MODELS:
        # Pallas grids are sized from concrete shapes; a symbolic batch
        # dimension cannot pick kernel blocks. Poly-batch artifacts route
        # the aggregation through the XLA lowering (shape-polymorphic by
        # construction); fixed-batch artifacts keep the Pallas kernels.
        model_args["use_pallas"] = False
    model = get_model(arg.model, **model_args)

    batch = ns.batch or arg.test_batch_size
    xs = example_inputs(arg, batch, ns.time)

    rng = jax.random.PRNGKey(arg.seed)
    variables = model.init(rng, *(jnp.asarray(x) for x in xs), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    if ns.weights:
        from tamgcn_tpu.train.checkpoint import Checkpointer

        ckptr = Checkpointer(ns.weights)
        name = "best" if ckptr.exists("best") else f"epoch{ckptr.latest_epoch()}"
        tree = ckptr.restore(name, target={
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "step": np.zeros((), np.int32),
        })
        params, batch_stats = tree["params"], tree["batch_stats"]
        print(f"loaded weights: {ns.weights}/{name}", file=sys.stderr)

    frozen = {"params": params, "batch_stats": batch_stats}

    if ns.fast_eval:
        from tamgcn_tpu.models.ctrgcn_infer import make_fast_eval_fn

        fast_fn = make_fast_eval_fn(model)

        def serve_fn(*inputs):
            return fast_fn(frozen, *inputs)
    else:
        def serve_fn(*inputs):
            return model.apply(frozen, *inputs, train=False)

    platforms = (tuple(p.strip() for p in ns.platforms.split(","))
                 if ns.platforms else None)

    put = jnp.asarray
    if ns.data_parallel:
        from jax.sharding import NamedSharding, PartitionSpec

        from tamgcn_tpu.parallel.graph_parallel import shard_map
        from tamgcn_tpu.parallel.mesh import make_mesh

        if ns.poly_batch:
            raise SystemExit("--data_parallel fixes the per-chip batch at "
                             "export; drop --poly_batch")
        if batch % ns.data_parallel:
            raise SystemExit(f"batch {batch} must divide "
                             f"data_parallel={ns.data_parallel}")
        mesh = make_mesh(ns.data_parallel, 1)
        in_sh = NamedSharding(mesh, PartitionSpec("data"))
        # shard_map (not bare GSPMD jit): the Pallas aggregation custom
        # call has no GSPMD partitioning rule, but inside shard_map the
        # traced shapes are PER-SHARD, so the production kernels run
        # unchanged on each chip's batch slice — dp serving keeps the
        # full single-chip kernel speed (eval is batch-elementwise;
        # params are closure constants, replicated).
        spec_in = (PartitionSpec("data"),) * len(xs)
        jitted = jax.jit(shard_map(
            serve_fn, mesh=mesh, in_specs=spec_in,
            out_specs=PartitionSpec("data"), check_rep=False))

        def put(x):
            return jax.device_put(jnp.asarray(x), in_sh)
    else:
        jitted = jax.jit(serve_fn)

    if ns.poly_batch:
        b = jexport.symbolic_shape("b")[0]
        spec = tuple(
            jax.ShapeDtypeStruct((b,) + x.shape[1:], x.dtype) for x in xs)
    else:
        spec = tuple(put(x) for x in xs)

    exported = jexport.export(jitted, platforms=platforms)(*spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(ns.out)), exist_ok=True)
    with open(ns.out, "wb") as f:
        f.write(data)

    # roundtrip: deserialize the artifact and verify it reproduces the live
    # model's logits (and, under --poly_batch, that a second batch size runs)
    with open(ns.out, "rb") as f:
        reloaded = jexport.deserialize(f.read())
    got = np.asarray(reloaded.call(*(put(x) for x in xs)))
    # compare against the jitted function the artifact serializes (the
    # eager, op-by-op apply is NOT the reference: on TPU its f32 matmul
    # accumulation order differs from the fused whole-graph executable,
    # which with trained-magnitude weights exceeds any tight tolerance)
    want = np.asarray(jitted(*(put(x) for x in xs)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    poly_ok = None
    if ns.poly_batch:
        half = tuple(np.asarray(x[: max(1, batch // 2)]) for x in xs)
        poly_ok = np.asarray(reloaded.call(*half)).shape[0] == max(1, batch // 2)
        assert poly_ok

    print(json.dumps({
        "metric": "serving_export_roundtrip",
        "artifact": ns.out,
        "bytes": len(data),
        "platforms": list(reloaded.platforms),
        "poly_batch": bool(ns.poly_batch),
        "input_shapes": [list(np.asarray(x).shape) for x in xs],
        "output_shape": list(got.shape),
        "nr_devices": exported.nr_devices,
        "roundtrip_max_abs_err": float(np.max(np.abs(got - want))),
    }))


if __name__ == "__main__":
    main()
