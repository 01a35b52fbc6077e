"""AOT serving export (tools/export_serving.py): StableHLO roundtrip.

A tiny CTRGCN (base_channel=8, T=16, batch 2) keeps the CPU compile in CI
range; the full-size path is the same code driven by the production
configs (see the tool's docstring and docs/CAPABILITIES.md).
"""
import json
import os

import numpy as np


def test_export_serving_roundtrip_poly_batch(tmp_path, capsys):
    from tools.export_serving import main as export_main

    out = os.path.join(str(tmp_path), "ctrgcn_tiny.stablehlo")
    export_main([
        "--out", out, "--batch", "2", "--time", "16", "--poly_batch",
        "-c", "configs/nucla/smoke.yaml",
        "--model_args", "base_channel=8",
    ])
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "serving_export_roundtrip"
    assert rec["poly_batch"] is True
    assert rec["output_shape"] == [2, 10]
    assert rec["roundtrip_max_abs_err"] <= 2e-5
    assert os.path.getsize(out) == rec["bytes"] > 0

    # the artifact is self-contained: a fresh deserialize (no model code,
    # no config) runs at a batch size never seen at export time
    from jax import export as jexport
    import jax.numpy as jnp

    with open(out, "rb") as f:
        reloaded = jexport.deserialize(f.read())
    logits = np.asarray(reloaded.call(jnp.zeros((3, 3, 16, 20, 1), jnp.float32)))
    assert logits.shape == (3, 10)
    assert np.all(np.isfinite(logits))


def test_export_serving_data_parallel_mesh(tmp_path, capsys):
    """dp-sharded artifact on the suite's 8-device CPU mesh: batch-sharded
    inputs via shard_map (per-shard static shapes keep the Pallas kernels
    viable on TPU), artifact records nr_devices=8, roundtrip exact."""
    from tools.export_serving import main as export_main

    out = os.path.join(str(tmp_path), "ctrgcn_dp8.stablehlo")
    export_main([
        "--out", out, "--batch", "16", "--time", "16", "--data_parallel", "8",
        "-c", "configs/nucla/smoke.yaml",
        "--model_args", "base_channel=8",
    ])
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["nr_devices"] == 8
    assert rec["output_shape"] == [16, 10]
    assert rec["roundtrip_max_abs_err"] <= 2e-5
