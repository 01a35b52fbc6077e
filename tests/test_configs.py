"""Every shipped YAML config must parse and resolve against the registries.

Drift tripwire: a renamed model/feeder/graph registry key, a typo'd
model_args entry, or a config referencing a removed flag should fail here,
not at user run time. Mirrors the reference's implicit contract that every
config under config/nucla/ is runnable (reference main.py + processor
argument double-parse).
"""
import glob
import os

import pytest

from tamgcn_tpu.data import resolve_feeder
from tamgcn_tpu.graphs import get_graph
from tamgcn_tpu.models import get_model
from tamgcn_tpu.train.config import base_parser, load_config

CONFIGS = sorted(
    glob.glob("configs/**/*.yaml", recursive=True)
)


def test_config_sweep_found_everything():
    # the sweep must actually cover the shipped set (guards the glob)
    names = {os.path.basename(p) for p in CONFIGS}
    assert {"gcn.yaml", "smoke.yaml", "smoke_resnet.yaml",
            "scene256.yaml", "ntu60.yaml"} <= names
    assert len(CONFIGS) >= 12


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.relpath(p, "configs")
                                               for p in CONFIGS])
def test_config_parses_and_resolves(path):
    arg = load_config(["-c", path], parser=base_parser(add_help=False))
    # required run keys
    assert arg.work_dir
    assert arg.batch_size > 0 and arg.test_batch_size > 0
    assert arg.num_epoch > 0
    # registry resolution: feeder, model (flax dataclass construction is
    # cheap — no params are initialized here), and the model's graph
    resolve_feeder(arg.feeder)
    model_args = dict(arg.model_args or {})
    get_model(arg.model, **model_args)
    if "graph" in model_args:
        get_graph(model_args["graph"], **dict(model_args.get("graph_args") or {}))
