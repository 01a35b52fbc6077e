#!/usr/bin/env python
"""Standalone ST-GCN trainer + gradient-based body-part importance extraction.

Capability parity with reference tools/train_stgcn_group.py: trains ST-GCN on
NW-UCLA (10-label mode; 5-group mode via --group_map), then computes per-class
body-part importance from input gradients and writes
{label,group}_weights.json — the input consumed by the reference's ST-ROI
weighting generator.

    python tools/train_stgcn_importance.py --data_path data/nucla/all_sqe \
        [--group_map configs/nucla/groups.json] [--num_epoch 80]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tamgcn_tpu.interpret import (  # noqa: E402
    LABEL_NAMES_10,
    gradient_body_part_importance,
    save_weights_json,
)
from tamgcn_tpu.train.config import base_parser, load_config  # noqa: E402


def main(argv=None):
    parser = base_parser(add_help=True)
    parser.add_argument("--data_path", default="data/nucla/all_sqe")
    parser.add_argument("--group_map", default=None,
                        help="JSON {label(0-9): group} for 5-group mode")
    parser.add_argument("--samples_per_class", type=int, default=200)
    parser.set_defaults(
        model="stgcn",
        feeder="nucla_gcn",
        work_dir="./work_dir/nucla/stgcn_importance",
        base_lr=0.1,
        step=[50, 65],
        warm_up_epoch=5,
        num_epoch=80,
        batch_size=16,
        test_batch_size=64,
        eval_interval=1,
    )
    arg = load_config(argv, parser=parser)
    arg.model_args = dict(arg.model_args) or {}
    arg.model_args.setdefault("num_class", 10)
    arg.model_args.setdefault("num_point", 20)
    arg.model_args.setdefault("num_person", 1)
    arg.model_args.setdefault("graph", "ucla")
    arg.model_args.setdefault("edge_importance_weighting", True)
    arg.train_feeder_args = dict(arg.train_feeder_args)
    arg.train_feeder_args.setdefault("data_path", arg.data_path)
    arg.train_feeder_args.setdefault("repeat", 5)
    arg.test_feeder_args = dict(arg.test_feeder_args)
    arg.test_feeder_args.setdefault("data_path", arg.data_path)

    from tamgcn_tpu.train.trainer import RecognitionTrainer

    class GroupTrainer(RecognitionTrainer):
        """Optionally remaps 10 NW-UCLA labels onto coarse groups."""

        def __init__(self, arg, group_map=None):
            self.group_map = group_map
            super().__init__(arg)

        def _load_data(self):
            super()._load_data()
            if self.group_map:
                for feeder in {self.test_feeder, getattr(self, "train_feeder", None)}:
                    if feeder is not None:
                        feeder.label = type(feeder.label)(
                            [self.group_map[int(l)] for l in feeder.label]
                        )

    group_map = None
    if arg.group_map:
        with open(arg.group_map) as f:
            group_map = {int(k): int(v) for k, v in json.load(f).items()}
        arg.model_args["num_class"] = len(set(group_map.values()))

    trainer = GroupTrainer(arg, group_map)
    trainer.start()

    trainer.print_log("Extracting class-specific importance (gradient analysis)")
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    loader = trainer.loaders.get("train", trainer.loaders["test"])
    weights = gradient_body_part_importance(
        trainer.model,
        variables,
        loader,
        num_class=arg.model_args["num_class"],
        samples_per_class=arg.samples_per_class,
    )
    names = LABEL_NAMES_10 if not group_map else None
    for g, parts in weights.items():
        label = names[g] if names else f"group {g}"
        trainer.print_log(f"{label}: " + ", ".join(
            f"{p}={v:.3f}" for p, v in parts.items()
        ))
    out = os.path.join(
        arg.work_dir, "group_weights.json" if group_map else "label_weights.json"
    )
    save_weights_json(weights, out)
    trainer.print_log(f"saved importance weights: {out}")

    # edge-importance-based per-joint scores (models/stgcn.py:227-252 parity)
    from tamgcn_tpu.models import edge_importance_per_joint

    masks = [
        trainer.state.params[f"edge_importance_{i}"] for i in range(10)
        if f"edge_importance_{i}" in trainer.state.params
    ]
    if masks:
        scores = edge_importance_per_joint(masks)
        with open(os.path.join(arg.work_dir, "edge_importance_per_joint.json"), "w") as f:
            json.dump([float(s) for s in scores], f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
