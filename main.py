#!/usr/bin/env python
"""tamgcn_tpu CLI — subcommand-per-processor dispatch (reference main.py).

    python main.py recognition -c configs/nucla/gcn.yaml [overrides]
    python main.py recognition_rgb_only -c configs/nucla/resnet.yaml
    python main.py recognition_cross_modal -c configs/nucla/cross_modal.yaml
    python main.py recognition_fusion -c configs/nucla/fused.yaml
"""
from __future__ import annotations

import sys


def _build_registry():
    from tamgcn_tpu.train.config import base_parser, load_config
    from tamgcn_tpu.train.trainer import RecognitionTrainer

    registry = {
        "recognition": RecognitionTrainer,
        "recognition_rgb_only": RecognitionTrainer,
    }
    try:
        from tamgcn_tpu.train.trainer_cross_modal import CrossModalTrainer

        registry["recognition_cross_modal"] = CrossModalTrainer
        registry["recognition_fusion"] = CrossModalTrainer
    except ImportError:
        pass
    return registry, base_parser, load_config


def main(argv=None):
    from tamgcn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    registry, base_parser, load_config = _build_registry()
    if not argv or argv[0] not in registry:
        print(f"usage: main.py {{{','.join(registry)}}} [-c CONFIG] [overrides]")
        return 2
    processor_cls = registry[argv[0]]
    arg = load_config(argv[1:], parser=base_parser(add_help=True))
    trainer = processor_cls(arg)
    trainer.start()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
