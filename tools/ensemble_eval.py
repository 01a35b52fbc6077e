#!/usr/bin/env python
"""Offline score-level ensemble evaluation CLI.

Capability parity with reference ensemble/ensemble_resnet_ctrgcn.py (fixed-
alpha fusion report) and the alpha-sweep/per-class reporting of
ensemble/ensemble_ctrgcn_resnet_eval.py:399-474.

    python tools/ensemble_eval.py --scores_a resnet.pkl --scores_b ctrgcn.pkl \
        [--alpha 1.0 | --sweep] [--no-normalize]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tamgcn_tpu.ensemble import (  # noqa: E402
    align_scores,
    alpha_sweep,
    fuse,
    load_scores,
    nucla_val_labels,
    per_class_report,
    top1,
)


def main(argv=None):
    p = argparse.ArgumentParser(description="score-level ensemble eval")
    p.add_argument("--scores_a", required=True, help="first model score pkl")
    p.add_argument("--scores_b", required=True, help="second model score pkl")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--sweep", action="store_true", help="sweep alpha 0.1..3.0")
    p.add_argument("--no-normalize", dest="normalize", action="store_false")
    p.add_argument("--labels", default=None,
                   help="optional label pkl {name: label}; default NW-UCLA val")
    arg = p.parse_args(argv)

    if arg.labels:
        import pickle

        with open(arg.labels, "rb") as f:
            labels = {str(k): int(v) for k, v in pickle.load(f).items()}
    else:
        labels = nucla_val_labels()

    a = load_scores(arg.scores_a)
    b = load_scores(arg.scores_b)
    names, (ma, mb), y = align_scores([a, b], labels)
    print(f"{len(names)} common samples")
    print(f"model A top-1: {top1(ma, y):.2%}")
    print(f"model B top-1: {top1(mb, y):.2%}")

    if arg.sweep:
        best_alpha, best, results = alpha_sweep(ma, mb, y, normalize=arg.normalize)
        for al in sorted(results):
            print(f"  alpha={al:.1f}: {results[al]:.2%}")
        print(f"best: alpha={best_alpha:.1f} top-1={best:.2%}")
        alpha = best_alpha
    else:
        alpha = arg.alpha
    fused = fuse(ma, mb, alpha, arg.normalize)
    rep = per_class_report(fused, y)
    print(f"fused (alpha={alpha:.2f}) top-1: {rep['top1']:.2%}")
    print("per-class:", [f"{v:.2%}" for v in rep["per_class_top1"]])
    print("confusion:\n", np.asarray(rep["confusion"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
