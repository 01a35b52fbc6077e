#!/usr/bin/env python
"""bf16 mixed-precision convergence evidence (round-5 verdict item 5).

The bf16 config (configs/nucla/gcn_bf16.yaml) shipped rounds 3-4 on
throughput evidence only (26.2 ms vs 37.9 ms f32, 1.45x). This harness
supplies the accuracy half of the claim: train the synthetic smoke config
to convergence in f32 and in bf16 — same seed, same data, same
hyperparameters, differing ONLY in model compute dtype — and compare the
loss trajectories and final/best val top-1. The reference has no mixed
precision at all; this is the framework's net-new claim, so it carries its
own convergence artifact (numbers recorded in docs/KERNELS.md "bf16
convergence" once run on-chip).

Round 5 extends the same harness to the RGB family (--family rgb):
ResNet-50 on synthetic class-prototype images (configs/nucla/smoke_resnet.yaml),
so the bf16 RGB branch (configs/nucla/resnet_bf16.yaml) carries convergence
evidence too, not just its 1.54x throughput number.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_bf16_convergence.py \
        [--family gcn|rgb] [--epochs 12] [--samples 256] [--batch 32] \
        [--out /tmp/bf16_conv.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np


CONFIGS = {
    # family -> the smoke config trained in both dtypes
    "gcn": "configs/nucla/smoke.yaml",
    "rgb": "configs/nucla/smoke_resnet.yaml",
}


def run_one(tag: str, dtype: str | None, epochs: int, samples: int,
            batch: int, seed: int, workroot: str, family: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import main as cli

    work_dir = os.path.join(workroot, tag)
    argv = [
        "recognition", "-c", CONFIGS[family],
        "--work_dir", work_dir,
        "--num_epoch", str(epochs),
        "--eval_interval", "1",
        "--save_interval", str(epochs + 1),
        "--seed", str(seed),
        "--batch_size", str(batch),
        "--test_batch_size", str(batch),
        "--train_feeder_args", f"num_samples={samples}",
        "--test_feeder_args", f"num_samples={max(64, samples // 4)}",
    ]
    if dtype:
        argv += ["--model_args", f"dtype={dtype!r}"]
    rc = cli.main(argv)
    if rc:
        raise SystemExit(f"{tag} run failed rc={rc}")
    # np.savetxt writes the header as a '#' comment line; loadtxt skips it
    csv = np.loadtxt(os.path.join(work_dir, "progress_info.csv"),
                     delimiter=",")
    csv = np.atleast_2d(csv)
    # columns: train_loss, test_loss, top1, top5 (trainer.py progress rows)
    return {
        "train_loss": [round(float(v), 5) for v in csv[:, 0]],
        "test_loss": [round(float(v), 5) for v in csv[:, 1]],
        "top1": [round(float(v), 5) for v in csv[:, 2]],
        "best_top1": round(float(csv[:, 2].max()), 5),
        "final_top1": round(float(csv[-1, 2]), 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tol", type=float, default=0.03,
                    help="allowed |best_top1(f32) - best_top1(bf16)|")
    ap.add_argument("--family", choices=sorted(CONFIGS), default="gcn",
                    help="model family to train: gcn (CTR-GCN on synthetic "
                         "skeletons) or rgb (ResNet-50 on synthetic images)")
    args = ap.parse_args()

    workroot = tempfile.mkdtemp(prefix="bf16conv_")
    f32 = run_one("f32", None, args.epochs, args.samples, args.batch,
                  args.seed, workroot, args.family)
    bf16 = run_one("bf16", "bfloat16", args.epochs, args.samples, args.batch,
                   args.seed, workroot, args.family)

    delta = abs(f32["best_top1"] - bf16["best_top1"])
    record = {
        "config": {"family": args.family, "epochs": args.epochs,
                   "samples": args.samples,
                   "batch": args.batch, "seed": args.seed},
        "f32": f32,
        "bf16": bf16,
        "best_top1_delta": round(delta, 5),
        "within_tol": bool(delta <= args.tol),
    }
    print(json.dumps({
        "metric": f"bf16_convergence_best_top1_delta_{args.family}",
        "value": record["best_top1_delta"],
        "unit": "top1_fraction",
        "f32_best_top1": f32["best_top1"],
        "bf16_best_top1": bf16["best_top1"],
        "within_tol": record["within_tol"],
    }))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
    if not record["within_tol"]:
        raise SystemExit(
            f"bf16 best top1 {bf16['best_top1']} deviates from f32 "
            f"{f32['best_top1']} by {delta} > tol {args.tol}"
        )


if __name__ == "__main__":
    main()
