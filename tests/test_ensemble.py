"""Ensemble/score tooling tests, anchored on the reference's shipped scores."""
import os
import pickle

import numpy as np
import pytest

from tamgcn_tpu.data.splits import load_nucla_split
from tamgcn_tpu.ensemble import (
    align_scores,
    alpha_sweep,
    fuse,
    per_class_report,
    softmax,
    top1,
)

REF_PKL = "/root/reference/result/nucla/CTROGC-GCN.pkl"


@pytest.mark.skipif(not os.path.exists(REF_PKL), reason="reference scores absent")
def test_reference_shipped_scores_top1():
    """The reference's shipped CTR-GCN val scores recompute to 94.18% top-1
    with our metric stack (BASELINE.md anchor)."""
    with open(REF_PKL, "rb") as f:
        scores = pickle.load(f)
    val = load_nucla_split("val")
    y = np.asarray([int(d["label"]) - 1 for d in val])
    if isinstance(scores, dict):
        mat = np.stack([np.asarray(scores[k]) for k in sorted(scores)])
        # index-keyed dict (SURVEY §3.2): order matches val list order
        if set(scores) != {d["file_name"] for d in val}:
            mat = np.stack([np.asarray(scores[k]) for k in scores])
    else:
        mat = np.asarray(scores)
    assert mat.shape == (464, 10)
    acc = top1(mat, y)
    assert acc == pytest.approx(437 / 464, abs=1e-6), f"got {acc}"
    # top-5 anchor: 99.14%
    rank = mat.argsort(axis=1)
    top5 = np.mean([l in rank[i, -5:] for i, l in enumerate(y)])
    assert top5 == pytest.approx(0.9914, abs=1e-3)
    # per-class range: min 85.4%, classes 1,2,5,6 perfect (BASELINE.md)
    rep = per_class_report(mat, y)
    pc = rep["per_class_top1"]
    assert min(pc) == pytest.approx(0.854, abs=1e-2)
    for c in (1, 2, 5, 6):
        assert pc[c] == 1.0


def test_fuse_and_sweep_synthetic():
    rs = np.random.RandomState(0)
    y = rs.randint(0, 10, size=200)
    # model A: noisy logits; model B: cleaner
    a = np.eye(10)[y] * 1.0 + rs.randn(200, 10) * 0.8
    b = np.eye(10)[y] * 1.5 + rs.randn(200, 10) * 0.5
    ta, tb = top1(a, y), top1(b, y)
    best_alpha, best, _ = alpha_sweep(a, b, y)
    assert best >= max(ta, tb) - 1e-9  # fusion at least as good
    fused = fuse(a, b, best_alpha)
    assert top1(fused, y) == pytest.approx(best)


def test_align_scores_intersection():
    labels = {"x": 0, "y": 1, "z": 2}
    a = {"x": np.zeros(3), "y": np.ones(3)}
    b = {"y": np.ones(3), "z": np.ones(3)}
    names, (ma, mb), yv = align_scores([a, b], labels)
    assert names == ["y"]
    with pytest.raises(ValueError):
        align_scores([{"q": np.ones(3)}, b], labels)


def test_softmax_rows_sum_to_one():
    x = np.random.RandomState(1).randn(5, 10) * 100
    s = softmax(x)
    np.testing.assert_allclose(s.sum(axis=1), 1.0, rtol=1e-6)


def test_plot_confusion_matrix(tmp_path):
    from tamgcn_tpu.viz import plot_confusion_matrix

    rs = np.random.RandomState(0)
    scores = rs.randn(40, 10)
    labels = rs.randint(0, 10, 40)
    out = plot_confusion_matrix(
        scores, labels, "t", str(tmp_path / "cm.png")
    )
    assert os.path.getsize(out) > 10_000  # a real rendered PNG


@pytest.mark.slow
def test_online_ensemble_eval_one_command(tmp_path):
    """The reference's one-command dual-model inference driver
    (ensemble_ctrgcn_resnet_eval.py:298-474): checkpoints in -> per-model +
    fused + sweep report and confusion-matrix PNGs out."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.ensemble_online_eval import main as ensemble_main

    from tamgcn_tpu.train.config import load_config
    from tamgcn_tpu.train.trainer import RecognitionTrainer

    # train one tiny checkpoint on synthetic data
    work = str(tmp_path / "train")
    arg = load_config(
        ["-c", "configs/nucla/smoke.yaml", "-w", work,
         "--num_epoch", "1", "--save_interval", "1"]
    )
    RecognitionTrainer(arg).start()
    ckpt = os.path.join(work, "checkpoints")

    out_dir = str(tmp_path / "ens")
    rc = ensemble_main([
        "--config_a", "configs/nucla/smoke.yaml", "--weights_a", ckpt,
        "--config_b", "configs/nucla/smoke.yaml", "--weights_b", ckpt,
        "--alpha", "1.0", "--out_dir", out_dir,
    ])
    assert rc == 0
    for f in ("confusion_matrix_model_a.png", "confusion_matrix_model_b.png",
              "confusion_matrix_alpha_1.0.png"):
        assert os.path.getsize(os.path.join(out_dir, f)) > 10_000, f
