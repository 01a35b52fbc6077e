"""Native (C++) augmentation runtime tests."""
import json

import numpy as np
import pytest

from tamgcn_tpu import runtime
from tamgcn_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime unavailable (no g++?)"
)


def test_eval_path_bit_exact_with_numpy():
    rs = np.random.RandomState(0)
    skel = rs.randn(37, 20, 3)
    out = runtime.augment_batch([skel], np.array([0]), time_steps=52, train=False)
    assert out.shape == (1, 3, 52, 20, 1)

    value = skel - skel[0:1, 1:2, :]
    value = T.minmax_normalize(value)
    idx = T.resample_eval(37, 52)
    want = np.transpose(value[idx], (2, 0, 1)).reshape(3, 52, 20, 1)
    np.testing.assert_array_equal(out[0], want.astype(np.float32))


def test_train_path_deterministic_streams():
    rs = np.random.RandomState(1)
    skel = rs.randn(25, 20, 3)
    a = runtime.augment_batch([skel, skel], np.array([3, 4]), train=True, seed=9)
    b = runtime.augment_batch([skel, skel], np.array([3, 4]), train=True, seed=9)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a[0], a[1])  # distinct per-index streams
    c = runtime.augment_batch([skel], np.array([3]), train=True, seed=9, epoch=1)
    assert not np.array_equal(a[0], c[0])  # epoch advances the stream
    assert a.min() >= -1.0 - 1e-6 and a.max() <= 1.0 + 1e-6


def test_modalities_native_vs_numpy_eval():
    rs = np.random.RandomState(2)
    skel = rs.randn(30, 20, 3)
    for modality in ("bone", "motion"):
        out = runtime.augment_batch(
            [skel], np.array([0]), train=False, modality=modality
        )[0]
        value = T.minmax_normalize(skel - skel[0:1, 1:2, :])
        data = value[T.resample_eval(30, 52)]
        data = T.to_bone(data) if modality == "bone" else T.to_motion(data)
        want = np.transpose(data, (2, 0, 1)).reshape(3, 52, 20, 1)
        np.testing.assert_allclose(out, want.astype(np.float32), atol=1e-6)


def test_feeder_native_batch_path(tmp_path):
    from tamgcn_tpu.data import Loader, NUCLAFeederGCN
    from tamgcn_tpu.data.splits import load_nucla_split

    rs = np.random.default_rng(0)
    for info in load_nucla_split("val")[:64]:
        name = info["file_name"]
        d = tmp_path / name
        d.mkdir()
        with open(d / f"{name}.json", "w") as f:
            json.dump(
                {"skeletons": rs.normal(size=(max(info["length"], 2), 20, 3)).tolist()},
                f,
            )
    f_native = NUCLAFeederGCN(str(tmp_path), split="val", backend="native", debug=True)
    f_numpy = NUCLAFeederGCN(str(tmp_path), split="val", backend="numpy", debug=True)
    ln = Loader(f_native, batch_size=8)
    lp = Loader(f_numpy, batch_size=8)
    bn = next(iter(ln))
    bp = next(iter(lp))
    # eval pipeline identical across backends
    np.testing.assert_allclose(bn[0], bp[0], atol=1e-6)
    np.testing.assert_array_equal(bn[1], bp[1])


def test_skeleton_feeder_native_ntu_bone(tmp_path):
    """Generic feeder: native path matches numpy for NTU-25 incl. bone table."""
    from tamgcn_tpu.data import Loader, get_feeder

    rs = np.random.default_rng(5)
    records = []
    for i in range(16):
        name = f"clip{i:03d}"
        skel = rs.normal(size=(int(rs.integers(8, 30)), 25, 3)).tolist()
        with open(tmp_path / f"{name}.json", "w") as f:
            json.dump({"skeletons": skel}, f)
        records.append({"file_name": name, "label": (i % 4) + 1})
    with open(tmp_path / "val_split.json", "w") as f:
        json.dump(records, f)

    for modality in ("joint", "bone", "motion"):
        fn = get_feeder("skeleton_gcn", data_path=str(tmp_path), split="val",
                        time_steps=20, modality=modality, backend="native")
        fp = get_feeder("skeleton_gcn", data_path=str(tmp_path), split="val",
                        time_steps=20, modality=modality, backend="numpy")
        bn = next(iter(Loader(fn, batch_size=16)))
        bp = next(iter(Loader(fp, batch_size=16)))
        np.testing.assert_allclose(bn[0], bp[0], atol=1e-6, err_msg=modality)
        np.testing.assert_array_equal(bn[1], bp[1])


def test_train_path_bit_exact_with_numpy(tmp_path):
    """Same (seed, epoch, index) -> bit-identical TRAIN batches on both
    backends: the native runtime implements numpy's Philox4x64-10 streams
    (masked-rejection integers + 53-bit uniforms) draw-for-draw."""
    from tamgcn_tpu.data import Loader, NUCLAFeederGCN
    from tamgcn_tpu.data.splits import load_nucla_split

    rs = np.random.default_rng(11)
    for info in load_nucla_split("train")[:64]:
        name = info["file_name"]
        d = tmp_path / name
        d.mkdir()
        with open(d / f"{name}.json", "w") as f:
            json.dump(
                {"skeletons": rs.normal(size=(max(info["length"], 2), 20, 3)).tolist()},
                f,
            )
    for epoch in (0, 3):
        for modality in ("joint", "bone"):
            fn = NUCLAFeederGCN(str(tmp_path), split="train", backend="native",
                                modality=modality, seed=7, debug=True)
            fp = NUCLAFeederGCN(str(tmp_path), split="train", backend="numpy",
                                modality=modality, seed=7, debug=True)
            fn.set_epoch(epoch)
            fp.set_epoch(epoch)
            bn = next(iter(Loader(fn, batch_size=16, seed=1)))
            bp = next(iter(Loader(fp, batch_size=16, seed=1)))
            np.testing.assert_array_equal(
                bn[0], bp[0],
                err_msg=f"train batches diverged (epoch={epoch}, {modality})",
            )
            np.testing.assert_array_equal(bn[1], bp[1])
