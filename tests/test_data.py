"""Data pipeline tests: splits, transforms, feeder determinism, loader."""
import json
import os

import numpy as np
import pytest

from tamgcn_tpu.data import Loader, NUCLAFeederGCN, get_feeder, load_nucla_split
from tamgcn_tpu.data import transforms as T


def test_splits_embedded():
    train = load_nucla_split("train")
    val = load_nucla_split("val")
    assert len(train) == 1020
    assert len(val) == 464
    # cross-view protocol: train = views 1-2, val = view 3
    assert all(d["file_name"].endswith(("_v01", "_v02")) for d in train)
    assert all(d["file_name"].endswith("_v03") for d in val)
    labels = {int(d["label"]) for d in train} | {int(d["label"]) for d in val}
    assert len(labels) == 10


@pytest.fixture(scope="module")
def nucla_dir(tmp_path_factory):
    """Synthetic NW-UCLA directory with JSON skeletons for every val sample
    and the first 32 train samples."""
    root = tmp_path_factory.mktemp("nucla")
    rng = np.random.default_rng(0)
    for split, limit in (("train", 64), ("val", 464)):
        for info in load_nucla_split(split)[:limit]:
            name = info["file_name"]
            d = root / name
            d.mkdir(exist_ok=True)
            skel = rng.normal(size=(max(info["length"], 2), 20, 3)).tolist()
            with open(d / f"{name}.json", "w") as f:
                json.dump({"skeletons": skel}, f)
    return str(root)


def test_feeder_val_deterministic(nucla_dir):
    f1 = NUCLAFeederGCN(nucla_dir, split="val")
    f2 = NUCLAFeederGCN(nucla_dir, split="val")
    a, la, ia = f1[3]
    b, lb, ib = f2[3]
    assert a.shape == (3, 52, 20, 1)
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    assert (la, ia) == (lb, ib)
    assert len(f1) == 464


def test_feeder_train_seeded_aug(nucla_dir):
    # debug=True limits to the first 64 samples (which the fixture provides)
    f = NUCLAFeederGCN(nucla_dir, split="train", repeat=5, seed=7, debug=True)
    assert len(f) == 64 * 5
    a, _, _ = f[5]
    b, _, _ = f[5]
    np.testing.assert_array_equal(a, b)  # same (seed, epoch, index) -> same aug
    f.set_epoch(1)
    c, _, _ = f[5]
    assert not np.array_equal(a, c)  # new epoch -> new aug
    # values bounded by min-max normalisation
    assert a.min() >= -1.0 - 1e-6 and a.max() <= 1.0 + 1e-6


def test_feeder_modalities(nucla_dir):
    fj = NUCLAFeederGCN(nucla_dir, split="val", modality="joint")
    fb = NUCLAFeederGCN(nucla_dir, split="val", modality="bone")
    fm = NUCLAFeederGCN(nucla_dir, split="val", modality="motion")
    j, _, _ = fj[0]
    b, _, _ = fb[0]
    m, _, _ = fm[0]
    # bone: joint 3 (index 2) is its own parent -> zero bone vector
    assert np.all(b[:, :, 2, :] == 0)
    # motion: last frame is zero
    assert np.all(m[:, -1] == 0)
    assert not np.array_equal(j, b)
    # motion equals forward diff of joint data
    np.testing.assert_allclose(m[:, :-1], j[:, 1:] - j[:, :-1], atol=1e-6)


def test_loader_shuffle_drop_last(nucla_dir):
    f = NUCLAFeederGCN(nucla_dir, split="val")
    ld = Loader(f, batch_size=32, shuffle=True, drop_last=True, seed=1)
    assert len(ld) == 464 // 32
    batches = list(ld)
    assert len(batches) == 14
    data, label, index = batches[0]
    assert data.shape == (32, 3, 52, 20, 1)
    assert label.shape == (32,)
    # deterministic epoch order
    ld2 = Loader(f, batch_size=32, shuffle=True, drop_last=True, seed=1)
    d2, l2, i2 = next(iter(ld2))
    np.testing.assert_array_equal(index, i2)
    # different epoch -> different order
    ld.set_epoch(1)
    d3, l3, i3 = next(iter(ld))
    assert not np.array_equal(index, i3)


def test_loader_process_sharding(nucla_dir):
    f = NUCLAFeederGCN(nucla_dir, split="val")
    shards = []
    for p in range(2):
        ld = Loader(f, batch_size=32, shuffle=True, seed=3,
                    process_index=p, process_count=2)
        assert ld.local_batch == 16
        shards.append(np.concatenate([b[2] for b in ld]))
    # disjoint coverage across processes
    assert set(shards[0]).isdisjoint(set(shards[1]))


def test_reference_parity_getitem(nucla_dir):
    """Val-path output matches a direct reimplementation of the reference math
    (feeder_nucla_gcn.py:85-154, eval branch)."""
    f = NUCLAFeederGCN(nucla_dir, split="val")
    info = f.data_dict[0]
    raw = f.data[0]
    got, label, _ = f[0]

    value = raw - raw[0:1, 1:2, :]
    sv = np.reshape(value, (-1, 3))
    v_min, v_max = sv.min(axis=0), sv.max(axis=0)
    sv = (sv - v_min) / (v_max - v_min + 1e-6) * 2 - 1
    sv = sv.reshape(-1, 20, 3)
    idx = np.linspace(0, sv.shape[0] - 1, 52).astype(int)
    want = np.transpose(sv[idx], (2, 0, 1)).reshape(3, 52, 20, 1)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)
    assert label == int(info["label"]) - 1


def test_synthetic_feeder_and_registry():
    f = get_feeder("synthetic_gcn", num_samples=16, split="train")
    data, label, index = f[0]
    assert data.shape == (3, 52, 20, 1)
    assert 0 <= label < 10


def test_synthetic_rgb_feeder():
    f = get_feeder("synthetic_rgb", num_samples=8, image_size=64,
                   split="train", seed=1)
    img, label, index = f[0]
    assert img.shape == (3, 64, 64) and img.dtype == np.float32
    assert 0 <= label < 10 and index == 0
    # prototypes shared across splits (val drawn from the train distribution)
    v = get_feeder("synthetic_rgb", num_samples=4, image_size=64,
                   split="val", seed=1)
    np.testing.assert_array_equal(f.proto_rgb, v.proto_rgb)
    # deterministic per (epoch, index); epoch changes the noise draw
    a = f[3][0]
    f.set_epoch(0)
    np.testing.assert_array_equal(a, f[3][0])
    f.set_epoch(1)
    assert not np.array_equal(a, f[3][0])
    # frame stacking matches the ResNet feeder contract
    s = get_feeder("synthetic_rgb", num_samples=2, image_size=32,
                   temporal_rgb_frames=5, split="train", seed=0)
    assert s[0][0].shape == (15, 32, 32)


def test_synthetic_fusion_rgb_class_signal():
    g = get_feeder("synthetic_fusion", num_samples=6, split="train", seed=1,
                   image_size=32)
    # samples of the same class share the prototype; the class signal must
    # dominate the per-sample noise (0.5-scale proto vs 0.3-scale noise)
    labels = [g[i][2] for i in range(6)]
    rgbs = [g[i][1] for i in range(6)]
    for i in range(6):
        proto = np.concatenate([g.proto_rgb[labels[i]]] * g.temporal_rgb_frames,
                               axis=0)
        resid = rgbs[i] - proto
        assert np.abs(resid).mean() < np.abs(rgbs[i] - proto.mean()).mean()


def test_tools_random_move_shapes():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 20, 20, 1))
    out = T.random_move(x.copy(), rng)
    assert out.shape == x.shape
    # z-axis untouched by the 2-D transform
    np.testing.assert_array_equal(out[2], x[2])


def test_tools_metrics():
    score = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    label = np.array([1, 0, 0])
    assert T.top_k(score, label, 1) == pytest.approx(2 / 3)
    assert T.top_k(score, label, 2) == 1.0
    per_class = T.top_k_by_category(label, score, 1)
    assert per_class[1] == 1.0
    prec, rec = T.calculate_recall_precision(label, score)
    assert len(prec) == 2 and len(rec) == 2
    cm = T.confusion_matrix(label, score)
    assert cm.sum() == 3


@pytest.fixture(scope="module")
def ntu_dir(tmp_path_factory):
    """Synthetic NTU-style dataset: 25 joints, mixed 1/2-person clips,
    flat `<name>.json` layout + `<split>_split.json` lists."""
    root = tmp_path_factory.mktemp("ntu")
    rng = np.random.default_rng(3)
    for split, n in (("train", 24), ("val", 12)):
        records = []
        for i in range(n):
            name = f"S001C001P{i:03d}R001A{(i % 6) + 1:03d}"
            t = int(rng.integers(10, 40))
            if i % 3 == 0:  # two-person clip
                skel = rng.normal(size=(t, 2, 25, 3)).tolist()
            else:
                skel = rng.normal(size=(t, 25, 3)).tolist()
            with open(root / f"{name}.json", "w") as f:
                json.dump({"skeletons": skel}, f)
            records.append({"file_name": name, "label": (i % 6) + 1})
        with open(root / f"{split}_split.json", "w") as f:
            json.dump(records, f)
    return str(root)


def test_skeleton_feeder_ntu_shapes(ntu_dir):
    f = get_feeder(
        "skeleton_gcn", data_path=ntu_dir, split="val", time_steps=16,
        num_person=2, backend="numpy",
    )
    data, label, idx = f[0]
    assert data.shape == (3, 16, 25, 2)
    assert data.dtype == np.float32
    assert 0 <= label < 6
    # single-person clip -> second person slot is zero padding
    d1, _, _ = f[1]
    assert np.all(d1[..., 1] == 0)
    assert not np.all(d1[..., 0] == 0)


def test_skeleton_feeder_ntu_modalities(ntu_dir):
    for modality in ("bone", "motion"):
        f = get_feeder(
            "skeleton_gcn", data_path=ntu_dir, split="val", time_steps=16,
            num_person=2, modality=modality, backend="numpy",
        )
        data, _, _ = f[0]
        assert data.shape == (3, 16, 25, 2)
        assert np.isfinite(data).all()
    # motion: last frame is the zero diff
    assert np.all(data[:, -1] == 0)


def test_skeleton_feeder_train_deterministic(ntu_dir):
    f = get_feeder(
        "skeleton_gcn", data_path=ntu_dir, split="train", time_steps=16,
        num_person=2, seed=5, backend="numpy",
    )
    a, _, _ = f[4]
    b, _, _ = f[4]
    np.testing.assert_array_equal(a, b)
    f.set_epoch(2)
    c, _, _ = f[4]
    assert not np.array_equal(a, c)


def test_bones_for_tables():
    assert len(T.bones_for(20)) == 20
    assert len(T.bones_for(25)) == 25
    with pytest.raises(ValueError):
        T.bones_for(17)
    # every child appears exactly once per table
    for v in (20, 25):
        children = [c for c, _ in T.bones_for(v)]
        assert sorted(children) == list(range(1, v + 1))


def test_pose_match_tracks_identity_swap():
    # two bodies moving on straight lines; the raw data swaps their slots
    # halfway through — pose_match must string identities back together
    rng = np.random.default_rng(0)
    t_len, V = 20, 5
    base = rng.normal(size=(1, 1, V, 1)) * 0.05
    track_a = base + np.stack(
        [np.linspace(0, 1, t_len), np.linspace(0, 0.5, t_len), np.ones(t_len)]
    ).reshape(3, t_len, 1, 1)
    track_b = base + np.stack(
        [np.linspace(5, 4, t_len), np.linspace(2, 2.5, t_len), np.full(t_len, 0.5)]
    ).reshape(3, t_len, 1, 1)
    data = np.concatenate([track_a, track_b], axis=-1)  # (3, T, V, 2)
    swapped = data.copy()
    swapped[:, t_len // 2:] = data[:, t_len // 2:, :, ::-1]
    out = T.pose_match(swapped)
    # person 0 = higher total confidence (track_a, conf 1.0 > 0.5)
    np.testing.assert_allclose(
        out[0, :, 0, 0], base[0, 0, 0, 0] + np.linspace(0, 1, t_len)
    )
    np.testing.assert_allclose(
        out[0, :, 0, 1], base[0, 0, 0, 0] + np.linspace(5, 4, t_len)
    )
