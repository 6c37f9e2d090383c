"""Dataset/loader/prepare tests over synthetic on-disk fixtures."""

import json
import os
import pickle
import zipfile

import cv2
import numpy as np
import pytest
from scipy.io import savemat

from posetpu.config import default_config
from posetpu.data.h5io import (
    load_heatmaps,
    load_pseudo_labels,
    save_heatmaps,
    save_pseudo_labels,
)
from posetpu.data.h36m import MultiViewH36M
from posetpu.data.loader import GroupLoader, collate_groups
from posetpu.data.mixed import MixedDataset
from posetpu.data.mpii import MPIIDataset
from posetpu.data.prepare import make_prepare_fn
from posetpu.data import zipreader


def _cfg(root):
    cfg = default_config()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.DATA_FORMAT = "jpg"
    cfg.NETWORK.IMAGE_SIZE = np.array([64, 64])
    cfg.NETWORK.HEATMAP_SIZE = np.array([16, 16])
    return cfg


def _write_img(path, w=100, h=80, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rs = np.random.RandomState(seed)
    cv2.imwrite(path, rs.randint(0, 255, (h, w, 3), np.uint8))


@pytest.fixture
def mpii_root(tmp_path):
    root = tmp_path / "data"
    n = 8
    annot = []
    for i in range(n):
        name = f"im{i:03d}.jpg"
        _write_img(str(root / "mpii" / "images" / name), seed=i)
        annot.append(
            {
                "image": name,
                "center": [50.0, 40.0],
                "scale": 0.4,
                "joints": np.random.RandomState(i).uniform(10, 70, (16, 2)).tolist(),
                "joints_vis": [1] * 16,
            }
        )
    os.makedirs(root / "mpii" / "annot", exist_ok=True)
    with open(root / "mpii" / "annot" / "valid.json", "w") as f:
        json.dump(annot, f)
    headboxes = np.zeros((2, 2, n))
    headboxes[1] = 20.0  # headsize = |(20,20)| * 0.6
    savemat(str(root / "mpii" / "annot" / "gt_valid.mat"), {"headboxes_src": headboxes})
    return root


@pytest.fixture
def h36m_root(tmp_path):
    root = tmp_path / "data"
    db = []
    cam_dict = {
        "R": np.eye(3), "T": np.zeros((3, 1)), "fx": 500.0, "fy": 500.0,
        "cx": 50.0, "cy": 40.0, "k": np.zeros((3, 1)), "p": np.zeros((2, 1)),
    }
    n_groups = 10  # ::5 subsample -> 2 train groups
    for g in range(n_groups):
        for cam_id in range(4):
            name = f"g{g}_c{cam_id}.jpg"
            _write_img(str(root / "h36m" / "images" / name), seed=g * 4 + cam_id)
            rs = np.random.RandomState(g * 4 + cam_id)
            db.append(
                {
                    "image": name,
                    "center": np.array([50.0, 40.0]),
                    "scale": np.array([0.5, 0.5]),
                    "joints_2d": rs.uniform(10, 70, (17, 2)),
                    "joints_3d": np.zeros((17, 3)),
                    "joints_vis": np.ones((17, 3)),
                    "camera": cam_dict,
                    "source": "h36m",
                    "subject": 1 + g % 2,
                    "action": 2,
                    "subaction": 1,
                    "image_id": g,
                    "camera_id": cam_id,
                }
            )
    os.makedirs(root / "h36m" / "annot", exist_ok=True)
    with open(root / "h36m" / "annot" / "h36m_train.pkl", "wb") as f:
        pickle.dump(db, f)
    with open(root / "h36m" / "annot" / "h36m_validation.pkl", "wb") as f:
        pickle.dump(db, f)
    return root


def test_mpii_db_and_grouping(mpii_root):
    ds = MPIIDataset(_cfg(mpii_root), "valid", is_train=False)
    assert len(ds.db) == 8
    assert len(ds) == 2  # 8 images / 4 fake views
    rec = ds.db[0]
    # center/scale fixups: y+15s, s*1.25, minus 1
    assert rec["scale"][0] == pytest.approx(0.5)
    assert rec["center"][1] == pytest.approx(40.0 + 15 * 0.4 - 1)
    assert rec["center"][0] == pytest.approx(49.0)


def test_mpii_evaluate_perfect_predictions(mpii_root):
    ds = MPIIDataset(_cfg(mpii_root), "valid", is_train=False)
    flat = [i for g in ds.grouping for i in g]
    preds = np.array([ds.db[i]["joints_2d"] for i in flat])
    name_values, mean = ds.evaluate(preds)
    assert mean == pytest.approx(1.0)
    assert set(name_values) > {"rank", "lwri", "mean"}


def test_mpii_load_record_shapes(mpii_root):
    cfg = _cfg(mpii_root)
    ds = MPIIDataset(cfg, "valid", is_train=False)
    rec = ds.load_record(0, np.random.RandomState(0))
    assert rec["image"].shape == (64, 64, 3)
    assert rec["joints_crop"].shape == (16, 2)
    assert rec["is_h36m"] == 0.0
    assert rec["supervise"] == 1.0


def test_h36m_grouping_and_mapping(h36m_root):
    ds = MultiViewH36M(_cfg(h36m_root), "train", is_train=True)
    assert len(ds) == 2  # 10 groups ::5
    assert all(len(g) == 4 for g in ds.grouping)
    # special renames present: thorax<-neck(8), upper neck<-nose(9), head top<-head(10)
    assert ds.u2a_mapping[7] == 8
    assert ds.u2a_mapping[8] == 9
    assert ds.u2a_mapping[9] == 10
    # 'belly' (7) is unmapped -> root(0) maps to union 6
    assert ds.u2a_mapping[6] == 0


def test_h36m_without_pseudo_supervise_zero(h36m_root):
    ds = MultiViewH36M(_cfg(h36m_root), "train", is_train=True)
    rec = ds.load_record(ds.grouping[0][0], np.random.RandomState(0))
    assert rec["supervise"] == 0.0
    assert rec["is_h36m"] == 1.0


def test_h36m_pseudo_injection(h36m_root, tmp_path):
    cfg = _cfg(h36m_root)
    base = MultiViewH36M(cfg, "train", is_train=True)
    n = len(base) * 4
    pseudo = np.full((n, 16, 2), 7.0, np.float32)
    vis = np.ones((n, 16), np.float32)
    path = str(tmp_path / "pseudo.h5")
    save_pseudo_labels(path, pseudo, vis)

    ds = MultiViewH36M(cfg, "train", is_train=True, pseudo_label_path=path)
    rec = ds.load_record(ds.grouping[0][0], np.random.RandomState(0))
    assert rec["supervise"] == 1.0
    first = ds.db[ds.grouping[0][0]]
    assert np.all(first["joints_2d_pseudo"][np.array(sorted(
        k for k, v in ds.u2a_mapping.items() if v != "*"))] == 7.0)


def test_h36m_evaluate_perfect(h36m_root):
    ds = MultiViewH36M(_cfg(h36m_root), "validation", is_train=False)
    from posetpu.data.base import sorted_union_indices

    u = sorted_union_indices(ds.u2a_mapping)
    flat = [i for g in ds.grouping for i in g]
    preds = np.array([ds.db[i]["joints_2d"] for i in flat])[:, u]
    name_values, mean = ds.evaluate(preds)
    assert mean == pytest.approx(1.0)
    assert "mean@0.1" in name_values
    assert "head" not in name_values  # excluded from the 15j mean


def test_mixed_concat_reindex(h36m_root, mpii_root, tmp_path):
    # both fixtures write under the same tmp_path/data root
    assert str(h36m_root) == str(mpii_root)
    root = h36m_root
    # mixed reads mpii 'train' annots; alias the valid fixture
    os.link(root / "mpii" / "annot" / "valid.json", root / "mpii" / "annot" / "train.json")
    cfg = _cfg(root)
    ds = MixedDataset(cfg, "train", is_train=True)
    assert len(ds) == len(ds.h36m) + len(ds.mpii)
    # mpii groups are reindexed past the h36m span
    first_mpii_group = ds.grouping[len(ds.h36m)]
    assert min(first_mpii_group) >= len(ds.h36m.db)
    rec_h = ds.load_record(ds.grouping[0][0], np.random.RandomState(0))
    rec_m = ds.load_record(first_mpii_group[0], np.random.RandomState(0))
    assert rec_h["is_h36m"] == 1.0 and rec_m["is_h36m"] == 0.0


def test_loader_batches_and_sharding(mpii_root):
    cfg = _cfg(mpii_root)
    ds = MPIIDataset(cfg, "valid", is_train=False)
    loader = GroupLoader(ds, batch_size=2, shuffle=False, prefetch=0)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["images"].shape == (2, 4, 64, 64, 3)
    assert b["joints_crop"].shape == (2, 4, 16, 2)
    assert b["is_h36m"].shape == (2,)

    # sharded loaders cover all groups disjointly
    l0 = GroupLoader(ds, 1, shuffle=False, prefetch=0, num_shards=2, shard_index=0)
    l1 = GroupLoader(ds, 1, shuffle=False, prefetch=0, num_shards=2, shard_index=1)
    assert len(l0) + len(l1) == 2


def test_loader_prefetch_matches_sync(mpii_root):
    cfg = _cfg(mpii_root)
    ds = MPIIDataset(cfg, "valid", is_train=False)
    sync = list(GroupLoader(ds, 2, shuffle=False, prefetch=0))
    pre = list(GroupLoader(ds, 2, shuffle=False, prefetch=2))
    np.testing.assert_array_equal(sync[0]["images"], pre[0]["images"])


def test_prepare_fn(mpii_root):
    cfg = _cfg(mpii_root)
    ds = MPIIDataset(cfg, "valid", is_train=False)
    batch = next(iter(GroupLoader(ds, 2, shuffle=False, prefetch=0)))
    prep = make_prepare_fn(cfg)
    out = prep(batch)
    assert out["images"].shape == (2, 4, 64, 64, 3)
    assert out["target"].shape == (2, 4, 16, 16, 16)
    assert out["weight"].shape == (2, 4, 16)
    assert float(np.asarray(out["images"]).max()) < 20.0  # normalised
    # weight respects the supervise flag
    batch["supervise"] = np.zeros_like(batch["supervise"])
    out2 = prep(batch)
    assert float(np.asarray(out2["weight"]).max()) == 0.0


def test_h5_roundtrips(tmp_path):
    hm = np.random.rand(8, 16, 4, 4).astype(np.float32)
    loc = np.random.rand(8, 16, 3).astype(np.float32)
    save_heatmaps(str(tmp_path / "h.h5"), hm, loc, np.arange(16))
    h2, l2, order = load_heatmaps(str(tmp_path / "h.h5"))
    np.testing.assert_array_equal(hm, h2)
    np.testing.assert_array_equal(loc, l2)

    save_pseudo_labels(str(tmp_path / "p.h5"), loc[..., :2], loc[..., 2])
    p2, v2 = load_pseudo_labels(str(tmp_path / "p.h5"))
    np.testing.assert_array_equal(p2, loc[..., :2])


def test_zipreader(tmp_path):
    img = np.random.RandomState(0).randint(0, 255, (20, 30, 3), np.uint8)
    img_path = tmp_path / "img.png"
    cv2.imwrite(str(img_path), img)
    zip_path = tmp_path / "archive.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.write(img_path, "inner/img.png")
    out = zipreader.imread(f"{zip_path}@/inner/img.png")
    np.testing.assert_array_equal(out, img)
    direct = zipreader.imread(str(img_path))
    np.testing.assert_array_equal(direct, img)


def test_loader_weighted_sampling(mpii_root):
    cfg = _cfg(mpii_root)
    ds = MPIIDataset(cfg, "valid", is_train=False)
    loader = GroupLoader(ds, 1, shuffle=True, prefetch=0, seed=3)
    w = np.zeros(len(ds))
    w[0] = 1.0  # only group 0 can be drawn
    loader.set_weights(w)
    idx = loader._indices()
    assert (idx == 0).all()
    # weights=None keeps the permutation behaviour
    loader.set_weights(None)
    assert sorted(loader._indices().tolist()) == list(range(len(ds)))


def test_native_batch_loader_matches_python_path(mpii_root, monkeypatch):
    """Deferred C++ batch loading (incl. random flips) == the Python path:
    metadata exactly, pixels within JPEG-decode/warp rounding tolerance."""
    from posetpu import native

    if not native.available():
        pytest.skip("native loader unavailable")

    cfg = _cfg(mpii_root)
    cfg.DATASET.MPII_SCALE_FACTOR = 0.25
    cfg.DATASET.MPII_ROT_FACTOR = 30
    cfg.DATASET.MPII_FLIP = True

    monkeypatch.setenv("POSETPU_NATIVE_LOADER", "1")
    ds_nat = MPIIDataset(cfg, "valid", is_train=True)
    assert ds_nat.use_native_loader
    monkeypatch.setenv("POSETPU_NATIVE_LOADER", "0")
    ds_py = MPIIDataset(cfg, "valid", is_train=True)
    assert not ds_py.use_native_loader

    nat = list(GroupLoader(ds_nat, 2, shuffle=True, seed=7, prefetch=0))
    py = list(GroupLoader(ds_py, 2, shuffle=True, seed=7, prefetch=0))
    assert len(nat) == len(py) and len(nat) > 0
    flips = 0
    for bn, bp in zip(nat, py):
        for key in ("joints_crop", "joints_vis", "center", "scale", "rotation"):
            np.testing.assert_array_equal(bn[key], bp[key], err_msg=key)
        diff = np.abs(bn["images"].astype(int) - bp["images"].astype(int))
        assert np.median(diff) <= 1
        assert (diff > 16).mean() < 0.03, (diff.mean(), (diff > 16).mean())


def test_evaluate_writes_overlay_sheets(mpii_root, tmp_path):
    """save_all_preds draws the reference's per-image overlay dumps
    (vis.py:253-296) plus the JSONL summary."""
    ds = MPIIDataset(_cfg(mpii_root), "valid", is_train=False)
    flat = [i for g in ds.grouping for i in g]
    preds = np.array([ds.db[i]["joints_2d"] for i in flat])
    out = tmp_path / "eval"
    ds.evaluate(preds, output_dir=str(out))
    assert (out / "all_preds_mpii.jsonl").exists()
    sheets = sorted((out / "debug").glob("*.jpg"))
    assert len(sheets) == len(flat)
    import cv2

    img = cv2.imread(str(sheets[0]))
    assert img is not None and img.shape[2] == 3


def test_loader_over_mixed_dataset(h36m_root, mpii_root):
    """GroupLoader's deferred-image batch path must work for MixedDataset
    (its load_record override once dropped the defer_image kwarg)."""
    assert str(h36m_root) == str(mpii_root)
    root = h36m_root
    if not os.path.exists(root / "mpii" / "annot" / "train.json"):
        os.link(root / "mpii" / "annot" / "valid.json",
                root / "mpii" / "annot" / "train.json")
    ds = MixedDataset(_cfg(root), "train", is_train=True)
    batches = list(GroupLoader(ds, 2, shuffle=False, prefetch=0))
    assert len(batches) >= 1
    assert batches[0]["images"].shape[1:] == (4, 64, 64, 3)
    assert batches[0]["images"].dtype == np.uint8
