"""Pseudo-label minting pipeline tests on the synthetic rig."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.data.h5io import load_pseudo_labels
from posetpu.data.synthetic import make_camera_ring, make_poses3d, tile_cameras
from posetpu.geometry.cameras import CameraParams
from posetpu.geometry.cameras import project_points
from posetpu.pseudo import (
    mint_pseudo_labels,
    pareto_select,
    pckh_weighted,
    visibility_stats,
)


def _flat_cams(cams, g):
    return CameraParams(*[np.asarray(x).reshape((g * 4,) + x.shape[2:]) for x in cams])


def test_pckh_weighted_perfect_and_off(rng):
    gt = rng.uniform(0, 100, (8, 16, 2))
    vis = np.ones((8, 16))
    hs = np.full((8, 1), 10.0)
    assert pckh_weighted(gt, gt, vis, hs) == 1.0
    assert pckh_weighted(gt + 100.0, gt, vis, hs) == 0.0


def test_visibility_stats():
    vis = np.ones((8, 16))
    vis[0:4, 0] = 0  # joint 0 of group 0 invisible in all views
    s = visibility_stats(vis)
    assert s["joints@0"] > 0
    assert abs(s["vis"] - (vis.sum() / vis.size)) < 1e-9


def test_pareto_select_dominance():
    acc = [0.9, 0.95, 0.85, 0.97]
    num = [0.8, 0.70, 0.90, 0.60]
    sel = pareto_select(acc, num)
    # (0.85, 0.90), (0.9, 0.8), (0.95, 0.7), (0.97, 0.6) are all non-dominated
    assert sorted(sel) == [0, 1, 2, 3]
    # a strictly dominated point is dropped
    sel2 = pareto_select([0.9, 0.8], [0.8, 0.7])
    assert sel2 == [0]


def test_mint_pseudo_labels_end_to_end(tmp_path, rng):
    G, J = 6, 16
    cams = tile_cameras(make_camera_ring(), G)
    gt3d = make_poses3d(G)
    pix = np.array(
        jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(
            cams, jnp.asarray(gt3d)
        )
    ).reshape(G * 4, J, 2)

    pred = pix + rng.randn(*pix.shape).astype(np.float32) * 2.0
    # view 2 of group 0 is garbage
    pred[2::4][0] += 200.0
    confidence = rng.uniform(0.5, 1.0, (G * 4, J)).astype(np.float32)
    gt2d = pix
    headsizes = np.full((G * 4, 1), 50.0)

    out = str(tmp_path / "pl")
    summary = mint_pseudo_labels(
        pred,
        confidence,
        _flat_cams(cams, G),
        out,
        gt2d=gt2d,
        headsizes=headsizes,
        thresholds=(0.6, 0.7),
        if_ransac=True,
        num_inliers=3,
        reproj_thre=10.0,
        use_reproj=True,
        log=lambda *_: None,
    )
    # files: 2 thresholds x (conf + reproj) + select/delete
    files = sorted(os.listdir(out))
    assert "0.6_0_pseudo_label.h5" in files
    assert "0.6_1_pseudo_label.h5" in files
    assert "select.txt" in files and "delete.txt" in files
    assert summary["selected"]

    # reprojected labels fix the corrupted view: its reprojection error vs GT
    # should be small again
    p2d, vis = load_pseudo_labels(os.path.join(out, "0.6_1_pseudo_label.h5"))
    bad_row = 2  # first group's view 2
    err = np.linalg.norm(p2d[bad_row] - gt2d[bad_row], axis=-1)
    mask = vis[bad_row] > 0
    assert mask.any()
    assert err[mask].mean() < 15.0, err[mask].mean()


def test_mint_choose_policy(tmp_path, rng):
    """summary['choose']() picks the Pareto entry maximising PCKh·vis
    (expected correct-label mass) over the visibility floor, and its H5
    exists — the --adaptive-thre pipeline regime. A detector whose
    confidences all sit below a high fixed threshold still yields usable
    labels at the lower sweep points."""
    G, J = 4, 16
    cams = tile_cameras(make_camera_ring(), G)
    gt3d = make_poses3d(G)
    pix = np.array(
        jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(
            cams, jnp.asarray(gt3d)
        )
    ).reshape(G * 4, J, 2)
    pred = pix + rng.randn(*pix.shape).astype(np.float32) * 2.0
    # every confidence below 0.7: a fixed 0.7 threshold would mint nothing
    confidence = rng.uniform(0.35, 0.65, (G * 4, J)).astype(np.float32)

    out = str(tmp_path / "pl")
    summary = mint_pseudo_labels(
        pred, confidence, _flat_cams(cams, G), out,
        gt2d=pix, headsizes=np.full((G * 4, 1), 50.0),
        thresholds=(0.1, 0.3, 0.5, 0.7, 0.9),
        if_ransac=True, num_inliers=3, reproj_thre=10.0, use_reproj=True,
        log=lambda *_: None,
    )
    name = summary["choose"]()
    entry = next(e for e in summary["entries"] if e.get("name") == name)
    assert entry["vis"] >= 0.10
    assert os.path.exists(os.path.join(out, f"{name}_pseudo_label.h5"))
    # every saved Pareto candidate with vis over the floor has
    # pckh*vis <= the chosen entry's (the expected-correct-label utility)
    floor = [e for e in summary["entries"]
             if e.get("name") in summary["selected"] and e["vis"] >= 0.10]
    util = entry["pckh"] * entry["vis"]
    assert all(e["pckh"] * e["vis"] <= util + 1e-9 for e in floor)

    # a near-perfect-but-sparse entry must not beat an almost-as-good
    # near-full-coverage one (the measured iteration-2 regression regime)
    summary["entries"].extend([
        {"name": "sparse", "pckh": 1.0, "vis": 0.16},
        {"name": "broad", "pckh": 0.985, "vis": 0.99},
    ])
    summary["selected"] = ["sparse", "broad"]
    assert summary["choose"]() == "broad"


def test_mint_loop_mode_single_threshold(tmp_path, rng):
    G, J = 2, 16
    cams = tile_cameras(make_camera_ring(), G)
    gt3d = make_poses3d(G)
    pix = np.array(
        jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(
            cams, jnp.asarray(gt3d)
        )
    ).reshape(G * 4, J, 2)
    confidence = np.full((G * 4, J), 0.9, np.float32)

    out = str(tmp_path / "pl")
    mint_pseudo_labels(
        pix,
        confidence,
        _flat_cams(cams, G),
        out,
        loop=True,
        confidence_thre=0.7,
        if_ransac=True,
        num_inliers=3,
        use_reproj=True,
        log=lambda *_: None,
    )
    files = sorted(os.listdir(out))
    # loop mode with ransac skips the confidence-only dump and writes only
    # the reprojected labels for the single threshold; no pareto files
    assert files == ["0.7_1_pseudo_label.h5"]
