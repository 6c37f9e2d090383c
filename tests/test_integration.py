"""End-to-end integration over a geometrically consistent synthetic H36M:
dataset -> (validate loop | GT triangulation oracle | pseudo-label mint)."""

import os
import pickle

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.config import default_config
from posetpu.data.h36m import MultiViewH36M
from posetpu.data.synthetic import make_camera_ring, make_poses3d
from posetpu.geometry.cameras import CameraParams, project_points, world_to_camera_frame


N_GROUPS = 10  # ::5 -> 2 train groups; ::64 -> 1 validation group... need more
IMG_W, IMG_H = 200, 200


def _cam_to_dict(cams: CameraParams, v: int) -> dict:
    return {
        "R": np.asarray(cams.R[v], np.float64),
        "T": np.asarray(cams.T[v], np.float64).reshape(3, 1),
        "fx": float(cams.f[v, 0]),
        "fy": float(cams.f[v, 1]),
        "cx": float(cams.c[v, 0]),
        "cy": float(cams.c[v, 1]),
        "k": np.asarray(cams.k[v], np.float64).reshape(3, 1),
        "p": np.asarray(cams.p[v], np.float64).reshape(2, 1),
    }


@pytest.fixture
def synth_h36m_root(tmp_path):
    """On-disk H36M-format dataset from the synthetic rig: 17-joint GT,
    consistent cameras/projections, camera-frame joints_3d."""
    root = tmp_path / "data"
    cams = make_camera_ring(image_size=(IMG_W, IMG_H))
    # rescale camera intrinsics to the small synthetic image
    cams = CameraParams(
        R=cams.R, T=cams.T,
        f=cams.f * (IMG_W / 1000.0) * 0.22,
        c=jnp.full_like(cams.c, IMG_W / 2.0),
        k=cams.k, p=cams.p,
    )
    pts3d = make_poses3d(N_GROUPS, n_joints=17)

    db = []
    for g in range(N_GROUPS):
        for v in range(4):
            cam_v = jax.tree.map(lambda x, v=v: x[v], cams)
            pix = np.asarray(project_points(jnp.asarray(pts3d[g]), cam_v))
            xcam = np.asarray(
                world_to_camera_frame(jnp.asarray(pts3d[g]), cam_v.R, cam_v.T)
            )
            name = f"g{g}_c{v}.jpg"
            path = root / "h36m" / "images" / name
            os.makedirs(path.parent, exist_ok=True)
            img = np.zeros((IMG_H, IMG_W, 3), np.uint8)
            for x, y in pix:
                cv2.circle(img, (int(x), int(y)), 2, (255, 255, 255), -1)
            cv2.imwrite(str(path), img)
            db.append(
                {
                    "image": name,
                    "center": np.array([IMG_W / 2.0, IMG_H / 2.0]),
                    "scale": np.array([IMG_W / 200.0, IMG_H / 200.0]),
                    "joints_2d": pix.astype(np.float64),
                    "joints_3d": xcam.astype(np.float64),
                    "joints_vis": np.ones((17, 3)),
                    "camera": _cam_to_dict(cams, v),
                    "source": "h36m",
                    "subject": 1,
                    "action": 2,
                    "subaction": 1,
                    "image_id": g,
                    "camera_id": v,
                }
            )
    os.makedirs(root / "h36m" / "annot", exist_ok=True)
    for subset in ("train", "validation"):
        with open(root / "h36m" / "annot" / f"h36m_{subset}.pkl", "wb") as f:
            pickle.dump(db, f)
    return root


def _cfg(root):
    cfg = default_config()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.DATA_FORMAT = "jpg"
    cfg.DATASET.TEST_DATASET = "multiview_h36m"
    cfg.NETWORK.IMAGE_SIZE = np.array([64, 64])
    cfg.NETWORK.HEATMAP_SIZE = np.array([16, 16])
    cfg.POSE_RESNET.NUM_LAYERS = 18
    cfg.TEST.BATCH_SIZE = 2
    return cfg


def test_cli_triangulate_gt_oracle(synth_h36m_root):
    """The reference's oracle (test_triangulate.py GT path): GT 2D through
    the dataset + camera plumbing triangulates back to ~0 MPJPE."""
    from posetpu.cli.triangulate import run

    cfg = _cfg(synth_h36m_root)
    stats = run(cfg, heatmap="", log=lambda *_: None)
    assert stats["mean_mm"] < 1.0, stats


def test_validate_loop_dumps_h5(synth_h36m_root, tmp_path):
    from posetpu.data.loader import GroupLoader
    from posetpu.models import MultiViewPose, get_pose_net
    from posetpu.train.loop import validate
    from posetpu.train.step import make_eval_step

    cfg = _cfg(synth_h36m_root)
    ds = MultiViewH36M(cfg, "train", False)  # ::5 -> 2 groups
    loader = GroupLoader(ds, 2, shuffle=False, drop_last=False, prefetch=0)
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    x = jnp.zeros((1, 4, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    eval_step = make_eval_step(model, cfg, flip_pairs=ds.flip_pairs)

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    perf, name_values, preds, heatmaps = validate(
        cfg, loader, ds, eval_step, variables, output_dir=out_dir
    )
    assert np.isfinite(perf)
    path = os.path.join(out_dir, "heatmaps_locations_train_multiview_h36m.h5")
    from posetpu.data.h5io import load_heatmaps

    hm, loc, order = load_heatmaps(path)
    assert hm.shape == (len(ds) * 4, 16, 16, 16)
    assert loc.shape == (len(ds) * 4, 16, 3)


def test_pseudo_label_flow_from_gt(synth_h36m_root, tmp_path):
    """GT 2D as 'predictions' -> mint -> inject back into the dataset."""
    from posetpu.data.base import sorted_union_indices
    from posetpu.pseudo import mint_pseudo_labels

    cfg = _cfg(synth_h36m_root)
    ds = MultiViewH36M(cfg, "train", True)
    u = sorted_union_indices(ds.u2a_mapping)
    gt2d, _ = ds.gt_joints_flat()
    pred2d = gt2d[:, u]
    confidence = np.full(pred2d.shape[:2], 0.9, np.float32)
    flat = [i for g in ds.grouping for i in g]
    scales = np.array([ds.db[i]["scale"] for i in flat])
    headsizes = np.amax(scales, axis=1, keepdims=True) * 200 / 10.0

    out = str(tmp_path / "pl")
    mint_pseudo_labels(
        pred2d, confidence, ds.cameras_flat(), out,
        gt2d=pred2d, headsizes=headsizes,
        loop=True, confidence_thre=0.5, if_ransac=True, num_inliers=3,
        use_reproj=True, log=lambda *_: None,
    )
    path = os.path.join(out, "0.5_1_pseudo_label.h5")
    assert os.path.exists(path)

    ds2 = MultiViewH36M(cfg, "train", True, pseudo_label_path=path)
    rec = ds2.load_record(ds2.grouping[0][0], np.random.RandomState(0))
    assert rec["supervise"] == 1.0
    # pseudo labels from GT + RANSAC + reprojection stay close to GT
    d = np.abs(
        ds2.db[ds2.grouping[0][0]]["joints_2d_pseudo"][u]
        - ds2.db[ds2.grouping[0][0]]["joints_2d"][u]
    )
    assert d.max() < 2.0, d.max()


def test_undistort_regeneration(synth_h36m_root, tmp_path):
    """Undistorted regeneration: after it, GT triangulation with
    no_distortion on the new annotations is still ~0 MPJPE."""
    from posetpu.cli.generate import generate_undistorted
    from posetpu.cli.triangulate import run

    cfg = _cfg(synth_h36m_root)
    out_root = str(tmp_path / "nodist")
    pkl = generate_undistorted(cfg, out_root, max_groups=2, log=lambda *_: None)
    assert os.path.exists(pkl)

    cfg2 = _cfg(out_root)
    # only 2 groups were regenerated; restrict via the pickle itself
    import pickle as pk

    with open(pkl, "rb") as f:
        db = pk.load(f)
    assert all(float(np.abs(r["camera"]["k"]).sum()) == 0 for r in db)
    stats = run(cfg2, heatmap="", no_distortion=True, log=lambda *_: None)
    assert stats["mean_mm"] < 1.0, stats
