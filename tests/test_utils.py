"""Utility modules: gradient probe, pose utils, vis, CLIs (diagnostics)."""

import os

import jax.numpy as jnp
import numpy as np

from posetpu.utils.gradients import grad_norms_wrt_heatmaps
from posetpu.utils.pose_utils import align_3d_to_2d, estimate_camera, procrustes


def test_grad_norms(rng):
    hm = jnp.asarray(rng.randn(4, 16, 8, 8).astype(np.float32))
    target = jnp.asarray(rng.randn(4, 16, 8, 8).astype(np.float32))
    fns = {
        "mse": lambda h: jnp.mean((h - target) ** 2),
        "zero": lambda h: jnp.sum(h * 0.0),
    }
    norms = grad_norms_wrt_heatmaps(fns, hm)
    assert float(norms["mse"]) > 0
    assert float(norms["zero"]) == 0.0


def test_procrustes_recovers_similarity(rng):
    x = rng.randn(16, 3)
    r_angle = 0.7
    R = np.array(
        [[np.cos(r_angle), -np.sin(r_angle), 0],
         [np.sin(r_angle), np.cos(r_angle), 0],
         [0, 0, 1]]
    )
    y = (x @ R.T) * 2.0 + np.array([1.0, -3.0, 5.0])
    d, z, tform = procrustes(x, y)
    assert d < 1e-10
    np.testing.assert_allclose(z, x, atol=1e-8)


def test_estimate_camera_weak_perspective(rng):
    pose3d = rng.randn(16, 3) * 100
    R = np.linalg.qr(rng.randn(3, 3))[0][:2]  # random 2x3 row-orthonormal
    s, t = 0.5, np.array([10.0, -5.0])
    pose2d = s * (pose3d @ R.T) + t
    proj = align_3d_to_2d(pose3d, pose2d)
    np.testing.assert_allclose(proj, pose2d, atol=1e-6)


def test_vis_dumps(tmp_path, rng):
    from posetpu.config import default_config
    from posetpu.utils.vis import save_all_preds, save_debug_images

    cfg = default_config()
    n, j = 2, 16
    images = rng.rand(n, 64, 64, 3).astype(np.float32)
    joints = rng.uniform(0, 60, (n, j, 2)).astype(np.float32)
    vis = np.ones((n, j))
    target = rng.rand(n, 16, 16, j).astype(np.float32)
    prefix = str(tmp_path / "dbg" / "batch0")
    save_debug_images(cfg, images, joints, vis, joints, target, target, prefix)
    assert os.path.exists(f"{prefix}_gt.jpg")
    assert os.path.exists(f"{prefix}_hm_pred.jpg")

    path = save_all_preds(
        joints, joints, np.ones((n, j)), [f"im{i}.jpg" for i in range(n)],
        "mpii", str(tmp_path / "preds"),
    )
    assert os.path.exists(path)


def test_generate_pseudo_cfg(tmp_path):
    import yaml

    from posetpu.cli.generate import generate_pseudo_cfg

    base = tmp_path / "base.yaml"
    with open(base, "w") as f:
        yaml.dump({"TRAIN": {"BATCH_SIZE": 4}}, f)
    select = tmp_path / "select.txt"
    with open(select, "w") as f:
        f.write(str(tmp_path / "0.7_1_pseudo_label.h5") + "\n")
    out = generate_pseudo_cfg(str(base), str(select), str(tmp_path / "cfgs"),
                              log=lambda *_: None)
    assert len(out) == 1
    loaded = yaml.safe_load(open(out[0]))
    assert loaded["DATASET"]["PSEUDO_LABEL_PATH"].endswith("0.7_1_pseudo_label.h5")
    assert loaded["TRAIN"]["BATCH_SIZE"] == 4


def test_step_timer_and_memory():
    import time as _time

    from posetpu.utils.profiling import StepTimer, device_memory_stats, sync

    t = StepTimer()
    t.data_ready()
    _time.sleep(0.01)
    t.step_done(jnp.ones(3))
    s = t.summary(samples_per_step=8)
    assert s["step_ms"] > 5
    assert s["samples_per_s"] > 0
    assert sync(jnp.ones(4)) == 4.0
    assert isinstance(device_memory_stats(), dict)


def test_checks_module():
    import pytest as _pytest

    from posetpu.utils.checks import assert_batch_shapes, check_finite_metrics

    batch = {
        "images": np.zeros((2, 4, 8, 8, 3)),
        "target": np.zeros((2, 4, 4, 4, 16)),
        "weight": np.zeros((2, 4, 16)),
        "is_h36m": np.zeros(2),
        "center": np.zeros((2, 4, 2)),
        "scale": np.zeros((2, 4, 2)),
    }
    assert_batch_shapes(batch)
    bad = dict(batch, weight=np.zeros((2, 4, 15)))
    with _pytest.raises(ValueError):
        assert_batch_shapes(bad)

    import os as _os

    _os.environ["POSETPU_CHECK_FINITE"] = "1"
    try:
        with _pytest.raises(FloatingPointError):
            check_finite_metrics({"loss": float("nan")}, 3)
        check_finite_metrics({"loss": 1.0}, 3)
    finally:
        _os.environ.pop("POSETPU_CHECK_FINITE")
