"""int8-vs-float accuracy delta on a TRAINED checkpoint (VERDICT weak #6).

Builds a learnable on-disk H36M-format fixture (bright blobs at projected
joint locations), trains the flagship MultiViewPose on the real chip for a
few epochs via the public CLI, then evaluates the SAME checkpoint through
cli.validate in float and int8-PTQ modes and reports the PCKh delta.

NOTE (round 5, 2026-08-21): this tool's own multiview_h36m-only fixture
plateaued at val acc ~0.12 after 21 epochs in a fresh /tmp workdir (round
2 recorded 1.000 at 25 — regime difference unexplained; batch 2, LR 1e-3,
no pseudo path until minting). The round-5 accuracy receipts (float /
int8 / act4) were therefore taken on the pipeline_drive mixed fixture
instead, which converges to 0.98 in ~15 min — see PERF.md win #13 and
PIPELINE_r05.json act4_accuracy. Prefer that path for future deltas; this
tool still works as the one-command variant once its fixture regime is
debugged.

Run: PYTHONPATH=. python tools/int8_accuracy.py [workdir]
"""

from __future__ import annotations

import json
import os
import pickle
import sys

import cv2
import numpy as np

IMG_W = IMG_H = 256
N_GROUPS = 320


def build_fixture(root: str, uniform_color: bool = False) -> None:
    import contextlib

    import jax
    import jax.numpy as jnp

    # pin the per-group eager projection math to the host CPU backend:
    # through the remote tunnel every eager op is a round-trip and the
    # 320x4 build takes ~10 min instead of seconds
    try:
        _cpu = jax.local_devices(backend="cpu")[0]
        _ctx = jax.default_device(_cpu)
    except RuntimeError:
        _ctx = contextlib.nullcontext()
    with _ctx:
        return _build_fixture_impl(root, uniform_color)


def _build_fixture_impl(root: str, uniform_color: bool) -> None:
    import jax
    import jax.numpy as jnp

    from posetpu.data.synthetic import make_camera_ring, make_skeleton_poses
    from posetpu.geometry.cameras import (
        CameraParams, project_points, world_to_camera_frame,
    )

    from posetpu.data.base import make_u2a_mapping
    from posetpu.data.h36m import H36M_JOINTS, SPECIAL_U2A

    cams = make_camera_ring(image_size=(IMG_W, IMG_H))
    # f ~= 420: the person spans ~140 px of the 256 frame (A/B'd on the
    # pipeline drive: x1.5 transfers best; x1.9 matched the MPII person
    # scale exactly but pushed edge joints into the frame margin and
    # measured WORSE iteration-0 pseudo PCKh, 0.22 vs 0.34). At the
    # original f ~= 99 the whole skeleton was a ~32 px cluster and
    # cross-domain transfer was impossible
    cams = CameraParams(
        R=cams.R, T=cams.T,
        f=cams.f * (IMG_W / 1000.0) * 1.5,
        c=jnp.full_like(cams.c, IMG_W / 2.0),
        k=cams.k * 0.0, p=cams.p * 0.0,
    )
    # 17-joint H36M schema in the loader's CANONICAL joint order: place the
    # union-ordered skeleton joints at the h36m indices the u2a mapping
    # expects, and color each blob by its UNION identity so a detector
    # trained on the MPII-format fixture transfers (the pipeline drive's
    # cross-domain regime; a same-order-shifted layout mislabels joints and
    # breaks transfer — measured PCKh 0.36 instead of ~0.9)
    poses16 = make_skeleton_poses(N_GROUPS, seed=3)
    # center the body on the ring's look-at point: the canonical skeleton
    # stands on z=0 (feet 80 mm, head 1750 mm) while make_camera_ring aims
    # at the origin — unshifted, a realistic f pushes the head off-frame
    poses16[..., 2] -= 1000.0
    u2a = make_u2a_mapping(H36M_JOINTS, SPECIAL_U2A)
    pts3d = np.zeros((N_GROUPS, 17, 3), poses16.dtype)
    colors = [(170, 170, 170)] * 17  # unmapped joints (belly): neutral
    for u, a in u2a.items():
        if a == "*":
            continue
        pts3d[:, a] = poses16[:, u]
        # uniform_color: all joints share one color, so joint identity must
        # come from the 2D CONFIGURATION (like real pose estimation) — the
        # regime where cross-view transfer is imperfect and the pipeline's
        # geometry distillation has headroom (reference's 0.904 regime)
        colors[a] = ((120, 220, 120) if uniform_color else
                     (int(80 + 10 * (u + 1)), int(255 - 9 * (u + 1)),
                      int(40 + 12 * (u + 1))))  # = the MPII fixture's color u
    pts3d[:, 7] = 0.5 * (pts3d[:, 0] + pts3d[:, 8])  # belly: root-neck mid
    db = []
    for g in range(N_GROUPS):
        for v in range(4):
            cam_v = jax.tree.map(lambda x, v=v: x[v], cams)
            pix = np.asarray(project_points(jnp.asarray(pts3d[g]), cam_v))
            xcam = np.asarray(
                world_to_camera_frame(jnp.asarray(pts3d[g]), cam_v.R, cam_v.T)
            )
            name = f"g{g:03d}_c{v}.jpg"
            path = os.path.join(root, "h36m", "images", name)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            img = np.full((IMG_H, IMG_W, 3), 16, np.uint8)
            for j, (x, y) in enumerate(pix):
                cv2.circle(img, (int(round(x)), int(round(y))), 4, colors[j], -1)
            cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
            db.append({
                "image": name,
                "center": np.array([IMG_W / 2.0, IMG_H / 2.0]),
                "scale": np.array([IMG_W / 200.0, IMG_H / 200.0]),
                "joints_2d": pix.astype(np.float64),
                "joints_3d": xcam.astype(np.float64),
                "joints_vis": np.ones((17, 3)),
                "camera": {
                    "R": np.asarray(cams.R[v], np.float64),
                    "T": np.asarray(cams.T[v], np.float64).reshape(3, 1),
                    "fx": float(cams.f[v, 0]), "fy": float(cams.f[v, 1]),
                    "cx": float(cams.c[v, 0]), "cy": float(cams.c[v, 1]),
                    "k": np.asarray(cams.k[v], np.float64).reshape(3, 1),
                    "p": np.asarray(cams.p[v], np.float64).reshape(2, 1),
                },
                "source": "h36m", "subject": 1, "action": 2, "subaction": 1,
                "image_id": g, "camera_id": v,
            })
    os.makedirs(os.path.join(root, "h36m", "annot"), exist_ok=True)
    for subset in ("train", "validation"):
        with open(os.path.join(root, "h36m", "annot", f"h36m_{subset}.pkl"), "wb") as f:
            pickle.dump(db, f)


CFG_YAML = """\
GPUS: '0'
DATA_DIR: ''
OUTPUT_DIR: output
LOG_DIR: log
DATASET:
  ROOT: '{root}'
  TRAIN_DATASET: multiview_h36m
  TEST_DATASET: multiview_h36m
  TRAIN_SUBSET: train
  TEST_SUBSET: validation
  DATA_FORMAT: jpg
NETWORK:
  PRETRAINED: ''
  IMAGE_SIZE:
  - 256
  - 256
  HEATMAP_SIZE:
  - 64
  - 64
  SIGMA: 2
  AGGRE: true
POSE_RESNET:
  NUM_LAYERS: 18
LOSS:
  USE_TARGET_WEIGHT: true
TRAIN:
  BATCH_SIZE: 2
  BEGIN_EPOCH: 0
  END_EPOCH: {epochs}
  LR: 0.001
  LR_STEP:
  - 90
  - 110
TEST:
  BATCH_SIZE: 2
"""


def mint_gt_pseudo(cfg_path: str, out_h5: str) -> None:
    """GT joints as pseudo labels (the fixture's supervised ceiling),
    in the interchange H5 schema add_pseudo expects."""
    from posetpu.cli.common import load_cfg
    from posetpu.data.base import sorted_union_indices
    from posetpu.data.h36m import MultiViewH36M
    from posetpu.data.h5io import save_pseudo_labels

    class A:
        cfg = cfg_path
        modelDir = logDir = dataDir = ""

    cfg = load_cfg(A())
    ds = MultiViewH36M(cfg, "train", True)
    u = sorted_union_indices(ds.u2a_mapping)
    rows, vis = [], []
    for items in ds.grouping:
        for idx in items:
            rows.append(np.asarray(ds.db[idx]["joints_2d"])[u])
            vis.append(np.ones(len(u), np.float32))
    save_pseudo_labels(out_h5, np.stack(rows), np.stack(vis))


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/int8_acc"
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "data")
    if not os.path.exists(os.path.join(root, "h36m", "annot", "h36m_train.pkl")):
        print("building fixture...", flush=True)
        build_fixture(root)

    cfg_path = os.path.join(work, "exp.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_YAML.format(root=root, epochs=25))

    os.chdir(work)
    import sys as _sys

    pseudo = os.path.join(work, "gt_pseudo.h5")
    if not os.path.exists(pseudo):
        mint_gt_pseudo(cfg_path, pseudo)

    import glob

    from posetpu.cli import train as train_cli  # noqa: F401

    best = glob.glob(os.path.join(work, "output", "**", "model_best"),
                     recursive=True)
    if not best:
        _sys.argv = ["train", "--cfg", cfg_path, "--pseudo-path", pseudo]
        print("training...", flush=True)
        train_cli.main()
        best = glob.glob(os.path.join(work, "output", "**", "model_best"),
                         recursive=True)
    assert best, "training produced no model_best checkpoint"

    from posetpu.cli import validate as validate_cli

    results = {}
    for mode, extra in (
        ("float", []),
        ("int8", ["--int8"]),
        ("int8_act4_l12", ["--int8", "--int8-act4", "l12"]),
        ("int8_qat", ["--int8", "--qat-steps", "60"]),
    ):
        _sys.argv = ["validate", "--cfg", cfg_path, "--state", best[0]] + extra
        print(f"validating ({mode})...", flush=True)
        results[mode] = validate_cli.main()
    results["delta"] = (
        None if results.get("float") is None or results.get("int8") is None
        else float(results["float"]) - float(results["int8"])
    )
    results["delta_act4_l12"] = (
        None if results.get("float") is None
        or results.get("int8_act4_l12") is None
        else float(results["float"]) - float(results["int8_act4_l12"])
    )
    results["delta_qat"] = (
        None if results.get("float") is None or results.get("int8_qat") is None
        else float(results["float"]) - float(results["int8_qat"])
    )
    print("INT8_ACCURACY " + json.dumps(results, default=str))


if __name__ == "__main__":
    main()
