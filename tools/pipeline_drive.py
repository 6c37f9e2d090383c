"""Drive the FULL self-training pipeline on the real chip and record the
iteration-level pseudo-label PCKh progression (the reference's pseudo-label
table, README.md:216-220 / train.sh:86-109 loop semantics).

Protocol (mini replica of the reference's):
  - labeled MPII-format blob fixture + unlabeled H36M-format blob fixture
    (same per-joint blob colors, so detection transfers across sources);
  - iteration 0: mixed training with NO pseudo labels (h36m target weights
    are zero -> MPII supervision only), then trainset inference -> heatmap
    H5 -> pseudo-label minting (threshold + RANSAC + reprojection);
  - iteration 1: retrain with iteration-0 pseudo labels (the reference's
    "+pseudo #0" regime; the epipolar loss joins at later iterations on
    real data -- on this mini fixture it destabilizes a from-scratch
    retrain whose labels are still ~60%-noisy), mint again;
  - report per-iteration pseudo PCKh and final validation PCKh.

Run: PYTHONPATH=. python tools/pipeline_drive.py [workdir]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import cv2
import numpy as np

from tools.int8_accuracy import CFG_YAML, build_fixture

N_MPII = 512  # flat images -> 128 fake 4-view groups


def build_mpii_fixture(root: str, seed: int = 11, n_mpii: int = N_MPII) -> None:
    """MPII-format blob fixture: same renderer and blob colors as the h36m
    fixture (tools/int8_accuracy.py) so the 2D detector transfers across
    sources.

    Round-3 change (VERDICT #5): images are rendered from RANDOM
    PERSPECTIVE viewpoints with ring-like geometry (random azimuth,
    jittered radius/height, same focal scale as the h36m fixture's
    cameras), replacing the round-2 orthographic TOP view (`pts[:, :2]`
    with z vertical looks straight down). MPII-the-dataset is in-the-wild
    and view-diverse; the top-view-only fixture trained a detector whose
    2D joint statistics never matched the horizontal ring views of the
    h36m fixture — the measured 0.335 transfer ceiling. View-matched
    rendering is what the real datasets actually share."""
    from posetpu.data.synthetic import make_skeleton_poses

    img_w = img_h = 256
    rng = np.random.RandomState(seed)
    poses = np.asarray(make_skeleton_poses(n_mpii, seed=seed))  # [N, 16, 3] mm
    poses[..., 2] -= 1000.0  # stand on the ring's look-at point (cf. h36m fixture)
    colors = [(int(80 + 10 * (j + 1)), int(255 - 9 * (j + 1)),
               int(40 + 12 * (j + 1))) for j in range(16)]

    os.makedirs(os.path.join(root, "mpii", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "mpii", "annot"), exist_ok=True)
    annos = []
    for i in range(n_mpii):
        # random ring-like viewpoint (same look-at construction as
        # data/synthetic.make_camera_ring, wider pose coverage)
        ang = rng.uniform(0, 2 * np.pi)
        radius = rng.uniform(4000.0, 6500.0)
        height = rng.uniform(600.0, 2400.0)
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        z = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 0.0, 1.0])
        x_ax = np.cross(z, up)
        x_ax /= np.linalg.norm(x_ax)
        y_ax = np.cross(z, x_ax)
        R = np.stack([x_ax, y_ax, z], axis=0)
        # same focal scale family as the h36m fixture (f ~= 420 at 5 m)
        f = 1100.0 * (img_w / 1000.0) * 1.5 * (radius / 5000.0) \
            * rng.uniform(0.9, 1.1)
        xc = (poses[i] - pos) @ R.T
        pix = xc[:, :2] / xc[:, 2:3] * f + img_w / 2.0
        name = f"m{i:04d}.jpg"
        img = np.full((img_h, img_w, 3), 16, np.uint8)
        for j, (x, y) in enumerate(pix):
            cv2.circle(img, (int(round(x)), int(round(y))), 4, colors[j], -1)
        cv2.imwrite(os.path.join(root, "mpii", "images", name),
                    img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        # invert the loader's matlab fixups (data/mpii.py:_load_db) so the
        # effective crop covers the whole frame
        s0 = img_w / 200.0 / 1.25
        center = np.array([img_w / 2.0 + 1, img_h / 2.0 + 1 - 15 * s0])
        annos.append({
            "image": name,
            "center": center.tolist(),
            "scale": s0,
            "joints": (pix + 1).tolist(),
            "joints_vis": [1.0] * 16,
        })
    for subset in ("train", "valid"):
        with open(os.path.join(root, "mpii", "annot", f"{subset}.json"), "w") as f:
            json.dump(annos, f)


MIXED_CFG = CFG_YAML.replace(
    "  TRAIN_DATASET: multiview_h36m",
    "  TRAIN_DATASET: mixed\n  IF_SAMPLE: true\n"
    # aug measured a LOSS on this tiny fixture (it0 pseudo PCKh 0.335
    # plain vs 0.232 with the reference's aug recipe at 60 epochs --
    # 128 blob images can't absorb the harder task); keep it off here
    "  H36M_WEIGHT: 1\n  MPII_WEIGHT: 3"
).replace("BATCH_SIZE: 2\n  BEGIN_EPOCH", "BATCH_SIZE: 4\n  BEGIN_EPOCH")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/pipeline_drive")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    args0 = ap.parse_args()
    work = args0.workdir
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "data")
    if not os.path.exists(os.path.join(root, "h36m", "annot", "h36m_train.pkl")):
        print("building h36m fixture...", flush=True)
        build_fixture(root)
    # the fixture's cameras carry zero distortion (int8_accuracy.build_fixture
    # zeroes k/p), so the no-distortion annots are the same content under the
    # reference's regenerated-annot naming (undistort_image.py regime)
    import shutil

    for subset in ("train", "validation"):
        src = os.path.join(root, "h36m", "annot", f"h36m_{subset}.pkl")
        dst = os.path.join(root, "h36m", "annot",
                           f"h36m_{subset}_nodistortion.pkl")
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)
    if not os.path.exists(os.path.join(root, "mpii", "annot", "train.json")):
        print("building mpii fixture...", flush=True)
        build_mpii_fixture(root)

    cfg_path = os.path.join(work, "exp.yaml")
    with open(cfg_path, "w") as f:
        f.write(MIXED_CFG.format(root=root, epochs=args0.epochs))

    os.chdir(work)
    from posetpu.cli.common import load_cfg
    from posetpu.cli.pipeline import run_pipeline

    sys.argv = ["pipeline"]
    args = argparse.Namespace(
        cfg=cfg_path, modelDir="", logDir="", dataDir="",
        repeats=args0.repeats, ransac=True, inliers=3, reproj_thre=10.0,
        confidence_thre=0.7, use_reproj=True, fund=False, fresh=False,
        no_distortion=True, epochs=args0.epochs, adaptive_thre=True,
    )
    cfg = load_cfg(args)

    lines = []

    def log(*a):
        msg = " ".join(str(x) for x in a)
        lines.append(msg)
        print(msg, flush=True)

    final_pseudo = run_pipeline(cfg, args, log=log)
    progression = [ln for ln in lines if "PCKh" in ln or "pseudo" in ln]
    print("PIPELINE_DRIVE " + json.dumps(
        {"final_pseudo": final_pseudo, "progression": progression}
    ))


if __name__ == "__main__":
    main()
