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


def build_mpii_fixture(root: str, seed: int = 11, n_mpii: int = N_MPII,
                       uniform_color: bool = False,
                       az_range: tuple | None = None) -> None:
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
    colors = [((120, 220, 120) if uniform_color else
               (int(80 + 10 * (j + 1)), int(255 - 9 * (j + 1)),
                int(40 + 12 * (j + 1)))) for j in range(16)]

    os.makedirs(os.path.join(root, "mpii", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "mpii", "annot"), exist_ok=True)
    annos = []
    for i in range(n_mpii):
        # random ring-like viewpoint (same look-at construction as
        # data/synthetic.make_camera_ring, wider pose coverage)
        ang = (rng.uniform(0, 2 * np.pi) if az_range is None
               else rng.uniform(*az_range))
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
).replace("BATCH_SIZE: 2\n  BEGIN_EPOCH", "BATCH_SIZE: 4\n  BEGIN_EPOCH"
).replace("LR: 0.001", "LR: 0.0003")
# LR note: the reference's pseudo recipe runs Adam 1e-3 at batch 8 x 4
# GPUs (32 groups); this drive runs batch 4. At 1e-3 the warm-started
# iteration-1 retrain EXPLODES on the first epoch's noisy small-batch
# steps (measured: step-0 acc 1.0 / mse 0.023 -> epoch-1 mse 0.99, model
# destroyed) -- fresh Adam second moments + converged weights + 8x the
# reference's gradient noise. 3e-4 is the batch-scaled equivalent.


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/pipeline_drive")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--fresh", action="store_true",
                    help="restart from iteration 0 (clears pipeline state)")
    ap.add_argument("--uniform-color", action="store_true",
                    help="all blobs one color: joint identity must come "
                         "from configuration (imperfect-transfer regime)")
    ap.add_argument("--az-range", type=float, nargs=2, default=None,
                    help="restrict MPII fixture viewpoints to this azimuth "
                         "range (rad) — makes part of the h36m ring OOD")
    ap.add_argument("--fund", action="store_true",
                    help="enable the epipolar/fundamental loss from "
                         "iteration 1 on (the reference's -f flag / fund5 "
                         "rows, README.md:228-230) — the round-4 A/B "
                         "against the fund-off baseline")
    ap.add_argument("--fund-weight", type=float, default=5.0,
                    help="LOSS.FUNDAMENTAL_LOSS_WEIGHT (reference fund5)")
    ap.add_argument("--home-regime", action="store_true",
                    help="approximate the reference's fund5 home regime "
                         "(round-4 VERDICT #5): batch 16 (vs the drive's "
                         "4), MSE:fund = 10:5 (its presets run "
                         "MSE_LOSS_WEIGHT 10 / FUNDAMENTAL_LOSS_WEIGHT 5), "
                         "LR 5e-4 (batch-scaled from its 1e-3 @ 32), and "
                         "TRAIN.WARMUP_EPOCHS 3 to kill the fresh-Adam "
                         "transient the round-4 mechanism notes blame "
                         "(PIPELINE_r04.json mechanism[1])")
    args0 = ap.parse_args()
    work = args0.workdir
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "data")
    if not os.path.exists(os.path.join(root, "h36m", "annot", "h36m_train.pkl")):
        print("building h36m fixture...", flush=True)
        build_fixture(root, uniform_color=args0.uniform_color)
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
        build_mpii_fixture(root, uniform_color=args0.uniform_color,
                           az_range=tuple(args0.az_range)
                           if args0.az_range else None)

    cfg_path = os.path.join(work, "exp.yaml")
    cfg_text = MIXED_CFG.format(root=root, epochs=args0.epochs)
    if args0.home_regime:
        cfg_text = cfg_text.replace("BATCH_SIZE: 4\n", "BATCH_SIZE: 16\n")
        cfg_text = cfg_text.replace("LR: 0.0003", "LR: 0.0005")
        cfg_text = cfg_text.replace(
            "TRAIN:\n", "TRAIN:\n  WARMUP_EPOCHS: 3\n", 1)
        cfg_text = cfg_text.replace(
            "LOSS:\n", "LOSS:\n  MSE_LOSS_WEIGHT: 10\n", 1)
    if args0.fund:
        # the loss weight rides in the written cfg (inside the existing
        # LOSS section — a duplicate yaml key would drop it); the ENABLE
        # flips per iteration inside cli/pipeline.py (fund joins at
        # iteration 1, the reference's -f semantics, train.sh:99-104)
        cfg_text = cfg_text.replace(
            "LOSS:\n",
            "LOSS:\n"
            f"  FUNDAMENTAL_LOSS_WEIGHT: {args0.fund_weight}\n"
            "  USE_TARGET_WEIGHT_FUND: true\n",
            1,
        )
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    os.chdir(work)
    from posetpu.cli.common import load_cfg
    from posetpu.cli.pipeline import default_stage_fns, run_pipeline

    sys.argv = ["pipeline"]
    args = argparse.Namespace(
        cfg=cfg_path, modelDir="", logDir="", dataDir="",
        repeats=args0.repeats, ransac=True, inliers=3, reproj_thre=10.0,
        confidence_thre=0.7, use_reproj=True, fund=args0.fund,
        fresh=args0.fresh, no_distortion=True, epochs=args0.epochs,
        adaptive_thre=True,
    )
    cfg = load_cfg(args)

    lines = []

    def log(*a):
        msg = " ".join(str(x) for x in a)
        lines.append(msg)
        print(msg, flush=True)

    # wrap the default stages: after each iteration's trainset inference,
    # also record (a) validation-set PCKh of the iteration's model and
    # (b) triangulation MPJPE of the minted heatmaps vs the fixture's GT 3D
    # — the per-iteration improvement evidence (reference pattern:
    # README.md:224-230, 109 -> 84 mm across iterations)
    train_fn, validate_fn, mint_fn = default_stage_fns(args, log=log)
    per_iter = []

    def validate_fn2(it_cfg, state_and_dir, it):
        h5 = validate_fn(it_cfg, state_and_dir, it)
        rec = {"iteration": it}
        try:
            rec["val_pckh"] = _eval_validation_pckh(
                it_cfg, state_and_dir[0], log)
            rec["tri_mm"] = _trainset_triangulation_mm(it_cfg, h5, log)
        except Exception as e:  # metrics must never kill the drive
            log(f"per-iter metrics failed: {e!r}")
        per_iter.append(rec)
        log(f"ITER_METRICS {json.dumps(rec)}")
        return h5

    final_pseudo = run_pipeline(cfg, args, train_fn=train_fn,
                                validate_fn=validate_fn2, mint_fn=mint_fn,
                                log=log)
    progression = [ln for ln in lines if "PCKh" in ln or "pseudo" in ln]
    print("PIPELINE_DRIVE " + json.dumps(
        {"final_pseudo": final_pseudo, "per_iteration": per_iter,
         "progression": progression,
         "fund": bool(args0.fund),
         "fund_weight": args0.fund_weight if args0.fund else 0.0}
    ))


def _eval_validation_pckh(cfg, state, log) -> float:
    """Validation-subset PCKh@0.5 of the iteration's trained model."""
    from posetpu.cli.common import build_model
    from posetpu.data.loader import GroupLoader
    from posetpu.data.registry import get_dataset
    from posetpu.train.loop import validate
    from posetpu.train.step import make_eval_step

    ds = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, "validation", False, no_distortion=True)
    loader = GroupLoader(ds, cfg.TEST.BATCH_SIZE, shuffle=False,
                         drop_last=False)
    model = build_model(cfg, bf16=False)
    eval_step = make_eval_step(model, cfg, flip_pairs=ds.flip_pairs)
    perf, _, _, _ = validate(cfg, loader, ds, eval_step, state.variables,
                             output_dir=None)
    log(f"validation PCKh@0.5 = {perf:.3f}")
    return float(perf)


def _trainset_triangulation_mm(cfg, heatmap_path, log) -> float:
    """Triangulation MPJPE (mm) of the trainset heatmap dump vs the
    fixture's GT 3D — cli.triangulate's math on the TRAIN grouping the
    dump rows follow."""
    import jax.numpy as jnp

    from posetpu.data.h5io import load_heatmaps
    from posetpu.data.registry import get_dataset
    from posetpu.geometry.cameras import camera_to_world_frame
    from posetpu.geometry.triangulate import triangulate_poses

    ds = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, "train", True, no_distortion=True)
    _, locations, _ = load_heatmaps(heatmap_path)
    pred2d = locations[:, :, :2]
    gt3d = []
    for items in ds.grouping:
        rec = ds.db[items[-1]]
        cam = rec["camera"]
        g = camera_to_world_frame(
            jnp.asarray(np.asarray(rec["joints_3d"], np.float64), jnp.float32),
            jnp.asarray(np.asarray(cam["R"], np.float64), jnp.float32),
            jnp.asarray(np.asarray(cam["T"], np.float64).reshape(3),
                        jnp.float32),
        )
        gt3d.append(np.asarray(g))
    gt3d = np.array(gt3d)
    pred3d = np.asarray(triangulate_poses(
        jnp.asarray(pred2d, jnp.float32), ds.cameras_flat(),
        no_distortion=True))
    pairs = sorted((k, v) for k, v in ds.u2a_mapping.items() if v != "*")
    a = np.array([v for _, v in pairs])
    err = float(np.linalg.norm(pred3d - gt3d[:, a], axis=2).mean())
    log(f"trainset triangulation MPJPE = {err:.1f} mm")
    return err


if __name__ == "__main__":
    main()
