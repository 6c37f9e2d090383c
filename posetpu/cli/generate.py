"""Offline artifact generators — run/test's generate_* scripts.

Subcommands:
    fundamental   per-(subject, view-pair) F matrices
                  (generate_fundamental_matirx.py:33-103): from GT joints via
                  the normalised 8-point estimator, or exactly from
                  calibration with --from-calibration; self-checks residuals
                  on held-out frames like the reference
    pairwise      limb lengths + first-iteration 16^3 pairwise constraint
                  tables (generate_pairwise_constraints.py:31-111)
    pseudo-cfg    machine-written experiment YAMLs from a select.txt
                  (generate_pseudo_cfg.py:43-101)

    python -m posetpu.cli.generate <subcommand> --cfg <yaml> ...
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def generate_fundamental(cfg, out_path: str, from_calibration: bool = False,
                         holdout: int = 50, log=print):
    import jax.numpy as jnp

    from posetpu.core.losses import VIEW_PERMS
    from posetpu.data.base import sorted_union_indices
    from posetpu.data.registry import get_dataset
    from posetpu.geometry.cameras import CameraParams
    from posetpu.geometry.fundamental import (
        build_fundamental_bank,
        eight_point,
    )

    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(cfg, "train", True)
    u = sorted_union_indices(dataset.u2a_mapping)
    pts, _ = dataset.gt_joints_flat()
    pts = pts[:, u]
    g = pts.shape[0] // 4
    pts_g = pts.reshape(g, 4, -1, 2)
    subj_of_group = [dataset.db[items[0]]["subject"] for items in dataset.grouping]

    bank = {}
    if from_calibration:
        cams_by_subject = {}
        for items, subj in zip(dataset.grouping, subj_of_group):
            if subj not in cams_by_subject:
                cams_by_subject[subj] = CameraParams.stack(
                    [CameraParams.from_dict(dataset.db[i]["camera"]) for i in items]
                )
        bank = build_fundamental_bank(cams_by_subject)
    else:
        subjects = sorted(set(subj_of_group))
        groups_of = {
            s: [i for i, ss in enumerate(subj_of_group) if ss == s] for s in subjects
        }
        for s in subjects:
            fit = groups_of[s][:-holdout] or groups_of[s]
            for (a, b) in VIEW_PERMS:
                p1 = pts_g[fit, a].reshape(-1, 2)
                p2 = pts_g[fit, b].reshape(-1, 2)
                bank[(s, a, b)] = np.asarray(
                    eight_point(jnp.asarray(p1), jnp.asarray(p2)), np.float32
                )

    # self-check on held-out frames (generate_fundamental_matirx.py:50-63)
    res_all = []
    for gi in range(max(g - holdout, 0), g):
        s = subj_of_group[gi]
        for (a, b) in VIEW_PERMS:
            F = bank[(s, a, b)]
            h1 = np.concatenate([pts_g[gi, a], np.ones((pts_g.shape[2], 1))], 1)
            h2 = np.concatenate([pts_g[gi, b], np.ones((pts_g.shape[2], 1))], 1)
            res_all.append(np.abs(np.einsum("jk,kl,jl->j", h2, F, h1)))
    res_all = np.concatenate(res_all) if res_all else np.zeros(1)
    log(f"heldout residual: mean {res_all.mean():.4f} max {res_all.max():.4f}")

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(bank, f)
    log(f"=> {out_path} ({len(bank)} matrices)")
    return bank


def generate_pairwise(cfg, out_dir: str, log=print):
    import jax.numpy as jnp

    from posetpu.data.registry import get_dataset
    from posetpu.geometry.body import edges
    from posetpu.geometry.cameras import camera_to_world_frame
    from posetpu.geometry.pictorial import (
        compute_grid,
        limb_lengths_from_pose,
        pairwise_constraints,
    )

    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(cfg, "train", True)
    pairs = sorted((k, v) for k, v in dataset.u2a_mapping.items() if v != "*")
    a = np.array([v for _, v in pairs])

    poses = []
    for items in dataset.grouping[:500]:
        rec = dataset.db[items[-1]]
        cam = rec["camera"]
        world = np.asarray(
            camera_to_world_frame(
                jnp.asarray(np.asarray(rec["joints_3d"]), jnp.float32),
                jnp.asarray(np.asarray(cam["R"]), jnp.float32),
                jnp.asarray(np.asarray(cam["T"]).reshape(3), jnp.float32),
            )
        )
        poses.append(world[a])
    mean_pose = np.mean(poses, axis=0)
    limbs = np.asarray(limb_lengths_from_pose(jnp.asarray(mean_pose)))
    limb_dict = {e: float(l) for e, l in zip(edges(), limbs)}

    nbins = int(cfg.PICT_STRUCT.FIRST_NBINS)
    grid = compute_grid(
        float(cfg.PICT_STRUCT.GRID_SIZE), jnp.zeros(3), nbins
    )
    tol = float(cfg.PICT_STRUCT.LIMB_LENGTH_TOLERANCE)
    constraints = {
        e: np.asarray(pairwise_constraints(grid, grid, limb_dict[e], tol))
        for e in edges()
    }

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "limb_length.pkl"), "wb") as f:
        pickle.dump(limb_dict, f)
    with open(os.path.join(out_dir, f"pairwise_b{nbins}.pkl"), "wb") as f:
        pickle.dump(constraints, f)
    log(f"=> {out_dir}: limb_length.pkl, pairwise_b{nbins}.pkl")
    return limb_dict, constraints


def generate_undistorted(cfg, out_root: str, max_groups: int = 0, log=print):
    """Regenerate an undistortion-free H36M dataset — the equivalent of
    run/test/undistort_image.py + test_proj2d.py: every image is remapped so
    a pinhole camera reproduces it, annotations re-projected, camera
    distortion zeroed, and the new pickle written with the
    ``h36m_<subset>_nodistortion.pkl`` name the dataset loader expects.

    Image remap: dst(u) = src(distort(u)) — each undistorted pixel samples
    the original at its distorted location (batched on device via the warp
    op's bilinear sampler).
    """
    import copy

    import cv2
    import jax
    import jax.numpy as jnp

    from posetpu.data.registry import get_dataset
    from posetpu.data import zipreader
    from posetpu.geometry.cameras import CameraParams, distort_opencv
    from posetpu.ops.warp import bilinear_sample

    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, cfg.DATASET.TEST_SUBSET, False
    )
    os.makedirs(os.path.join(out_root, "h36m", "images"), exist_ok=True)
    new_db = []
    groups = dataset.grouping[:max_groups] if max_groups else dataset.grouping

    from functools import partial

    @partial(jax.jit, static_argnames=("h", "w"))
    def remap(img, f, c, k, p, h, w):
        uy = jnp.arange(h, dtype=jnp.float32)
        ux = jnp.arange(w, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(ux, uy)
        norm = jnp.stack([(gx - c[0]) / f[0], (gy - c[1]) / f[1]], -1)
        d = distort_opencv(norm.reshape(-1, 2), k, p)
        src = d * f + c
        return bilinear_sample(img, src[:, 0].reshape(h, w), src[:, 1].reshape(h, w))

    for items in groups:
        for idx in items:
            rec = copy.deepcopy(dataset.db[idx])
            cam = CameraParams.from_dict(rec["camera"])
            img = zipreader.imread(dataset._image_path(rec))
            h, w = img.shape[:2]
            und = np.asarray(
                remap(jnp.asarray(img, jnp.float32), cam.f, cam.c, cam.k, cam.p,
                      h, w)
            ).clip(0, 255).astype(np.uint8)
            out_img = os.path.join(out_root, "h36m", "images", rec["image"])
            os.makedirs(os.path.dirname(out_img), exist_ok=True)
            cv2.imwrite(out_img, und)

            # undistorted joints: pinhole projection of the camera-frame 3D,
            # stored in the ACTUAL (pre-mapping) annotation format the loader
            # expects — it applies the union remap itself on load
            xc = np.asarray(rec["joints_3d"], np.float64)
            f = np.asarray(cam.f)
            c = np.asarray(cam.c)
            pin = xc[:, :2] / xc[:, 2:3] * f + c
            rec["joints_2d"] = pin.astype(np.float64)
            rec["joints_vis"] = np.ones((len(pin), 3))
            rec["camera"] = dict(rec["camera"])
            rec["camera"]["k"] = np.zeros((3, 1))
            rec["camera"]["p"] = np.zeros((2, 1))
            new_db.append(rec)

    annot_dir = os.path.join(out_root, "h36m", "annot")
    os.makedirs(annot_dir, exist_ok=True)
    out_pkl = os.path.join(
        annot_dir, f"h36m_{cfg.DATASET.TEST_SUBSET}_nodistortion.pkl"
    )
    with open(out_pkl, "wb") as fh:
        pickle.dump(new_db, fh)
    log(f"=> {out_pkl} ({len(new_db)} records)")
    return out_pkl


def generate_pseudo_cfg(base_cfg_path: str, select_file: str, out_dir: str,
                        log=print):
    """Write one experiment YAML per selected pseudo-label file
    (generate_pseudo_cfg.py:43-101)."""
    import yaml

    with open(base_cfg_path) as f:
        base = yaml.safe_load(f) or {}
    with open(select_file) as f:
        selected = [line.strip() for line in f if line.strip()]

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for path in selected:
        tag = os.path.basename(path).replace("_pseudo_label.h5", "")
        # the sweep's {inliers}_{reproj} lives in the PARENT directory —
        # fold it into the name like the reference does
        # (generate_pseudo_cfg.py:70-72: prefix + dir_name + '_' + name),
        # or same-basename configs from different sweep dirs overwrite
        parent = os.path.basename(os.path.dirname(path))
        if parent and parent not in ("", "."):
            tag = f"{parent}_{tag}"
        cfg = dict(base)
        cfg.setdefault("DATASET", {})
        cfg["DATASET"] = dict(cfg["DATASET"])
        cfg["DATASET"]["PSEUDO_LABEL_PATH"] = path
        out = os.path.join(out_dir, f"pseudo_{tag}.yaml")
        with open(out, "w") as f:
            yaml.dump(cfg, f, default_flow_style=False)
        written.append(out)
        log(f"=> {out}")
    return written


def main():
    import argparse

    from posetpu.cli.common import load_cfg

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("command",
                   choices=["fundamental", "pairwise", "pseudo-cfg", "undistort"])
    p.add_argument("--cfg", required=True)
    p.add_argument("--out", default="")
    p.add_argument("--from-calibration", action="store_true")
    p.add_argument("--select-file", default="")
    p.add_argument("--modelDir", default="")
    p.add_argument("--logDir", default="")
    p.add_argument("--dataDir", default="")
    args = p.parse_args()
    cfg = load_cfg(args)
    if args.command == "fundamental":
        out = args.out or os.path.join(cfg.DATASET.ROOT, "testdata", "fundamental_matrix.pkl")
        return generate_fundamental(cfg, out, args.from_calibration)
    if args.command == "pairwise":
        out = args.out or os.path.join(cfg.DATASET.ROOT, "testdata")
        return generate_pairwise(cfg, out)
    if args.command == "undistort":
        return generate_undistorted(cfg, args.out or cfg.DATASET.ROOT)
    return generate_pseudo_cfg(args.cfg, args.select_file, args.out or "experiments/pseudo")


if __name__ == "__main__":
    main()
