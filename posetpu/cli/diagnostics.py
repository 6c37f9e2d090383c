"""Diagnostic harnesses — equivalents of run/test's analysis scripts.

Subcommands:
    ransac-report   error-CDF table of RANSAC-filtered triangulation
                    (test_ransac.py:60-121)
    fund-residual   epipolar residuals of predictions vs the F bank
                    (test_fund_mtx.py:58-71)
    integral-check  integral (soft-argmax) vs argmax decode through the same
                    evaluator (test_integral.py:63-99)

    python -m posetpu.cli.diagnostics <subcommand> --cfg <yaml> [--heatmap h5]
"""

from __future__ import annotations

import numpy as np


def ransac_report(cfg, heatmap: str, log=print):
    import jax.numpy as jnp

    from posetpu.data.base import sorted_union_indices
    from posetpu.data.h5io import load_heatmaps
    from posetpu.data.registry import get_dataset
    from posetpu.geometry.cameras import CameraParams, camera_to_world_frame
    from posetpu.geometry.triangulate import ransac_filter, triangulate_points

    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, cfg.DATASET.TEST_SUBSET, False
    )
    _, locations, _ = load_heatmaps(heatmap)
    pred2d = locations[:, :, :2]
    conf = locations[:, :, 2]
    n, j, _ = pred2d.shape
    g = n // 4
    cams = dataset.cameras_flat()
    cams_g = CameraParams(*[np.asarray(x).reshape((g, 4) + x.shape[1:]) for x in cams])

    vis = (conf > cfg.PSEUDO_LABEL.CONFIDENCE_THRE).astype(np.float32)
    res_vis = np.asarray(
        ransac_filter(
            jnp.asarray(pred2d.reshape(g, 4, j, 2)), cams_g,
            jnp.asarray(vis.reshape(g, 4, j)),
            float(cfg.PSEUDO_LABEL.REPROJ_THRE),
            int(cfg.PSEUDO_LABEL.NUM_INLIERS),
            bool(cfg.DATASET.NO_DISTORTION),
        )
    )
    pred3d = np.asarray(
        triangulate_points(
            jnp.asarray(pred2d.reshape(g, 4, j, 2)), cams_g,
            jnp.asarray(res_vis), bool(cfg.DATASET.NO_DISTORTION),
        )
    )

    gt3d = []
    for items in dataset.grouping:
        rec = dataset.db[items[-1]]
        cam = rec["camera"]
        gt3d.append(
            np.asarray(
                camera_to_world_frame(
                    jnp.asarray(np.asarray(rec["joints_3d"]), jnp.float32),
                    jnp.asarray(np.asarray(cam["R"]), jnp.float32),
                    jnp.asarray(np.asarray(cam["T"]).reshape(3), jnp.float32),
                )
            )
        )
    pairs = sorted((k, v) for k, v in dataset.u2a_mapping.items() if v != "*")
    a = np.array([v for _, v in pairs])
    gt3d = np.array(gt3d)[:, a]

    valid = res_vis.sum(axis=1) >= 2  # [G, J]
    err = np.linalg.norm(pred3d - gt3d, axis=-1)
    err_valid = err[valid]
    table = {}
    for thr in (10, 20, 30, 50, 100, 150):
        table[f"<={thr}mm"] = float((err_valid <= thr).mean()) if err_valid.size else 0.0
    table["mean_mm"] = float(err_valid.mean()) if err_valid.size else -1.0
    table["kept_frac"] = float(valid.mean())
    log(" | ".join(f"{k}: {v:.3f}" for k, v in table.items()))
    return table


def fund_residual(cfg, heatmap: str, log=print):
    import jax.numpy as jnp

    from posetpu.core.losses import VIEW_PERMS
    from posetpu.data.h5io import load_heatmaps
    from posetpu.data.registry import get_dataset
    from posetpu.geometry.cameras import CameraParams
    from posetpu.geometry.fundamental import build_fundamental_bank

    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, cfg.DATASET.TEST_SUBSET, False
    )
    if heatmap:
        _, locations, _ = load_heatmaps(heatmap)
        pts = locations[:, :, :2]
    else:
        pts, _ = dataset.gt_joints_flat()
        from posetpu.data.base import sorted_union_indices

        pts = pts[:, sorted_union_indices(dataset.u2a_mapping)]
    n, j, _ = pts.shape
    g = n // 4
    pts_g = pts.reshape(g, 4, j, 2)

    cams_by_subject = {}
    subj_of_group = []
    for items in dataset.grouping:
        rec = dataset.db[items[0]]
        subj = rec["subject"]
        subj_of_group.append(subj)
        if subj not in cams_by_subject:
            cams_by_subject[subj] = CameraParams.stack(
                [CameraParams.from_dict(dataset.db[i]["camera"]) for i in items]
            )
    bank = build_fundamental_bank(cams_by_subject)

    homo = np.concatenate([pts_g, np.ones((g, 4, j, 1))], axis=-1)
    res = []
    for gi in range(g):
        for (va, vb) in VIEW_PERMS:
            F = bank[(subj_of_group[gi], va, vb)]
            r = np.abs(np.einsum("jk,kl,jl->j", homo[gi, vb], F, homo[gi, va]))
            res.append(r)
    res = np.concatenate(res)
    stats = {"mean": float(res.mean()), "max": float(res.max())}
    log(f"epipolar residual: mean {stats['mean']:.4f} max {stats['max']:.4f}")
    return stats


def integral_check(cfg, heatmap: str, log=print):
    import jax.numpy as jnp

    from posetpu.data.base import sorted_union_indices
    from posetpu.data.h5io import load_heatmaps
    from posetpu.data.registry import get_dataset
    from posetpu.ops.affine import transform_preds
    from posetpu.ops.heatmap import decode_heatmaps, soft_argmax_2d

    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, cfg.DATASET.TEST_SUBSET, False
    )
    heatmaps, _, _ = load_heatmaps(heatmap)
    hm = jnp.asarray(heatmaps)
    flat = [i for items in dataset.grouping for i in items]
    centers = jnp.asarray(
        np.array([dataset.db[i]["center"] for i in flat], np.float32)
    )
    scales = jnp.asarray(
        np.array([dataset.db[i]["scale"] for i in flat], np.float32)
    )
    h, w = heatmaps.shape[2], heatmaps.shape[3]

    coords_arg, _ = decode_heatmaps(hm)
    coords_int = soft_argmax_2d(hm)
    preds_arg = np.asarray(transform_preds(coords_arg, centers, scales, (w, h)))
    preds_int = np.asarray(transform_preds(coords_int, centers, scales, (w, h)))

    results = {}
    for name, preds in (("argmax", preds_arg), ("integral", preds_int)):
        _, mean = dataset.evaluate(preds)
        results[name] = float(mean)
        log(f"{name}: PCKh {mean:.4f}")
    return results


def main():
    import argparse

    from posetpu.cli.common import load_cfg

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("command", choices=["ransac-report", "fund-residual", "integral-check"])
    p.add_argument("--cfg", required=True)
    p.add_argument("--heatmap", default="")
    p.add_argument("--modelDir", default="")
    p.add_argument("--logDir", default="")
    p.add_argument("--dataDir", default="")
    args = p.parse_args()
    cfg = load_cfg(args)
    fn = {
        "ransac-report": ransac_report,
        "fund-residual": fund_residual,
        "integral-check": integral_check,
    }[args.command]
    return fn(cfg, args.heatmap)


if __name__ == "__main__":
    main()
