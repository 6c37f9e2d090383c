"""Pseudo-label minting: confidence thresholding + RANSAC + reprojection +
Pareto selection.

Equivalent of run/test/test_pseudo_label.py:89-287, with the per-point pymvg
loops replaced by the batched geometry stack: the RANSAC filter and
reprojection run as single jitted programs over all groups at once
(posetpu.geometry.triangulate), so a full H36M training-set sweep is one
device call per threshold instead of ~2215 x 16 x 6 host SVDs.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from posetpu.data.h5io import save_pseudo_labels
from posetpu.geometry.cameras import CameraParams
from posetpu.geometry.triangulate import ransac_filter, reproject_poses


def pckh_weighted(pred2d, gt2d, joints_vis, headsizes, threshold: float = 0.5):
    """Visibility-weighted mean PCKh (my_eval, test_pseudo_label.py:89-105)."""
    pred2d = np.asarray(pred2d)
    gt2d = np.asarray(gt2d)
    joints_vis = np.asarray(joints_vis)
    dist = np.linalg.norm(gt2d - pred2d, axis=2)
    detected = (dist / np.asarray(headsizes)) <= threshold
    considered = detected * joints_vis
    denom = np.maximum(joints_vis.sum(0), 1e-12)
    rate = considered.sum(0) / denom
    ratio = joints_vis.sum(0) / max(joints_vis.sum(), 1e-12)
    return float(np.sum(ratio * rate))


def visibility_stats(joints_vis) -> dict:
    """Vis fraction + per-group joint-count histogram
    (test_pseudo_label.py:196-205)."""
    joints_vis = np.asarray(joints_vis)
    per_group = np.sum(joints_vis.reshape(-1, 4, joints_vis.shape[-1]), axis=1)
    stats = {"vis": float(joints_vis.sum() / joints_vis.size)}
    for k in range(5):
        stats[f"joints@{k}"] = float((per_group == k).sum() / per_group.size)
    return stats


def pareto_select(acc: Sequence[float], num: Sequence[float]) -> list[int]:
    """Pareto front over (accuracy, visible fraction), preserving the
    reference's rank-based dominance scan (test_pseudo_label.py:261-274)."""
    _, acc_order = np.unique(acc, return_inverse=True)
    _, num_order = np.unique(num, return_inverse=True)
    order = list(np.argsort(acc_order + num_order))
    selected: list[int] = []
    while order:
        ref = order.pop()
        selected.append(ref)
        order = [
            i for i in order
            if not (acc_order[i] <= acc_order[ref] and num_order[i] <= num_order[ref])
        ]
    return selected


def mint_pseudo_labels(
    pred2d: np.ndarray,
    confidence: np.ndarray,
    cams: CameraParams,
    out_dir: str,
    *,
    gt2d: np.ndarray | None = None,
    headsizes: np.ndarray | None = None,
    thresholds: Sequence[float] = (0.6, 0.7, 0.8, 0.9),
    if_ransac: bool = True,
    num_inliers: int = 4,
    reproj_thre: float = 10.0,
    use_reproj: bool = False,
    no_distortion: bool = False,
    loop: bool = False,
    confidence_thre: float = 0.6,
    log=print,
) -> dict:
    """The full sweep of test_pseudo_label.py:191-287.

    pred2d: [N, J, 2] decoded 2D (N = groups*4, grouping-flattened order);
    confidence: [N, J] heatmap maxima; cams: CameraParams with leading [N].
    Writes ``<thre>_0_pseudo_label.h5`` (confidence-only) and, with
    ``use_reproj``, ``<thre>_1_pseudo_label.h5`` (reprojected), then the
    Pareto ``select.txt``/``delete.txt``. Returns a summary dict.
    """
    os.makedirs(out_dir, exist_ok=True)
    n, j, _ = pred2d.shape
    g = n // 4
    pred_g = jnp.asarray(pred2d.reshape(g, 4, j, 2))
    cams_g = CameraParams(*[x.reshape((g, 4) + x.shape[1:]) for x in cams])

    names: list[str] = []
    acc: list[float] = []
    num: list[float] = []
    summary: dict = {"entries": []}
    thre_list = [confidence_thre] if loop else list(thresholds)

    def _report(tag, pred, vis):
        entry = {"tag": tag, **visibility_stats(vis)}
        if gt2d is not None and headsizes is not None:
            entry["pckh"] = pckh_weighted(pred, gt2d, vis, headsizes)
            log(f"{tag}: PCKh@0.5={entry['pckh']:.3f} vis={entry['vis']:.2f}")
        else:
            log(f"{tag}: vis={entry['vis']:.2f}")
        summary["entries"].append(entry)
        return entry

    for conf_thre in thre_list:
        joints_vis = (confidence > conf_thre).astype(np.float32)
        entry = _report(f"thre {conf_thre}", pred2d, joints_vis)
        entry["name"] = f"{conf_thre}_0"
        acc.append(entry.get("pckh", 0.0))
        num.append(entry["vis"])
        name = f"{conf_thre}_0"
        names.append(name)
        if not (loop and if_ransac):
            path = os.path.join(out_dir, f"{name}_pseudo_label.h5")
            save_pseudo_labels(path, pred2d, joints_vis)
            log(f"=> saved {path}")

        if if_ransac:
            vis_g = jnp.asarray(joints_vis.reshape(g, 4, j))
            joints_vis = np.asarray(
                ransac_filter(pred_g, cams_g, vis_g, reproj_thre, num_inliers,
                              no_distortion)
            ).reshape(n, j)
            _report("after RANSAC", pred2d, joints_vis)

        if use_reproj:
            vis_g = jnp.asarray(joints_vis.reshape(g, 4, j))
            proj_g, res_vis_g = reproject_poses(pred_g, cams_g, vis_g, no_distortion)
            proj2d = np.asarray(proj_g).reshape(n, j, 2)
            joints_vis = np.asarray(res_vis_g).reshape(n, j)
            entry = _report("after reprojection", proj2d, joints_vis)
            entry["name"] = f"{conf_thre}_1"
            acc.append(entry.get("pckh", 0.0))
            num.append(entry["vis"])
            name = f"{conf_thre}_1"
            names.append(name)
            path = os.path.join(out_dir, f"{name}_pseudo_label.h5")
            save_pseudo_labels(path, proj2d, joints_vis)
            log(f"=> saved {path}")

    def choose(min_vis: float = 0.10):
        """Automatic pick from the Pareto front: the reference publishes
        select.txt for a human to choose from (test_pseudo_label.py:261-286);
        the pipeline's --adaptive-thre mode maximises PCKh·vis — the
        expected fraction of joints that get a CORRECT label — over the
        selected entries clearing ``min_vis``, falling back to the
        most-visible entry.

        Why not max-PCKh: a later-iteration detector's confidence
        distribution shifts, and a high threshold can be left with
        near-perfect labels on almost nothing (measured on chip: iteration
        1's sweep had 1.000 PCKh @ 0.16 vis beside 0.985 @ 0.99; picking
        the former starved iteration 2 of supervision and regressed it,
        0.973 -> 0.940 val PCKh). The reference's own published pick is a
        coverage point (0.967 @ 0.90, README.md:220)."""
        sel = summary.get("selected") or names
        cand = [e for e in summary["entries"] if e.get("name") in sel]
        ok = [e for e in cand if e["vis"] >= min_vis]
        pool = ok or cand
        key = ((lambda e: e.get("pckh", 0.0) * e["vis"]) if ok
               else (lambda e: e["vis"]))
        return max(pool, key=key)["name"]

    summary["choose"] = choose

    if not loop:
        selected = pareto_select(acc, num)
        with open(os.path.join(out_dir, "select.txt"), "w") as f:
            for idx in selected:
                f.write(os.path.join(out_dir, f"{names[idx]}_pseudo_label.h5") + "\n")
        removed = [k for k in range(len(names)) if k not in selected]
        with open(os.path.join(out_dir, "delete.txt"), "w") as f:
            for idx in removed:
                f.write(os.path.join(out_dir, f"{names[idx]}_pseudo_label.h5") + "\n")
        summary["selected"] = [names[i] for i in selected]
    return summary
