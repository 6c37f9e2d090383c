"""Pseudo-label minting entry point — run/test/test_pseudo_label.py.

    python -m posetpu.cli.pseudo_labels --cfg <yaml> --heatmap <h5> \
        [--ransac --inliers 3 --reproj-thre 10 --use-reproj --loop \
         --confidence-thre 0.7 --no-distortion]
"""

from __future__ import annotations

import os

import numpy as np


def parse_args():
    from posetpu.cli.common import base_parser

    p = base_parser("Mint pseudo labels from a heatmap dump")
    p.add_argument("--heatmap", required=True, help="heatmaps_locations H5")
    p.add_argument("--confidence-thre", type=float, default=0.0)
    p.add_argument("--ransac", action="store_true")
    p.add_argument("--inliers", type=int, default=0)
    p.add_argument("--reproj-thre", type=float, default=0.0)
    p.add_argument("--use-reproj", action="store_true")
    p.add_argument("--loop", action="store_true")
    p.add_argument("--no-distortion", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    from posetpu.cli.common import load_cfg
    from posetpu.data.base import sorted_union_indices
    from posetpu.data.h5io import load_heatmaps
    from posetpu.data.registry import get_dataset
    from posetpu.pseudo import mint_pseudo_labels

    cfg = load_cfg(args)
    pl = cfg.PSEUDO_LABEL
    if args.confidence_thre:
        pl.CONFIDENCE_THRE = args.confidence_thre
    if args.ransac:
        pl.IF_RANSAC = True
    if args.inliers:
        pl.NUM_INLIERS = args.inliers
    if args.reproj_thre:
        pl.REPROJ_THRE = args.reproj_thre
    if args.use_reproj:
        pl.USE_REPROJ = True
    if args.loop:
        pl.IF_LOOP = True
    no_distortion = args.no_distortion or cfg.DATASET.NO_DISTORTION

    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, "train", True, no_distortion=no_distortion
    )
    _, locations, _ = load_heatmaps(args.heatmap)
    pred2d = locations[:, :, :2]
    confidence = locations[:, :, 2]
    assert len(pred2d) == len(dataset.grouping) * 4

    u = sorted_union_indices(dataset.u2a_mapping)
    gt2d_all, _ = dataset.gt_joints_flat()
    gt2d = gt2d_all[:, u]
    flat = [i for g in dataset.grouping for i in g]
    scales = np.array([dataset.db[i]["scale"] for i in flat])
    headsizes = np.amax(scales, axis=1, keepdims=True) * 200 / 10.0

    out_dir = os.path.join(
        cfg.OUTPUT_DIR, "test",
        os.path.splitext(os.path.basename(args.cfg))[0]
        + (f"_{cfg.POSE_RESNET.NUM_LAYERS}" if cfg.POSE_RESNET.NUM_LAYERS != 50 else ""),
        f"{pl.NUM_INLIERS}_{pl.REPROJ_THRE}",
    )
    summary = mint_pseudo_labels(
        pred2d,
        confidence,
        dataset.cameras_flat(),
        out_dir,
        gt2d=gt2d,
        headsizes=headsizes,
        if_ransac=bool(pl.IF_RANSAC),
        num_inliers=int(pl.NUM_INLIERS),
        reproj_thre=float(pl.REPROJ_THRE),
        use_reproj=bool(pl.USE_REPROJ),
        no_distortion=no_distortion,
        loop=bool(pl.IF_LOOP),
        confidence_thre=float(pl.CONFIDENCE_THRE),
    )
    return summary


if __name__ == "__main__":
    main()
