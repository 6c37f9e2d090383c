"""3D triangulation benchmark — run/test/test_triangulate.py equivalent.

    python -m posetpu.cli.triangulate --cfg <yaml> [--heatmap <h5>] \
        [--no-distortion]

Without ``--heatmap`` it triangulates the GT 2D joints (the built-in oracle:
MPJPE should be ~0); with one it consumes the validate H5 dump and reports
H36M triangulation MPJPE.
"""

from __future__ import annotations

import numpy as np


def parse_args():
    from posetpu.cli.common import base_parser

    p = base_parser("DLT triangulation MPJPE benchmark")
    p.add_argument("--heatmap", default="", help="heatmaps_locations H5 (omit for GT)")
    p.add_argument("--no-distortion", action="store_true")
    return p.parse_args()


def run(cfg, heatmap: str = "", no_distortion: bool = False, log=print):
    import jax.numpy as jnp

    from posetpu.data.h5io import load_heatmaps
    from posetpu.data.registry import get_dataset
    from posetpu.geometry.cameras import camera_to_world_frame
    from posetpu.geometry.triangulate import triangulate_poses

    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, cfg.DATASET.TEST_SUBSET, False, no_distortion=no_distortion
    )
    cams = dataset.cameras_flat()

    if heatmap:
        _, locations, _ = load_heatmaps(heatmap)
        pred2d = locations[:, :, :2]
        test_gt = False
    else:
        pred2d, _ = dataset.gt_joints_flat()
        test_gt = True

    # world-frame GT 3D from the last view's camera-frame annotation
    # (test_triangulate.py:69-80)
    gt3d = []
    for items in dataset.grouping:
        rec = dataset.db[items[-1]]
        cam = rec["camera"]
        g = camera_to_world_frame(
            jnp.asarray(np.asarray(rec["joints_3d"], np.float64), jnp.float32),
            jnp.asarray(np.asarray(cam["R"], np.float64), jnp.float32),
            jnp.asarray(np.asarray(cam["T"], np.float64).reshape(3), jnp.float32),
        )
        gt3d.append(np.asarray(g))
    gt3d = np.array(gt3d)

    pred3d = np.asarray(
        triangulate_poses(jnp.asarray(pred2d, jnp.float32), cams,
                          no_distortion=no_distortion)
    )

    pairs = sorted((k, v) for k, v in dataset.u2a_mapping.items() if v != "*")
    u = np.array([k for k, _ in pairs])
    a = np.array([v for _, v in pairs])
    compatible_pred = pred3d[:, u] if test_gt else pred3d
    compatible_gt = gt3d[:, a]

    norm = np.linalg.norm(compatible_pred - compatible_gt, axis=2)
    stats = {
        "mean_mm": float(norm.mean()),
        "std_mm": float(norm.std()),
        "max_mm": float(norm.max()),
        "tail_frac": float((norm > norm.mean() + norm.std()).sum() / norm.size),
    }
    log(f"Mean Error: {stats['mean_mm']:.2f}")
    log(f"Std Error: {stats['std_mm']:.2f}")
    log(f"Max Error: {stats['max_mm']:.2f}")
    log(f"Larger than Mean+Std Error: {stats['tail_frac']:.1%}")
    return stats


def main():
    args = parse_args()
    from posetpu.cli.common import load_cfg

    cfg = load_cfg(args)
    return run(cfg, args.heatmap, args.no_distortion or cfg.DATASET.NO_DISTORTION)


if __name__ == "__main__":
    main()
