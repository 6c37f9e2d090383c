"""RPSM 3D evaluation — run/test/test_rpsm.py equivalent.

    python -m posetpu.cli.rpsm --cfg <yaml> --heatmap <h5> [--limb-source gt]

Consumes the heatmap H5 dump, runs batched RPSM per 4-view group, reports
MPJPE vs world-frame GT. Limb lengths come from the dataset's GT 3D pose
(--limb-source gt, the in-framework analogue of the reference's
pairwise/limb pickles) or a reference pickle.
"""

from __future__ import annotations

import numpy as np


def parse_args():
    from posetpu.cli.common import base_parser

    p = base_parser("RPSM 3D refinement benchmark")
    p.add_argument("--heatmap", required=True)
    p.add_argument("--limb-file", default="", help="reference limb-length pickle")
    p.add_argument("--max-groups", type=int, default=0)
    return p.parse_args()


def run(cfg, heatmap: str, limb_file: str = "", max_groups: int = 0, log=print):
    import jax
    import jax.numpy as jnp

    from posetpu.data.h5io import load_heatmaps
    from posetpu.data.registry import get_dataset
    from posetpu.geometry.body import ROOT_IDX, edges
    from posetpu.geometry.cameras import CameraParams, camera_to_world_frame
    from posetpu.geometry.pictorial import limb_lengths_from_pose, rpsm

    dataset = get_dataset(cfg.DATASET.TEST_DATASET)(
        cfg, cfg.DATASET.TEST_SUBSET, False
    )
    heatmaps, _, u = load_heatmaps(heatmap)
    n, j, hh, hw = heatmaps.shape
    g = n // 4
    if max_groups:
        g = min(g, max_groups)

    # world-frame GT (union joint order via u2a)
    pairs = sorted((k, v) for k, v in dataset.u2a_mapping.items() if v != "*")
    a = np.array([v for _, v in pairs])
    gt3d, centers, scales, cam_list = [], [], [], []
    for items in dataset.grouping[:g]:
        rec = dataset.db[items[-1]]
        cam = rec["camera"]
        world = np.asarray(
            camera_to_world_frame(
                jnp.asarray(np.asarray(rec["joints_3d"], np.float64), jnp.float32),
                jnp.asarray(np.asarray(cam["R"], np.float64), jnp.float32),
                jnp.asarray(np.asarray(cam["T"], np.float64).reshape(3), jnp.float32),
            )
        )
        gt3d.append(world[a])
        centers.append([dataset.db[i]["center"] for i in items])
        scales.append([dataset.db[i]["scale"] for i in items])
        cam_list.append(
            [CameraParams.from_dict(dataset.db[i]["camera"]) for i in items]
        )
    gt3d = np.array(gt3d, np.float32)  # [G, J, 3] union order

    cams = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[CameraParams.stack(c) for c in cam_list],
    )
    if limb_file:
        import pickle

        with open(limb_file, "rb") as f:
            limb_dict = pickle.load(f)
        limbs = jnp.asarray([float(limb_dict[e]) for e in edges()], jnp.float32)
    else:
        limbs = limb_lengths_from_pose(jnp.asarray(gt3d.mean(axis=0)))

    out = rpsm(
        jnp.asarray(heatmaps[: g * 4].reshape(g, 4, j, hh, hw)),
        cams,
        jnp.asarray(np.array(centers, np.float32)),
        jnp.asarray(np.array(scales, np.float32)),
        jnp.asarray(gt3d[:, ROOT_IDX]),
        limbs,
        cfg,
    )
    err = np.linalg.norm(np.asarray(out) - gt3d, axis=-1)
    stats = {"mpjpe_mm": float(err.mean()), "max_mm": float(err.max())}
    log(f"RPSM MPJPE: {stats['mpjpe_mm']:.2f} mm (max {stats['max_mm']:.1f})")
    return stats


def main():
    args = parse_args()
    from posetpu.cli.common import load_cfg

    cfg = load_cfg(args)
    return run(cfg, args.heatmap, args.limb_file, args.max_groups)


if __name__ == "__main__":
    main()
