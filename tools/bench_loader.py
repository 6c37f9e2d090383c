"""Host input-pipeline throughput: native C++ batch loader vs Python path.

Builds an on-disk MPII-style fixture with realistic frame sizes (1000x1000
JPEG like H36M), then measures GroupLoader samples/s in three modes:
python (cv2/zipfile), native per-record, native batched (pthreads via
ptpu_load_warp_batch_geom). Run: python tools/bench_loader.py [n_images]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import cv2
import numpy as np


def build_fixture(root: str, n: int, size: int = 1000) -> None:
    os.makedirs(os.path.join(root, "mpii", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "mpii", "annot"), exist_ok=True)
    annot = []
    rs = np.random.RandomState(0)
    for i in range(n):
        name = f"im{i:04d}.jpg"
        # smooth photo-like statistics — random noise JPEGs are ~20x larger
        # and decode pathologically slowly, which would skew the numbers
        img = cv2.GaussianBlur(
            rs.randint(0, 255, (size, size, 3), np.uint8), (31, 31), 10
        )
        cv2.imwrite(
            os.path.join(root, "mpii", "images", name),
            img, [cv2.IMWRITE_JPEG_QUALITY, 90],
        )
        annot.append({
            "image": name,
            "center": [size / 2, size / 2],
            "scale": 4.0,  # 800px person box -> 256px crop (H36M-like ratio)
            "joints": rs.uniform(100, size - 100, (16, 2)).tolist(),
            "joints_vis": [1] * 16,
        })
    with open(os.path.join(root, "mpii", "annot", "train.json"), "w") as f:
        json.dump(annot, f)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from posetpu.config import default_config
    from posetpu.data.loader import GroupLoader
    from posetpu.data.mpii import MPIIDataset

    with tempfile.TemporaryDirectory() as root:
        build_fixture(root, n)
        cfg = default_config()
        cfg.DATASET.ROOT = root
        cfg.DATASET.DATA_FORMAT = "jpg"
        cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
        cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
        cfg.DATASET.MPII_SCALE_FACTOR = 0.25
        cfg.DATASET.MPII_ROT_FACTOR = 30
        cfg.DATASET.MPII_FLIP = True

        results = {}
        for mode, env in (("python", "0"), ("native-batch", "1")):
            os.environ["POSETPU_NATIVE_LOADER"] = env
            ds = MPIIDataset(cfg, "train", is_train=True)
            loader = GroupLoader(
                ds, batch_size=4, shuffle=False, prefetch=0, num_threads=8
            )
            # warm one batch (zip dir cache, libjpeg init)
            next(iter(loader))
            t0 = time.perf_counter()
            count = 0
            for batch in loader:
                count += batch["images"].shape[0] * batch["images"].shape[1]
            dt = time.perf_counter() - t0
            results[mode] = count / dt
            print(f"{mode:13s} {count/dt:8.1f} samples/s "
                  f"({count} samples in {dt:.2f}s)", flush=True)
        print(json.dumps({
            "metric": "host loader samples/s (1000px JPEG -> 256px crop)",
            "python": round(results["python"], 1),
            "native_batch": round(results["native-batch"], 1),
            "speedup": round(results["native-batch"] / results["python"], 2),
        }))


if __name__ == "__main__":
    main()
