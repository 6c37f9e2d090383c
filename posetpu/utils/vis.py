"""Debug visualisation dumps.

Equivalent of lib/utils/vis.py: grids of GT/pred joints over denormalised
input crops, heatmap mosaics, and qualitative prediction sheets — cv2/numpy,
host-side, written every PRINT_FREQ like the reference (function.py:521-526).
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def _denormalize(images, mean, std):
    """[N, H, W, 3] normalised floats -> uint8 BGR."""
    img = images * np.asarray(std) + np.asarray(mean)
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def save_batch_image_with_joints(images, joints, joints_vis, path,
                                 nrow: int = 8, padding: int = 2):
    """Grid of images with joint dots (vis.py:23-66 equivalent).

    images: [N, H, W, 3] uint8; joints: [N, J, 2] crop coords."""
    n, h, w = images.shape[:3]
    nrow = min(nrow, n)
    ncol = int(np.ceil(n / nrow))
    canvas = np.zeros(
        (ncol * (h + padding), nrow * (w + padding), 3), np.uint8
    )
    for i in range(n):
        r, c = divmod(i, nrow)
        y0, x0 = r * (h + padding), c * (w + padding)
        img = images[i].copy()
        for (x, y), v in zip(joints[i], joints_vis[i]):
            if v > 0:
                cv2.circle(img, (int(x), int(y)), 2, (0, 255, 0), 2)
        canvas[y0:y0 + h, x0:x0 + w] = img
    cv2.imwrite(path, canvas)


def save_batch_heatmaps(images, heatmaps, path):
    """Image + per-joint heatmap mosaic (vis.py:69-121 equivalent).

    images: [N, H, W, 3] uint8; heatmaps: [N, h, w, J]."""
    n, hh, hw, j = heatmaps.shape
    rows = []
    for i in range(n):
        img_small = cv2.resize(images[i], (hw, hh))
        cells = [img_small]
        for jj in range(j):
            hm = heatmaps[i, :, :, jj]
            hm = np.clip(hm * 255, 0, 255).astype(np.uint8)
            colored = cv2.applyColorMap(hm, cv2.COLORMAP_JET)
            cells.append((0.7 * colored + 0.3 * img_small).astype(np.uint8))
        rows.append(np.concatenate(cells, axis=1))
    cv2.imwrite(path, np.concatenate(rows, axis=0))


def save_debug_images(cfg, images_norm, joints_gt, joints_vis, joints_pred,
                      target, output, prefix: str):
    """The save_debug_images bundle (vis.py:124-150): GT joints, pred joints,
    GT heatmaps, pred heatmaps — gated by the DEBUG config flags."""
    if not cfg.DEBUG.DEBUG:
        return
    mean = np.asarray(cfg.DATASET.MEAN)
    std = np.asarray(cfg.DATASET.STD)
    images = _denormalize(np.asarray(images_norm), mean, std)
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    if cfg.DEBUG.SAVE_BATCH_IMAGES_GT:
        save_batch_image_with_joints(
            images, np.asarray(joints_gt), np.asarray(joints_vis), f"{prefix}_gt.jpg"
        )
    if cfg.DEBUG.SAVE_BATCH_IMAGES_PRED:
        save_batch_image_with_joints(
            images, np.asarray(joints_pred), np.ones(joints_pred.shape[:2]),
            f"{prefix}_pred.jpg",
        )
    if cfg.DEBUG.SAVE_HEATMAPS_GT:
        save_batch_heatmaps(images, np.asarray(target), f"{prefix}_hm_gt.jpg")
    if cfg.DEBUG.SAVE_HEATMAPS_PRED:
        save_batch_heatmaps(images, np.asarray(output), f"{prefix}_hm_pred.jpg")


def save_all_preds(gt, pred, detected, image_names, source, output_dir,
                   image_root: str = "", max_images: int = 200):
    """Qualitative per-sample prediction dumps (vis.py:253-296).

    Always writes a JSON-lines summary (machine-checkable), and — when
    ``image_root`` locates the source images — draws the reference's
    per-image overlay sheets into ``<output_dir>/debug``: GT joints as red
    circles, detected predictions as green crosses, misses as blue crosses
    (same colour semantics as the reference, capped at ``max_images``)."""
    import json

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"all_preds_{source}.jsonl")
    with open(path, "w") as f:
        for i, name in enumerate(image_names):
            f.write(
                json.dumps(
                    {
                        "image": str(name),
                        "gt": np.asarray(gt[i]).tolist(),
                        "pred": np.asarray(pred[i]).tolist(),
                        "detected": np.asarray(detected[i]).astype(int).tolist(),
                    }
                )
                + "\n"
            )

    if image_root:
        import cv2

        from posetpu.data import zipreader

        debug_dir = os.path.join(output_dir, "debug")
        os.makedirs(debug_dir, exist_ok=True)
        red, green, blue = (0, 0, 255), (0, 255, 0), (255, 0, 0)
        for i, name in enumerate(image_names[:max_images]):
            img = zipreader.imread(
                os.path.join(image_root, str(name)),
                cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION,
            )
            if img is None:
                continue
            for j in range(len(gt[i])):
                cv2.circle(
                    img, (int(gt[i][j][0]), int(gt[i][j][1])), 5, red, -1
                )
                cv2.drawMarker(
                    img, (int(pred[i][j][0]), int(pred[i][j][1])),
                    green if detected[i][j] else blue, cv2.MARKER_CROSS, 10,
                )
            cv2.imwrite(os.path.join(debug_dir, f"{i:05d}.jpg"), img)
    return path
