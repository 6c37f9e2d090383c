"""Device-side batch preparation — the fused TPU input frontend.

Takes the host loader's uint8 crops + joint coords and produces the train/eval
batch entirely on device in one jit: float conversion + mean/std
normalisation (the torchvision ToTensor+Normalize of the reference's run
scripts) fused with batched Gaussian target rendering
(joints_dataset_compatible.py:207-253, which the reference does per-sample on
the host). Keeping the uint8 -> normalised conversion on device also cuts
host->device transfer bytes 4x.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from posetpu.ops.heatmap import render_gaussian_heatmaps


def make_prepare_fn(cfg):
    """Returns jit-compiled prepare(batch_host) -> batch_device."""
    mean = jnp.asarray(np.asarray(cfg.DATASET.MEAN, np.float32))
    std = jnp.asarray(np.asarray(cfg.DATASET.STD, np.float32))
    hm_size = (int(cfg.NETWORK.HEATMAP_SIZE[0]), int(cfg.NETWORK.HEATMAP_SIZE[1]))
    img_size = (int(cfg.NETWORK.IMAGE_SIZE[0]), int(cfg.NETWORK.IMAGE_SIZE[1]))
    sigma = int(cfg.NETWORK.SIGMA)

    @jax.jit
    def prepare(host_batch):
        images = host_batch["images"].astype(jnp.float32) / 255.0
        images = (images - mean) / std

        target, weight = render_gaussian_heatmaps(
            host_batch["joints_crop"],
            host_batch["joints_vis"],
            hm_size,
            img_size,
            sigma,
        )
        # h36m groups without pseudo labels get zero supervision weight
        # (joints_dataset_compatible.py:250-251)
        weight = weight * host_batch["supervise"][:, None, None]
        target = jnp.moveaxis(target, 2, -1)  # [N, V, h, w, J]

        out = {
            "images": images,
            "target": target,
            "weight": weight,
            "is_h36m": host_batch["is_h36m"],
            "center": host_batch["center"],
            "scale": host_batch["scale"],
            # crop-frame joints + visibility feed the MI pair samplers
            "joints_crop": host_batch["joints_crop"],
            "joints_vis": host_batch["joints_vis"],
        }
        return out

    return prepare
