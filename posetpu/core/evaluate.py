"""Train-time PCK accuracy from heatmaps, fully vectorised.

Equivalent of lib/core/evaluate.py:17-72 (which loops per sample/joint on
the host): decode predicted and GT heatmaps, normalise distances by
heatmap_size/10, count hits under 0.5.
"""

from __future__ import annotations

import jax.numpy as jnp

from posetpu.ops.heatmap import max_preds


def pck_accuracy(output, target, thr: float = 0.5):
    """PCK between decoded pred/GT heatmaps.

    output/target: [N, J, h, w] (view-flattened batches welcome).
    Returns (per_joint_acc [J] with -1 for joints with no valid GT,
    avg_acc, valid_joint_count, preds [N, J, 2]).

    Matches the reference exactly, including: a GT joint is valid only when
    both decoded GT coords are > 1, distances are normalised per-axis by
    (h/10, w/10), and the average runs over joints with any valid sample.
    """
    pred, _ = max_preds(output)
    gt, _ = max_preds(target)
    h, w = output.shape[-2:]
    norm = jnp.array([h / 10.0, w / 10.0], jnp.float32)

    valid = (gt[..., 0] > 1) & (gt[..., 1] > 1)  # [N, J]
    d = jnp.linalg.norm((pred - gt) / norm, axis=-1)  # [N, J]

    hits = (d < thr) & valid
    n_valid = jnp.sum(valid, axis=0)  # [J]
    per_joint = jnp.where(
        n_valid > 0, jnp.sum(hits, axis=0) / jnp.maximum(n_valid, 1), -1.0
    )
    usable = per_joint >= 0
    cnt = jnp.sum(usable)
    avg = jnp.sum(jnp.where(usable, per_joint, 0.0)) / jnp.maximum(cnt, 1)
    return per_joint, avg, cnt, pred
