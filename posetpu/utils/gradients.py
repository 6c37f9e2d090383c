"""Per-loss gradient-norm probe.

Equivalent of lib/utils/gradients.py:16-40: for each loss term, the gradient
w.r.t. the raw heatmap outputs, reduced per view to the mean row norm over
nonzero rows and summed over views (the reference's ``check_grad_norm`` with
its default ``norm=1``, called from lib/core/function.py:352-362). In JAX
this is a ``jax.grad`` of the loss as a function of the heatmaps — wired into
the jitted train steps when ``LOSS.WATCH_GRAD_NORM`` is on.
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax
import jax.numpy as jnp


def grad_norms_wrt_heatmaps(loss_fns: Mapping[str, Callable], heatmaps,
                            ord: int = 1) -> dict:
    """loss_fns: {name: fn(heatmaps) -> scalar}; heatmaps: ``[N, ...]`` or
    ``[N, V, ...]`` raw model outputs. Returns {name: scalar}: for each view
    the per-sample row norms averaged over nonzero rows, summed over views
    (matching the reference's per-view accumulation over its heatmap list)."""
    out = {}
    for name, fn in loss_fns.items():
        g = jax.grad(fn)(heatmaps)
        if g.ndim > 2:
            n, v = g.shape[0], g.shape[1]
            rows = g.reshape(n, v, -1)
        else:
            rows = g.reshape(g.shape[0], 1, -1)
        norms = jnp.linalg.norm(rows, ord=ord, axis=-1)  # [N, V]
        nonzero = (norms > 0).astype(jnp.float32)
        per_view = jnp.sum(norms, axis=0) / jnp.maximum(jnp.sum(nonzero, axis=0), 1.0)
        out[name] = jnp.sum(per_view)
    return out
