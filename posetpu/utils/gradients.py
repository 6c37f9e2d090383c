"""Per-loss gradient-norm probe.

Equivalent of lib/utils/gradients.py:16-40: for each loss term, the gradient
w.r.t. the raw heatmap outputs, reduced to a mean row norm over nonzero rows.
In JAX this is a ``jax.grad`` of the loss as a function of the heatmaps —
usable inside a jitted diagnostics step when LOSS.WATCH_GRAD_NORM is on.
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax
import jax.numpy as jnp


def grad_norms_wrt_heatmaps(loss_fns: Mapping[str, Callable], heatmaps) -> dict:
    """loss_fns: {name: fn(heatmaps) -> scalar}; heatmaps: [N, ...] raw model
    outputs. Returns {name: mean per-sample grad norm over nonzero rows}."""
    out = {}
    for name, fn in loss_fns.items():
        g = jax.grad(fn)(heatmaps)
        rows = g.reshape(g.shape[0], -1)
        norms = jnp.linalg.norm(rows, axis=1)
        nonzero = (norms > 0).astype(jnp.float32)
        out[name] = jnp.sum(norms) / jnp.maximum(jnp.sum(nonzero), 1.0)
    return out
