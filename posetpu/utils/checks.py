"""Runtime sanity guards — the sanitizer analogue.

The reference's closest equivalents are scattered shape asserts in the losses
(loss.py:108-114, 203-208) and the strict config-key validation. Here:
static shape checks for batch dicts plus an opt-in finite-values guard
(POSETPU_CHECK_FINITE=1) that fails fast on NaN/Inf in metrics — cheap
insurance for long unattended runs.
"""

from __future__ import annotations

import os

import numpy as np


def assert_batch_shapes(batch: dict, nviews: int = 4, num_joints: int = 16) -> None:
    """Validate the canonical [N, V, ...] training batch layout."""
    n = batch["images"].shape[0]
    expect = {
        "images": (n, nviews, None, None, 3),
        "target": (n, nviews, None, None, num_joints),
        "weight": (n, nviews, num_joints),
        "is_h36m": (n,),
        "center": (n, nviews, 2),
        "scale": (n, nviews, 2),
    }
    for key, shape in expect.items():
        if key not in batch:
            raise ValueError(f"batch missing '{key}'")
        got = batch[key].shape
        if len(got) != len(shape) or any(
            e is not None and g != e for g, e in zip(got, shape)
        ):
            raise ValueError(f"batch['{key}'] shape {got}, expected {shape}")


def finite_guard_enabled() -> bool:
    return os.environ.get("POSETPU_CHECK_FINITE", "0") == "1"


def check_finite_metrics(metrics: dict, step: int = -1) -> None:
    """Host-side NaN/Inf guard over fetched scalars (no-op unless enabled)."""
    if not finite_guard_enabled():
        return
    for k, v in metrics.items():
        val = np.asarray(v)
        if val.size == 1 and not np.isfinite(float(val)):
            raise FloatingPointError(f"non-finite metric '{k}' at step {step}: {val}")
