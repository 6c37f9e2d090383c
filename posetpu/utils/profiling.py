"""Tracing and step timing.

The reference's observability is wall-clock AverageMeters + GPU memory in the
log line (lib/core/function.py:93-96, 471-487). The TPU-native equivalents:

* :func:`trace` — a ``jax.profiler`` trace context writing a TensorBoard-
  compatible profile (op-level device timeline) for a chosen span;
* :class:`StepTimer` — per-step wall timing with the host-fetch
  synchronisation this environment requires (``block_until_ready`` is a
  no-op through the remote tunnel — see PERF.md), plus device memory stats
  where the backend exposes them.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a span: ``with trace('/tmp/prof'): run_steps()`` then inspect
    with TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Best-effort device memory stats (the torch.cuda.memory_allocated
    analogue)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": int(stats.get("bytes_in_use", -1)),
            "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", -1)),
        }
    except Exception:
        return {}


def sync(value) -> float:
    """Synchronise with the device by fetching a scalar; returns it. The only
    reliable sync on tunneled backends."""
    return float(jnp.asarray(value).sum())


class StepTimer:
    """Rolling step/data-time tracker for the train loop (the batch_time /
    data_time AverageMeters of the reference)."""

    def __init__(self):
        self.step_times: list[float] = []
        self.data_times: list[float] = []
        self._t = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_times.append(now - self._t)
        self._t = now

    def step_done(self, sync_value=None):
        if sync_value is not None:
            sync(sync_value)
        now = time.perf_counter()
        self.step_times.append(now - self._t)
        self._t = now

    def summary(self, samples_per_step: int = 0) -> dict:
        import numpy as np

        out = {}
        if self.step_times:
            st = float(np.mean(self.step_times[-50:]))
            out["step_ms"] = st * 1e3
            if samples_per_step:
                out["samples_per_s"] = samples_per_step / st
        if self.data_times:
            out["data_ms"] = float(np.mean(self.data_times[-50:])) * 1e3
        out.update(device_memory_stats())
        return out
