"""Measure Mosaic-level MXU int8 efficiency vs dot shape, and VPU requant
throughput — the two numbers that decide whether VMEM-fused multi-conv
kernels can beat XLA's per-conv HBM floor on the ResNet trunk.

Each probe is a single Pallas kernel over one VMEM-resident block with an
internal fori_loop carrying a data dependence. Two traps this version fixes
(the first draft fell into both):

- the chain epilogue must not be algebraically constant — ``(p & 1) | 1``
  folds to 1 and whole shapes compiled to nothing;
- tunnel-RTT jitter (±5 ms) swamps any single launch. Each probe runs at T
  and 2T iterations and reports the DIFFERENCE, which cancels launch + RTT.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_mxu_vpu.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 4000  # base iteration count; the probe also runs 2T and differences


def _time_once(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _time_diff(make, *args):
    """Per-iteration time via (time at 2T) - (time at T): launch overhead
    and tunnel RTT cancel exactly."""
    f1 = make(T)
    f2 = make(2 * T)
    return (_time_once(f2, *args) - _time_once(f1, *args)) / T


# ---------------------------------------------------------------- MXU probe
def _mxu_kernel(x_ref, w_ref, o_ref, *, steps, taps):
    def body(i, c):
        lhs = c if taps == 1 else jnp.concatenate([c] * taps, axis=1)
        acc = jax.lax.dot_general(
            lhs, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # NOT foldable: (p & 3) ^ 1 varies with p (|1 variants fold to 1)
        return ((acc & 3) ^ 1).astype(jnp.int8)

    c = jax.lax.fori_loop(0, steps, body, x_ref[:])
    o_ref[:] = c.astype(jnp.int32)


def mxu_probe(m, k, n, taps=1):
    x = jnp.ones((m, n), jnp.int8)
    w = jnp.ones((taps * k, n), jnp.int8)

    def make(steps):
        f = pl.pallas_call(
            partial(_mxu_kernel, steps=steps, taps=taps),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        )

        @jax.jit
        def run(x, w):
            return jnp.sum(f(x, w))

        return run

    return make, x, w


# ---------------------------------------------------------------- VPU probe
def _vpu_kernel(y_ref, o_ref, *, steps):
    def body(i, y):
        # requant-epilogue op mix; the +i*1e-8 keeps the fixpoint moving so
        # nothing is hoistable
        z = y * np.float32(1.0009) + (np.float32(0.1) + i.astype(jnp.float32)
                                      * np.float32(1e-8))
        z = jnp.maximum(z, 0.0)
        return jnp.clip(jnp.round(z), -127.0, 127.0)

    o_ref[:] = jax.lax.fori_loop(0, steps, body, y_ref[:])


def vpu_probe(rows, cols):
    y = jnp.ones((rows, cols), jnp.float32)

    def make(steps):
        f = pl.pallas_call(
            partial(_vpu_kernel, steps=steps),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        )

        @jax.jit
        def run(y):
            return jnp.sum(f(y))

        return run

    return make, y


# ------------------------------------------------------------- shift probe
def _shift_kernel(x_ref, o_ref, *, steps, w):
    hw, c = x_ref.shape
    row_j = jax.lax.broadcasted_iota(jnp.int32, (hw, c), 0) % w
    zero = jnp.zeros((hw, c), jnp.int8)

    def body(i, x):
        xi = pltpu.bitcast(x, jnp.int32)
        r = pltpu.bitcast(pltpu.roll(xi, hw - 1, 0), jnp.int8)
        return jnp.where(row_j != w - 1, r, zero) ^ jnp.int8(1)

    o_ref[:] = jax.lax.fori_loop(0, steps, body, x_ref[:])


def shift_probe(hw, c, w):
    x = jnp.ones((hw, c), jnp.int8)

    def make(steps):
        f = pl.pallas_call(
            partial(_shift_kernel, steps=steps, w=w),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hw, c), jnp.int8),
        )

        @jax.jit
        def run(x):
            return jnp.sum(f(x).astype(jnp.int32))

        return run

    return make, x


def main():
    print("--- MXU int8 dependent-dot chain (M=4096), 2T-T differential:")
    for k, n, taps in ((64, 64, 1), (128, 128, 1), (256, 256, 1),
                       (512, 512, 1), (64, 64, 9)):
        make, x, w = mxu_probe(4096, k, n, taps)
        t = _time_diff(make, x, w)
        macs = 4096 * k * taps * n
        label = f"K={k*taps}{'(im2col x9)' if taps > 1 else ''} N={n}"
        print(f"  {label:24s} {macs / t / 1e12:7.1f} GMAC/ms "
              f"({2 * macs / t / 1e12:6.1f} TOP/s)  {t*1e6:7.2f} us/dot",
              flush=True)

    print("--- VPU f32 requant-chain (~6 ops/el):")
    for rows, cols in ((2048, 256), (2048, 128), (4096, 64)):
        make, y = vpu_probe(rows, cols)
        t = _time_diff(make, y)
        els = rows * cols
        print(f"  [{rows},{cols}]  {els / t / 1e9:7.2f} G els/s "
              f"({els * 6 / t / 1e12:6.2f} T ops/s)  {t*1e6:7.2f} us/pass",
              flush=True)

    print("--- masked int8 sublane rotate (tap-shift pattern):")
    for hw, c in ((4096, 64), (4096, 256), (16384, 64)):
        make, x = shift_probe(hw, c, 64)
        t = _time_diff(make, x)
        els = hw * c
        print(f"  [{hw},{c}]  {els / t / 1e9:7.2f} G els/s  "
              f"{t*1e6:7.2f} us/shift", flush=True)


if __name__ == "__main__":
    main()
