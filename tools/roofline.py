"""Measure this chip's actual HBM bandwidth and MXU peaks.

The per-op rooflines in PERF.md assumed v5e paper specs (394 int8 TOPS,
819 GB/s). BUILDLOG's conv microbench hit ~990 TOP/s int8, i.e. this "v5
lite" device outruns the v5e spec 2.5x — so the bandwidth assumption needs
measuring too before calling any op "at its floor".

Timing uses the scalar-fetch protocol (block_until_ready is a no-op through
the tunnel): each jitted probe loops the op LOOP times via fori_loop with a
data dependence and returns a scalar.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/roofline.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

LOOP = 10


def _sample_nop(nop):
    t0 = time.perf_counter()
    float(nop(jnp.float32(2)))
    return time.perf_counter() - t0


def _time(fn, *args):
    float(fn(*args))
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    @jax.jit
    def nop(x):
        return x + 1.0

    float(nop(jnp.float32(0)))
    rtt = min(_sample_nop(nop) for _ in range(10))
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)

    # --- HBM read bandwidth: sum over a 512 MB int8 array, LOOP passes
    n = 512 * 1024 * 1024
    x8 = jnp.ones((n // 512, 512), jnp.int8)

    @jax.jit
    def bw_read(x):
        def body(i, acc):
            return acc + jnp.sum((x ^ acc.astype(jnp.int8)).astype(jnp.int32),
                                 dtype=jnp.int32)
        return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

    t = (_time(bw_read, x8) - rtt) / LOOP
    print(f"HBM read : {n / t / 1e9:8.0f} GB/s  ({t*1e3:.2f} ms / 512 MB)",
          flush=True)

    # --- HBM copy bandwidth (read+write): y = x ^ bit, materialized
    m = 256 * 1024 * 1024
    y8 = jnp.ones((m // 512, 512), jnp.int8)

    # fori carrying the full array: each iter reads 256 MB + writes 256 MB
    @jax.jit
    def bw_copy2(x):
        def body(i, y):
            return y ^ jnp.int8(1)
        out = jax.lax.fori_loop(0, LOOP, body, x)
        return jnp.sum(out[0, :8].astype(jnp.int32))

    t = (_time(bw_copy2, y8) - rtt) / LOOP
    print(f"HBM copy : {2 * m / t / 1e9:8.0f} GB/s  ({t*1e3:.2f} ms / 256+256 MB)",
          flush=True)

    # --- MXU peaks: a chain of DEPENDENT matmuls (c <- f(c @ b)), reduced
    # over the FULL matrix at the end. A scalar tap like p[0,0] is useless:
    # XLA slices it through the dot and the whole chain degenerates to
    # vector-matrix products (that's how the first version "measured"
    # 400k TFLOP/s). The final full-matrix sum cannot be sliced away, and
    # the carried dependence keeps every matmul live.
    MXU_LOOP = 100
    for dtype, name, unit in ((jnp.bfloat16, "bf16", "TFLOP"),
                              (jnp.int8, "int8", " TOP")):
        k = 4096
        a = jnp.ones((k, k), dtype)
        b = jnp.eye(k, dtype=dtype)

        if dtype == jnp.int8:
            @jax.jit
            def mm(c0, b):
                def body(i, c):
                    p = jax.lax.dot_general(
                        c, b, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    return (p & 1).astype(jnp.int8) | jnp.int8(1)
                c = jax.lax.fori_loop(0, MXU_LOOP, body, c0)
                return jnp.sum(c.astype(jnp.int32))
        else:
            @jax.jit
            def mm(c0, b):
                def body(i, c):
                    p = jax.lax.dot_general(
                        c, b, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return jnp.tanh(p).astype(jnp.bfloat16)
                c = jax.lax.fori_loop(0, MXU_LOOP, body, c0)
                return jnp.sum(c.astype(jnp.float32))

        t = (_time(mm, a, b) - rtt) / MXU_LOOP
        flops = 2 * k * k * k
        print(f"MXU {name}: {flops / t / 1e12:8.1f} {unit}/s"
              f"  ({t*1e3:.2f} ms / {k}^3 matmul + epilogue)", flush=True)


if __name__ == "__main__":
    main()
