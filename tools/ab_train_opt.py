"""A/B the train step's optimizer-state traffic (round-4 VERDICT #6).

The train-step trace (TRACE_TABLE_train.json) shows the aggregation bank's
Adam update as the largest single op: f32 p/m/v on a [12,4096,4096] bank =
4.93 GB accessed = 7.23 ms/iter, AT the HBM copy floor (645 GB/s). The one
lever that shrinks the floor is narrower moment storage:

  f32      optax.adam (the reference-equivalent default)
  mu_bf16  optax.adam(mu_dtype=bfloat16) — first moment stored bf16
           (805 MB less read+write per step on the bank alone)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_train_opt.py [batch]
"""

from __future__ import annotations

import sys

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bench._enable_compile_cache()
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    for mode in ("f32", "mu_bf16"):
        bench.TRAIN_MU_DTYPE = mode
        pipe, state, x = bench._built_on_cpu(bench._build_train, batch)
        gps = bench._measure(pipe, state, x, batch, rtt, reps=3)
        print(f"adam moments {mode}: {gps:.1f} groups/s "
              f"({1000.0 / gps * 1:.1f} ms/step at {batch} groups)",
              flush=True)


if __name__ == "__main__":
    main()
