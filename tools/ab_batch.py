"""A/B the serving pipeline's batch size on the real chip.

Receipts so far: 64 groups lost at every config tried (2,042 vs 2,076;
re-test 2,921 vs 3,078 — larger intermediates break fusion windows). This
harness re-tests arbitrary sizes against the CURRENT adopted config
(Pallas aggregation kernel + two-level tail), where the intermediates'
shapes changed again.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_batch.py [b1 b2 ...]
"""

from __future__ import annotations

import sys

import bench


def main():
    batches = [int(a) for a in sys.argv[1:]] or [32, 48]
    bench._enable_compile_cache()
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    for b in batches:
        pipe, params, x = bench._built_on_cpu(bench._build_serving, b)
        fps = bench._measure(pipe, params, x, b, rtt)
        print(f"batch {b}: {fps:.1f} 4-view frames/s", flush=True)


if __name__ == "__main__":
    main()
