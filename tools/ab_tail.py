"""A/B the serving-tail layout on the real chip: NHWC vs S-minor (jns).

Run: PYTHONPATH=. python tools/ab_tail.py [batch]
"""

from __future__ import annotations

import sys

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    for tail in ("nhwc", "jns", "jns_bf16"):
        pipe, params, x = bench._build_int8(batch, tail=tail)
        fps = bench._measure(pipe, params, x, batch, rtt)
        print(f"tail={tail}: {fps:.1f} 4-view frames/s", flush=True)


if __name__ == "__main__":
    main()
