"""A/B the two-level tail kernel's deconv1 batching on the real chip.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_tail2.py [batch]
"""

from __future__ import annotations

import sys

import bench
from posetpu.ops.pallas import phase_tail as pt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    kw = dict(subpixel_deconvs={"deconv0"}, phase_kernel=2,
              grouped_aggre=True)
    for batch_d1 in (False, True):
        pt.TAIL2_BATCH_D1 = batch_d1
        pipe, params, x = bench._build_int8(batch, **kw)
        fps = bench._measure(pipe, params, x, batch, rtt)
        print(f"tail2_batch_d1={batch_d1}: {fps:.1f} 4-view frames/s",
              flush=True)


if __name__ == "__main__":
    main()
