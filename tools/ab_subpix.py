"""A/B the inner-subpixel-deconv kernel batching on the real chip.

Run: PYTHONPATH=. python tools/ab_subpix.py [batch]
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
    for batched in (False, True):
        pt.SUBPIX_BATCHED = batched
        pipe, params, x = bench._build_int8(batch, **kw)
        fps = bench._measure(pipe, params, x, batch, rtt)
        print(f"subpix_batched={batched}: {fps:.1f} 4-view frames/s",
              flush=True)


if __name__ == "__main__":
    main()
