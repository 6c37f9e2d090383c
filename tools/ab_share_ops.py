"""A/B the shared-shift kernel operands (phase_tail.TAIL2_SHARE_OPS) on
the real chip, at the adopted serving config.

The 16 (phase, tap) dots of each fused-tail stage index only 9 distinct
shifted int8 operands; sharing them removes the redundant VPU
roll/mask/concat work. Bit-exact either way (tests/test_phase_kernel.py).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_share_ops.py [batch]
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
              grouped_aggre=True, stem_s2d="pre", input_layout="hwcn")
    saved = pt.TAIL2_SHARE_OPS
    try:
        for share in (False, True):
            # trace-time capture: the global must be set BEFORE the build
            # (and restored after — a later build must not inherit it)
            pt.TAIL2_SHARE_OPS = share
            pipe, params, x = bench._build_int8(batch, **kw)
            fps = bench._measure(pipe, params, x, batch, rtt)
            print(f"share_ops={share}: {fps:.1f} 4-view frames/s", flush=True)
    finally:
        pt.TAIL2_SHARE_OPS = saved


if __name__ == "__main__":
    main()
