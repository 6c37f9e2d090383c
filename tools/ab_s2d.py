"""A/B the pre-packed space-to-depth serving input on the real chip
(headline + flip-test variants) at the adopted kernel config.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_s2d.py [batch]
"""

from __future__ import annotations

import sys

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    kw = dict(subpixel_deconvs={"deconv0"}, phase_kernel=2,
              grouped_aggre=True)
    combos = [(False, False), (False, "pre"), (True, False), (True, "pre")]
    if len(sys.argv) > 2:  # e.g. "1,2,3" to skip already-measured combos
        combos = [combos[int(i)] for i in sys.argv[2].split(",")]
    for flip, s2d in combos:
        if True:
            pipe, params, x = bench._build_int8(batch, flip_test=flip,
                                                stem_s2d=s2d, **kw)
            fps = bench._measure(pipe, params, x, batch, rtt)
            print(f"flip={flip} stem_s2d={s2d!r}: {fps:.1f} 4-view frames/s",
                  flush=True)


if __name__ == "__main__":
    main()
