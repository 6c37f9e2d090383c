"""A/B the batch-minor (H, W, C, N) serving-input contract on the real chip.

Hypothesis (round-2 device trace): the u8->int8 input affine emits the
standard layout and XLA inserts a 0.22 ms/iter retile (copy.809) to the stem
conv's preferred {0,3,2,1} (N-minor) layout. If the bytes ARRIVE in (H, W, C,
N) physical order — free for the host loader, which writes warp pixels at
computed addresses anyway — the affine emits the conv layout directly and the
retile disappears.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_hwcn.py [batch] [combos]
"""

from __future__ import annotations

import sys

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    kw = dict(subpixel_deconvs={"deconv0"}, phase_kernel=2,
              grouped_aggre=True, stem_s2d="pre")
    combos = [(False, "nhwc"), (False, "hwcn"), (True, "nhwc"),
              (True, "hwcn")]
    if len(sys.argv) > 2:
        combos = [combos[int(i)] for i in sys.argv[2].split(",")]
    for flip, layout in combos:
        pipe, params, x = bench._build_int8(batch, flip_test=flip,
                                            input_layout=layout, **kw)
        fps = bench._measure(pipe, params, x, batch, rtt)
        print(f"flip={flip} input_layout={layout}: {fps:.1f} 4-view frames/s",
              flush=True)


if __name__ == "__main__":
    main()
