"""A/B the public-API serving build (posetpu.serving via bench._build_serving)
against the ablation-harness build (bench._build_int8 at the adopted config).

The two construct the same graph through different code paths; this run is
the receipt that routing the bench headline through the package API costs
nothing.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_serving.py [batch]
"""

from __future__ import annotations

import sys

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bench._enable_compile_cache()
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    for flip in (False, True):
        # grouped_aggre="pallas" matches the serving default since the
        # round-3 aggregation-kernel adoption (serving.py aggre_kernel=True)
        # act4="l12"-equivalent boundaries match the serving default since
        # the round-5 s4 adoption (serving.py act4="l12")
        act4 = tuple(f"layer1_{i}.out" for i in range(3)) + tuple(
            f"layer2_{i}.out" for i in range(4))
        pipe, params, x = bench._built_on_cpu(
            bench._build_int8, batch, flip_test=flip,
            subpixel_deconvs={"deconv0"}, phase_kernel=2,
            grouped_aggre="pallas", stem_s2d="pre", input_layout="hwcn",
            act4=act4, act4_mode="s4")
        fps = bench._measure(pipe, params, x, batch, rtt)
        print(f"flip={flip} ablation-harness: {fps:.1f} 4-view frames/s",
              flush=True)
        spipe, sparams, sx = bench._built_on_cpu(
            bench._build_serving, batch, flip_test=flip)
        sfps = bench._measure(spipe, sparams, sx, batch, rtt)
        print(f"flip={flip} package-API     : {sfps:.1f} 4-view frames/s",
              flush=True)


if __name__ == "__main__":
    main()
