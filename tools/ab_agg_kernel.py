"""A/B the Pallas grouped-aggregation kernel vs the XLA grouped dot on the
real chip, at the adopted serving config.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_agg_kernel.py [batch]
"""

from __future__ import annotations

import sys

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bench._enable_compile_cache()
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    kw = dict(subpixel_deconvs={"deconv0"}, phase_kernel=2,
              stem_s2d="pre", input_layout="hwcn")
    for mode in (True, "pallas"):
        pipe, params, x = bench._built_on_cpu(
            bench._build_int8, batch, grouped_aggre=mode, **kw)
        fps = bench._measure(pipe, params, x, batch, rtt)
        print(f"grouped_aggre={mode}: {fps:.1f} 4-view frames/s", flush=True)


if __name__ == "__main__":
    main()
