"""A/B the s4 diag-split aggregation bank on the real chip (round-5
follow-on to the act4 win, same mechanism one level down the tail).

The adopted Pallas aggregation kernel is weight-stream bound: the
[4, 3, S, S] int8 bank is 201 MB at S=4096 and its HBM stream sets the
kernel's 0.56 ms floor (PERF.md round-4 trace table). Storing the bank at
4 bits halves that stream. A straight int4 bank would crush the
off-diagonal couplings (the per-column amax sits at the ~1.0 diagonal of
the reference's identity-initialised ChannelWiseFC), so the bank is split:
exact f32 diagonal in the kernel epilogue + 4-bit residual against its own
amax (quant.quantize_aggregation_grouped_s4).

Variants (same session, same RTT subtraction):

  base      adopted config (int8 bank, Pallas kernel)
  s4-i8     diag-split bank, int8 CARRIER (residual still shipped at
            8 bits) — isolates the epilogue cost of the split from the
            traffic win
  s4        diag-split bank cast to native jnp.int4 ON-DEVICE
            (serving.finalize_device_params; host s4 transfers are broken
            on this backend) — the traffic win

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_agg4.py [batch]
"""

from __future__ import annotations

import sys

import bench
from posetpu.serving import finalize_device_params


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bench._enable_compile_cache()
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    kw = dict(subpixel_deconvs={"deconv0"}, phase_kernel=2,
              stem_s2d="pre", input_layout="hwcn",
              act4=tuple(f"layer1_{i}.out" for i in range(3))
              + tuple(f"layer2_{i}.out" for i in range(4)),
              act4_mode="s4")
    variants = [
        ("base", "pallas", False),
        ("s4-i8", "pallas_s4", False),
        ("s4", "pallas_s4", True),
    ]
    results = {}
    for name, aggre, finalize in variants:
        try:
            pipe, params, x = bench._built_on_cpu(
                bench._build_int8, batch, grouped_aggre=aggre, **kw)
            if finalize:
                params = finalize_device_params(params)
                print(f"  bank dtype on device: "
                      f"{params['qagg']['wq4'].dtype}", flush=True)
            fps = bench._measure(pipe, params, x, batch, rtt)
            results[name] = fps
            print(f"agg={name}: {fps:.1f} 4-view frames/s", flush=True)
        except Exception as e:
            results[name] = None
            print(f"agg={name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)
    print("AB_AGG4 " + str({k: (round(v, 1) if v else None)
                            for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
