"""A/B sub-int8 (4-bit) activations at the HBM-bound trunk boundaries
(round-4 VERDICT #2) on the real chip, at the adopted serving config.

The layer1/layer2 fusions sit at their HBM-*traffic* floors (PERF.md trunk
audit); storing their boundary tensors at 4 bits halves those floors — the
one identified lever that moves single-chip SOL itself. Variants:

  base       adopted config (all-int8 boundaries)
  l1         layer1 block outputs packed-int4 (3 x 134 MB @ batch 128)
  l12        + layer2 block outputs (4 x 67 MB)
  l12-s4     l12 with native jnp.int4 storage instead of nibble-packing
             (expected to fail on this backend — receipt either way)

(only the ``requant``-produced block-output boundaries are coverable —
the stem/maxpool boundary quantizes inside qchain's conv epilogue and is
not an act4 site in this experiment)

Accuracy receipts come from tools/int8_accuracy.py --act4 (fixture PCKh).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_act4.py [batch]
"""

from __future__ import annotations

import sys

import bench

L1 = tuple(f"layer1_{i}.out" for i in range(3))
L2 = tuple(f"layer2_{i}.out" for i in range(4))
L3 = tuple(f"layer3_{i}.out" for i in range(6))
INTRA12 = tuple(f"layer{s}_{i}.conv{c}.out"
                for s, nb in ((1, 3), (2, 4))
                for i in range(nb) for c in (1, 2))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bench._enable_compile_cache()
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    kw = dict(subpixel_deconvs={"deconv0"}, phase_kernel=2,
              grouped_aggre="pallas", stem_s2d="pre", input_layout="hwcn")
    variants = [
        ("base", (), "packed"),
        ("l1", L1, "packed"),
        ("l12", L1 + L2, "packed"),
        ("l12-s4", L1 + L2, "s4"),
        ("l1-s4", L1, "s4"),
        ("l123-s4", L1 + L2 + L3, "s4"),
        ("l12i-s4", L1 + L2 + INTRA12, "s4"),
    ]
    results = {}
    for name, act4, mode in variants:
        try:
            pipe, params, x = bench._built_on_cpu(
                bench._build_int8, batch, act4=act4, act4_mode=mode, **kw)
            fps = bench._measure(pipe, params, x, batch, rtt)
            results[name] = fps
            print(f"act4={name}: {fps:.1f} 4-view frames/s", flush=True)
        except Exception as e:
            results[name] = None
            print(f"act4={name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    print("AB_ACT4 " + str({k: (round(v, 1) if v else None)
                            for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
