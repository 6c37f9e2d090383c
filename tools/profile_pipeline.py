"""Device-trace the int8 bench pipeline; dump the top device ops.

The per-op device timeline is the only reliable way to see where the
pipeline's milliseconds go (isolated stage timings compile differently and
mislead — layout copies and fusion shapes change in context).

Run: PYTHONPATH=. python tools/profile_pipeline.py [batch] [logdir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    logdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace_bench"

    import jax

    import bench

    bench._enable_compile_cache()
    # the adopted serving config (keep in sync with bench.main's int8 build);
    # build on the CPU backend (eager build ops through the tunnel cost
    # minutes — bench._built_on_cpu)
    qpipe, qparams, qx = bench._built_on_cpu(
        bench._build_int8, batch, subpixel_deconvs={"deconv0"},
        phase_kernel=2, grouped_aggre="pallas", stem_s2d="pre",
        input_layout="hwcn")
    _ = float(qpipe(qparams, qx))  # compile + warm

    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        _ = float(qpipe(qparams, qx))
    print("captured", flush=True)

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    agg = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        if name.startswith("$") or e.get("pid") == 701:
            continue  # host-side python frames
        agg.setdefault(name, [0, 0])
        agg[name][0] += e.get("dur", 0)
        agg[name][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]
    print(f"top device ops over {bench.LOOP_INSIDE} pipeline iters "
          f"(divide by {bench.LOOP_INSIDE} for per-iter):")
    for name, (dur, cnt) in rows:
        print(f"{dur/1e3:9.3f} ms  x{cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
