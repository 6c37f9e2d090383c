"""Per-STAGE accounting table for the serving pipeline (round-4 VERDICT #1).

profile_pipeline.py gives per-op timings and fusion_map.py gives op->HLO
metadata, but reconciling the SOL floor sum against the trace needs the two
joined and bucketed into architecture stages in one shot, from ONE program
(the round-4 accounting gap came partly from hand-joining runs of slightly
different builds). This tool:

1. builds the adopted bench config ONCE (identical args to bench.main's
   headline / flip variants),
2. lowers it and keeps the optimized HLO text,
3. device-traces LOOP_INSIDE iterations on the chip,
4. joins every timed device op to its HLO definition (output shape,
   op_name metadata, source file) and classifies it into a stage
   (stem / maxpool / layer1..4 / deconv0 / tail2 / aggregation /
   decode+3d / input-affine / copies / other),
5. prints the stage table (ms/iter, op count, share) + the residual
   between the stage sum and the whole-loop time, and writes
   TRACE_TABLE_<variant>.json next to the repo root for PERF.md.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/trace_table.py [batch]
     [--flip | --train] [--json OUT]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys


def build(variant: str, batch: int):
    import bench

    bench._enable_compile_cache()
    if variant == "flip":
        return bench._built_on_cpu(bench._build_serving, batch,
                                   flip_test="premirrored")
    if variant == "train":
        return bench._built_on_cpu(bench._build_train, batch)
    return bench._built_on_cpu(bench._build_serving, batch)


def hlo_defs(txt: str) -> dict:
    """instruction name -> (shape, op_name, source_file:line)."""
    defs = {}
    pat = re.compile(
        r"^\s*%?([\w.\-]+)\s*=\s*(\S+)\s+(\w[\w\-]*)\(")
    meta = re.compile(
        r'op_name="([^"]*)"(?:.*?source_file="([^"]*)".*?source_line=(\d+))?')
    for line in txt.splitlines():
        m = pat.match(line)
        if not m:
            continue
        name, shape, op = m.groups()
        mm = meta.search(line[:4000])
        op_name = mm.group(1) if mm else ""
        src = f"{os.path.basename(mm.group(2))}:{mm.group(3)}" \
            if (mm and mm.group(2)) else ""
        defs[name] = (shape, op, op_name, src)
    return defs


_SPATIAL = {  # (h, w) -> trunk stage for conv-like fusion outputs
    (128, 128): "stem", (64, 64): "layer1", (32, 32): "layer2",
    (16, 16): "layer3", (8, 8): "layer4",
}


def classify(name: str, shape: str, op: str, op_name: str, src: str) -> str:
    if name.startswith(("copy", "bitcast", "copy-done", "copy-start",
                        "all-reduce")):
        return "copies/infra"
    if "phase_tail.py" in src:
        # both Pallas kernels live there: deconv0 emits int8 phase planes,
        # tail2 emits f32/packed heatmaps
        return "deconv0-kernel" if shape.startswith("s8") else "tail2-kernel"
    if "aggregation.py" in src or "closed_call" in op_name and "pallas" in op_name:
        return "aggregation-kernel"
    if op == "custom-call" and "pallas" in op_name:
        return "pallas-other"
    # train-step traces: backward ops carry transpose(jvp(...)) metadata;
    # bucket them separately so fwd/bwd/optimizer attribution falls out
    bwd = "-bwd" if "transpose(" in op_name else ""
    if "adam" in op_name or "update" in op_name and "opt" in op_name:
        return "optimizer"
    dims = re.match(r"\w+\[([\d,]+)\]", shape)
    d = [int(x) for x in dims.group(1).split(",")] if dims else []
    if "reduce_window_max" in op_name:
        return "maxpool" + bwd
    if "select_and_scatter" in op_name:
        return "maxpool-bwd"
    if len(d) == 4 and (d[1], d[2]) in _SPATIAL and d[3] >= 12:
        stage = _SPATIAL[(d[1], d[2])]
        # distinguish the stem conv (out 128x128x64) from layer1 (64ch at
        # 64x64 belongs to layer1's 1x1/3x3 convs)
        return stage + bwd
    if any(k in op_name for k in ("gather", "take", "dot_general", "argmax",
                                  "reduce", "iota", "select", "triangul")):
        return "decode+3d"
    if "convert" in op_name or "mul" in op_name or "add" in op_name:
        return "elementwise-misc"
    return "other"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=32)
    ap.add_argument("--flip", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--logdir", default="/tmp/jaxtrace_table")
    args = ap.parse_args()
    variant = "flip" if args.flip else ("train" if args.train else "headline")

    import jax

    import bench

    pipe, params, x = build(variant, args.batch)
    txt = pipe.lower(params, x).compile().as_text()
    _ = float(pipe(params, x))  # warm

    os.system(f"rm -rf {args.logdir}")
    with jax.profiler.trace(args.logdir):
        _ = float(pipe(params, x))

    files = glob.glob(f"{args.logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    agg = {}
    long_names = {}
    total_loop = None
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        if name.startswith("$") or e.get("pid") == 701:
            continue
        ln = (e.get("args") or {}).get("long_name", "")
        if name.startswith("jit_") or (name == "0" and not ln):
            # whole-module wrapper events ("jit_<fn>", or the bare "0"
            # module row some profiler versions emit)
            total_loop = max(total_loop or 0, e.get("dur", 0))
            continue
        if name.startswith("while"):
            continue
        agg.setdefault(name, [0, 0])
        agg[name][0] += e.get("dur", 0)
        agg[name][1] += 1
        if ln and name not in long_names:
            long_names[name] = ln

    defs = hlo_defs(txt)
    n_iter = bench.LOOP_INSIDE
    stages: dict = {}
    unmatched = []
    meta_re = re.compile(
        r'op_name="([^"]*)"(?:.*?source_file="([^"]*)".*?source_line=(\d+))?')
    shape_re = re.compile(r"=\s*(\(?\S+)\s+(\w[\w\-]*)\(")
    for name, (dur, cnt) in agg.items():
        key = name
        if key not in defs:
            base = key.split(" ")[0]
            key = base if base in defs else None
        if key is not None:
            stage = classify(key, *defs[key])
        elif name in long_names:
            # classify straight from the trace event's own HLO line — the
            # lowered-text join can miss fusions when the profiler session
            # renames them (seen on train-step traces)
            ln = long_names[name]
            mm = meta_re.search(ln)
            op_name = mm.group(1) if mm else ""
            src = (os.path.basename(mm.group(2)) + ":" + mm.group(3)) \
                if (mm and mm.group(2)) else ""
            sm = shape_re.search(ln)
            op = sm.group(2) if sm else ""
            # tuple-output fusions (conv bwd emits (f32[C]..., bf16[N,H,W,C]
            # ...)): classify by the LARGEST shape in the line, not the
            # first tuple element
            all_shapes = re.findall(r"\w+\[[\d,]+\]", ln.split("fusion(")[0]
                                    or ln)
            def _numel(s):
                import math
                return math.prod(int(x) for x in
                                 re.search(r"\[([\d,]+)\]", s).group(1)
                                 .split(","))
            shape = max(all_shapes, key=_numel) if all_shapes else ""
            stage = classify(name, shape, op, op_name, src)
            if stage in ("other", "elementwise-misc"):
                # optimizer updates touch [*]-shaped f32 param tuples with
                # no spatial dims; the aggregation bank's Adam update is
                # the dominant example (f32[12,4096,4096] x3 outputs)
                if "4096,4096" in ln:
                    stage = "aggre-bank-optimizer"
        else:
            stage = ("copies/infra" if name.startswith(("copy", "bitcast"))
                     else "untraced")
            unmatched.append((name, dur))
        stages.setdefault(stage, [0.0, 0])
        stages[stage][0] += dur / 1e3 / n_iter
        stages[stage][1] += cnt

    rows = sorted(stages.items(), key=lambda kv: -kv[1][0])
    stage_sum = sum(v[0] for _, v in rows)
    total = (total_loop or 0) / 1e3 / n_iter
    print(f"\n=== {variant} batch {args.batch}: per-stage device time "
          f"(ms/iter over {n_iter} iters) ===")
    print(f"{'stage':<20}{'ms/iter':>9}{'ops':>6}{'share':>8}")
    for stage, (ms, cnt) in rows:
        print(f"{stage:<20}{ms:>9.3f}{cnt:>6}{ms/stage_sum:>8.1%}")
    print(f"{'SUM(stages)':<20}{stage_sum:>9.3f}")
    print(f"{'whole loop':<20}{total:>9.3f}   (residual "
          f"{total - stage_sum:+.3f} = scheduling gaps/untimed)")
    if unmatched:
        um = sorted(unmatched, key=lambda kv: -kv[1])[:8]
        print("top unmatched trace ops:",
              [(n[:40], round(d / 1e3 / n_iter, 3)) for n, d in um])

    out = args.json or f"TRACE_TABLE_{variant}.json"
    with open(out, "w") as f:
        json.dump({
            "variant": variant, "batch": args.batch,
            "ms_per_iter_whole_loop": round(total, 3),
            "stages_ms_per_iter": {k: round(v[0], 3) for k, v in rows},
            "stage_sum": round(stage_sum, 3),
            "residual": round(total - stage_sum, 3),
        }, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
