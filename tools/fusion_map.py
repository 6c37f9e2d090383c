"""Map the device-trace fusion names of the bench pipeline to their HLO ops.

Compiles the adopted int8 bench pipeline, then for every fusion that calls a
convolution/dot prints: fusion name, the conv/dot shape line, and the JAX
op_name metadata (source attribution). Cross-reference with
tools/profile_pipeline.py's per-op timings.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/fusion_map.py [batch]
"""

from __future__ import annotations

import re
import sys

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    qpipe, qparams, qx = bench._build_int8(batch, subpixel_deconvs={"deconv0"},
                                           phase_kernel=2,
                                           grouped_aggre=True, stem_s2d="pre")
    txt = qpipe.lower(qparams, qx).compile().as_text()
    import os
    dump = os.environ.get("FUSION_MAP_DUMP")
    if dump:  # keep the full optimized HLO for offline analysis
        with open(dump, "w") as f:
            f.write(txt)

    # computation name -> list of interesting op lines inside it
    comp = None
    comp_ops = {}
    for line in txt.splitlines():
        m = re.match(r"%?(\S+) \([^)]*\) -> ", line.strip())
        if line.startswith("%fused_computation") or line.startswith(
                "fused_computation"):
            comp = line.split(" ")[0].lstrip("%")
            comp_ops[comp] = []
        elif line.startswith("}"):
            comp = None
        elif comp and ("convolution(" in line or "dot(" in line
                       or "custom-call" in line):
            shape = line.strip().split(" = ")[-1][:120]
            mm = re.search(r'op_name="([^"]+)"', line)
            comp_ops[comp].append(
                (shape, mm.group(1)[-90:] if mm else ""))

    # fusion instr -> computation it calls
    for line in txt.splitlines():
        m = re.search(r"%?((?:clamp_convert_|copy_bitcast_)?fusion[.\d]*) = .*"
                      r"calls=%?(\S+?)[,)]", line)
        if not m:
            continue
        name, callee = m.group(1), m.group(2)
        ops = comp_ops.get(callee)
        if ops:
            for shape, opname in ops:
                print(f"{name:32s} {opname}\n{'':32s}   {shape}")


if __name__ == "__main__":
    main()
