"""Probe XLA TPU flags on the headline int8 serving config.

The round-2 HLO dump shows the axon backend already chains producer-consumer
pairs through scoped (VMEM) memory (`S(1)` tensors, used_scoped_memory up to
~8 MB per fusion). If the scoped-memory budget is what stops it from chaining
more of the bandwidth-bound layer1/layer2 fusions, raising
--xla_tpu_scoped_vmem_limit_kib should show up directly in the bench number.

Each flag set runs in a fresh subprocess (XLA flags are read at backend
init). Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_xla_flags.py
"""

from __future__ import annotations

import os
import subprocess
import sys

FLAG_SETS = [
    "",
    "--xla_tpu_scoped_vmem_limit_kib=32768",
    "--xla_tpu_scoped_vmem_limit_kib=65536",
]


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for fs in FLAG_SETS:
        env = dict(os.environ)
        if fs:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + fs).strip()
        print(f"=== XLA_FLAGS={fs!r}", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(here, "ab_hwcn.py"), "32", "0"],
            env=env, check=False,
        )


if __name__ == "__main__":
    main()
