"""Timed REAL-process DP comparison (round-3 VERDICT #5).

`SCALING_r03.json` measured the weak-scaling SHAPE on virtual devices inside
ONE process — collective overhead was invisible (in-process "collectives"
are memory moves). This tool measures the thing that was missing: the cost
of running the SAME global training step as a multi-controller
`jax.distributed` job, with gradient all-reduces crossing real process
boundaries (gRPC transport on CPU — the DCN-like worst case; on a TPU pod
slice the same program rides ICI).

Protocol (work-constant, single-core-host-fair): global batch G is fixed
and sharded over 8 virtual CPU devices in every config —
  1 process x 8 devices   (in-process collectives, the baseline)
  2 processes x 4 devices (cross-process all-reduce)
Total FLOPs and core contention are identical, so the per-step wall-time
ratio isolates the multi-controller transport overhead.

Run: PYTHONPATH=. python tools/multihost_timing.py [--steps 6]
Prints one MULTIHOST_TIMING json line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time, json
num_procs, pid, port, steps, gbatch = (int(sys.argv[1]), int(sys.argv[2]),
                                       int(sys.argv[3]), int(sys.argv[4]),
                                       int(sys.argv[5]))
devs = 8 // num_procs
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={devs}").strip()
import jax
jax.config.update("jax_platforms", "cpu")
if num_procs > 1:
    jax.distributed.initialize(f"localhost:{port}", num_procs, pid)
import numpy as np
import jax.numpy as jnp
from posetpu.config import default_config
from posetpu.models import MultiViewPose, get_pose_net
from posetpu.parallel.mesh import data_mesh, replicate, shard_host_batch
from posetpu.train.optim import make_optimizer
from posetpu.train.step import init_train_state, make_train_step

assert len(jax.devices()) == 8, jax.devices()
cfg = default_config()
cfg.NETWORK.IMAGE_SIZE = np.array([64, 64])
cfg.NETWORK.HEATMAP_SIZE = np.array([16, 16])
cfg.POSE_RESNET.NUM_LAYERS = 18
model = MultiViewPose(resnet=get_pose_net(cfg, dtype=jnp.float32), aggre=True)
tx = make_optimizer(cfg, steps_per_epoch=100)
train_step = make_train_step(model, cfg, tx)

rs = np.random.RandomState(0)
n_local = gbatch // num_procs
local = {
    "images": rs.randn(n_local, 4, 64, 64, 3).astype(np.float32),
    "target": rs.rand(n_local, 4, 16, 16, 16).astype(np.float32),
    "weight": np.ones((n_local, 4, 16), np.float32),
    "is_h36m": np.ones((n_local,), np.float32),
    "center": np.full((n_local, 4, 2), 500.0, np.float32),
    "scale": np.full((n_local, 4, 2), 2.5, np.float32),
}
mesh = data_mesh(8)
with mesh:
    # init on the full-batch template shape (is shape-only)
    state = init_train_state(model, cfg, tx, local)
    state = replicate(state, mesh)
    sharded = shard_host_batch(local, mesh)
    for _ in range(2):  # compile + warm
        state, metrics = train_step(state, sharded)
        float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, sharded)
        float(metrics["loss"])
    ms = (time.perf_counter() - t0) / steps * 1e3
if pid == 0:
    print("WORKER_MS " + json.dumps({"procs": num_procs, "ms_per_step": ms}),
          flush=True)
"""


def run_config(num_procs: int, steps: int, gbatch: int, port: int) -> float:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = []
    logs = []
    for pid in range(num_procs):
        log = tempfile.NamedTemporaryFile("w+", suffix=f".p{pid}.log",
                                          delete=False)
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER, str(num_procs), str(pid),
             str(port), str(steps), str(gbatch)],
            env=env, stdout=log, stderr=subprocess.STDOUT, cwd=REPO))
    for p in procs:
        rc = p.wait(timeout=1800)
        if rc != 0:
            for log in logs:
                log.flush()
                log.seek(0)
                sys.stderr.write(log.read()[-2000:])
            raise RuntimeError(f"worker rc={rc} (procs={num_procs})")
    ms = None
    for log in logs:
        log.flush()
        log.seek(0)
        for line in log.read().splitlines():
            if line.startswith("WORKER_MS "):
                ms = json.loads(line[len("WORKER_MS "):])["ms_per_step"]
    for log in logs:
        os.unlink(log.name)
    assert ms is not None, "no WORKER_MS line from pid 0"
    return ms


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--gbatch", type=int, default=8)
    ap.add_argument("--procs", type=int, nargs="+", default=[1, 2])
    args = ap.parse_args()

    results = {}
    port = 29531
    for np_ in args.procs:
        ms = run_config(np_, args.steps, args.gbatch, port)
        port += 1
        results[np_] = ms
        print(f"{np_} process(es) x {8 // np_} devices: {ms:.1f} ms/step "
              f"(global batch {args.gbatch} groups)", flush=True)
    base = results.get(1)
    rec = {
        "protocol": "fixed global batch over 8 virtual CPU devices; "
                    "1-proc in-process collectives vs multi-proc "
                    "jax.distributed (gRPC transport)",
        "global_batch_groups": args.gbatch,
        "ms_per_step": {str(k): round(v, 1) for k, v in results.items()},
    }
    if base:
        rec["overhead_vs_1proc"] = {
            str(k): round(v / base, 3) for k, v in results.items()
        }
    print("MULTIHOST_TIMING " + json.dumps(rec), flush=True)

    # Write the repo record with the exact keys __graft_entry__'s dryrun
    # replay reads (date / ms_per_step / overhead_2proc_vs_1proc), so
    # regenerating it never breaks the replay (ADVICE r4).
    if base and 2 in results:
        import datetime

        record = {
            "what": "timed REAL-process DP comparison: the same global "
                    "train step as 1 process x 8 virtual devices vs "
                    "2 processes x 4, jax.distributed multi-controller",
            "harness": f"tools/multihost_timing.py --steps {args.steps} "
                       f"--gbatch {args.gbatch} (run on an idle host)",
            "date": datetime.date.today().isoformat(),
            "ms_per_step": {"1proc_x8dev": round(results[1], 1),
                            "2proc_x4dev": round(results[2], 1)},
            "overhead_2proc_vs_1proc": round(results[2] / base, 3),
            "explanation": "Work-constant protocol: global batch and device "
                           "count identical; the ratio isolates the "
                           "multi-controller collective transport (gRPC on "
                           "CPU - the DCN-like worst case).",
        }
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MULTIHOST_TIMING.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=2)
            f.write("\n")
        print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
