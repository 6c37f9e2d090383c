"""DP weak-scaling rehearsal on the virtual CPU mesh: 1/2/4/8 devices.

Measures the jitted sharded train step (the same make_train_step /
shard_batch path the CLIs run — posetpu/train/step.py, parallel/mesh.py)
with the PER-DEVICE batch held fixed while the mesh grows, replacing the
reference's "DDP scales linearly" assumption (run/pose2d/train.py:129-225)
with a number.

Interpretation on THIS host (1 CPU core): virtual devices are serialized
onto one core, so wall-clock per step grows ~linearly with device count by
construction. The meaningful quantity is the **parallel-overhead ratio**
t_n / (n * t_1): compute scales with n on one core, while everything the
mesh ADDS (gradient psum, resharding, partitioning) is pure overhead on
top — a ratio near 1.0 means the sharded program inserts no superlinear
collective/reshard cost and the scaling SHAPE is linear. (On a real pod
slice the n* factor sits on n chips and drops out; the ratio is the part
that transfers.)

Run: PYTHONPATH=. python tools/scaling_rehearsal.py [out.json]
Each mesh size runs in a fresh subprocess (device count is fixed at JAX
init). Prints a table + one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import os, sys, time, json
import numpy as np
n = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n)
import jax.numpy as jnp
from posetpu.config import default_config
from posetpu.models import MultiViewPose, get_pose_net
from posetpu.parallel.mesh import data_mesh, replicated, shard_batch
from posetpu.train.optim import make_optimizer
from posetpu.train.step import init_train_state, make_train_step

cfg = default_config()
cfg.NETWORK.IMAGE_SIZE = np.array([64, 64])
cfg.NETWORK.HEATMAP_SIZE = np.array([16, 16])
cfg.POSE_RESNET.NUM_LAYERS = 50  # flagship backbone, dryrun shapes
cfg.LOSS.USE_CONSISTENT_LOSS = True
cfg.LOSS.USE_FUNDAMENTAL_LOSS = True

PER_DEV = 2  # groups per device (weak scaling)
nb = n * PER_DEV
rs = np.random.RandomState(0)
batch = {
    "images": rs.randn(nb, 4, 64, 64, 3).astype(np.float32),
    "target": rs.rand(nb, 4, 16, 16, 16).astype(np.float32),
    "weight": np.ones((nb, 4, 16), np.float32),
    "is_h36m": np.ones((nb,), np.float32),
    "center": np.full((nb, 4, 2), 500.0, np.float32),
    "scale": np.full((nb, 4, 2), 2.5, np.float32),
    "fmats": rs.randn(nb, 12, 3, 3).astype(np.float32),
    "joints_crop": rs.uniform(5, 60, (nb, 4, 16, 2)).astype(np.float32),
    "joints_vis": np.ones((nb, 4, 16), np.float32),
}
model = MultiViewPose(resnet=get_pose_net(cfg, dtype=jnp.float32), aggre=True)
tx = make_optimizer(cfg, steps_per_epoch=100)
step = make_train_step(model, cfg, tx)
mesh = data_mesh(n)
with mesh:
    state = init_train_state(model, cfg, tx, batch)
    state = jax.device_put(state, replicated(mesh))
    sharded = shard_batch(batch, mesh)
    state, m = step(state, sharded)           # compile + 1st step
    float(m["loss"])
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step(state, sharded)
        float(m["loss"])                      # sync
    dt = (time.perf_counter() - t0) / reps
print(json.dumps({"n": n, "ms_per_step": dt * 1e3,
                  "groups_per_step": nb, "loss": float(m["loss"])}))
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    rows = []
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(n)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            print(f"n={n} FAILED:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            sys.exit(1)
        print(f"n={n}: {rows[-1]['ms_per_step']:.0f} ms/step "
              f"({rows[-1]['groups_per_step']} groups)", flush=True)

    t1 = rows[0]["ms_per_step"]
    for r in rows:
        # single-core host: compute serializes, so t_n ~ n*t_1; the mesh's
        # ADDED cost is the ratio above 1.0
        r["overhead_ratio"] = r["ms_per_step"] / (r["n"] * t1)
    print("\nweak scaling (per-device batch fixed, 1 CPU core → compute "
          "serializes; overhead_ratio = t_n / (n·t_1), ~1.0 = linear shape):")
    for r in rows:
        print(f"  {r['n']} dev: {r['ms_per_step']:8.0f} ms/step   "
              f"overhead_ratio {r['overhead_ratio']:.3f}")
    result = {"metric": "dp_weak_scaling_overhead_ratio",
              "rows": rows,
              "max_overhead_ratio": max(r["overhead_ratio"] for r in rows)}
    print(json.dumps(result), flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
