"""Multi-host training rehearsal: 2 REAL processes x 4 virtual CPU devices.

The dryrun (`__graft_entry__.dryrun_multichip`) validates sharding in one
process; this rehearsal exercises the true multi-controller path the way a
2-host TPU pod slice would run it — `jax.distributed.initialize` rendezvous,
per-process loader shards (`GroupLoader(num_shards=2)`), local-shard ->
global-batch assembly (`make_array_from_process_local_data`), collective
eval on every process, and the collective Orbax checkpoint save — all via
the public `posetpu.cli.train` entry point.

Run: PYTHONPATH=. python tools/multihost_rehearsal.py [workdir]
Prints PASS/FAIL; artifacts stay in the workdir for inspection.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

CFG_YAML = """\
GPUS: '0'
DATA_DIR: ''
OUTPUT_DIR: output
LOG_DIR: log
DATASET:
  ROOT: '{root}'
  TRAIN_DATASET: mpii
  TEST_DATASET: mpii
  TRAIN_SUBSET: train
  TEST_SUBSET: train
  DATA_FORMAT: jpg
NETWORK:
  PRETRAINED: ''
  IMAGE_SIZE:
  - 64
  - 64
  HEATMAP_SIZE:
  - 16
  - 16
  SIGMA: 2
  AGGRE: false
POSE_RESNET:
  NUM_LAYERS: 18
LOSS:
  USE_TARGET_WEIGHT: true
TRAIN:
  BATCH_SIZE: 4
  BEGIN_EPOCH: 0
  END_EPOCH: 1
  LR: 0.001
  LR_STEP:
  - 90
  - 110
TEST:
  BATCH_SIZE: 8
"""

WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
cfg, pid = sys.argv[1], sys.argv[2]
sys.argv = [
    "train", "--cfg", cfg,
    "--coordinator", "localhost:{port}",
    "--num-processes", "2", "--process-id", pid,
]
from posetpu.cli.train import main
main()
"""


def build_fixture(root: str, n: int = 32) -> None:
    import cv2

    os.makedirs(os.path.join(root, "mpii", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "mpii", "annot"), exist_ok=True)
    annot = []
    rs = np.random.RandomState(0)
    for i in range(n):
        name = f"im{i:03d}.jpg"
        cv2.imwrite(
            os.path.join(root, "mpii", "images", name),
            rs.randint(0, 255, (80, 100, 3), np.uint8),
        )
        annot.append({
            "image": name,
            "center": [50.0, 40.0],
            "scale": 0.4,
            "joints": rs.uniform(10, 70, (16, 2)).tolist(),
            "joints_vis": [1] * 16,
        })
    with open(os.path.join(root, "mpii", "annot", "train.json"), "w") as f:
        json.dump(annot, f)
    from scipy.io import savemat

    headboxes = np.zeros((2, 2, n))
    headboxes[1] = 20.0
    savemat(os.path.join(root, "mpii", "annot", "gt_train.mat"),
            {"headboxes_src": headboxes})


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mh_")
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "data")
    if not os.path.exists(os.path.join(root, "mpii", "annot", "train.json")):
        build_fixture(root)
    cfg_path = os.path.join(work, "exp.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_YAML.format(root=root))

    port = 29517
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for pid in range(2):
        log = open(os.path.join(work, f"proc{pid}.log"), "w")
        procs.append((
            subprocess.Popen(
                [sys.executable, "-c", WORKER.format(port=port),
                 cfg_path, str(pid)],
                cwd=work, env=env, stdout=log, stderr=subprocess.STDOUT,
            ),
            log,
        ))
    codes = []
    for p, log in procs:
        try:
            codes.append(p.wait(timeout=2400))
        except subprocess.TimeoutExpired:
            p.kill()
            codes.append(-9)
        log.close()

    ok = codes == [0, 0]
    ckpts = []
    for base, _, names in os.walk(os.path.join(work, "output")):
        ckpts += [os.path.join(base, n) for n in names if n == "_METADATA"]
    print(f"exit codes: {codes}; checkpoints: {len(ckpts)}")
    if not ok or not ckpts:
        for pid in range(2):
            print(f"---- proc{pid}.log tail ----")
            with open(os.path.join(work, f"proc{pid}.log")) as f:
                print("".join(f.readlines()[-25:]))
        print("FAIL")
        sys.exit(1)
    print(f"PASS — 2-process x 4-device multi-controller training run "
          f"complete (workdir {work})")


if __name__ == "__main__":
    main()
