"""Dry-run of docs/REALDATA_GATE.md on the synthetic fixture.

Runs the real-data gate checklist steps 1-4 VERBATIM (same CLI entry
points, same flags the checklist prescribes) against the committed
synthetic blob fixtures, proving that the moment real MPII / H36M assets
or a reference checkpoint appear, convert-and-eval needs zero new code.

Chain: build fixtures -> train a small detector through cli.train ->
  [1] cli.validate --flip-test --shift-heatmap --post-process   (MPII PCKh)
  [2] cli.validate on h36m + --trainset heatmap dump            (H36M PCKh, H5)
  [3] cli.triangulate (GT oracle ~0 mm, then --heatmap) + cli.rpsm
  [4] cli.pseudo_labels sweep + the reference's 0.7/RANSAC-3/10px point

Run: PYTHONPATH=. python tools/realdata_gate_dryrun.py [workdir] [--epochs N]
Prints one GATE_DRYRUN json line with every parsed metric.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

from tools.int8_accuracy import CFG_YAML as H36M_CFG
from tools.int8_accuracy import build_fixture as build_h36m_fixture
from tools.pipeline_drive import build_mpii_fixture

MPII_CFG = """\
GPUS: '0'
DATA_DIR: ''
OUTPUT_DIR: output
LOG_DIR: log
DATASET:
  ROOT: '{root}'
  TRAIN_DATASET: mpii
  TEST_DATASET: mpii
  TRAIN_SUBSET: train
  TEST_SUBSET: valid
  DATA_FORMAT: jpg
NETWORK:
  PRETRAINED: ''
  IMAGE_SIZE:
  - 256
  - 256
  HEATMAP_SIZE:
  - 64
  - 64
  SIGMA: 2
  AGGRE: false
POSE_RESNET:
  NUM_LAYERS: 18
LOSS:
  USE_TARGET_WEIGHT: true
TRAIN:
  BATCH_SIZE: 4
  BEGIN_EPOCH: 0
  END_EPOCH: {epochs}
  LR: 0.001
  LR_STEP:
  - 90
  - 110
TEST:
  BATCH_SIZE: 4
"""


def write_headboxes(root: str) -> None:
    """gt_<subset>.mat headboxes from the fixture's head joints (indices
    8/9 of the union order = upper-neck/head-top), the schema
    data/mpii.py:evaluate consumes (reference: gt_valid.mat ×0.6)."""
    from scipy.io import savemat

    with open(os.path.join(root, "mpii", "annot", "valid.json")) as f:
        annos = json.load(f)
    n = len(annos)
    hb = np.zeros((2, 2, n))
    for i, a in enumerate(annos):
        j = np.asarray(a["joints"])
        hb[0, :, i] = j[8]
        hb[1, :, i] = j[9]
    for subset in ("valid", "train"):
        savemat(os.path.join(root, "mpii", "annot", f"gt_{subset}.mat"),
                {"headboxes_src": hb})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/realdata_gate")
    ap.add_argument("--epochs", type=int, default=60)
    args = ap.parse_args()
    work = args.workdir
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "data")
    if not os.path.exists(os.path.join(root, "mpii", "annot", "train.json")):
        print("building mpii fixture...", flush=True)
        build_mpii_fixture(root, n_mpii=192)
    if not os.path.exists(os.path.join(root, "mpii", "annot", "gt_valid.mat")):
        # keyed on gt_valid.mat itself (ADVICE r3): a workdir whose MPII
        # fixture came from tools/pipeline_drive.py (which never writes the
        # headbox mats) passed the train.json check and then failed in the
        # PCKh evaluate step
        write_headboxes(root)
    if not os.path.exists(os.path.join(root, "h36m", "annot", "h36m_train.pkl")):
        print("building h36m fixture...", flush=True)
        build_h36m_fixture(root)

    mpii_cfg = os.path.join(work, "mpii.yaml")
    with open(mpii_cfg, "w") as f:
        f.write(MPII_CFG.format(root=root, epochs=args.epochs))
    h36m_cfg = os.path.join(work, "h36m.yaml")
    with open(h36m_cfg, "w") as f:
        # AGGRE=false: the checkpoint being gated is the MPII-trained
        # (non-aggre) model, the reference's own protocol for the
        # mpii-model rows of README.md:224-227
        f.write(H36M_CFG.format(root=root, epochs=args.epochs)
                .replace("AGGRE: true", "AGGRE: false"))

    os.chdir(work)
    results = {}

    # ---- train the detector (stand-in for "reference checkpoint appears";
    # with a real .pth.tar, --state takes it directly and this step is skipped)
    from posetpu.cli import train as train_cli

    best = glob.glob("output/mpii/**/model_best", recursive=True)
    if not best:
        print("training detector...", flush=True)
        sys.argv = ["train", "--cfg", mpii_cfg]
        train_cli.main()
        best = glob.glob("output/mpii/**/model_best", recursive=True)
    assert best, "no model_best produced"
    state = os.path.abspath(best[0])

    # ---- [1] the MPII PCKh gate command, flags verbatim
    from posetpu.cli import validate as validate_cli

    sys.argv = ["validate", "--cfg", mpii_cfg, "--state", state,
                "--flip-test", "--shift-heatmap", "--post-process"]
    results["mpii_pckh"] = float(validate_cli.main())
    print(f"[1] MPII PCKh@0.5 = {results['mpii_pckh']:.3f}", flush=True)

    # ---- [2] H36M validation PCKh + trainset heatmap dump
    sys.argv = ["validate", "--cfg", h36m_cfg, "--state", state,
                "--flip-test", "--shift-heatmap", "--post-process"]
    results["h36m_pckh"] = float(validate_cli.main())
    sys.argv = ["validate", "--cfg", h36m_cfg, "--state", state, "--trainset"]
    validate_cli.main()
    # two dumps, two consumers (reference protocol): triangulate/rpsm read
    # the VALIDATION dump (test_triangulate.py:51-52 builds the eval
    # grouping), pseudo_labels reads the TRAINSET dump
    # (valid_trainset.py:155 builds the ::5 train grouping)
    dumps = glob.glob("output/multiview_h36m/**/heatmaps_locations_train*.h5",
                      recursive=True)
    assert dumps, "trainset validate produced no H5 dump"
    h5 = os.path.abspath(dumps[0])
    vdumps = glob.glob(
        "output/multiview_h36m/**/heatmaps_locations_validation*.h5",
        recursive=True)
    assert vdumps, "validate produced no validation H5 dump"
    h5_val = os.path.abspath(vdumps[0])
    print(f"[2] H36M PCKh@0.5 = {results['h36m_pckh']:.3f}; dumps {h5}, "
          f"{h5_val}", flush=True)

    # ---- [3] triangulation (GT oracle, then predictions) + RPSM
    from posetpu.cli import rpsm as rpsm_cli
    from posetpu.cli import triangulate as tri_cli
    from posetpu.cli.common import load_cfg

    class A:
        cfg = h36m_cfg
        modelDir = logDir = dataDir = ""

    cfg = load_cfg(A())
    results["tri_gt_mm"] = float(tri_cli.run(cfg, "")["mean_mm"])
    results["tri_pred_mm"] = float(tri_cli.run(cfg, h5_val)["mean_mm"])
    results["rpsm_mm"] = float(
        rpsm_cli.run(cfg, h5_val, "", max_groups=8)["mpjpe_mm"])
    print(f"[3] MPJPE: GT {results['tri_gt_mm']:.2f} mm, pred "
          f"{results['tri_pred_mm']:.2f} mm, rpsm {results['rpsm_mm']:.2f} mm",
          flush=True)

    # ---- [4] pseudo-label sweep + the reference operating point
    from posetpu.cli import pseudo_labels as pl_cli

    sys.argv = ["pseudo_labels", "--cfg", h36m_cfg, "--heatmap", h5]
    results["pseudo_sweep"] = pl_cli.main()
    sys.argv = ["pseudo_labels", "--cfg", h36m_cfg, "--heatmap", h5,
                "--confidence-thre", "0.7", "--ransac", "--inliers", "3",
                "--reproj-thre", "10", "--use-reproj", "--loop"]
    results["pseudo_ref_point"] = pl_cli.main()
    print("[4] pseudo-label sweep + reference point OK", flush=True)

    assert results["tri_gt_mm"] < 1.0, "GT triangulation oracle must be ~0 mm"
    print("GATE_DRYRUN " + json.dumps(results, default=str), flush=True)


if __name__ == "__main__":
    main()
