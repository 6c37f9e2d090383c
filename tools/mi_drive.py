"""MI/GAN retrain A/B on the pipeline fixture (round-3 VERDICT #2, part 2).

The MI loss family (view MI + joints MI — the reference's
`256_*_view/joints_nofusion_resume_pseudo` configs, lib/core/loss.py:
564-633, weights 1e-4/NCE) has compiled, trained and been unit-tested, but
had never been shown to MOVE a metric end-to-end. This drive takes a
COMPLETED tools/pipeline_drive.py workdir (its final model + final pseudo
labels) and runs ONE further retrain iteration twice from that common warm
start, through the public `posetpu.cli.train` entry point:

  (a) plain   — supervised MSE on MPII + pseudo-labeled H36M
  (b) mi      — same + view MI + joints MI (adversarial D/G steps,
                posetpu/train/gan.py choreography)

then evaluates both on the fixture's validation subset. Same data, same
seed, same warm start — the PCKh/MPJPE delta is the MI evidence, win or
honest loss.

Run: PYTHONPATH=. python tools/mi_drive.py <pipeline_drive workdir> [--epochs 8]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def find_artifacts(work: str) -> tuple[str, str, str]:
    """(cfg_path, final_state_dir, pseudo_h5) of the completed drive."""
    cfg_path = os.path.join(work, "exp.yaml")
    assert os.path.exists(cfg_path), cfg_path
    states = glob.glob(os.path.join(
        work, "output", "**", "final_state"), recursive=True)
    assert states, f"no final_state under {work}/output"
    state_dir = max(states, key=os.path.getmtime)
    pstate = glob.glob(os.path.join(
        work, "output", "**", "pipeline_state.json"), recursive=True)
    assert pstate, "no pipeline_state.json (drive incomplete?)"
    with open(pstate[0]) as f:
        pseudo = json.load(f)["pseudo_path"]
    if not os.path.isabs(pseudo):  # drive runs with cwd=workdir
        pseudo = os.path.join(work, pseudo)
    assert os.path.exists(pseudo), pseudo
    return cfg_path, state_dir, pseudo


# Per-variant LOSS-section blocks: each is the corresponding reference
# preset's recipe (experiments/mixed/resnet50/pseudo_label/256_fund5_*.yaml)
# minus the fund term (A/B'd separately by pipeline_drive --fund).
VARIANT_BLOCKS = {
    "plain": "",
    # 256_fund5_view/joints_*: weights 1e-4, NCE
    "mi": ("  USE_VIEW_MI_LOSS: true\n"
           "  VIEW_MI_LOSS_WEIGHT: 0.0001\n"
           "  VIEW_MI_MEASURE: NCE\n"
           "  USE_JOINTS_MI_LOSS: true\n"
           "  JOINTS_MI_LOSS_WEIGHT: 0.0001\n"
           "  JOINTS_MI_MEASURE: NCE\n"),
    # 256_fund5_local_mi_joint_*: weight 1e-3, JSD, 500 pos / ratio 20,
    # SPECIFIC=joint (lib/core/loss.py:136-561)
    "local": ("  USE_LOCAL_MI_LOSS: true\n"
              "  LOCAL_MI_LOSS_WEIGHT: 0.001\n"
              "  MI_MEASURE: JSD\n"
              "  MI_POSITIVE_NUM: 500\n"
              "  MI_NEG_POS_RATIO: 20\n"
              "  SPECIFIC: joint\n"),
    # 256_fund5_heatmap_*: weight 0.01, JSD (lib/core/loss.py:636-780);
    # its preset also raises LR_DISCRIMINATOR to 0.01
    "heatmap": ("  USE_HEATMAP_MI_LOSS: true\n"
                "  HEATMAP_MI_LOSS_WEIGHT: 0.01\n"
                "  HEATMAP_MI_MEASURE: JSD\n"),
    # 256_fund5_domain_*: weight 0.01 (lib/core/function.py:229-257)
    "domain": ("  USE_DOMAIN_TRANSFER_LOSS: true\n"
               "  DOMAIN_LOSS_WEIGHT: 0.01\n"),
}


def variant_cfg(base_cfg: str, work: str, name: str, state_dir: str,
                pseudo: str, epochs: int) -> str:
    with open(base_cfg) as f:
        text = f.read()
    text = text.replace("END_EPOCH: ", f"END_EPOCH: {epochs} # was: ")
    mi_block = VARIANT_BLOCKS[name]
    if name == "heatmap":
        text = text.replace("LR_DISCRIMINATOR: ",
                            "LR_DISCRIMINATOR: 0.01 # was: ")
        if "LR_DISCRIMINATOR" not in text:
            text = text.replace("TRAIN:\n",
                                "TRAIN:\n  LR_DISCRIMINATOR: 0.01\n", 1)
    if "LOSS:\n" in text:
        text = text.replace("LOSS:\n", "LOSS:\n" + mi_block, 1)
    else:
        text += "LOSS:\n" + mi_block
    assert "TRAIN:\n" in text and "DATASET:\n" in text, \
        "exp.yaml shape changed; update mi_drive.variant_cfg"
    # insert INTO the existing sections — a duplicate top-level yaml key
    # would silently drop the original section (last-wins)
    text = text.replace(
        "TRAIN:\n",
        "TRAIN:\n  RESUME: true\n"
        f"  RESUME_PATH: '{state_dir}'\n", 1)
    text = text.replace(
        "DATASET:\n",
        f"DATASET:\n  PSEUDO_LABEL_PATH: '{pseudo}'\n", 1)
    out = os.path.join(work, f"mi_ab_{name}.yaml")
    with open(out, "w") as f:
        f.write(text)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--variants", default="plain,mi",
                    help="comma list from: " + ",".join(VARIANT_BLOCKS))
    args = ap.parse_args()
    work = os.path.abspath(args.workdir)
    cfg_path, state_dir, pseudo = find_artifacts(work)
    print(f"warm start: {state_dir}\npseudo: {pseudo}", flush=True)

    os.chdir(work)
    results = {}
    for name in args.variants.split(","):
        vcfg = variant_cfg(cfg_path, work, name, state_dir, pseudo,
                           args.epochs)
        sys.argv = ["train", "--cfg", vcfg]
        from posetpu.cli.train import main as train_main

        print(f"==== retrain variant {name} ====", flush=True)
        train_main()
        # evaluate the variant's final model on the validation subset
        from posetpu.cli.common import build_model, load_cfg
        from posetpu.data.loader import GroupLoader
        from posetpu.data.registry import get_dataset
        from posetpu.train.checkpoint import CheckpointManager
        from posetpu.train.loop import validate
        from posetpu.train.step import make_eval_step
        from posetpu.config import get_model_name

        cfg = load_cfg(argparse.Namespace(cfg=vcfg, modelDir="", logDir="",
                                          dataDir=""))
        model_name, _ = get_model_name(cfg)
        cfg_base = os.path.splitext(os.path.basename(vcfg))[0]
        out_dir = os.path.join(cfg.OUTPUT_DIR, cfg.DATASET.TRAIN_DATASET,
                               model_name, cfg_base)
        mgr = CheckpointManager(out_dir)
        prev = mgr.restore_model("final_state")["base_model"]
        variables = {"params": prev["params"],
                     "batch_stats": prev["batch_stats"]}
        ds = get_dataset(cfg.DATASET.TEST_DATASET)(
            cfg, "validation", False, no_distortion=True)
        loader = GroupLoader(ds, cfg.TEST.BATCH_SIZE, shuffle=False,
                             drop_last=False)
        eval_model = build_model(cfg, bf16=False)
        eval_step = make_eval_step(eval_model, cfg, flip_pairs=ds.flip_pairs)
        perf, _, _, _ = validate(cfg, loader, ds, eval_step, variables,
                                 output_dir=None)
        results[name] = float(perf)
        print(f"variant {name}: validation PCKh@0.5 = {perf:.4f}", flush=True)

    base = results.get("plain")
    print("MI_DRIVE " + json.dumps({
        "epochs": args.epochs,
        "val_pckh": {k: round(v, 4) for k, v in results.items()},
        "delta_vs_plain": {k: round(v - base, 4) for k, v in results.items()
                           if k != "plain" and base is not None},
        "recipes": {k: VARIANT_BLOCKS[k].replace("  ", " ").replace(
            chr(10), ";") for k in results},
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
