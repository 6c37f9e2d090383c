"""Self-training pipeline driver — the train.sh:86-109 loop as a Python
orchestrator.

Each iteration: (1) train on MPII [+ current pseudo labels], (2) run
inference over the unlabeled H36M training set and dump the heatmap H5,
(3) mint pseudo labels (threshold + RANSAC + optional reprojection),
(4) feed them to the next iteration's mixed training. ``--repeats`` controls
the loop count; ``--fund`` adds the epipolar loss from iteration 2 on, like
the reference's ``-f`` flag.
"""

from __future__ import annotations

import os


def parse_args():
    from posetpu.cli.common import base_parser

    p = base_parser("Self-training loop driver")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--ransac", action="store_true")
    p.add_argument("--inliers", type=int, default=3)
    p.add_argument("--reproj-thre", type=float, default=10.0)
    p.add_argument("--confidence-thre", type=float, default=0.7)
    p.add_argument("--use-reproj", action="store_true")
    p.add_argument("--fund", action="store_true", help="epipolar loss from iter 2")
    p.add_argument("--no-distortion", action="store_true")
    p.add_argument("--epochs", type=int, default=0)
    return p.parse_args()


def run_pipeline(cfg, args, train_fn=None, validate_fn=None, mint_fn=None, log=print):
    """One full self-training run. The stage functions are injectable for
    testing; the defaults call the real CLI mains in-process."""
    from posetpu.config import clone

    pseudo_path = ""
    for it in range(args.repeats):
        log(f"==== pipeline iteration {it} ====")
        it_cfg = clone(cfg)
        if args.fund and it >= 1:
            it_cfg.LOSS.USE_FUNDAMENTAL_LOSS = True
        state_path = train_fn(it_cfg, pseudo_path, it)
        heatmap_path = validate_fn(it_cfg, state_path, it)
        pseudo_path = mint_fn(it_cfg, heatmap_path, it)
        log(f"iteration {it}: pseudo labels at {pseudo_path}")
    return pseudo_path
