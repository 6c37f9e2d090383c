"""Checkpoint conversion — reference PyTorch .pth/.pth.tar -> Orbax.

    python -m posetpu.cli.convert --cfg <yaml> --torch <ckpt.pth.tar> --out <dir>

After conversion, --state <dir> in validate/train resumes from it natively
(validate also converts torch files on the fly; this persists the result).
"""

from __future__ import annotations


def parse_args():
    from posetpu.cli.common import base_parser

    p = base_parser("Convert a reference torch checkpoint to Orbax")
    p.add_argument("--torch", required=True, help="reference .pth/.pth.tar")
    p.add_argument("--out", required=True, help="output Orbax directory")
    return p.parse_args()


def main():
    args = parse_args()
    import orbax.checkpoint as ocp

    from posetpu.cli.common import load_cfg, load_model_variables

    cfg = load_cfg(args)
    variables = load_model_variables(args.torch, drop_aggre=not cfg.NETWORK.AGGRE)
    import os

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(args.out), variables, force=True)
    ckpt.wait_until_finished()
    n = sum(x.size for x in __import__("jax").tree.leaves(variables["params"]))
    print(f"=> {args.out}: {n/1e6:.1f}M params")


if __name__ == "__main__":
    main()
