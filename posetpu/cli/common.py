"""Shared CLI plumbing: config/arg parsing, model/state construction,
checkpoint restore from either Orbax or reference torch files."""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from posetpu.config import load_config, update_dir


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cfg", required=True, help="experiment YAML")
    p.add_argument("--modelDir", default="", help="model directory")
    p.add_argument("--logDir", default="", help="log directory")
    p.add_argument("--dataDir", default="", help="data directory")
    return p


def load_cfg(args, **overrides):
    cfg = load_config(args.cfg, **overrides)
    update_dir(cfg, args.modelDir, args.logDir, args.dataDir)
    return cfg


def build_model(cfg, bf16: bool = True):
    from posetpu.models import MultiViewPose, get_pose_net

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    return MultiViewPose(
        resnet=get_pose_net(cfg, dtype=dtype), aggre=bool(cfg.NETWORK.AGGRE),
        dtype=dtype,
    )


def load_model_variables(path: str, drop_aggre: bool = False):
    """Load model variables from a reference torch checkpoint (.pth/.pth.tar)
    or an Orbax directory."""
    import os

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        payload = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        if "params" in payload:
            return payload
        state = payload.get("base_model", payload)
        return {"params": state["params"], "batch_stats": state["batch_stats"]}

    from posetpu.models.convert_torch import convert_multiview, load_torch_state, to_jax

    state = load_torch_state(path)
    if not any(k.startswith("resnet.") for k in state):
        # bare PoseResNet checkpoint: nest it
        state = {f"resnet.{k}": v for k, v in state.items()}
    variables, unused = convert_multiview(state, drop_aggre=drop_aggre)
    if unused:
        print(f"warning: {len(unused)} unconverted torch keys, e.g. {unused[:5]}")
    return to_jax(variables)
