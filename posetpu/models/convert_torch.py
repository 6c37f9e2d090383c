"""PyTorch checkpoint -> Flax variables converter.

Consumes the reference's checkpoints (``resnet50-19c8e357.pth`` ImageNet
backbones, ``final_state.pth.tar`` / ``checkpoint.pth.tar`` training states,
reference: run/pose2d/train.py:250-286) and emits ``{"params", "batch_stats"}``
for :class:`posetpu.models.pose_resnet.PoseResNet` /
:class:`posetpu.models.multiview.MultiViewPose`.

Layout mapping (the classic silent-transpose traps, handled once here):

* Conv2d weight   [O, I, kh, kw] -> HWIO [kh, kw, I, O]
* ConvTranspose2d [I, O, kh, kw] -> spatially flipped HWIO [kh, kw, I, O]
  (our ConvTranspose module runs an input-dilated *correlation*, so the flip
  bakes torch's transposed-conv semantics into the stored kernel)
* Linear weight   [O, I] -> [I, O]
* BatchNorm weight/bias -> scale/bias; running stats -> batch_stats
* ChannelWiseFC   [S, S] kept as-is (both sides right-multiply), 12 modules
  stacked into the [12, S, S] aggregation bank
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state(path: str) -> dict:
    """Load a .pth/.pth.tar file to a flat numpy state dict; unwraps the
    reference's checkpoint envelope and DDP 'module.' prefixes."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict_base_model" in obj:
        obj = obj["state_dict_base_model"]
    elif isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    state = {}
    for k, v in obj.items():
        k = k.removeprefix("module.")
        state[k] = _np(v)
    return state


def _set(tree: dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_BN_MAP = {"weight": "scale", "bias": "bias"}
_BN_STATS = {"running_mean": "mean", "running_var": "var"}


def convert_pose_resnet(state: Mapping[str, np.ndarray], strict: bool = False):
    """Convert a (possibly partial) torch PoseResNet state dict.

    Returns ``{"params": ..., "batch_stats": ...}`` nested dicts matching the
    Flax module names, plus the list of unconsumed torch keys.
    """
    params: dict = {}
    stats: dict = {}
    unused: list[str] = []

    for key, val in state.items():
        parts = key.split(".")
        consumed = _convert_one(parts, val, params, stats)
        if not consumed:
            unused.append(key)
    if strict and unused:
        raise ValueError(f"unconsumed torch keys: {unused[:10]} (+{len(unused)-10 if len(unused)>10 else 0})")
    return {"params": params, "batch_stats": stats}, unused


def _convert_one(parts, val, params, stats) -> bool:
    # stem
    if parts[0] == "conv1" and parts[1] == "weight":
        _set(params, ("conv1", "kernel"), val.transpose(2, 3, 1, 0))
        return True
    if parts[0] == "bn1":
        return _convert_bn(("bn1",), parts[1], val, params, stats)

    # residual stages: layer{s}.{b}.<leaf>
    m = re.fullmatch(r"layer(\d)", parts[0])
    if m:
        block = f"layer{m.group(1)}_{parts[1]}"
        rest = parts[2:]
        if rest[0].startswith("conv") and rest[1] == "weight":
            _set(params, (block, rest[0], "kernel"), val.transpose(2, 3, 1, 0))
            return True
        if rest[0].startswith("bn"):
            return _convert_bn((block, rest[0]), rest[1], val, params, stats)
        if rest[0] == "downsample":
            if rest[1] == "0" and rest[2] == "weight":
                _set(params, (block, "downsample_conv", "kernel"), val.transpose(2, 3, 1, 0))
                return True
            if rest[1] == "1":
                return _convert_bn((block, "downsample_bn"), rest[2], val, params, stats)
        return False

    # deconv head: Sequential indices 0,3,6 = deconv, 1,4,7 = BN
    if parts[0] == "deconv_layers":
        idx = int(parts[1])
        stage, role = divmod(idx, 3)
        if role == 0:
            name = f"deconv{stage}_conv"
            if parts[2] == "weight":
                flipped = val[:, :, ::-1, ::-1]  # [I, O, kh, kw]
                _set(params, (name, "kernel"), flipped.transpose(2, 3, 0, 1).copy())
                return True
            if parts[2] == "bias":
                _set(params, (name, "bias"), val)
                return True
        if role == 1:
            return _convert_bn((f"deconv{stage}_bn",), parts[2], val, params, stats)
        return False

    if parts[0] == "final_layer":
        if parts[1] == "weight":
            _set(params, ("final_layer", "kernel"), val.transpose(2, 3, 1, 0))
            return True
        if parts[1] == "bias":
            _set(params, ("final_layer", "bias"), val)
            return True

    # torchvision-style ImageNet extras we deliberately drop
    if parts[0] in ("fc",) or parts[-1] == "num_batches_tracked":
        return True
    return False


def _convert_bn(flax_path, leaf, val, params, stats) -> bool:
    if leaf in _BN_MAP:
        _set(params, flax_path + (_BN_MAP[leaf],), val)
        return True
    if leaf in _BN_STATS:
        _set(stats, flax_path + (_BN_STATS[leaf],), val)
        return True
    if leaf == "num_batches_tracked":
        return True
    return False


def convert_multiview(state: Mapping[str, np.ndarray], drop_aggre: bool = False):
    """Convert a MultiViewPose checkpoint: 'resnet.*' keys through
    :func:`convert_pose_resnet`, 'aggre_layer.aggre.{i}.weight' stacked into
    the [12, S, S] bank (pruned when ``drop_aggre``, mirroring the reference's
    AGGRE=false resume pruning, train.py:262-275)."""
    resnet_state = {
        k.removeprefix("resnet."): v for k, v in state.items() if k.startswith("resnet.")
    }
    variables, unused = convert_pose_resnet(resnet_state)
    params = {"resnet": variables["params"]}
    stats = {"resnet": variables["batch_stats"]}

    fc = {}
    for k, v in state.items():
        m = re.fullmatch(r"aggre_layer\.aggre\.(\d+)\.weight", k)
        if m and not drop_aggre:
            fc[int(m.group(1))] = v
        elif not k.startswith("resnet.") and not m:
            unused.append(k)
    if fc:
        bank = np.stack([fc[i] for i in range(len(fc))])
        params["aggre_layer"] = {"weight": bank}
    return {"params": params, "batch_stats": stats}, unused


def to_jax(variables):
    """numpy tree -> jnp tree (float32)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), variables)
