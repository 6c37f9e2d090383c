"""int8 serving-side evaluation step.

Runs the PTQ int8 trunk (posetpu/models/quant.py) inside the same eval
contract as make_eval_step: multi-view batches, optional aggregation fusion
(kept bf16 — it's one einsum over float-trained weights), fuse routing,
in-graph flip test, decode to source-image coordinates. Lets
``posetpu.cli.validate --int8`` serve reference checkpoints quantized.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from posetpu.core.inference import final_preds, flip_test_merge, fuse_routing


def make_quant_eval_step(qfwd, cfg, flip_pairs=None,
                         has_aggre: bool = False) -> Callable:
    """qfwd from quantize_pose_resnet. The returned
    ``eval_step(qvars, batch)`` takes ``qvars = {"q": qparams, "bank":
    aggre_bank_or_None}`` as a TRACED argument — closing device arrays over
    the jit would embed them as compile-time constants (the [12, S, S]
    aggregation bank alone is 400 MB at S=4096, and constant-folding it
    stalled compilation for >20 min)."""
    is_aggre = has_aggre
    fuse_output = bool(cfg.TEST.FUSE_OUTPUT)
    flip_test = bool(cfg.TEST.FLIP_TEST)
    shift = bool(cfg.TEST.SHIFT_HEATMAP)
    post = bool(cfg.TEST.POST_PROCESS)
    pairs = tuple(tuple(p) for p in (flip_pairs or ()))
    aggre = None
    if has_aggre:
        from posetpu.models.multiview import Aggregation

        aggre = Aggregation(heatmap_size=int(cfg.NETWORK.HEATMAP_SIZE[0]),
                            dtype=jnp.bfloat16)

    def trunk(qparams, x):
        n, v = x.shape[0], x.shape[1]
        hm = qfwd(qparams, x.reshape((n * v,) + x.shape[2:]))
        return hm.reshape((n, v) + hm.shape[1:])

    @jax.jit
    def eval_step(qvars, batch):
        qparams = qvars["q"]
        is_h36m = batch["is_h36m"]

        def aggre_apply(hm):
            return aggre.apply({"params": {"weight": qvars["bank"]}}, hm)

        if flip_test:
            x = jnp.concatenate(
                [batch["images"], jnp.flip(batch["images"], axis=-2)], axis=0
            )
            raw2 = trunk(qparams, x)
            m2 = jnp.concatenate([is_h36m, is_h36m], axis=0)
            fused2 = aggre_apply(raw2) if is_aggre else None
            out2 = (
                fuse_routing(raw2, fused2, m2) if (is_aggre and fuse_output) else raw2
            )
            n = batch["images"].shape[0]
            output = flip_test_merge(out2[:n], out2[n:], pairs, shift=shift)
        else:
            raw = trunk(qparams, batch["images"])
            fused = aggre_apply(raw) if is_aggre else None
            output = (
                fuse_routing(raw, fused, is_h36m)
                if (is_aggre and fuse_output)
                else raw
            )

        preds, maxvals = final_preds(
            output, batch["center"], batch["scale"], post_process=post
        )
        return {
            "loss": jnp.float32(0.0),  # serving path: no training losses
            "acc": jnp.float32(0.0),
            "preds": preds,
            "maxvals": maxvals,
            "heatmaps": output,
        }

    return eval_step


def build_quant_from_variables(cfg, variables, calib_batches,
                               qat_batches=None, qat_lr: float = 3e-6,
                               subpixel_deconvs=False, act4=()):
    """Quantize a MultiViewPose variables tree's resnet trunk; returns
    (qparams, qfwd, aggre_bank or None). Pass ``{"q": qparams, "bank":
    aggre_bank}`` as the eval step's variables argument.

    ``qat_batches``: optional [N, H, W, 3] image batches — when given, the
    folded weights are distillation-QAT fine-tuned (posetpu/train/qat.py)
    before int8 conversion instead of plain PTQ.

    ``subpixel_deconvs``: bool or set of deconv names to quantize in the
    per-phase subpixel form (finer per-phase weight scales; the bench's
    adopted serving config uses {"deconv0"}). PTQ only.

    ``act4``: boundary names stored as native int4 in HBM (s4 mode,
    tools/ab_act4.py receipts). PTQ only."""
    from posetpu.models import get_pose_net
    from posetpu.models.quant import quantize_pose_resnet

    resnet = get_pose_net(cfg, dtype=jnp.float32)
    res_vars = {
        "params": variables["params"]["resnet"],
        "batch_stats": variables["batch_stats"]["resnet"],
    }
    if qat_batches:
        from posetpu.train.qat import quantize_pose_resnet_qat

        assert not subpixel_deconvs, "subpixel_deconvs is PTQ-only"
        qparams, qfwd, _ = quantize_pose_resnet_qat(
            resnet, res_vars, calib_batches, qat_batches, lr=qat_lr
        )
    else:
        qparams, qfwd = quantize_pose_resnet(
            resnet, res_vars, calib_batches,
            subpixel_deconvs=subpixel_deconvs,
            act4=act4, act4_mode="s4",
        )

    bank = None
    if cfg.NETWORK.AGGRE and "aggre_layer" in variables["params"]:
        bank = variables["params"]["aggre_layer"]["weight"]
    return qparams, qfwd, bank
