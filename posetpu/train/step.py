"""jit-compiled train and eval steps.

The reference's inner loop (lib/core/function.py:148-367) interleaves Python
per-view loops, host-side metric decoding and `.item()` syncs; here one jitted
function consumes the whole ``[N, V, ...]`` batch and returns scalars. Under a
``data`` mesh the batch is sharded on axis 0 and jit inserts the gradient
all-reduce — the DDP backward (train.py:223, implicit NCCL) becomes XLA
collectives over ICI.

Deliberate divergence: BatchNorm statistics are computed over the *global*
batch (sync-BN) rather than per-device as torch DDP does — with pjit's
global-view semantics this is the natural lowering, and it is quality-neutral
or better; documented here rather than replicated.

The supervised objective implements the reference's *intended* loss — MSE on
raw heatmaps plus MSE on the fused output — not the literal accumulator bug
at function.py:184-188 that double-adds the raw term when aggregation is on.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from posetpu.core.evaluate import pck_accuracy
from posetpu.core.inference import final_preds, flip_test_merge, fuse_routing
from posetpu.core.losses import (
    consistency_loss,
    fundamental_loss,
    joints_mse_loss,
)
from posetpu.ops.affine import get_affine_transform, affine_transform_points
from posetpu.ops.heatmap import soft_argmax_2d
from posetpu.train.state import TrainState


def _integral_joints_image_coords(output, center, scale, heatmap_size):
    """Soft-argmax in heatmap coords -> source-image coords
    (generate_integral_preds_2d_th + transform_back_th,
    lib/utils/transforms.py:149-198). output: [N, V, h, w, J]."""
    hm = jnp.moveaxis(output, -1, 2)  # [N, V, J, h, w]
    coords = soft_argmax_2d(hm)  # [N, V, J, 2]
    inv = get_affine_transform(center, scale, 0.0, heatmap_size, inv=True)
    return affine_transform_points(coords, inv)


def make_train_step(model, cfg, tx) -> Callable:
    """Build the jitted supervised train step (MSE + consistency +
    fundamental — the deterministic loss set; adversarial MI losses train via
    the separate GAN steps in posetpu/train/gan.py)."""
    is_aggre = bool(cfg.NETWORK.AGGRE)
    fuse_output = bool(cfg.TEST.FUSE_OUTPUT)
    use_consistent = bool(cfg.LOSS.USE_CONSISTENT_LOSS)
    use_fund = bool(cfg.LOSS.USE_FUNDAMENTAL_LOSS)
    use_tw = bool(cfg.LOSS.USE_TARGET_WEIGHT)
    use_tw_fund = bool(cfg.LOSS.USE_TARGET_WEIGHT_FUND)
    watch_grad = bool(cfg.LOSS.WATCH_GRAD_NORM)
    mse_w = float(cfg.LOSS.MSE_LOSS_WEIGHT)
    cons_w = float(cfg.LOSS.CONSISTENT_LOSS_WEIGHT)
    fund_w = float(cfg.LOSS.FUNDAMENTAL_LOSS_WEIGHT)
    hm_size = (int(cfg.NETWORK.HEATMAP_SIZE[0]), int(cfg.NETWORK.HEATMAP_SIZE[1]))

    def loss_fn(params, batch_stats, batch):
        (raw, fused, low, high), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"],
            train=True,
            mutable=["batch_stats"],
        )
        is_h36m = batch["is_h36m"]
        output = (
            fuse_routing(raw, fused, is_h36m) if (is_aggre and fuse_output) else raw
        )
        nviews = raw.shape[1]
        tw = batch["weight"] if use_tw else None

        # supervised MSE: per-view sum == V * all-view mean (function.py:176-188)
        mse = joints_mse_loss(raw, batch["target"], tw) * nviews * mse_w
        if is_aggre:
            mse = mse + joints_mse_loss(output, batch["target"], tw) * nviews * mse_w
        loss = mse
        metrics = {"mse_loss": mse}

        if is_aggre and use_consistent:
            cons = consistency_loss(raw, fused, is_h36m) * cons_w
            loss = loss + cons
            metrics["consistent_loss"] = cons

        if use_fund:
            joints2d = _integral_joints_image_coords(
                output, batch["center"], batch["scale"], hm_size
            )
            fl = fundamental_loss(
                joints2d,
                batch["weight"],
                batch["fmats"],
                sample_mask=is_h36m,
                use_target_weight=use_tw_fund,
            )
            # reference normalises by the h36m-subset size (loss.py:132);
            # rescale from the full-batch mean
            n = joints2d.shape[0]
            n_h36m = jnp.maximum(jnp.sum(is_h36m), 1.0)
            fl = fl * (n / n_h36m) * fund_w
            loss = loss + fl
            metrics["fund_loss"] = fl

        metrics["loss"] = loss
        return loss, (mut["batch_stats"], output, raw, metrics)

    def grad_norm_probe(params, raw, batch):
        """Per-loss grad norms w.r.t. the raw heatmaps (the reference's
        WATCH_GRAD_NORM hook, function.py:352-362) — recomputes the cheap
        downstream-of-the-backbone graph (aggregation einsum + losses) per
        term; the backbone forward is NOT re-run."""
        from posetpu.models.multiview import Aggregation
        from posetpu.utils.gradients import grad_norms_wrt_heatmaps

        tw = batch["weight"] if use_tw else None
        is_h36m = batch["is_h36m"]
        nviews = raw.shape[1]

        def downstream(r):
            fused = None
            if is_aggre:
                fused = Aggregation(heatmap_size=r.shape[2]).apply(
                    {"params": params["aggre_layer"]}, r
                )
            out = (
                fuse_routing(r, fused, is_h36m)
                if (is_aggre and fuse_output)
                else r
            )
            return fused, out

        def mse_term(r):
            _, out = downstream(r)
            m = joints_mse_loss(r, batch["target"], tw) * nviews * mse_w
            if is_aggre:
                m = m + joints_mse_loss(out, batch["target"], tw) * nviews * mse_w
            return m

        terms = {"mse": mse_term}
        if is_aggre and use_consistent:
            def cons_term(r):
                fused, _ = downstream(r)
                return consistency_loss(r, fused, is_h36m) * cons_w

            terms["consistent"] = cons_term
        if use_fund:
            def fund_term(r):
                _, out = downstream(r)
                j2d = _integral_joints_image_coords(
                    out, batch["center"], batch["scale"], hm_size
                )
                fl = fundamental_loss(
                    j2d, batch["weight"], batch["fmats"],
                    sample_mask=is_h36m, use_target_weight=use_tw_fund,
                )
                n_h36m = jnp.maximum(jnp.sum(is_h36m), 1.0)
                return fl * (j2d.shape[0] / n_h36m) * fund_w

            terms["fund"] = fund_term
        return grad_norms_wrt_heatmaps(terms, raw)

    @jax.jit
    def train_step(state: TrainState, batch):
        # accuracy is computed on the (fused) output, like the reference
        # (function.py:463-466)
        grads, (new_stats, raw, raw_hm, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        if watch_grad:
            for k, v in grad_norm_probe(state.params, raw_hm, batch).items():
                metrics[f"grad_norm_{k}"] = v
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        n, v = raw.shape[0], raw.shape[1]
        hm_pred = jnp.moveaxis(raw, -1, 2).reshape(n * v, raw.shape[-1], *raw.shape[2:4])
        hm_gt = jnp.moveaxis(batch["target"], -1, 2).reshape(
            n * v, raw.shape[-1], *raw.shape[2:4]
        )
        _, acc, _, _ = pck_accuracy(hm_pred, hm_gt)
        metrics["acc"] = acc

        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            metrics,
        )

    return train_step


def make_eval_step(model, cfg, flip_pairs=None, mesh=None) -> Callable:
    """Build the jitted eval step: forward (+ optional in-graph flip test),
    fuse, losses, accuracy, decode to source-image coords — the device-side
    body of validate() (function.py:557-644).

    With ``mesh`` given the outputs are gathered replicated over the mesh
    (one XLA all-gather over ICI), so every process can fetch the full
    preds/heatmaps for host accumulation — the TPU-native replacement for
    the reference's rank-0 numpy accumulation (function.py:642-644)."""
    is_aggre = bool(cfg.NETWORK.AGGRE)
    fuse_output = bool(cfg.TEST.FUSE_OUTPUT)
    flip_test = bool(cfg.TEST.FLIP_TEST)
    shift = bool(cfg.TEST.SHIFT_HEATMAP)
    post = bool(cfg.TEST.POST_PROCESS)
    use_tw = bool(cfg.LOSS.USE_TARGET_WEIGHT)
    use_consistent = bool(cfg.LOSS.USE_CONSISTENT_LOSS)
    pseudo_mse = bool(cfg.DATASET.PSEUDO_LABEL_PATH)
    mse_w = float(cfg.LOSS.MSE_LOSS_WEIGHT)
    pairs = tuple(tuple(p) for p in (flip_pairs or ()))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        jit_kwargs = {"out_shardings": NamedSharding(mesh, PartitionSpec())}
    else:
        jit_kwargs = {}

    @partial(jax.jit, **jit_kwargs)
    def eval_step(variables, batch):
        is_h36m = batch["is_h36m"]
        if flip_test:
            # fold the flipped copies into the batch: one forward at 2N
            # groups instead of two at N (keeps the MXU tiles full at small
            # eval batch sizes; the reference runs a second forward,
            # function.py:570-571)
            x = jnp.concatenate(
                [batch["images"], jnp.flip(batch["images"], axis=-2)], axis=0
            )
            raw2, fused2, _, _ = model.apply(variables, x, train=False)
            n = batch["images"].shape[0]
            m2 = jnp.concatenate([is_h36m, is_h36m], axis=0)
            out2 = (
                fuse_routing(raw2, fused2, m2) if (is_aggre and fuse_output) else raw2
            )
            raw = raw2[:n]
            fused = fused2[:n] if fused2 is not None else None
            output = flip_test_merge(out2[:n], out2[n:], pairs, shift=shift)
        else:
            raw, fused, _, _ = model.apply(variables, batch["images"], train=False)
            output = (
                fuse_routing(raw, fused, is_h36m)
                if (is_aggre and fuse_output)
                else raw
            )

        tw = batch["weight"] if use_tw else None
        loss = joints_mse_loss(raw, batch["target"], tw) * raw.shape[1]
        # validate()'s optional extra loss terms (function.py:596-609)
        if is_aggre and use_consistent and fused is not None:
            loss = loss + consistency_loss(raw, fused, is_h36m)
        if is_aggre and pseudo_mse:
            loss = loss + joints_mse_loss(output, batch["target"], tw)                 * raw.shape[1] * mse_w

        n, v = raw.shape[0], raw.shape[1]
        hm_pred = jnp.moveaxis(output, -1, 2).reshape(
            n * v, output.shape[-1], *output.shape[2:4]
        )
        hm_gt = jnp.moveaxis(batch["target"], -1, 2).reshape(
            n * v, output.shape[-1], *output.shape[2:4]
        )
        _, acc, _, _ = pck_accuracy(hm_pred, hm_gt)

        preds, maxvals = final_preds(
            output, batch["center"], batch["scale"], post_process=post
        )
        return {
            "loss": loss,
            "acc": acc,
            "preds": preds,  # [N, V, J, 2] source-image coords
            "maxvals": maxvals,  # [N, V, J]
            "heatmaps": output,  # [N, V, h, w, J]
        }

    return eval_step


def init_train_state(model, cfg, tx, sample_batch, seed: int = 0) -> TrainState:
    """Initialise params/stats/optimizer for a model."""
    variables = model.init(
        jax.random.PRNGKey(seed), sample_batch["images"][:1], train=False
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return TrainState(params, stats, tx.init(params), 0)
