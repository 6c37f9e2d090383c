"""Adversarial train step: discriminator updates + generator update in one
jitted program.

Mirrors the reference's inner-loop choreography (lib/core/function.py:
191-367): per batch, the enabled discriminators first update on
stop-gradient features; then the base model updates on the supervised losses
plus the generator-side adversarial terms, scored by the *just-updated*
discriminators. The heatmap/view/joints MI losses alternate by epoch parity
(D on even epochs, G on odd — function.py:263, 317, 336); parity is a static
argument so each phase compiles once.

Deliberate divergences (documented, not silent):
* the reference computes view/joints/fundamental losses on the
  dynamically-selected h36m sub-batch (select_out_h36m, function.py:283-288);
  here they run over the full fixed-shape batch scaled by the h36m fraction —
  jit-safe, expectation-equivalent for shuffled mixed batches;
* its local-MI call passes the deconv features twice (function.py:194, 220),
  which makes the 'org'/'one_image' extraction paths unreachable (they assert
  on 64x64 inputs); the same wiring is used here, so SPECIFIC='joint' is the
  operative variant, exactly as in the reference's runnable configs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from posetpu.core.evaluate import pck_accuracy
from posetpu.core.inference import fuse_routing
from posetpu.core.losses import consistency_loss, fundamental_loss, joints_mse_loss
from posetpu.core.mi import (
    domain_d_loss,
    domain_g_loss,
    heatmap_mi_loss,
    joints_mi_loss,
    local_mi_loss,
    view_mi_loss,
)
from posetpu.train.state import TrainState
from posetpu.train.step import _integral_joints_image_coords


def _disc_apply(model, state: TrainState, train: bool = True):
    """Bind a discriminator module + state into a callable that also threads
    BN mutation; the returned mutated stats are ignored for the D losses on
    the G side (matching torch, where D stays in train mode throughout)."""

    def apply(*xs):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *xs,
            train=train,
            mutable=["batch_stats"] if train else [],
        )
        return out[0] if train else out

    return apply


def make_adversarial_train_step(model, disc_models: dict, cfg, tx_base,
                                tx_disc: dict) -> Callable:
    """Returns step(states, batch, key, epoch_parity) -> (states, metrics).

    ``states``: {'base_model': TrainState, '<disc name>': TrainState, ...};
    ``batch`` additionally carries 'joints_crop' [N, V, J, 2] and
    'joints_vis' [N, V, J] for the MI samplers.
    """
    is_aggre = bool(cfg.NETWORK.AGGRE)
    fuse_output = bool(cfg.TEST.FUSE_OUTPUT)
    use_tw = bool(cfg.LOSS.USE_TARGET_WEIGHT)
    hm_size = (int(cfg.NETWORK.HEATMAP_SIZE[0]), int(cfg.NETWORK.HEATMAP_SIZE[1]))
    use = {
        "local": bool(cfg.LOSS.USE_LOCAL_MI_LOSS),
        "domain": bool(cfg.LOSS.USE_DOMAIN_TRANSFER_LOSS),
        "heatmap": bool(cfg.LOSS.USE_HEATMAP_MI_LOSS),
        "view": bool(cfg.LOSS.USE_VIEW_MI_LOSS),
        "joints": bool(cfg.LOSS.USE_JOINTS_MI_LOSS),
        "fund": bool(cfg.LOSS.USE_FUNDAMENTAL_LOSS),
        "consistent": bool(cfg.LOSS.USE_CONSISTENT_LOSS),
    }
    w = {
        "mse": float(cfg.LOSS.MSE_LOSS_WEIGHT),
        "local": float(cfg.LOSS.LOCAL_MI_LOSS_WEIGHT),
        "domain": float(cfg.LOSS.DOMAIN_LOSS_WEIGHT),
        "heatmap": float(cfg.LOSS.HEATMAP_MI_LOSS_WEIGHT),
        "view": float(cfg.LOSS.VIEW_MI_LOSS_WEIGHT),
        "joints": float(cfg.LOSS.JOINTS_MI_LOSS_WEIGHT),
        "fund": float(cfg.LOSS.FUNDAMENTAL_LOSS_WEIGHT),
        "consistent": float(cfg.LOSS.CONSISTENT_LOSS_WEIGHT),
    }
    joint_idx = int(cfg.HEATMAP_DISCRIMINATOR.JOINT_IDX)
    view1_num = int(cfg.VIEW_DISCRIMINATOR.VIEW_ONE_NUM)
    var1_idx = tuple(int(i) for i in cfg.JOINTS_DISCRIMINATOR.VAR_ONE_IDX)
    view_measure = cfg.LOSS.VIEW_MI_MEASURE
    joints_measure = cfg.LOSS.JOINTS_MI_MEASURE

    def joints2d_of(output, batch):
        return _integral_joints_image_coords(
            output, batch["center"], batch["scale"], hm_size
        )

    def h36m_frac(batch):
        return jnp.mean(batch["is_h36m"])

    # ------------------------------------------------------------- D side

    def d_losses(d_params_stats: dict, feats, batch, key, parity: int):
        """Total discriminator loss over stop-gradient features; returns
        (loss, metrics). d_params_stats: {name: (params, stats)};
        feats: the shared (raw, fused, low, high) from the single base
        forward."""
        raw, fused, low, high = map(jax.lax.stop_gradient, feats)
        output = (
            fuse_routing(raw, fused, batch["is_h36m"])
            if (is_aggre and fuse_output)
            else raw
        )
        n, v = low.shape[0], low.shape[1]
        keys = jax.random.split(key, 8)
        total = 0.0
        metrics = {}

        def mk(name):
            p, s = d_params_stats[name]
            return _disc_apply(disc_models[name], TrainState(p, s, None, 0))

        if use["local"]:
            d = mk("local_discriminator")
            l = 0.0
            for view in range(v):
                l = l + local_mi_loss(
                    jax.random.fold_in(keys[0], view), d,
                    high[:, view], high[:, view],
                    batch["joints_crop"][:, view], batch["joints_vis"][:, view],
                    cfg,
                )
            total = total + l * w["local"]
            metrics["local_mi_d"] = l * w["local"]

        if use["domain"]:
            d = mk("domain_discriminator")
            dl, dacc = domain_d_loss(d, low, 1.0 - batch["is_h36m"])
            total = total + dl
            metrics["domain_d"] = dl
            metrics["domain_acc_d"] = dacc

        if use["heatmap"] and parity == 0:
            d = mk("heatmap_discriminator")
            hl = 0.0
            for view in range(v):
                hl = hl + heatmap_mi_loss(
                    jax.random.fold_in(keys[1], view), d,
                    low[:, view], output[:, view],
                    batch["joints_crop"][:, view], batch["joints_vis"][:, view],
                    cfg, joint_idx,
                )
            total = total + hl
            metrics["hmi_d"] = hl

        if (use["view"] or use["joints"]) and parity == 0:
            j2d = jax.lax.stop_gradient(joints2d_of(output, batch))
            frac = h36m_frac(batch)
            if use["view"]:
                d = mk("view_discriminator")
                vl = view_mi_loss(d, j2d, view1_num, view_measure) * frac
                total = total + vl
                metrics["vmi_d"] = vl
            if use["joints"]:
                d = mk("joints_discriminator")
                jl = 0.0
                for view in range(v):
                    jl = jl + joints_mi_loss(
                        d, j2d[:, view], var1_idx, joints_measure
                    )
                jl = jl * frac
                total = total + jl
                metrics["jmi_d"] = jl

        return total, metrics

    # ------------------------------------------------------------- G side

    def g_loss(feats, d_states: dict, batch, key, parity: int):
        raw, fused, low, high = feats
        output = (
            fuse_routing(raw, fused, batch["is_h36m"])
            if (is_aggre and fuse_output)
            else raw
        )
        nviews = raw.shape[1]
        tw = batch["weight"] if use_tw else None
        keys = jax.random.split(key, 8)
        metrics = {}

        mse = joints_mse_loss(raw, batch["target"], tw) * nviews * w["mse"]
        if is_aggre:
            mse = mse + joints_mse_loss(output, batch["target"], tw) * nviews * w["mse"]
        loss = mse
        metrics["mse_loss"] = mse

        def mk(name):
            st = d_states[name]
            # D params are constants on the G side (stop grads through them)
            return _disc_apply(
                disc_models[name],
                TrainState(
                    jax.lax.stop_gradient(st.params), st.batch_stats, None, 0
                ),
            )

        if use["consistent"] and is_aggre:
            cl = consistency_loss(raw, fused, batch["is_h36m"]) * w["consistent"]
            loss = loss + cl
            metrics["consistent_loss"] = cl

        if use["local"]:
            d = mk("local_discriminator")
            l = 0.0
            for view in range(raw.shape[1]):
                l = l + local_mi_loss(
                    jax.random.fold_in(keys[0], view), d,
                    high[:, view], high[:, view],
                    batch["joints_crop"][:, view], batch["joints_vis"][:, view],
                    cfg,
                )
            loss = loss + l * w["local"]
            metrics["local_mi_g"] = l * w["local"]

        if use["domain"]:
            d = mk("domain_discriminator")
            gl = domain_g_loss(d, low, 1.0 - batch["is_h36m"]) * w["domain"]
            loss = loss + gl
            metrics["domain_g"] = gl

        if use["heatmap"] and parity == 1:
            d = mk("heatmap_discriminator")
            hl = 0.0
            for view in range(raw.shape[1]):
                hl = hl + heatmap_mi_loss(
                    jax.random.fold_in(keys[1], view), d,
                    low[:, view], output[:, view],
                    batch["joints_crop"][:, view], batch["joints_vis"][:, view],
                    cfg, joint_idx,
                ) * w["heatmap"]
            loss = loss + hl
            metrics["hmi_g"] = hl

        if use["view"] or use["joints"] or use["fund"]:
            j2d = joints2d_of(output, batch)
            frac = h36m_frac(batch)
            if use["fund"]:
                fl = fundamental_loss(
                    j2d, batch["weight"], batch["fmats"],
                    sample_mask=batch["is_h36m"],
                )
                n = j2d.shape[0]
                fl = fl * (n / jnp.maximum(jnp.sum(batch["is_h36m"]), 1.0)) * w["fund"]
                loss = loss + fl
                metrics["fund_loss"] = fl
            if use["view"] and parity == 1:
                d = mk("view_discriminator")
                vl = view_mi_loss(d, j2d, view1_num, view_measure) * frac * w["view"]
                loss = loss + vl
                metrics["vmi_g"] = vl
            if use["joints"] and parity == 1:
                d = mk("joints_discriminator")
                jl = 0.0
                for view in range(raw.shape[1]):
                    jl = jl + joints_mi_loss(
                        d, j2d[:, view], var1_idx, joints_measure
                    )
                jl = jl * frac * w["joints"]
                loss = loss + jl
                metrics["jmi_g"] = jl

        metrics["loss"] = loss
        return loss, (output, metrics)

    # ----------------------------------------------------- grad-norm probe

    watch_grad = bool(cfg.LOSS.WATCH_GRAD_NORM)

    def g_grad_norm_probe(feats, d_states, batch, key, parity: int):
        """Per-loss grad norms w.r.t. raw heatmaps for the generator-side
        terms (the reference's WATCH_GRAD_NORM dict: mse/fund + parity-gated
        MI g terms, function.py:352-362). Divergence: fused heatmaps are held
        fixed, so gradients reach raw through fuse_routing's direct blend but
        not back through the aggregation einsum — cheap and close enough for
        a relative-magnitude diagnostic."""
        from posetpu.utils.gradients import grad_norms_wrt_heatmaps

        raw0, fused0, low0, _ = feats
        tw = batch["weight"] if use_tw else None
        keys = jax.random.split(key, 8)
        frac = h36m_frac(batch)
        nviews = raw0.shape[1]

        def mk(name):
            st = d_states[name]
            return _disc_apply(
                disc_models[name],
                TrainState(
                    jax.lax.stop_gradient(st.params), st.batch_stats, None, 0
                ),
            )

        def out_of(r):
            return (
                fuse_routing(r, fused0, batch["is_h36m"])
                if (is_aggre and fuse_output)
                else r
            )

        def mse_term(r):
            m = joints_mse_loss(r, batch["target"], tw) * nviews * w["mse"]
            if is_aggre:
                m = m + joints_mse_loss(out_of(r), batch["target"], tw) * nviews * w["mse"]
            return m

        terms = {"mse": mse_term}
        if use["fund"]:
            def fund_term(r):
                j2d = joints2d_of(out_of(r), batch)
                fl = fundamental_loss(
                    j2d, batch["weight"], batch["fmats"],
                    sample_mask=batch["is_h36m"],
                )
                n_h36m = jnp.maximum(jnp.sum(batch["is_h36m"]), 1.0)
                return fl * (j2d.shape[0] / n_h36m) * w["fund"]

            terms["fund"] = fund_term
        if use["heatmap"] and parity == 1:
            d_hm = mk("heatmap_discriminator")

            def hmi_term(r):
                o = out_of(r)
                hl = 0.0
                for view in range(nviews):
                    hl = hl + heatmap_mi_loss(
                        jax.random.fold_in(keys[1], view), d_hm,
                        low0[:, view], o[:, view],
                        batch["joints_crop"][:, view],
                        batch["joints_vis"][:, view],
                        cfg, joint_idx,
                    ) * w["heatmap"]
                return hl

            terms["hmi_g"] = hmi_term
        if use["view"] and parity == 1:
            d_view = mk("view_discriminator")

            def vmi_term(r):
                j2d = joints2d_of(out_of(r), batch)
                return view_mi_loss(d_view, j2d, view1_num, view_measure) * frac * w["view"]

            terms["vmi_g"] = vmi_term
        if use["joints"] and parity == 1:
            d_joints = mk("joints_discriminator")

            def jmi_term(r):
                j2d = joints2d_of(out_of(r), batch)
                jl = 0.0
                for view in range(nviews):
                    jl = jl + joints_mi_loss(
                        d_joints, j2d[:, view], var1_idx, joints_measure
                    )
                return jl * frac * w["joints"]

            terms["jmi_g"] = jmi_term
        return grad_norms_wrt_heatmaps(terms, raw0)

    # --------------------------------------------------------- full step

    @partial(jax.jit, static_argnames=("epoch_parity",))
    def step(states: dict, batch, key, epoch_parity: int = 0):
        kd, kg = jax.random.split(key)
        base = states["base_model"]
        new_states = dict(states)
        metrics = {}

        # ONE base forward per step (the reference also forwards once,
        # function.py:158): D losses read it stop-gradient, G gradients chain
        # back through the recorded vjp — halves the adversarial step cost
        # vs re-running the model on the G side.
        def fwd(params):
            (raw, fused, low, high), mut = model.apply(
                {"params": params, "batch_stats": base.batch_stats},
                batch["images"], train=True, mutable=["batch_stats"],
            )
            if fused is None:  # static: aggre off
                fused = raw
            return (raw, fused, low, high), mut["batch_stats"]

        feats, vjp_fn, new_stats = jax.vjp(fwd, base.params, has_aux=True)

        d_names = [n for n in states if n != "base_model"]
        if d_names:
            def d_total(params_dict):
                ps = {n: (params_dict[n], states[n].batch_stats) for n in d_names}
                return d_losses(ps, feats, batch, kd, epoch_parity)

            grads, d_metrics = jax.grad(
                d_total, has_aux=True
            )({n: states[n].params for n in d_names})
            metrics.update(d_metrics)
            for n in d_names:
                updates, new_opt = tx_disc[n].update(
                    grads[n], states[n].opt_state, states[n].params
                )
                new_params = optax.apply_updates(states[n].params, updates)
                new_states[n] = TrainState(
                    new_params, states[n].batch_stats, new_opt, states[n].step + 1
                )

        feat_grads, (output, g_metrics) = jax.grad(
            g_loss, has_aux=True
        )(feats, new_states, batch, kg, epoch_parity)
        (grads,) = vjp_fn(feat_grads)
        metrics.update(g_metrics)
        if watch_grad:
            probes = g_grad_norm_probe(feats, new_states, batch, kg, epoch_parity)
            for k, v in probes.items():
                metrics[f"grad_norm_{k}"] = v
        updates, new_opt = tx_base.update(grads, base.opt_state, base.params)
        new_params = optax.apply_updates(base.params, updates)
        new_states["base_model"] = TrainState(
            new_params, new_stats, new_opt, base.step + 1
        )

        raw = output
        n, v = raw.shape[0], raw.shape[1]
        hm_pred = jnp.moveaxis(raw, -1, 2).reshape(n * v, raw.shape[-1], *raw.shape[2:4])
        hm_gt = jnp.moveaxis(batch["target"], -1, 2).reshape(
            n * v, raw.shape[-1], *raw.shape[2:4]
        )
        _, acc, _, _ = pck_accuracy(hm_pred, hm_gt)
        metrics["acc"] = acc
        return new_states, metrics

    return step


def init_discriminator_states(cfg, disc_models: dict, tx_disc: dict, batch,
                              model, base_variables, seed: int = 0) -> dict:
    """Initialise discriminator parameters by tracing one forward to get the
    feature shapes (run/pose2d/train.py:163-180 equivalent)."""
    raw, fused, low, high = model.apply(
        base_variables, batch["images"][:2], train=False
    )
    output = fused if fused is not None else raw
    n, v = raw.shape[0], raw.shape[1]
    states = {}
    key = jax.random.PRNGKey(seed)
    for i, (name, dm) in enumerate(disc_models.items()):
        k = jax.random.fold_in(key, i)
        if name == "local_discriminator":
            variables = dm.init(k, high[:, 0, :4, :4, :].reshape(n, 16, -1),
                                high[:, 0, :4, :4, :].reshape(n, 16, -1), train=False)
        elif name == "domain_discriminator":
            variables = dm.init(k, low[:, 0], train=False)
        elif name == "view_discriminator":
            j = int(cfg.NETWORK.NUM_JOINTS)
            v1 = int(cfg.VIEW_DISCRIMINATOR.VIEW_ONE_NUM)
            variables = dm.init(
                k, jnp.zeros((n, v1 * j * 2)), jnp.zeros((n, (4 - v1) * j * 2)),
                train=False,
            )
        elif name == "joints_discriminator":
            v1 = int(cfg.JOINTS_DISCRIMINATOR.VAR_ONE_NUM)
            v2 = int(cfg.JOINTS_DISCRIMINATOR.VAR_TWO_NUM)
            variables = dm.init(
                k, jnp.zeros((n, v1 * 2)), jnp.zeros((n, v2 * 2)), train=False
            )
        elif name == "heatmap_discriminator":
            # pair = 1 heatmap prob + C feature channels; infer C from the
            # actual low features rather than trusting the config constant
            cin = 1 + low.shape[-1]
            variables = dm.init(k, jnp.zeros((4, cin)), train=False)
        else:
            raise ValueError(name)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        states[name] = TrainState(params, stats, tx_disc[name].init(params), 0)
    return states
