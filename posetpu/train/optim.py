"""Optimizers and LR schedules (optax).

Equivalent of get_optimizer (lib/utils/utils.py:62-85) + the per-model
MultiStepLR wiring (run/pose2d/train.py:289-292): Adam (default, lr 1e-3) or
SGD with momentum, stepwise-decayed at the configured epochs; a separate LR
for discriminators; ``FIX_BACKBONE`` freezes everything except the
aggregation bank (utils.py:64-67).
"""

from __future__ import annotations

import optax


def multistep_lr(base_lr: float, lr_step, lr_factor: float, steps_per_epoch: int,
                 warmup_epochs: int = 0):
    """MultiStepLR: multiply by ``lr_factor`` at each boundary epoch.

    ``warmup_epochs`` > 0 prefixes a linear 0 -> base_lr ramp
    (TRAIN.WARMUP_EPOCHS; off by default — the reference has none)."""
    boundaries = {int(e) * steps_per_epoch: lr_factor for e in lr_step}
    schedule = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_epochs:
        warm_steps = int(warmup_epochs) * steps_per_epoch
        warmup = optax.linear_schedule(0.0, base_lr, warm_steps)
        return optax.join_schedules([warmup, schedule], [warm_steps])
    return schedule


def make_optimizer(cfg, steps_per_epoch: int, discriminator: bool = False,
                   fix_backbone: bool | None = None):
    """Build the optax transform for the base model or a discriminator."""
    lr = cfg.TRAIN.LR_DISCRIMINATOR if discriminator else cfg.TRAIN.LR
    schedule = multistep_lr(lr, cfg.TRAIN.LR_STEP, cfg.TRAIN.LR_FACTOR,
                            steps_per_epoch,
                            warmup_epochs=int(getattr(cfg.TRAIN,
                                                      "WARMUP_EPOCHS", 0)))

    if cfg.TRAIN.OPTIMIZER == "adam":
        mu_dtype = getattr(cfg.TRAIN, "ADAM_MU_DTYPE", "float32")
        tx = optax.adam(schedule, mu_dtype=None if mu_dtype == "float32"
                        else mu_dtype)
    elif cfg.TRAIN.OPTIMIZER == "sgd":
        tx = optax.sgd(schedule, momentum=cfg.TRAIN.MOMENTUM,
                       nesterov=bool(cfg.TRAIN.NESTEROV))
    else:
        raise ValueError(f"unknown optimizer {cfg.TRAIN.OPTIMIZER}")

    fix = cfg.TRAIN.FIX_BACKBONE if fix_backbone is None else fix_backbone
    if fix and not discriminator:
        # train only the aggregation bank (utils.py:64-67); frozen leaves get
        # zero updates (optax.masked would pass raw grads through instead)
        def label_fn(params):
            import jax

            return jax.tree.map_with_path(
                lambda path, _: "train"
                if any(getattr(p, "key", None) == "aggre_layer" for p in path)
                else "freeze",
                params,
            )

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, label_fn
        )
    return tx
