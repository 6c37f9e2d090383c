"""Train state pytree."""

from __future__ import annotations

from typing import Any

import flax.struct


@flax.struct.dataclass
class TrainState:
    """Parameters + BN statistics + optimizer state for one model.

    The reference keeps a dict of torch modules with per-module optimizers
    (train.py:163-180, utils.py:62-85); here each trainable component gets
    one of these, and the whole thing is a pytree that shards/checkpoints
    directly.
    """

    params: Any
    batch_stats: Any
    opt_state: Any
    step: int

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}
