"""Quantization-aware fine-tuning for the int8 serving trunk.

PTQ on a trained checkpoint measured a 0.05 PCKh@0.5 delta concentrated on
extremity joints (tools/int8_accuracy.py, BUILDLOG PARITY-EVIDENCE). This
module closes that gap the standard way: fine-tune the BN-folded float
weights through a fake-quantized forward whose quantization points are
EXACTLY the int8 runner's (posetpu/models/quant.py:_Int8Runner — int8
activations at every HBM boundary, per-output-channel int8 weights), with
straight-through-estimator gradients through round/clip.

No labels are needed: the default objective distills the float trunk's own
heatmaps (teacher = the same folded weights without fake quant), so QAT runs
on any images — including the unlabeled serving distribution. The reference
has no quantization path at all; this is TPU-serving infrastructure on top
of its model family (lib/models/pose_resnet.py:102-254).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from posetpu.models.quant import (
    _conv,
    _forward,
    _Recorder,
    calibrate,
    quantize_weights,
)


def _fake_quant(x, scale):
    """Symmetric int8 quantize-dequantize with a straight-through gradient."""
    q = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    return x + jax.lax.stop_gradient(q - x)


class _FakeQuantRunner:
    """Float executor over traced folded params with quant-dequant at every
    point the int8 runner (quant.py:_Int8Runner) carries an int8 tensor.
    Activation scales are the calibrated constants the serving graph will
    use; weight scales are recomputed from the live weights per step (the
    serving-side quantize_weights does the same per-channel max)."""

    def __init__(self, params, act_scales):
        self.p = params
        self.s = {k: float(v) for k, v in act_scales.items()}

    def _fq_w(self, w):
        s = jnp.maximum(
            jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True), 1e-8
        ) / 127.0
        return _fake_quant(w, s)

    def _fq_a(self, x, name):
        return _fake_quant(x, self.s[name])

    def input(self, x):
        return self._fq_a(x, "input"), None

    def qchain(self, h, s_h, name, stride=1, relu=True, subpixel=False, **kw):
        assert not subpixel, "QAT runs the standard dilated-conv plan"
        w, b = self.p[name]
        y = _conv(h, self._fq_w(w), stride=stride, prefer=jnp.float32, **kw) + b
        if relu:
            y = jax.nn.relu(y)
        return self._fq_a(y, f"{name}.out"), None

    def conv_f32(self, h, s_h, name, stride=1, **kw):
        w, b = self.p[name]
        return _conv(h, self._fq_w(w), stride=stride, prefer=jnp.float32, **kw) + b

    def dequant(self, h, s_h):
        return h

    def requant(self, y, name):
        return self._fq_a(y, name), None


def qat_finetune(
    model,
    variables,
    calib_batches: Iterable[Any],
    train_batches: Iterable[Any],
    *,
    lr: float = 3e-6,
    target_fn=None,
) -> tuple[dict, dict]:
    """Fine-tune the folded trunk through fake quantization.

    Args:
        model: the float PoseResNet (posetpu.models.get_pose_net).
        variables: its trained variables (params + batch_stats).
        calib_batches: [N, H, W, 3] float batches for activation calibration.
        train_batches: iterable of [N, H, W, 3] float batches to fine-tune
            on (one optimizer step each; iterate epochs/steps outside).
        lr: Adam learning rate. Keep it SMALL: Adam's first steps are
            ~sign-steps of size lr on every folded weight, and lr=1e-4
            measured an 80x loss blow-up on a ResNet-18 trunk; 3e-6 is the
            measured stable default (the quantization perturbation being
            repaired is itself tiny).
        target_fn: optional ``batch -> target heatmaps``; default distills
            the float teacher's own heatmaps on the same batch.

    Returns:
        (qparams, info): serving qparams (quant.py schema, drop-in for
        ``_Int8Runner``/``make_quant_eval_step``) and {"losses": [...]}.
    """
    folded, act_scales = calibrate(model, variables, calib_batches)
    folded0 = {k: (jnp.asarray(w), jnp.asarray(b)) for k, (w, b) in folded.items()}
    params = folded0
    nl, dfs, dks = model.num_layers, model.deconv_filters, model.deconv_kernels

    def qat_fwd(p, x):
        return _forward(_FakeQuantRunner(p, act_scales), x, nl, dfs, dks)

    @jax.jit
    def teacher_fwd(x):
        return _forward(_Recorder(folded0), x, nl, dfs, dks)

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, target):
        def loss_fn(p):
            return jnp.mean(jnp.square(qat_fwd(p, x) - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for batch in train_batches:
        x = jnp.asarray(batch)
        if target_fn is not None:
            target = jnp.asarray(target_fn(batch))
        else:
            target = jax.lax.stop_gradient(teacher_fwd(x))
        params, opt_state, loss = step(params, opt_state, x, target)
        losses.append(float(loss))

    tuned = {
        k: (np.asarray(w, np.float32), np.asarray(b, np.float32))
        for k, (w, b) in params.items()
    }
    qparams = quantize_weights(tuned, act_scales)
    return qparams, {"losses": losses}


def quantize_pose_resnet_qat(model, variables, calib_batches, train_batches,
                             lr: float = 3e-6):
    """QAT twin of quant.quantize_pose_resnet: returns (qparams, jitted int8
    forward) where the weights have been fake-quant fine-tuned."""
    from posetpu.models.quant import _Int8Runner, conv_dtype_policy

    qparams, info = qat_finetune(
        model, variables, calib_batches, train_batches, lr=lr
    )
    policy = conv_dtype_policy(qparams)
    nl, dfs, dks = model.num_layers, model.deconv_filters, model.deconv_kernels

    @jax.jit
    def forward(qparams, x):
        return _forward(_Int8Runner(qparams, policy), x, nl, dfs, dks)

    return qparams, forward, info
