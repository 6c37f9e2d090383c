"""QAT fine-tuning: fake-quant graph fidelity and PTQ-error reduction."""

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.models.quant import _Int8Runner, _forward, quantize_pose_resnet
from posetpu.train.qat import _FakeQuantRunner, qat_finetune
from tests.test_quant import _trained_like_variables


def _int8_fwd(model, qparams, x):
    return _forward(
        _Int8Runner(qparams), jnp.asarray(x), model.num_layers,
        model.deconv_filters, model.deconv_kernels,
    )


def test_fake_quant_matches_int8_runner(rng):
    """The QAT graph must predict the serving graph: with the SAME weights
    and scales, fake-quant float outputs ~= int8 runner outputs (both
    quantize at identical points; differences are accumulation order)."""
    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    qparams, _ = quantize_pose_resnet(model, variables, calib)

    from posetpu.models.quant import calibrate

    folded, act_scales = calibrate(model, variables, calib)
    params = {k: (jnp.asarray(w), jnp.asarray(b)) for k, (w, b) in folded.items()}
    x = jnp.asarray(calib[0])
    fq = _forward(_FakeQuantRunner(params, act_scales), x, model.num_layers,
                  model.deconv_filters, model.deconv_kernels)
    q = _int8_fwd(model, qparams, x)
    err = np.abs(np.asarray(fq) - np.asarray(q)).max()
    spread = np.abs(np.asarray(q)).max() + 1e-6
    assert err / spread < 0.05, (err, spread)


def test_qat_reduces_quantization_error(rng):
    """Distillation QAT must shrink the int8-vs-float output gap vs PTQ."""
    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    train = [rng.randn(2, 64, 64, 3).astype(np.float32) for _ in range(8)]
    x = jnp.asarray(calib[0])
    float_hm, _, _ = model.apply(variables, x, train=False)
    float_hm = np.asarray(float_hm)

    ptq_params, _ = quantize_pose_resnet(model, variables, calib)
    ptq_err = float(np.mean((np.asarray(_int8_fwd(model, ptq_params, x)) - float_hm) ** 2))

    qat_params, info = qat_finetune(model, variables, calib, train * 3, lr=3e-6)
    qat_err = float(np.mean((np.asarray(_int8_fwd(model, qat_params, x)) - float_hm) ** 2))

    assert len(info["losses"]) == 24
    assert info["losses"][-1] < info["losses"][0] * 1.05  # training moved
    assert qat_err < ptq_err, (qat_err, ptq_err)
