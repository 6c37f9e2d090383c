"""int8 PTQ path: folded-float equivalence and quantized-output fidelity."""

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.models.pose_resnet import PoseResNet
from posetpu.models.quant import (
    calibrate,
    fold_params,
    quantize_pose_resnet,
)


def _trained_like_variables(rng, num_layers=18):
    """Random but sane variables (weights ~0.05, BN stats near identity)."""
    model = PoseResNet(num_layers=num_layers)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def jitter(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        r = rng.randn(*leaf.shape).astype(np.float32)
        if name == "kernel":
            return jnp.asarray(r * 0.05)
        if name == "scale":
            return jnp.asarray(1.0 + 0.1 * r)
        if name == "var":
            return jnp.asarray(1.0 + 0.05 * np.abs(r))
        return jnp.asarray(0.1 * r)

    variables = jax.tree_util.tree_map_with_path(jitter, variables)
    return model, variables


def test_folded_float_matches_model(rng):
    """The calibration-mode (folded float) forward must equal the flax eval
    forward — validates BN folding and the layer plan."""
    model, variables = _trained_like_variables(rng)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    ref_hm, _, _ = model.apply(variables, x, train=False)

    from posetpu.models.quant import _Recorder, _forward

    folded = fold_params(model, variables)
    rec = _Recorder(folded)
    got = _forward(rec, x, model.num_layers, model.deconv_filters,
                   model.deconv_kernels)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_hm), rtol=1e-3, atol=1e-3
    )


def test_int8_forward_close_to_float(rng):
    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32) for _ in range(2)]
    qparams, fwd = quantize_pose_resnet(model, variables, calib)

    x = jnp.asarray(calib[0])
    ref_hm, _, _ = model.apply(variables, x, train=False)
    got = fwd(qparams, x)
    ref = np.asarray(ref_hm)
    out = np.asarray(got)
    assert out.shape == ref.shape
    # int8 fidelity: high correlation and matching peaks
    corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    assert corr > 0.99, corr
    ref_peak = ref.reshape(-1, ref.shape[1] * ref.shape[2], ref.shape[3]).argmax(1)
    out_peak = out.reshape(-1, ref.shape[1] * ref.shape[2], ref.shape[3]).argmax(1)
    agree = (ref_peak == out_peak).mean()
    assert agree > 0.8, agree


def test_quant_weights_are_int8(rng):
    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(1, 64, 64, 3).astype(np.float32)]
    qparams, _ = quantize_pose_resnet(model, variables, calib)
    for name, w in qparams["weights"].items():
        assert w.dtype == jnp.int8, name
        assert qparams["w_scales"][name].shape == (w.shape[-1],)


def test_int8_subpixel_variant_matches(rng):
    """The subpixel-deconv option produces the same heatmaps as dilated."""
    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    q1, f1 = quantize_pose_resnet(model, variables, calib)
    q2, f2 = quantize_pose_resnet(model, variables, calib, subpixel_deconvs=True)
    x = jnp.asarray(calib[0])
    a = np.asarray(f1(q1, x))
    b = np.asarray(f2(q2, x))
    # same math up to independent weight-quantization rounding
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_act4_boundaries_close_to_int8(rng):
    """Sub-int8 (4-bit) activation boundaries (round-4 VERDICT #2): the
    nibble-packed and native-s4 encodings are exactly equivalent, and both
    stay close to the all-int8 forward (same calibrated amax, 7 steps
    instead of 127 at the marked boundaries only). The adopted serving set
    is layer1+layer2 block outputs, s4 mode (tools/ab_act4.py: 3,233 ->
    3,387 f/s same-session; accuracy receipt tools/int8_accuracy.py)."""
    from posetpu.models.quant import pack_nibbles, unpack_nibbles

    q = jnp.asarray(rng.randint(-8, 8, (2, 3, 5, 8)).astype(np.int8))
    np.testing.assert_array_equal(np.asarray(unpack_nibbles(pack_nibbles(q))),
                                  np.asarray(q))

    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32) for _ in range(2)]
    act4 = tuple(f"layer1_{i}.out" for i in range(2)) + tuple(
        f"layer2_{i}.out" for i in range(2))
    q0, f0 = quantize_pose_resnet(model, variables, calib)
    q1, f1 = quantize_pose_resnet(model, variables, calib, act4=act4)
    q2, f2 = quantize_pose_resnet(model, variables, calib, act4=act4,
                                  act4_mode="s4")
    x = jnp.asarray(calib[0])
    base = np.asarray(f0(q0, x))
    packed = np.asarray(f1(q1, x))
    s4 = np.asarray(f2(q2, x))
    np.testing.assert_array_equal(packed, s4)  # same 4-bit grid, same math
    assert np.corrcoef(base.ravel(), packed.ravel())[0, 1] > 0.98


def test_int8_aggregation_matches_float(rng):
    from posetpu.models.multiview import Aggregation
    from posetpu.models.quant import aggregation_int8_apply, quantize_aggregation

    s = 8
    bank = rng.uniform(0, 0.1, (12, s * s, s * s)).astype(np.float32)
    hm = rng.uniform(0, 1, (2, 4, s, s, 3)).astype(np.float32)
    model = Aggregation(heatmap_size=s)
    ref = np.asarray(model.apply({"params": {"weight": jnp.asarray(bank)}},
                                 jnp.asarray(hm)))
    qagg = quantize_aggregation(bank, calib_heatmaps=hm)
    got = np.asarray(aggregation_int8_apply(qagg, jnp.asarray(hm)))
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.999
    assert np.abs(ref - got).max() < 0.05 * max(np.abs(ref).max(), 1e-6)


def test_int8_aggregation_grouped_matches_float(rng):
    """The fused-mean (single-contraction) aggregation matches the float
    Aggregation within the same tolerance as the per-pair int8 path, and
    matches the per-pair int8 path itself almost exactly on an
    identity-like bank (the reference's ChannelWiseFC init regime)."""
    from posetpu.models.multiview import Aggregation
    from posetpu.models.quant import (
        aggregation_int8_apply_jns,
        aggregation_int8_apply_jns_grouped,
        quantize_aggregation,
        quantize_aggregation_grouped,
    )

    s = 8
    bank = rng.uniform(0, 0.1, (12, s * s, s * s)).astype(np.float32)
    bank += np.eye(s * s, dtype=np.float32)[None]  # identity-init regime
    hm = rng.uniform(0, 1, (2, 4, s, s, 3)).astype(np.float32)
    model = Aggregation(heatmap_size=s)
    ref = np.asarray(model.apply({"params": {"weight": jnp.asarray(bank)}},
                                 jnp.asarray(hm)))
    # [N, V, h, w, J] -> [J, N, V, S] for the jns appliers
    hm_jns = jnp.moveaxis(jnp.asarray(hm.reshape(2, 4, s * s, 3)), 3, 0)
    qg = quantize_aggregation_grouped(bank, calib_heatmaps=hm)
    got = np.asarray(aggregation_int8_apply_jns_grouped(qg, hm_jns))
    ref_jns = np.moveaxis(ref.reshape(2, 4, s * s, 3), 3, 0)
    assert np.corrcoef(ref_jns.ravel(), got.ravel())[0, 1] > 0.999
    assert np.abs(ref_jns - got).max() < 0.05 * max(np.abs(ref).max(), 1e-6)

    qp = quantize_aggregation(bank, calib_heatmaps=hm)
    per_pair = np.asarray(aggregation_int8_apply_jns(qp, hm_jns))
    # independent weight-quantization rounding separates the two int8 paths
    np.testing.assert_allclose(got, per_pair, atol=0.03)


def test_u8_input_front_end_matches_f32(rng):
    """make_u8_quant(u8) == quantize(normalize(u8)) for every pixel value."""
    from posetpu.models.quant import _Int8Runner, make_u8_quant

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    qparams = {"act_scales": {"input": jnp.float32(0.0213)}}

    u8 = jnp.asarray(
        rng.randint(0, 256, size=(2, 8, 8, 3)).astype(np.uint8)
    )
    fn, s_in = make_u8_quant(qparams, mean, std)
    got = np.asarray(fn(u8))

    x = (np.asarray(u8).astype(np.float32) / 255.0 - mean) / std
    runner = _Int8Runner(qparams)
    want, s = runner.input(jnp.asarray(x))
    np.testing.assert_array_equal(got, np.asarray(want))
    assert s_in == float(s)

    # and int8 input short-circuits the runner's quantizer
    again, s2 = runner.input(jnp.asarray(got))
    np.testing.assert_array_equal(np.asarray(again), got)
