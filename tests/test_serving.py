"""posetpu.serving — the packaged int8 serving pipeline.

Checks the public builder reproduces the ablation-verified path exactly:
the packed-input + phase-tail + grouped-aggregation pipeline's PREDICTIONS
equal a hand-assembled jns-tail int8 pipeline bit-for-bit (the phase tail is
an exact re-indexing of the jns tail; the grouped aggregation is shared),
and the host-side packing helper is byte-identical to the native loader's
hwcn contract. Pallas kernels run in interpret mode (CPU mesh)."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from posetpu.config import default_config  # noqa: E402
from posetpu.serving import build_serving_pipeline, pack_hwcn  # noqa: E402
from tests.test_quant import _trained_like_variables  # noqa: E402


def _small_cfg():
    cfg = default_config()
    cfg.POSE_RESNET.NUM_LAYERS = 18
    cfg.NETWORK.IMAGE_SIZE = np.array([64, 64])
    cfg.NETWORK.HEATMAP_SIZE = np.array([16, 16])
    cfg.NETWORK.AGGRE = True
    return cfg


def _mv_variables(rng):
    model, res_vars = _trained_like_variables(rng)
    bank = jnp.asarray(0.01 * rng.randn(12, 256, 256).astype(np.float32)
                       + np.eye(256, dtype=np.float32))
    return {
        "params": {"resnet": res_vars["params"],
                   "aggre_layer": {"weight": bank}},
        "batch_stats": {"resnet": res_vars["batch_stats"]},
    }, bank


def test_pack_hwcn_matches_s2d_transpose(rng):
    """pack_hwcn == _s2d + batch-minor transpose — the exact byte order the
    native loader's (s2d=True, hwcn=True) mode writes (whose equality to
    _s2d is covered by tests/test_phase_tail.py)."""
    from posetpu.models.quant import _s2d

    x = rng.randint(0, 256, (3, 8, 12, 3)).astype(np.uint8)
    ref = np.asarray(_s2d(jnp.asarray(x))).transpose(1, 2, 3, 0)
    np.testing.assert_array_equal(pack_hwcn(x), ref)


def test_serving_preds_match_jns_reference(rng):
    """build_serving_pipeline (packed input, fused phase tail, grouped int8
    aggregation, fuse routing, packed decode) returns EXACTLY the preds of
    the same quantization driven through the jns-tail ops by hand."""
    from posetpu.core.inference import final_preds_jns, fuse_routing_jns
    from posetpu.models.quant import (
        aggregation_int8_apply_jns_grouped,
        make_u8_quant,
        quantize_aggregation_grouped,
        quantize_pose_resnet,
    )

    cfg = _small_cfg()
    variables, bank = _mv_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]

    # act4=() pins the all-int8 boundaries: this test certifies the
    # packing/routing/decode contracts bit-exactly against the jns oracle,
    # which the (default, approximate) int4 boundaries would blur —
    # act4 closeness has its own receipt in test_quant.py
    pipe = build_serving_pipeline(cfg, variables, calib,
                                  subpixel_deconvs=False, interpret=True,
                                  act4=())

    n, v = 2, 4
    images = rng.randint(0, 256, (n, v, 64, 64, 3)).astype(np.uint8)
    center = jnp.asarray(100 + 50 * rng.rand(n, v, 2).astype(np.float32))
    scale = jnp.asarray(1 + rng.rand(n, v, 2).astype(np.float32))
    is_h36m = jnp.asarray([1.0, 0.0], jnp.float32)

    preds, maxvals = pipe.infer(pipe.params, jnp.asarray(pipe.prepare(images)),
                                center, scale, is_h36m)

    # reference: same calibration, jns head, no s2d, same grouped aggregation
    from posetpu.models import get_pose_net

    resnet = get_pose_net(cfg, dtype=jnp.float32)
    res_vars = {"params": variables["params"]["resnet"],
                "batch_stats": variables["batch_stats"]["resnet"]}
    qparams, qfwd = quantize_pose_resnet(resnet, res_vars, calib,
                                         jns_head=True)
    u8q, _ = make_u8_quant(qparams, cfg.DATASET.MEAN, cfg.DATASET.STD)
    flat = jnp.asarray(images.reshape(n * v, 64, 64, 3))
    hm = qfwd(qparams, u8q(flat))  # [J, N*V, S] rowmajor
    raw = hm.reshape(hm.shape[0], n, v, hm.shape[-1])
    qagg = quantize_aggregation_grouped(bank)
    fused = aggregation_int8_apply_jns_grouped(qagg, raw)
    out = fuse_routing_jns(raw, fused, is_h36m)
    ref_preds, ref_maxvals = final_preds_jns(out, center, scale, (16, 16))

    # Piecewise (stage-by-stage jits) the two paths are bit-identical —
    # verified during development: int8 inputs, trunk heatmaps, aggregation
    # and routing all assert_array_equal across the packings. Inside
    # pipe.infer's SINGLE jit, XLA may contract the routing lerp into FMAs
    # (legal f32 reassociation), so the end-to-end comparison tolerates the
    # last ulp (~2^-16 at heatmap magnitudes) instead of exact equality.
    np.testing.assert_allclose(np.asarray(maxvals), np.asarray(ref_maxvals),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(preds), np.asarray(ref_preds),
                               atol=1e-4)
    assert float(jnp.std(maxvals)) > 0  # non-degenerate


def test_serving_flip_test_and_defaults_smoke(rng):
    """The adopted config (subpixel deconv0) + flip test runs end to end and
    returns the right shapes; flip merging changes the heatmap maxima."""
    cfg = _small_cfg()
    variables, _ = _mv_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    pipe = build_serving_pipeline(cfg, variables, calib, flip_test=True,
                                  interpret=True)
    n, v = 1, 4
    images = rng.randint(0, 256, (n, v, 64, 64, 3)).astype(np.uint8)
    center = jnp.full((n, v, 2), 100.0, jnp.float32)
    scale = jnp.ones((n, v, 2), jnp.float32)
    preds, maxvals = pipe.infer(pipe.params,
                                jnp.asarray(pipe.prepare(images)),
                                center, scale, jnp.ones((n,), jnp.float32))
    assert preds.shape == (n, v, 16, 2) and maxvals.shape == (n, v, 16)
    assert np.isfinite(np.asarray(preds)).all()


def test_serving_premirrored_flip_matches_device_mirror(rng):
    """flip_test="premirrored" (host-side mirror in the input contract,
    round-4 flip lever — kills the in-graph 25 MB reverse) is bit-exact vs
    flip_test=True (device-side mirror): same bytes reach the u8 affine."""
    cfg = _small_cfg()
    variables, _ = _mv_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]

    pipe_dev = build_serving_pipeline(cfg, variables, calib, flip_test=True,
                                      subpixel_deconvs=False, interpret=True)
    pipe_pre = build_serving_pipeline(cfg, variables, calib,
                                      flip_test="premirrored",
                                      subpixel_deconvs=False, interpret=True)

    n, v = 2, 4
    images = rng.randint(0, 256, (n, v, 64, 64, 3)).astype(np.uint8)
    center = jnp.asarray(100 + 50 * rng.rand(n, v, 2).astype(np.float32))
    scale = jnp.asarray(1 + rng.rand(n, v, 2).astype(np.float32))
    is_h36m = jnp.asarray([1.0, 0.0], jnp.float32)

    x_dev = jnp.asarray(pipe_dev.prepare(images))
    x_pre = jnp.asarray(pipe_pre.prepare(images))
    assert x_pre.shape[3] == 2 * x_dev.shape[3]
    p1, m1 = pipe_dev.infer(pipe_dev.params, x_dev, center, scale, is_h36m)
    p2, m2 = pipe_pre.infer(pipe_pre.params, x_pre, center, scale, is_h36m)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_serving_agg_w4_close_to_int8_and_finalize(rng):
    """agg_w4=True (diag-split 4-bit residual bank) through the full public
    pipeline: predictions stay close to the int8-bank pipeline on an
    identity-dominated bank, and finalize_device_params casts the int8
    carrier to native s4 without changing the outputs (the carrier and the
    s4 array are numerically identical by construction)."""
    from posetpu.serving import finalize_device_params

    cfg = _small_cfg()
    variables, bank = _mv_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]

    pipe8 = build_serving_pipeline(cfg, variables, calib,
                                   subpixel_deconvs=False, interpret=True,
                                   act4=())
    pipe4 = build_serving_pipeline(cfg, variables, calib,
                                   subpixel_deconvs=False, interpret=True,
                                   act4=(), agg_w4=True)
    assert pipe4.params["qagg"]["wq4"].dtype == jnp.int8  # carrier

    n, v = 2, 4
    images = rng.randint(0, 256, (n, v, 64, 64, 3)).astype(np.uint8)
    center = jnp.asarray(100 + 50 * rng.rand(n, v, 2).astype(np.float32))
    scale = jnp.asarray(1 + rng.rand(n, v, 2).astype(np.float32))
    is_h36m = jnp.asarray([1.0, 0.0], jnp.float32)
    x = jnp.asarray(pipe8.prepare(images))

    preds8, mv8 = pipe8.infer(pipe8.params, x, center, scale, is_h36m)
    preds4, mv4 = pipe4.infer(pipe4.params, x, center, scale, is_h36m)
    # the bank is identity-dominated (random MultiViewPose init bank is
    # near-identity, models/multiview.py), so the 4-bit residual moves
    # heatmaps by <1 int8 step and preds by at most a refine sub-pixel
    assert np.corrcoef(np.asarray(mv8).ravel(),
                       np.asarray(mv4).ravel())[0, 1] > 0.98
    assert np.abs(np.asarray(preds8) - np.asarray(preds4)).mean() < 2.0

    fin = finalize_device_params(pipe4.params)
    assert fin["qagg"]["wq4"].dtype == jnp.int4
    predsf, mvf = pipe4.infer(fin, x, center, scale, is_h36m)
    np.testing.assert_allclose(np.asarray(mvf), np.asarray(mv4),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(predsf), np.asarray(preds4),
                               atol=1e-4)
    # idempotent + no-op on int8-bank params
    assert finalize_device_params(fin)["qagg"]["wq4"].dtype == jnp.int4
    assert finalize_device_params(pipe8.params) is pipe8.params
