"""S-minor (jns) serving-tail equivalence vs the standard NHWC tail.

The jns tail re-lays the whole head->aggregation->routing->decode chain as
[J, N, V, S] with S minor so no op ever transposes a J-minor tensor; it must
be numerically identical to the NHWC path (same int8 math, different layout).
"""

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.core.inference import (
    final_preds,
    final_preds_jns,
    fuse_routing,
    fuse_routing_jns,
)
from posetpu.models.quant import (
    _forward,
    _Int8Runner,
    aggregation_int8_apply,
    aggregation_int8_apply_jns,
    quantize_aggregation,
    quantize_pose_resnet,
)
from tests.test_quant import _trained_like_variables


def test_jns_tail_matches_nhwc_tail(rng):
    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    qparams, fwd = quantize_pose_resnet(model, variables, calib)
    _, fwd_jns = quantize_pose_resnet(model, variables, calib, jns_head=True)

    n, v = 2, 4
    x = jnp.asarray(rng.randn(n * v, 64, 64, 3).astype(np.float32))
    hm = fwd(qparams, x)  # [N*V, h, w, J]
    hm_jns = fwd_jns(qparams, x)  # [J, N*V, S]
    h, w, j = hm.shape[1:]

    # head layouts agree
    np.testing.assert_allclose(
        np.asarray(hm_jns.reshape(j, n * v, h, w)),
        np.asarray(jnp.moveaxis(hm, 3, 0)),
        rtol=1e-5, atol=1e-5,
    )

    raw = hm.reshape(n, v, h, w, j)
    raw_jns = hm_jns.reshape(j, n, v, h * w)

    bank = rng.randn(12, h * w, h * w).astype(np.float32) * 0.01
    qagg = quantize_aggregation(bank, calib_heatmaps=np.asarray(hm))
    fused = aggregation_int8_apply(qagg, raw)
    fused_jns = aggregation_int8_apply_jns(qagg, raw_jns)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(fused_jns, 0, 3).reshape(n, v, h, w, j)),
        np.asarray(fused), rtol=1e-4, atol=1e-4,
    )

    is_h36m = jnp.asarray([1.0, 0.0])
    out = fuse_routing(raw, fused, is_h36m)
    out_jns = fuse_routing_jns(raw_jns, fused_jns, is_h36m)

    # flip-test merge equivalence (shift + pair swap + W reversal)
    from posetpu.core.inference import flip_test_merge, flip_test_merge_jns
    from posetpu.data.base import union_flip_pairs

    pairs = union_flip_pairs()[:3]
    out_f = jnp.asarray(rng.randn(*np.shape(raw)).astype(np.float32))
    out_f_jns = jnp.moveaxis(out_f.reshape(n, v, h * w, j), 3, 0).reshape(
        j, n, v, h * w
    )
    m = flip_test_merge(raw, out_f, pairs, shift=True)
    m_jns = flip_test_merge_jns(raw_jns, out_f_jns, pairs, (h, w), shift=True)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(m_jns.reshape(j, n, v, h, w), 0, 4)),
        np.asarray(m), rtol=1e-5, atol=1e-5,
    )

    center = jnp.asarray(rng.rand(n, v, 2).astype(np.float32) * 500)
    scale = jnp.full((n, v, 2), 2.0, jnp.float32)
    preds, maxv = final_preds(out, center, scale)
    preds_jns, maxv_jns = final_preds_jns(out_jns, center, scale, (h, w))
    np.testing.assert_allclose(np.asarray(maxv_jns), np.asarray(maxv),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(preds_jns), np.asarray(preds),
                               rtol=1e-4, atol=1e-4)


def test_jns_bf16_tail_close_to_f32(rng):
    """The opt-in bf16 tail may flip quarter-pixel ties, but on peaked
    (realistic) heatmaps the decoded joints stay within a heatmap pixel.
    (On UNIFORM-noise maps bf16 rounding creates argmax ties by
    construction — that is not the serving distribution.)"""
    from posetpu.ops.heatmap import decode_heatmaps_jns, render_gaussian_heatmaps

    j, n, v, h, w = 16, 2, 4, 16, 16
    joints = rng.rand(n * v, j, 2).astype(np.float32) * 60 + 2
    target, _ = render_gaussian_heatmaps(
        jnp.asarray(joints), jnp.ones((n * v, j)), (w, h), (64, 64), sigma=1.5
    )  # [N*V, J, H, W]
    hm = jnp.moveaxis(target, 1, 0).reshape(j, n, v, h * w)
    hm = hm + jnp.asarray(rng.rand(j, n, v, h * w).astype(np.float32)) * 0.01
    c32, _ = decode_heatmaps_jns(hm, (h, w))
    c16, m16 = decode_heatmaps_jns(hm.astype(jnp.bfloat16), (h, w))
    assert np.isfinite(np.asarray(m16, np.float32)).all()
    d = np.abs(np.asarray(c16, np.float32) - np.asarray(c32))
    assert (d <= 1.0).all(), d.max()
