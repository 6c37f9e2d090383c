"""Bit-exactness of the Pallas grouped-aggregation kernel vs the XLA path.

The kernel (ops/pallas/aggregation.py) must produce EXACTLY the output of
quant.aggregation_int8_apply_jns_grouped: identical int8 products, the
3-source pair sum int32-exact in the MXU accumulator, and the same single
pre-folded f32 epilogue multiply.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.models.quant import (
    aggregation_int8_apply_jns_grouped,
    quantize_aggregation_grouped,
)
from posetpu.ops.pallas.aggregation import aggregation_grouped_pallas


@pytest.mark.parametrize("jn_shape", [(4, 2), (5, 3)])
def test_grouped_aggregation_kernel_bitexact(jn_shape):
    j, n = jn_shape
    s = 256  # 16x16 heatmaps keep interpret mode fast
    rng = np.random.RandomState(0)
    bank = rng.randn(12, s, s).astype(np.float32) * 0.05
    for i in range(12):  # identity-ish init like the reference's FCs
        bank[i] += np.eye(s, dtype=np.float32)
    qagg = quantize_aggregation_grouped(jnp.asarray(bank))
    hm = jnp.asarray(rng.rand(j, n, 4, s).astype(np.float32))

    ref = aggregation_int8_apply_jns_grouped(qagg, hm)
    out = aggregation_grouped_pallas(qagg, hm, block_s=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_grouped_aggregation_kernel_fallback_ragged_s():
    """ADVICE r3 (medium): an S the kernel cannot tile (56x56 heatmaps ->
    S=3136, not a multiple of 128) must fall back to the XLA grouped dot
    instead of asserting inside the default serving path."""
    j, n, s = 3, 2, 3136
    rng = np.random.RandomState(1)
    bank = jnp.asarray(rng.randn(12, s, s).astype(np.float32) * 0.01)
    qagg = quantize_aggregation_grouped(bank)
    hm = jnp.asarray(rng.rand(j, n, 4, s).astype(np.float32))
    ref = aggregation_int8_apply_jns_grouped(qagg, hm)
    out = aggregation_grouped_pallas(qagg, hm, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_grouped_aggregation_kernel_fallback_vmem_budget():
    """A batch whose 3 persistent source planes exceed the VMEM budget
    falls back rather than OOMing the scoped stack at compile time."""
    from posetpu.ops.pallas import aggregation as agg_mod

    j, n, s = 4, 2, 256
    rng = np.random.RandomState(2)
    bank = jnp.asarray(rng.randn(12, s, s).astype(np.float32) * 0.01)
    qagg = quantize_aggregation_grouped(bank)
    hm = jnp.asarray(rng.rand(j, n, 4, s).astype(np.float32))
    ref = aggregation_int8_apply_jns_grouped(qagg, hm)
    old = agg_mod._VMEM_BUDGET_BYTES
    try:
        agg_mod._VMEM_BUDGET_BYTES = 1024  # force the budget fallback
        out = aggregation_grouped_pallas(qagg, hm, interpret=True)
    finally:
        agg_mod._VMEM_BUDGET_BYTES = old
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_grouped_aggregation_kernel_jn_blocked_bitexact():
    """When the full source planes exceed the VMEM budget, the JN-blocked
    grid runs (not the XLA fallback) and stays bit-exact."""
    from posetpu.ops.pallas import aggregation as agg_mod

    j, n, s = 4, 16, 256  # jn=64: blocked path picks jnb=32 (the int8
    # sublane tile is (32, 128), so jnb < 32 is no longer legal — ADVICE r4)
    rng = np.random.RandomState(3)
    bank = jnp.asarray(rng.randn(12, s, s).astype(np.float32) * 0.01)
    qagg = quantize_aggregation_grouped(bank)
    hm = jnp.asarray(rng.rand(j, n, 4, s).astype(np.float32))
    ref = aggregation_int8_apply_jns_grouped(qagg, hm)
    old = agg_mod._VMEM_BUDGET_BYTES
    try:
        # full planes = 3*64*256 = 49152 B; force the blocked path but
        # leave room for a jnb=32 slice (3*32*256=24576) + pipeline blocks
        agg_mod._VMEM_BUDGET_BYTES = 3 * 32 * s + 2 * (3 * s * 128) \
            + 2 * (j * n * 128 * 4) + 1
        jnb = agg_mod._pick_jn_block(
            j * n, s, agg_mod._VMEM_BUDGET_BYTES
            - 2 * (3 * s * 128) - 2 * (j * n * 128 * 4))
        assert jnb is not None and jnb < j * n, jnb
        out = aggregation_grouped_pallas(qagg, hm, block_s=128,
                                         interpret=True)
    finally:
        agg_mod._VMEM_BUDGET_BYTES = old
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.parametrize("jn_shape", [(4, 2), (5, 3)])
def test_grouped_aggregation_s4_kernel_bitexact(jn_shape):
    """The s4 diag-split kernel matches its XLA twin to 1 ulp: identical
    int4->int8 products and int32-exact pair sum; the f32 epilogue keeps
    the same association but its multiply+add may fuse into FMA
    differently across the two compiled programs (measured max diff
    1.8e-7 on outputs of scale ~1.6), so the guard is a tight allclose,
    not assert_array_equal like the pure-multiply int8 epilogue."""
    from posetpu.models.quant import (
        aggregation_int4_apply_jns_grouped,
        quantize_aggregation_grouped_s4,
    )
    from posetpu.ops.pallas.aggregation import aggregation_grouped_pallas_s4

    j, n = jn_shape
    s = 256
    rng = np.random.RandomState(3)
    bank = rng.randn(12, s, s).astype(np.float32) * 0.05
    for i in range(12):
        bank[i] += np.eye(s, dtype=np.float32)
    qagg = quantize_aggregation_grouped_s4(jnp.asarray(bank))
    hm = jnp.asarray(rng.rand(j, n, 4, s).astype(np.float32))

    ref = aggregation_int4_apply_jns_grouped(qagg, hm)
    out = aggregation_grouped_pallas_s4(qagg, hm, block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=0, atol=1e-6)


def test_grouped_aggregation_s4_close_to_float_and_beats_straight_int4():
    """Accuracy structure of the diag-split: on an identity-dominated bank
    (the reference's ChannelWiseFC regime, multiview_pose_resnet.py:16-30)
    the s4 path must stay as close to the float fusion as the int8 path
    does, while a STRAIGHT int4 quantization of the same bank (per-column
    amax pinned at the ~1.0 diagonal, off-diagonals crushed to steps of
    amax/7) must be measurably worse — the receipt that the split is what
    makes 4-bit storage usable here."""
    from posetpu.models.multiview import Aggregation
    from posetpu.models.quant import (
        aggregation_int4_apply_jns_grouped,
        aggregation_int8_apply_jns_grouped,
        quantize_aggregation_grouped,
        quantize_aggregation_grouped_s4,
    )

    s = 8
    rng = np.random.RandomState(4)
    bank = rng.uniform(0, 0.1, (12, s * s, s * s)).astype(np.float32)
    bank += np.eye(s * s, dtype=np.float32)[None]
    hm = rng.uniform(0, 1, (2, 4, s, s, 3)).astype(np.float32)
    model = Aggregation(heatmap_size=s)
    ref = np.asarray(model.apply({"params": {"weight": jnp.asarray(bank)}},
                                 jnp.asarray(hm)))
    hm_jns = jnp.moveaxis(jnp.asarray(hm.reshape(2, 4, s * s, 3)), 3, 0)
    ref_jns = np.moveaxis(ref.reshape(2, 4, s * s, 3), 3, 0)

    q8 = quantize_aggregation_grouped(bank, calib_heatmaps=hm)
    got8 = np.asarray(aggregation_int8_apply_jns_grouped(q8, hm_jns))
    q4 = quantize_aggregation_grouped_s4(bank, calib_heatmaps=hm)
    got4 = np.asarray(aggregation_int4_apply_jns_grouped(q4, hm_jns))

    err8 = np.abs(got8 - ref_jns).max()
    err4 = np.abs(got4 - ref_jns).max()
    assert err4 < 2.0 * err8 + 1e-6, (err4, err8)

    # straight int4 on the same bank: residual quantized against the
    # diagonal-pinned amax
    w = bank.reshape(4, 3, s * s, s * s)
    s_w = np.maximum(np.abs(w).max(axis=(1, 2), keepdims=True), 1e-8) / 7.0
    wq = np.clip(np.round(w / s_w), -7, 7).astype(np.int8)
    q4s = dict(q8)
    q4s["wq"] = jnp.asarray(wq)
    q4s["w_scale"] = jnp.asarray(s_w[:, 0].astype(np.float32))
    got4s = np.asarray(aggregation_int8_apply_jns_grouped(q4s, hm_jns))
    err4s = np.abs(got4s - ref_jns).max()
    assert err4s > 3.0 * err4, (err4s, err4)
