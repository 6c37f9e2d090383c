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
