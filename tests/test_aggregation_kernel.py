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
