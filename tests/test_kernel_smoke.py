"""Fast-tier smoke guards for the ADOPTED serving kernels (ADVICE r3).

The full bit-exactness suite for the serving path lives in the slow tier
(test_phase_kernel/test_phase_tail/test_serving, ~100 s of interpret-mode
Pallas on this host); a plain `pytest` run still needs SOME guard on the
kernels that produce the headline number. One minimal configuration each:
32x32 input (8x8 heatmaps), batch 2, single quantize per path.
"""

import jax.numpy as jnp
import numpy as np

from posetpu.models.quant import quantize_pose_resnet
from tests.test_quant import _trained_like_variables


def test_adopted_tail2_kernel_bitexact_smoke(rng):
    """Two-level fused tail (phase_kernel=2, the adopted serving config)
    vs the XLA phase tail at a tiny shape — bit-exact up to the static
    levels=2 packing permutation."""
    from posetpu.ops.heatmap import phase_index_tables

    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 32, 32, 3).astype(np.float32)]
    qparams, fwd = quantize_pose_resnet(model, variables, calib,
                                        jns_head="phase")
    qparams2, fwd2 = quantize_pose_resnet(
        model, variables, calib, jns_head="phase",
        phase_kernel="interpret2")

    t1 = phase_index_tables((8, 8), levels=1)
    t2 = phase_index_tables((8, 8), levels=2)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    ref = np.asarray(fwd(qparams, x))[..., t1["packed"]]  # -> row-major
    got = np.asarray(fwd2(qparams2, x))[..., t2["packed"]]
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)
