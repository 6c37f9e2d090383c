"""Pallas fused decode vs the XLA decode (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from posetpu.ops.heatmap import decode_heatmaps
from posetpu.ops.pallas.decode import decode_heatmaps_pallas


def test_pallas_decode_matches_xla(rng):
    hm = rng.uniform(-0.2, 1.0, size=(3, 16, 64, 64)).astype(np.float32)
    exp_c, exp_v = decode_heatmaps(jnp.asarray(hm))
    got_c, got_v = decode_heatmaps_pallas(jnp.asarray(hm), interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(exp_v), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(exp_c), rtol=1e-6)


def test_pallas_decode_zero_map(rng):
    hm = np.zeros((1, 2, 32, 32), np.float32)
    c, v = decode_heatmaps_pallas(jnp.asarray(hm), interpret=True)
    np.testing.assert_allclose(np.asarray(c), 0.0)
    np.testing.assert_allclose(np.asarray(v), 0.0)


def test_pallas_decode_padding_rows(rng):
    """Row counts that aren't tile multiples pad internally and still match."""
    hm = rng.uniform(0, 1, size=(5, 7, 32, 32)).astype(np.float32)  # 35 rows
    exp_c, exp_v = decode_heatmaps(jnp.asarray(hm))
    got_c, got_v = decode_heatmaps_pallas(jnp.asarray(hm), tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(exp_c), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(exp_v), rtol=1e-6)
