"""Fused int8 bottleneck Pallas kernel vs the XLA _Int8Runner reference.

Runs in interpret mode on the CPU mesh (conftest forces JAX_PLATFORMS=cpu),
checking the fused kernel reproduces quant.py's per-site requantisation
semantics. The downsample variant tolerates |diff| <= 1 on a tiny fraction of
elements (f32 scale-folding ULPs can flip a round-half-even boundary).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from posetpu.models.quant import _Int8Runner  # noqa: E402
from posetpu.ops.pallas.resblock import (  # noqa: E402
    build_bottleneck_args,
    fused_bottleneck,
)


def _mk_qparams(rng, name, cin, cm, cout, with_ds):
    def w(shape):
        return jnp.asarray(rng.integers(-127, 128, size=shape).astype(np.int8))

    def s(n):
        return jnp.asarray(rng.uniform(0.001, 0.01, n).astype(np.float32))

    def b(n):
        return jnp.asarray(rng.normal(0, 0.5, n).astype(np.float32))

    qp = {
        "weights": {
            f"{name}.conv1": w((1, 1, cin, cm)),
            f"{name}.conv2": w((3, 3, cm, cm)),
            f"{name}.conv3": w((1, 1, cm, cout)),
        },
        "w_scales": {
            f"{name}.conv1": s(cm),
            f"{name}.conv2": s(cm),
            f"{name}.conv3": s(cout),
        },
        "biases": {
            f"{name}.conv1": b(cm),
            f"{name}.conv2": b(cm),
            f"{name}.conv3": b(cout),
        },
        "act_scales": {
            f"{name}.conv1.out": jnp.float32(0.02),
            f"{name}.conv2.out": jnp.float32(0.03),
            f"{name}.out": jnp.float32(0.05),
        },
    }
    if with_ds:
        qp["weights"][f"{name}.downsample"] = w((1, 1, cin, cout))
        qp["w_scales"][f"{name}.downsample"] = s(cout)
        qp["biases"][f"{name}.downsample"] = b(cout)
        qp["act_scales"][f"{name}.downsample.out"] = jnp.float32(0.04)
    return qp


@pytest.mark.parametrize("with_ds", [False, True])
def test_fused_bottleneck_matches_xla_runner(with_ds):
    rng = np.random.default_rng(0)
    h = w = 8
    cin, cm, cout = 64, 32, 64
    n = 2
    name = "layer1_0" if with_ds else "layer1_1"
    qp = _mk_qparams(rng, name, cin, cm, cout, with_ds)
    s_in = 0.025
    x_q = jnp.asarray(rng.integers(-127, 128, size=(n, h, w, cin)).astype(np.int8))

    runner = _Int8Runner(qp)
    m, s_m = runner.qchain(x_q, jnp.float32(s_in), f"{name}.conv1")
    m, s_m = runner.qchain(m, s_m, f"{name}.conv2", stride=1)
    y = runner.conv_f32(m, s_m, f"{name}.conv3")
    if with_ds:
        r_q, r_s = runner.qchain(
            x_q, jnp.float32(s_in), f"{name}.downsample", stride=1, relu=False
        )
    else:
        r_q, r_s = x_q, jnp.float32(s_in)
    out = jax.nn.relu(y + runner.dequant(r_q, r_s))
    ref_q, _ = runner.requant(out, f"{name}.out")
    ref = np.asarray(ref_q)

    args = build_bottleneck_args(qp, name, s_in)
    got = fused_bottleneck(
        x_q.reshape(n, h * w, cin), args, h=h, w=w, interpret=True
    )
    got = np.asarray(got).reshape(n, h, w, cout)

    diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
    assert diff.max() <= 1
    assert np.mean(diff > 0) < 1e-3
    assert ref.std() > 1.0  # non-degenerate fixture


def test_fused_bottleneck_v2_matches_xla_runner():
    """v2 (im2col 3x3, multi-image steps) reproduces the same semantics.
    Kept as a measured-and-rejected variant (PERF.md): XLA's conv emitter
    wins at every bottleneck shape on v5e."""
    from posetpu.ops.pallas.resblock import fused_bottleneck_v2

    rng = np.random.default_rng(1)
    h = w = 8
    cin, cm, cout = 64, 32, 64
    n = 4
    name = "layer1_1"
    qp = _mk_qparams(rng, name, cin, cm, cout, False)
    s_in = 0.025
    x_q = jnp.asarray(rng.integers(-127, 128, size=(n, h, w, cin)).astype(np.int8))

    runner = _Int8Runner(qp)
    m, s_m = runner.qchain(x_q, jnp.float32(s_in), f"{name}.conv1")
    m, s_m = runner.qchain(m, s_m, f"{name}.conv2", stride=1)
    y = runner.conv_f32(m, s_m, f"{name}.conv3")
    out = jax.nn.relu(y + runner.dequant(x_q, jnp.float32(s_in)))
    ref_q, _ = runner.requant(out, f"{name}.out")
    ref = np.asarray(ref_q)

    args = build_bottleneck_args(qp, name, s_in)
    got = fused_bottleneck_v2(
        x_q.reshape(n, h * w, cin), args, h=h, w=w, imgs=2, interpret=True
    )
    got = np.asarray(got).reshape(n, h, w, cout)
    diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
    assert diff.max() <= 2
    assert np.mean(diff > 0) < 1e-3
