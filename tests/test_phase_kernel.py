"""Fused Pallas phase-tail kernel vs the XLA phase tail (interpret on CPU).

The kernel (ops/pallas/phase_tail.py) must be BIT-exact vs
quant._Int8Runner.{subpixel_phases, final_phase}: identical int8 products,
int32 accumulation, and the same f32 epilogue op order (the folded
scale/bias vectors are single-rounded f32 products).
"""

import jax.numpy as jnp
import numpy as np

from posetpu.models.quant import quantize_pose_resnet
from tests.test_quant import _trained_like_variables


def test_phase_kernel_bitexact_vs_xla_phase_tail(rng):
    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    qparams, fwd = quantize_pose_resnet(model, variables, calib,
                                        jns_head="phase")
    qparams_k, fwd_k = quantize_pose_resnet(model, variables, calib,
                                            jns_head="phase",
                                            phase_kernel="interpret")

    # N=3 exercises a grid that isn't a multiple of anything in particular
    for n in (8, 3):
        x = jnp.asarray(rng.randn(n, 64, 64, 3).astype(np.float32))
        ref = np.asarray(fwd(qparams, x))
        got = np.asarray(fwd_k(qparams_k, x))
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


def test_phase_tail2_bitexact_vs_xla_phase_tail(rng):
    """The TWO-level fused tail (deconv1 + deconv2 + head in one kernel)
    must equal the XLA phase tail up to the static levels=2 packing
    permutation — same int8 products, int32 sums and f32 epilogue."""
    from posetpu.ops.heatmap import phase_index_tables

    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    qparams, fwd = quantize_pose_resnet(model, variables, calib,
                                        jns_head="phase")
    qparams2, fwd2 = quantize_pose_resnet(model, variables, calib,
                                          jns_head="phase",
                                          phase_kernel="interpret2")
    assert "phase_tail2" in qparams2

    t1 = phase_index_tables((16, 16), levels=1)
    t2 = phase_index_tables((16, 16), levels=2)
    x = jnp.asarray(rng.randn(3, 64, 64, 3).astype(np.float32))
    ref = np.asarray(fwd(qparams, x))[..., t1["packed"]]  # -> row-major
    got = np.asarray(fwd2(qparams2, x))[..., t2["packed"]]
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)

    # the measured-and-rejected batched-deconv1 variant stays bit-exact
    from posetpu.ops.pallas import phase_tail as pt

    old = pt.TAIL2_BATCH_D1
    pt.TAIL2_BATCH_D1 = True
    try:
        qparams_b, fwd_b = quantize_pose_resnet(model, variables, calib,
                                                jns_head="phase",
                                                phase_kernel="interpret2")
        got_b = np.asarray(fwd_b(qparams_b, x))[..., t2["packed"]]
        np.testing.assert_array_equal(got_b, ref)
    finally:
        pt.TAIL2_BATCH_D1 = old

    # the operand-sharing flag (TAIL2_SHARE_OPS, adopted True) is also
    # bit-exact with sharing off — same dots/tap order/int32 accumulation,
    # just re-built shifted operands
    old = pt.TAIL2_SHARE_OPS
    pt.TAIL2_SHARE_OPS = False
    try:
        qparams_s, fwd_s = quantize_pose_resnet(model, variables, calib,
                                                jns_head="phase",
                                                phase_kernel="interpret2")
        got_s = np.asarray(fwd_s(qparams_s, x))[..., t2["packed"]]
        np.testing.assert_array_equal(got_s, ref)
    finally:
        pt.TAIL2_SHARE_OPS = old


def test_two_level_packed_ops_match_rowmajor(rng):
    """levels=2 tables are a true packing (decode/flip/shift twins all
    agree with the row-major reference ops through the tables)."""
    from posetpu.ops.heatmap import (
        flip_back_packed,
        phase_index_tables,
        shift_heatmap_right_packed,
    )

    h = w = 8
    t2 = phase_index_tables((h, w), levels=2)
    r, p = np.asarray(t2["rowmajor"]), np.asarray(t2["packed"])
    assert (r[p] == np.arange(h * w)).all() and (p[r] == np.arange(h * w)).all()

    hm_rm = rng.rand(3, 2, h * w).astype(np.float32)  # [J=3, N=2, S] row-major
    packed = jnp.asarray(hm_rm[..., r])

    # flip twin: pack(flip_rowmajor(unpack)) == flip_packed(pack)
    pairs = [(0, 1)]
    rm_img = hm_rm.reshape(3, 2, h, w)
    flipped_rm = rm_img[..., ::-1].reshape(3, 2, h * w)
    order = [1, 0, 2]
    flipped_rm = flipped_rm[order]
    got = np.asarray(flip_back_packed(packed, pairs, (h, w), levels=2))
    np.testing.assert_array_equal(got[..., p], flipped_rm)

    # shift twin: new[:, x] = old[:, x-1], first column duplicated
    shifted_rm = np.concatenate(
        [rm_img[..., :1], rm_img[..., :-1]], axis=-1
    ).reshape(3, 2, h * w)
    got = np.asarray(shift_heatmap_right_packed(packed, (h, w), levels=2))
    np.testing.assert_array_equal(got[..., p], shifted_rm)


def test_subpixel_deconv_kernel_bitexact_vs_xla_subpixel(rng):
    """The inner-deconv Pallas kernel (fused_subpixel_deconv) must be
    bit-exact vs quant.qchain(subpixel=True) through the whole forward
    (deconv0 subpixel + phase tail, the adopted serving config)."""
    from posetpu.ops.pallas import phase_tail as pt

    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    kw = dict(jns_head="phase", subpixel_deconvs={"deconv0"})
    qparams, fwd = quantize_pose_resnet(model, variables, calib, **kw)
    old = pt.SUBPIX_BATCHED
    pt.SUBPIX_BATCHED = False  # pin the per-pair kernel (receipts coverage)
    try:
        qparams_k, fwd_k = quantize_pose_resnet(model, variables, calib,
                                                phase_kernel="interpret",
                                                **kw)
        assert "subpix_deconv0" in qparams_k

        x = jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32))
        ref = np.asarray(fwd(qparams, x))
        got = np.asarray(fwd_k(qparams_k, x))
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)
    finally:
        pt.SUBPIX_BATCHED = old


def test_subpixel_deconv_kernel_batched_bitexact(rng):
    """The fully-batched variant (one M=nb*hw dot per (phase, tap),
    fused_subpixel_deconv_batched) is bit-exact vs the per-pair kernel
    path — same products/sums/epilogue, different dot batching. Covers
    both the nb=8 grid and the padded (n % 8 != 0) path."""
    from posetpu.ops.pallas import phase_tail as pt

    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    kw = dict(jns_head="phase", subpixel_deconvs={"deconv0"})
    qparams, fwd = quantize_pose_resnet(model, variables, calib, **kw)
    old = pt.SUBPIX_BATCHED
    pt.SUBPIX_BATCHED = True
    try:
        qparams_b, fwd_b = quantize_pose_resnet(model, variables, calib,
                                                phase_kernel="interpret",
                                                **kw)
        for n in (8, 3):
            x = jnp.asarray(rng.randn(n, 64, 64, 3).astype(np.float32))
            ref = np.asarray(fwd(qparams, x))
            got = np.asarray(fwd_b(qparams_b, x))
            assert got.shape == ref.shape
            np.testing.assert_array_equal(got, ref)
    finally:
        pt.SUBPIX_BATCHED = old
