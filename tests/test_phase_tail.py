"""Phase-domain serving-tail equivalence vs the jns (S-minor) tail.

The phase tail runs the LAST k4/s2 deconv as a stride-1 2x2 subpixel conv and
keeps the four phase groups separate all the way through the 1x1 head
(quant._Int8Runner.{subpixel_phases,final_phase}); the depth-to-space
interleave the earlier subpixel experiments paid for (PERF.md) is replaced by
static index bookkeeping: each group's conv padding selects its valid window so the head emits the packed order directly, the aggregation bank is permuted offline
(permute_aggregation_packed) and decode maps packed indices back to row-major
pixels (decode_heatmaps_packed). Every step is int32/elementwise-exact, so
the phase tail must match the jns tail BIT-FOR-BIT, not just approximately.
"""

import jax.numpy as jnp
import numpy as np

from posetpu.core.inference import final_preds_jns, final_preds_packed
from posetpu.models.quant import (
    aggregation_int8_apply_jns,
    permute_aggregation_packed,
    quantize_aggregation,
    quantize_pose_resnet,
)
from posetpu.ops.heatmap import (
    decode_heatmaps_jns,
    decode_heatmaps_packed,
    phase_index_tables,
)
from tests.test_quant import _trained_like_variables


def test_phase_index_tables_roundtrip():
    t = phase_index_tables((16, 16))
    r, p = t["rowmajor"], t["packed"]
    np.testing.assert_array_equal(r[p], np.arange(256))
    np.testing.assert_array_equal(p[r], np.arange(256))
    # packed position 0 is phase (0,0) pixel (0,0); the second phase group
    # starts at the (0,1) pixel
    assert r[0] == 0 and r[(16 // 2) * (16 // 2)] == 1


def test_phase_forward_bitexact_vs_jns(rng):
    """Full int8 forward: phase head + pack == jns head re-indexed, exactly
    (same int8 products, int32 accumulation, identical f32 epilogues)."""
    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    qparams, fwd_jns = quantize_pose_resnet(model, variables, calib,
                                            jns_head=True)
    _, fwd_phase = quantize_pose_resnet(model, variables, calib,
                                        jns_head="phase")

    x = jnp.asarray(rng.randn(3, 64, 64, 3).astype(np.float32))
    hm_jns = fwd_jns(qparams, x)  # [J, N, S] rowmajor S
    packed = fwd_phase(qparams, x)  # [J, N, S] phase-PACKED S
    j, n, s = hm_jns.shape
    assert packed.shape == (j, n, s)
    h = w = int(np.sqrt(s))

    tables = phase_index_tables((h, w))
    np.testing.assert_array_equal(
        np.asarray(packed)[..., tables["packed"]], np.asarray(hm_jns)
    )


def test_permuted_aggregation_matches(rng):
    j, n, v, h, w = 16, 2, 4, 16, 16
    s = h * w
    tables = phase_index_tables((h, w))
    hm = jnp.asarray(rng.rand(j, n, v, s).astype(np.float32))
    bank = rng.randn(12, s, s).astype(np.float32) * 0.01
    qagg = quantize_aggregation(bank)
    qagg_p = permute_aggregation_packed(qagg, tables)

    fused = aggregation_int8_apply_jns(qagg, hm)
    fused_p = aggregation_int8_apply_jns(qagg_p, hm[..., tables["rowmajor"]])
    np.testing.assert_array_equal(
        np.asarray(fused_p), np.asarray(fused)[..., tables["rowmajor"]]
    )


def test_decode_packed_matches_jns(rng):
    """Packed decode must reproduce the row-major first-occurrence argmax
    tie-break and the quarter-pixel refinement exactly."""
    j, n, v, h, w = 16, 2, 4, 16, 16
    tables = phase_index_tables((h, w))
    hm = rng.rand(j, n, v, h * w).astype(np.float32)
    # force argmax ties across phase groups (the packed order would pick a
    # different winner without the min-rowmajor lookup)
    hm[0, :, :, :] = np.round(hm[0] * 4) / 4
    hm[1, 0, 0, :] = 0.0  # all-tied map: winner must be pixel (0, 0)
    hm[2, 0, 0, 5] = hm[2, 0, 0, 200] = 2.0  # explicit two-pixel tie
    hm = jnp.asarray(hm)
    hm_p = hm[..., tables["rowmajor"]]

    for pp in (True, False):
        c, m = decode_heatmaps_jns(hm, (h, w), post_process=pp)
        c_p, m_p = decode_heatmaps_packed(hm_p, tables, (h, w),
                                          post_process=pp)
        np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m))
        np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c))


def test_final_preds_packed_matches_jns(rng):
    j, n, v, h, w = 16, 2, 4, 16, 16
    tables = phase_index_tables((h, w))
    hm = jnp.asarray(rng.rand(j, n, v, h * w).astype(np.float32))
    center = jnp.asarray(rng.rand(n, v, 2).astype(np.float32) * 500)
    scale = jnp.full((n, v, 2), 2.0, jnp.float32)
    preds, maxv = final_preds_jns(hm, center, scale, (h, w))
    preds_p, maxv_p = final_preds_packed(
        hm[..., tables["rowmajor"]], center, scale, (h, w), tables
    )
    np.testing.assert_array_equal(np.asarray(maxv_p), np.asarray(maxv))
    np.testing.assert_allclose(np.asarray(preds_p), np.asarray(preds),
                               rtol=1e-6, atol=1e-6)


def test_s2d_stem_bitexact(rng):
    """Space-to-depth stem (s2d_stem_weights + _s2d input fold) is bit-exact
    vs the standard int8 stem: same weight set plus zeros, same per-channel
    scales, int32 accumulation."""
    from posetpu.models.quant import quantize_pose_resnet

    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    q1, f1 = quantize_pose_resnet(model, variables, calib, jns_head=True)
    q2, f2 = quantize_pose_resnet(model, variables, calib, jns_head=True,
                                  stem_s2d=True)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(f1(q1, x)),
                                  np.asarray(f2(q2, x)))

    # "pre" mode: the input arrives ALREADY s2d-packed (host-side serving
    # contract) — same conv, no device retile, still bit-exact
    from posetpu.models.quant import _s2d

    q3, f3 = quantize_pose_resnet(model, variables, calib, jns_head=True,
                                  stem_s2d="pre")
    np.testing.assert_array_equal(np.asarray(f1(q1, x)),
                                  np.asarray(f3(q3, _s2d(x))))


def test_mirror_s2d_matches_mirror_then_pack(rng):
    """Packed horizontal mirror (flip-test on the s2d serving input):
    mirror_s2d(pack(x)) == pack(x[..., ::-1, :]) exactly — reversing the
    packed column axis + swapping the b-phase channel groups IS the
    row-major W-mirror. Also checks the native loader's s2d output is the
    pack of its plain output (same bytes, s2d addresses)."""
    from posetpu.models.quant import _s2d, mirror_s2d

    x = jnp.asarray(rng.randint(0, 256, (2, 8, 12, 3)).astype(np.uint8))
    packed = _s2d(x)
    np.testing.assert_array_equal(
        np.asarray(mirror_s2d(packed)), np.asarray(_s2d(x[:, :, ::-1, :])))


def test_mirror_s2d_hwcn_matches_mirror_s2d(rng):
    """Batch-minor twin: mirror_s2d_hwcn on the (H, W, C, N)-transposed pack
    equals mirror_s2d on the [N, H, W, C] pack, transposed."""
    from posetpu.models.quant import _s2d, mirror_s2d, mirror_s2d_hwcn

    x = jnp.asarray(rng.randint(0, 256, (3, 8, 12, 3)).astype(np.uint8))
    packed = _s2d(x)  # [N, 4, 6, 12]
    hwcn = jnp.transpose(packed, (1, 2, 3, 0))
    np.testing.assert_array_equal(
        np.asarray(mirror_s2d_hwcn(hwcn)),
        np.asarray(jnp.transpose(mirror_s2d(packed), (1, 2, 3, 0))))


def test_native_loader_hwcn_output(rng, tmp_path):
    """load_warp_batch_geom(s2d=True, hwcn=True) returns exactly the
    batch-minor transpose of the s2d output — the (H, W, C, N) serving
    input contract (bench input_layout='hwcn', PERF.md win #10)."""
    import cv2

    from posetpu import native

    if not native.available():
        import pytest

        pytest.skip("native loader unavailable")
    imgs, paths = [], []
    for i in range(3):
        img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{i}.jpg")
        cv2.imwrite(p, img)
        imgs.append(img)
        paths.append(p)
    geom = np.array([[40, 32, 48, 0, 0]] * 3, np.float32)
    geom[1, 3] = 20.0  # one rotated record
    geom[2, 4] = 1.0   # one flipped record
    packed, w1, f1 = native.load_warp_batch_geom(
        paths, [""] * 3, geom, 32, 32, s2d=True)
    hwcn, w2, f2 = native.load_warp_batch_geom(
        paths, [""] * 3, geom, 32, 32, s2d=True, hwcn=True)
    assert f1 == 0 and f2 == 0
    assert hwcn.shape == (16, 16, 12, 3)
    np.testing.assert_array_equal(hwcn, packed.transpose(1, 2, 3, 0))


def test_native_loader_s2d_output(rng, tmp_path):
    """native.load_warp_batch_geom(s2d=True) returns exactly the space-to-
    depth pack of its plain output (serving input contract for
    quant.qchain(s2d='pre'))."""
    import cv2

    from posetpu import native

    if not native.available():  # toolchain-less environment: Python path only
        import pytest

        pytest.skip("native loader unavailable")
    img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    cv2.imwrite(p, img)
    geom = np.array([[40, 32, 48, 0, 0]], np.float32)
    plain, w1, f1 = native.load_warp_batch_geom([p], [""], geom, 32, 32)
    packed, w2, f2 = native.load_warp_batch_geom([p], [""], geom, 32, 32,
                                                 s2d=True)
    assert f1 == 0 and f2 == 0
    ref = (plain.reshape(1, 16, 2, 16, 2, 3)
           .transpose(0, 1, 3, 2, 4, 5).reshape(1, 16, 16, 12))
    np.testing.assert_array_equal(packed, ref)


def test_per_name_subpixel_deconv(rng):
    """subpixel_deconvs as a name set quantizes only those deconvs in phase
    layout; output stays close to the all-dilated path (finer per-phase
    weight scales change the int8 values, so equality is approximate)."""
    from posetpu.models.quant import quantize_pose_resnet

    model, variables = _trained_like_variables(rng)
    calib = [rng.randn(2, 64, 64, 3).astype(np.float32)]
    q1, f1 = quantize_pose_resnet(model, variables, calib, jns_head=True)
    q2, f2 = quantize_pose_resnet(model, variables, calib, jns_head=True,
                                  subpixel_deconvs={"deconv0"})
    assert q2["weights"]["deconv0"].shape[-1] == 4 * q1["weights"]["deconv0"].shape[-1]
    assert q2["weights"]["deconv1"].shape == q1["weights"]["deconv1"].shape
    x = jnp.asarray(calib[0])
    a, b = np.asarray(f1(q1, x)), np.asarray(f2(q2, x))
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.999, corr


def test_flip_back_packed_matches_jns(rng):
    """Packed flip-back == jns flip-back re-indexed (same for the shift)."""
    from posetpu.core.inference import flip_test_merge_jns, flip_test_merge_packed

    j, n, h, w = 16, 3, 16, 16
    tables = phase_index_tables((h, w))
    flip_pairs = [(0, 5), (1, 4), (2, 3), (10, 15)]
    hm = jnp.asarray(rng.rand(j, n, h * w).astype(np.float32))
    hm_f = jnp.asarray(rng.rand(j, n, h * w).astype(np.float32))

    for shift in (False, True):
        merged = flip_test_merge_jns(hm, hm_f, flip_pairs, (h, w), shift=shift)
        merged_p = flip_test_merge_packed(
            hm[..., tables["rowmajor"]], hm_f[..., tables["rowmajor"]],
            flip_pairs, (h, w), shift=shift,
        )
        np.testing.assert_array_equal(
            np.asarray(merged_p), np.asarray(merged)[..., tables["rowmajor"]]
        )
