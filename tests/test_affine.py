"""Affine transform parity vs the cv2 3-point construction the reference uses."""

import cv2
import numpy as np
import pytest

from posetpu.ops.affine import (
    affine_transform_points,
    get_affine_transform,
    transform_preds,
)


def _reference_affine(center, scale, rot, output_size, inv=0):
    """Oracle: the reference's 3-point + cv2.getAffineTransform construction
    (lib/utils/transforms.py:76-109), reimplemented minimally for testing."""
    scale = np.array([scale, scale]) if np.isscalar(scale) else np.asarray(scale)
    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size

    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([-src_w * 0.5 * -sn * -1, 0], np.float32)  # placeholder
    # direction [0, -src_w/2] rotated CCW by rot_rad
    src_dir = np.array(
        [0 * cs - (-src_w * 0.5) * sn, 0 * sn + (-src_w * 0.5) * cs], np.float32
    )
    dst_dir = np.array([0, -dst_w * 0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    src[2] = third(src[0], src[1])
    dst[2] = third(dst[0], dst[1])

    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


@pytest.mark.parametrize("rot", [0.0, 13.0, -47.0, 90.0])
@pytest.mark.parametrize("inv", [0, 1])
def test_matches_cv2_construction(rot, inv, rng):
    center = rng.uniform(50, 900, size=2).astype(np.float32)
    scale = rng.uniform(0.8, 3.0, size=2).astype(np.float32)
    out_size = (256, 256)
    ours = np.asarray(get_affine_transform(center, scale, rot, out_size, inv=bool(inv)))
    ref = _reference_affine(center, scale, rot, out_size, inv=inv)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_rect_output_size(rng):
    center = np.array([320.0, 240.0], np.float32)
    scale = np.array([1.5, 1.5], np.float32)
    ours = np.asarray(get_affine_transform(center, scale, 25.0, (192, 256)))
    ref = _reference_affine(center, scale, 25.0, (192, 256))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_batched_points_roundtrip(rng):
    center = rng.uniform(100, 500, size=(5, 2)).astype(np.float32)
    scale = rng.uniform(1.0, 2.0, size=(5, 2)).astype(np.float32)
    rot = rng.uniform(-30, 30, size=(5,)).astype(np.float32)
    pts = rng.uniform(0, 600, size=(5, 16, 2)).astype(np.float32)

    fwd = get_affine_transform(center, scale, rot, (256, 256))
    inv = get_affine_transform(center, scale, rot, (256, 256), inv=True)
    warped = affine_transform_points(pts, fwd)
    back = affine_transform_points(warped, inv)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-3, atol=5e-2)


def test_transform_preds_matches_reference_path(rng):
    """transform_preds == applying the inverse crop affine per point."""
    center = np.array([400.0, 300.0], np.float32)
    scale = np.array([2.0, 2.0], np.float32)
    coords = rng.uniform(0, 64, size=(16, 2)).astype(np.float32)
    ref_t = _reference_affine(center, scale, 0, (64, 64), inv=1)
    expected = (np.concatenate([coords, np.ones((16, 1))], 1) @ ref_t.T)
    got = np.asarray(transform_preds(coords, center, scale, (64, 64)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)
