"""Native C++ loader parity vs the cv2/zipfile Python path."""

import os
import zipfile

import cv2
import numpy as np
import pytest

from posetpu import native
from posetpu.data.base import _affine_matrix_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain/libjpeg unavailable"
)


@pytest.fixture
def jpeg_file(tmp_path):
    img = np.random.RandomState(0).randint(0, 255, (120, 160, 3), np.uint8)
    path = str(tmp_path / "img.jpg")
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    return path, cv2.imread(path)  # decode with cv2 as the oracle


def _inv(center, scale, rot, out_size):
    """dst->src matrix like cv2.warpAffine's internal inversion."""
    m = _affine_matrix_np(center, scale, rot, out_size)
    m3 = np.vstack([m, [0, 0, 1]])
    return np.linalg.inv(m3)[:2]


def test_decode_warp_matches_cv2(jpeg_file):
    path, oracle_img = jpeg_file
    center, scale = np.array([80.0, 60.0]), np.array([0.5, 0.5])
    inv = _inv(center, scale, 15.0, (64, 64))
    got = native.load_warp(path, "", inv, 64, 64)
    assert got is not None
    fwd = _affine_matrix_np(center, scale, 15.0, (64, 64))
    exp = cv2.warpAffine(oracle_img, fwd, (64, 64), flags=cv2.INTER_LINEAR)
    # libjpeg vs cv2 JPEG decode and interpolation rounding differ slightly
    diff = np.abs(got.astype(int) - exp.astype(int))
    assert np.median(diff) <= 1
    assert (diff > 8).mean() < 0.02, (diff.mean(), (diff > 8).mean())


def test_zip_member_decode(jpeg_file, tmp_path):
    path, oracle_img = jpeg_file
    zpath = str(tmp_path / "a.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.write(path, "images/img.jpg")
    raw = native.zip_read(zpath, "images/img.jpg")
    assert raw == open(path, "rb").read()

    inv = _inv(np.array([80.0, 60.0]), np.array([0.5, 0.5]), 0.0, (48, 48))
    got = native.load_warp(zpath, "images/img.jpg", inv, 48, 48)
    assert got is not None and got.shape == (48, 48, 3)


def test_zip_stored_member(tmp_path, jpeg_file):
    path, _ = jpeg_file
    zpath = str(tmp_path / "s.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
        zf.write(path, "img.jpg")
    raw = native.zip_read(zpath, "img.jpg")
    assert raw == open(path, "rb").read()


def test_batch_parity_and_failures(jpeg_file, tmp_path):
    path, _ = jpeg_file
    inv = _inv(np.array([80.0, 60.0]), np.array([0.5, 0.5]), 0.0, (32, 32))
    out = native.load_warp_batch(
        [path, path, str(tmp_path / "missing.jpg")],
        ["", "", ""],
        np.stack([inv, inv, inv]),
        32, 32, n_threads=2,
    )
    assert out is not None
    imgs, fails = out
    assert fails == 1
    np.testing.assert_array_equal(imgs[0], imgs[1])
    single = native.load_warp(path, "", inv, 32, 32)
    np.testing.assert_array_equal(imgs[0], single)
