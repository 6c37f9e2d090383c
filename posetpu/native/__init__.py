"""Native (C++) data-loading fast path.

Compiles ``dataload.cpp`` on first import (cached as a shared object beside
the source) and exposes it via ctypes. Everything degrades gracefully: if the
toolchain or libjpeg/zlib are missing, ``available()`` returns False and the
Python (cv2/zipfile) paths are used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataload.cpp")
_SO = os.path.join(_HERE, "_dataload.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-ljpeg", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ptpu_load_warp.restype = ctypes.c_int
        lib.ptpu_load_warp.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.ptpu_load_warp_batch.restype = ctypes.c_int
        lib.ptpu_load_warp_batch.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.ptpu_load_warp_batch_geom.restype = ctypes.c_int
        lib.ptpu_load_warp_batch_geom.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.ptpu_zip_read.restype = ctypes.c_long
        lib.ptpu_zip_read.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_warp(path: str, inner: str, inv_m: np.ndarray, out_h: int, out_w: int):
    """Decode one JPEG (plain file or zip member) and warp to [out_h, out_w, 3]
    BGR uint8 with the dst->src affine ``inv_m`` [2, 3]. None on failure."""
    lib = _load()
    if lib is None:
        return None
    dst = np.empty((out_h, out_w, 3), np.uint8)
    m = np.ascontiguousarray(inv_m, np.float32)
    rc = lib.ptpu_load_warp(
        path.encode(), (inner or "").encode(),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w,
    )
    return dst if rc == 0 else None


def load_warp_batch(paths, inners, inv_ms, out_h: int, out_w: int,
                    n_threads: int = 4):
    """Threaded batch decode+warp -> [N, out_h, out_w, 3] uint8 BGR.
    Returns (array, n_failures); None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    dst = np.empty((n, out_h, out_w, 3), np.uint8)
    m = np.ascontiguousarray(np.asarray(inv_ms, np.float32).reshape(n, 6))
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_inners = (ctypes.c_char_p * n)(*[(s or "").encode() for s in inners])
    fails = lib.ptpu_load_warp_batch(
        n, c_paths, c_inners,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, n_threads,
    )
    return dst, int(fails)


def load_warp_batch_geom(paths, inners, geoms, out_h: int, out_w: int,
                         n_threads: int = 8, s2d: bool = False,
                         hwcn: bool = False):
    """Geometry-driven threaded batch decode+warp.

    ``geoms``: [N, 5] float32 rows (cx, cy, box_w_px, rot_deg, flip). The
    crop matrix — including a source-image horizontal flip, which needs the
    raw width — is built natively after decode, so flipped training samples
    stay on the C++ path (the old per-matrix API had to fall back to Python
    for them).

    ``s2d=True`` writes each record space-to-depth packed —
    [N, out_h/2, out_w/2, 12] with channels ((y&1)*2 + (x&1))*3 + c, the
    serving input contract of quant.qchain(s2d="pre") (same bytes, free on
    the host; the device-side retile that sank the in-graph s2d stem never
    exists).

    ``hwcn=True`` (requires ``s2d``) interleaves the records batch-minor:
    [out_h/2, out_w/2, 12, N] — the (H, W, C, N) serving contract whose
    physical byte order IS the stem conv's preferred N-minor layout, so the
    device-side u8 affine feeds the conv with no input retile (measured
    +3.1% headline / +5.4% flip-test, PERF.md win #10).

    Returns (images [N, out_h, out_w, 3] uint8 BGR — or the packed/
    interleaved shape with ``s2d``/``hwcn`` — widths [N] int32 with -1
    marking per-record failures, n_failures); None if the lib is missing.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    assert s2d or not hwcn, "hwcn requires the s2d packing"
    shape = (n, out_h // 2, out_w // 2, 12) if s2d else (n, out_h, out_w, 3)
    if hwcn:
        shape = (out_h // 2, out_w // 2, 12, n)
    dst = np.empty(shape, np.uint8)
    widths = np.empty(n, np.int32)
    g = np.ascontiguousarray(np.asarray(geoms, np.float32).reshape(n, 5))
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_inners = (ctypes.c_char_p * n)(*[(s or "").encode() for s in inners])
    fails = lib.ptpu_load_warp_batch_geom(
        n, c_paths, c_inners,
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_h, out_w, n_threads, 1 if s2d else 0, 1 if hwcn else 0,
    )
    return dst, widths, int(fails)


def zip_read(zip_path: str, inner: str) -> bytes | None:
    """Raw zip member bytes via the native reader (zipreader backend)."""
    lib = _load()
    if lib is None:
        return None
    cap = 1 << 24
    buf = np.empty(cap, np.uint8)
    size = lib.ptpu_zip_read(
        zip_path.encode(), inner.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if size < 0:
        if size < -1:  # buffer too small: retry with exact size
            cap = -size
            buf = np.empty(cap, np.uint8)
            size = lib.ptpu_zip_read(
                zip_path.encode(), inner.encode(),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            )
            if size < 0:
                return None
        else:
            return None
    return bytes(buf[:size])
