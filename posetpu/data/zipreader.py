"""Zip-archived image reading (``archive.zip@/inner/path`` paths).

Equivalent of lib/utils/zipreader.py:24-47: keeps opened zipfiles cached per
path and decodes images with cv2. Thread-safe for the prefetching loader.
"""

from __future__ import annotations

import threading
import zipfile

import cv2
import numpy as np

_cache: dict[str, zipfile.ZipFile] = {}
_lock = threading.Lock()


def split_zip_path(path: str) -> tuple[str, str]:
    """'/a/b.zip@/inner/img.jpg' -> ('/a/b.zip', 'inner/img.jpg')."""
    if "@" not in path:
        raise ValueError(f"not a zip path: {path}")
    zip_path, inner = path.split("@", 1)
    return zip_path, inner.lstrip("/")


def is_zip_path(path: str) -> bool:
    return "@" in path


def _get_zip(zip_path: str) -> zipfile.ZipFile:
    with _lock:
        zf = _cache.get(zip_path)
        if zf is None:
            zf = zipfile.ZipFile(zip_path, "r")
            _cache[zip_path] = zf
        return zf


def imread(path: str, flags: int = cv2.IMREAD_COLOR) -> np.ndarray:
    """Read an image from a plain path or a zip@inner path (BGR, like cv2)."""
    if is_zip_path(path):
        zip_path, inner = split_zip_path(path)
        zf = _get_zip(zip_path)
        with _lock:
            data = zf.read(inner)
        buf = np.frombuffer(data, np.uint8)
        img = cv2.imdecode(buf, flags)
    else:
        img = cv2.imread(path, flags)
    if img is None:
        raise FileNotFoundError(path)
    return img
