"""ctypes bindings for the native C++ image pipeline (native/imageops.cpp).

Compiles native/libimageops.so on first use (cached by mtime) and exposes:
  - load_image(path, size, mode)         one image -> (size,size,3) uint8
  - load_batch(paths, size, mode, n_threads)  threaded batch decode
  - native_image_loader                  drop-in for collators' image_loader

Falls back to PIL transparently if the toolchain or libjpeg is missing, so
nothing in the stack hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libimageops.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "imageops.cpp")

_lib = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if (
            not os.path.exists(_SO_PATH)
            or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
        ):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.vlr_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.vlr_load_image.restype = ctypes.c_int
        lib.vlr_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.vlr_load_batch.restype = ctypes.c_int
        lib.vlr_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.vlr_decode_jpeg.restype = ctypes.c_long
        _lib = lib
        return lib
    except Exception:
        _build_failed = True
        return None


def native_available() -> bool:
    return _ensure_built() is not None


_MODES = {"squash": 0, "shortest_edge_crop": 1}


def load_image(path: str, size: int, mode: str = "shortest_edge_crop"):
    """(size, size, 3) uint8, or None on decode failure (caller falls back)."""
    lib = _ensure_built()
    if lib is None or not path.lower().endswith((".jpg", ".jpeg")):
        return None
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.vlr_load_image(
        path.encode(), size, _MODES[mode],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def load_batch(
    paths: Sequence[Optional[str]],
    size: int,
    mode: str = "shortest_edge_crop",
    n_threads: int = 8,
) -> Optional[np.ndarray]:
    lib = _ensure_built()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(
        *[(p or "").encode() for p in paths]
    )
    lib.vlr_load_batch(
        arr, n, size, _MODES[mode],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads,
    )
    return out


def native_image_loader(path: str, size: int, mode: str = "shortest_edge_crop"):
    """Drop-in `image_loader` for the collators: native fast path, PIL
    fallback for non-JPEG formats or when the native lib is unavailable."""
    out = load_image(path, size, mode)
    if out is not None:
        return out
    from vlrlhf_tpu.data.collators import default_image_loader

    return default_image_loader(path, size, mode)
