"""ctypes binding to the native (C++/libjpeg/OpenMP) image loader.

Optional fast path for `detectax.data.pipeline`: multithreaded JPEG decode
+ bilinear resize without the Python/PIL per-image overhead. Auto-builds
`native/libdx_image.so` on first use (g++ is part of the toolchain);
callers fall back to PIL when unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libdx_image.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "libdx_image.so"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.dx_image_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dx_image_info.restype = ctypes.c_int
        lib.dx_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dx_decode_resize.restype = ctypes.c_int
        lib.dx_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.dx_decode_resize_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def image_info(path: str) -> tuple[int, int]:
    """(height, width) from the JPEG header."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.dx_image_info(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"dx_image_info failed ({rc}) for {path}")
    return h.value, w.value


def decode_resize(path: str, out_h: int, out_w: int) -> np.ndarray:
    """Decode a JPEG and bilinear-resize to [out_h, out_w, 3] float32."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((out_h, out_w, 3), np.float32)
    rc = lib.dx_decode_resize(
        path.encode(), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"dx_decode_resize failed ({rc}) for {path}")
    return out


def decode_resize_batch(
    paths: list[str],
    out_hw: list[tuple[int, int]],
    num_threads: int = 0,
) -> list[np.ndarray]:
    """Decode+resize many JPEGs in parallel (OpenMP inside the library)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    hs = np.asarray([hw[0] for hw in out_hw], np.int32)
    ws = np.asarray([hw[1] for hw in out_hw], np.int32)
    sizes = (hs.astype(np.int64) * ws * 3)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    buf = np.empty(int(sizes.sum()), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.dx_decode_resize_batch(
        c_paths, n,
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if failures:
        raise IOError(f"{failures}/{n} decodes failed")
    return [
        buf[offsets[i]:offsets[i] + sizes[i]].reshape(hs[i], ws[i], 3)
        for i in range(n)
    ]
