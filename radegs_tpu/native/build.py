"""Build-on-demand loader for the C++ native helpers (native/*.cpp).

Compiles with the system C++ compiler into a per-source-hash cached shared
object and binds it via ctypes (this image ships no pybind11). All callers
degrade gracefully to their pure-Python paths when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_ROOT, "native", "colmap_native.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src: str) -> str | None:
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "RADEGS_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "radegs_tpu"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, f"colmap_native_{digest}.so")
    if os.path.exists(out):
        return out
    for cxx in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out + ".tmp"],
                check=True, capture_output=True,
            )
            os.replace(out + ".tmp", out)
            return out
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    return None


def load_native():
    """Returns the ctypes library with typed signatures, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SRC):
            return None
        path = _build(_SRC)
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        c = ctypes
        lib.radegs_points3d_count.argtypes = [c.c_char_p]
        lib.radegs_points3d_count.restype = c.c_int64
        lib.radegs_points3d_fill.argtypes = [
            c.c_char_p, c.POINTER(c.c_double), c.POINTER(c.c_uint8),
            c.POINTER(c.c_double), c.POINTER(c.c_int64), c.c_int64,
        ]
        lib.radegs_points3d_fill.restype = c.c_int64
        lib.radegs_images_count.argtypes = [c.c_char_p]
        lib.radegs_images_count.restype = c.c_int64
        lib.radegs_images_fill.argtypes = [
            c.c_char_p, c.POINTER(c.c_int32), c.POINTER(c.c_double),
            c.POINTER(c.c_double), c.POINTER(c.c_int32), c.c_char_p,
            c.c_int64, c.c_int64,
        ]
        lib.radegs_images_fill.restype = c.c_int64
        _LIB = lib
        return _LIB
