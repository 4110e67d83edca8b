"""Native (C++) runtime components, built on demand with the system toolchain
and loaded via ctypes (no pybind11 dependency).

Current components:
  - ply_writer: buffered ASCII-PLY point-cloud export
    (viewcrafter_tpu/native/ply_writer.cpp).

Build artifacts are cached next to the sources; a failed build degrades to the
pure-Python fallbacks without breaking the pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    src = os.path.join(_DIR, "ply_writer.cpp")
    out = os.path.join(_DIR, "_viewcrafter_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            path = _build()
            if path:
                try:
                    lib = ctypes.CDLL(path)
                    lib.viewcrafter_write_ply.restype = ctypes.c_int
                    lib.viewcrafter_write_ply.argtypes = [
                        ctypes.c_char_p,
                        ctypes.POINTER(ctypes.c_float),
                        ctypes.POINTER(ctypes.c_ubyte),
                        ctypes.c_long,
                    ]
                    _LIB = lib
                except OSError:
                    _LIB = None
        return _LIB


def write_ply(path: str, points, colors_uint8) -> bool:
    """points (N,3) float32, colors (N,3) uint8. True when the native writer
    handled it, False -> caller should fall back."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return False
    pts = np.ascontiguousarray(points, np.float32)
    rgb = np.ascontiguousarray(colors_uint8, np.uint8)
    rc = lib.viewcrafter_write_ply(
        path.encode(),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        len(pts),
    )
    return rc == 0
