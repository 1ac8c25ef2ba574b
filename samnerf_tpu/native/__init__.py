"""Native (C++) runtime components with on-demand compilation.

The compute path is JAX/Pallas; the host runtime around it uses C++
where the reference leaned on native code (torch's dataloader / PIL):
currently a thread-pooled libjpeg/libpng dataset decoder
(``loader.cpp``), built once per machine with the system toolchain and
loaded through ctypes.  Everything degrades gracefully to the pure
python path if the toolchain or libraries are missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    src = _HERE / "loader.cpp"
    out = _HERE / "_loader.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = ["c++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src),
           "-o", str(out), "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def get_loader() -> Optional[ctypes.CDLL]:
    """The compiled library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            return None
        lib.decode_images.restype = ctypes.c_int
        lib.decode_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        _LIB = lib
        return _LIB


def decode_images(paths: List, out_h: int, out_w: int,
                  downscale: int = 1,
                  num_threads: Optional[int] = None) -> Optional[np.ndarray]:
    """Decode a list of JPEG/PNG files into one [N, H, W, 3] uint8 array
    with the C++ thread pool; returns None if the native path is
    unavailable or any file fails (caller falls back to PIL)."""
    lib = get_loader()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    threads = num_threads or min(16, os.cpu_count() or 1)
    rc = lib.decode_images(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_h, out_w, downscale, threads)
    return out if rc == 0 else None
