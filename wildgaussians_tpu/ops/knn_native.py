"""ctypes loader for the native C++ simple-knn (native/simple_knn.cpp).

Builds the shared library on first use (g++ -O3, cached beside the source);
callers fall back to the pure-JAX ops.knn path when the toolchain or build is
unavailable.
"""
import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)
_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "..", "native", "simple_knn.cpp")
    src = os.path.normpath(src)
    cache_dir = os.path.expanduser("~/.cache/wild-gaussians-tpu")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libsimple_knn.so")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-pthread", src, "-o", so_path]
        logger.info("Building native simple-knn: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so_path)
    lib.mean_knn_dist2.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.mean_knn_dist2.restype = None
    return lib


def available() -> bool:
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            try:
                _lib = _build_and_load()
            except Exception as e:  # pragma: no cover
                logger.warning("native simple-knn unavailable (%s); "
                               "falling back to JAX", e)
                _lib = None
    return _lib is not None


def mean_knn_dist2_native(points: np.ndarray, window: int = 48, k: int = 3) -> np.ndarray:
    """[N,3] float32 -> [N] mean squared 3-NN distance (native, threaded)."""
    assert available()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty((pts.shape[0],), np.float32)
    _lib.mean_knn_dist2(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(pts.shape[0]), ctypes.c_int(window), ctypes.c_int(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
