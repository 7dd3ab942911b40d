"""Native (C++) extensions, built on first use and loaded via ctypes.

The reference leaned on Cython-backed libraries (skimage marching cubes,
scipy KD-trees) for host-side geometry; this module provides our own
native layer where numpy is too slow. Shared objects are compiled with
g++ -O3 into a cache directory; absence of a compiler degrades gracefully
to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc")
_CACHE = os.path.expanduser("~/.cache/isdf_tpu_native")

_libs = {}


def _build(name: str) -> Optional[ctypes.CDLL]:
    if name in _libs:
        return _libs[name]
    src = os.path.join(_CSRC, name + ".cpp")
    if not os.path.exists(src):
        _libs[name] = None
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    os.makedirs(_CACHE, exist_ok=True)
    so = os.path.join(_CACHE, f"{name}-{tag}.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src],
                check=True, capture_output=True, timeout=120)
        except Exception:
            _libs[name] = None
            return None
    try:
        _libs[name] = ctypes.CDLL(so)
    except OSError:
        _libs[name] = None
    return _libs[name]


def marching_tets_native(sdf: np.ndarray, level: float = 0.0
                         ) -> Optional[np.ndarray]:
    """Triangle soup [T, 3, 3] in grid-index coords, or None if the
    native library is unavailable."""
    lib = _build("marching_tets")
    if lib is None:
        return None
    lib.marching_tets.restype = ctypes.c_int
    lib.marching_tets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long)]
    lib.free_tris.argtypes = [ctypes.POINTER(ctypes.c_float)]

    sdf = np.ascontiguousarray(sdf, np.float32)
    out_p = ctypes.POINTER(ctypes.c_float)()
    out_n = ctypes.c_long(0)
    rc = lib.marching_tets(
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sdf.shape[0], sdf.shape[1], sdf.shape[2], ctypes.c_float(level),
        ctypes.byref(out_p), ctypes.byref(out_n))
    if rc != 0:
        return None
    n = out_n.value
    if n == 0:
        lib.free_tris(out_p)
        return np.zeros((0, 3, 3), np.float32)
    tris = np.ctypeslib.as_array(out_p, shape=(n, 3, 3)).copy()
    lib.free_tris(out_p)
    return tris
