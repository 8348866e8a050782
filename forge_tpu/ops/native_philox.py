"""ctypes binding for the native Philox noise generator (native/philox.cpp).

Compiles on first use into a cache directory; bit-exactness against the
numpy reference is asserted once at load and the numpy path is used on any
failure (no native toolchain, mismatching libm, ...).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_CHECKED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "philox.cpp")
_CACHE = os.environ.get("FORGE_TPU_NATIVE_CACHE", os.path.expanduser("~/.cache/forge_tpu_native"))


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_CACHE, exist_ok=True)
    with open(_SRC, "rb") as f:
        tag = hashlib.md5(f.read()).hexdigest()[:12]
    so_path = os.path.join(_CACHE, f"philox_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return so_path
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _CHECKED
    if _CHECKED:
        return _LIB
    _CHECKED = True
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.philox_randn.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.philox_randn.restype = None
        # bit-exactness gate vs the numpy reference
        from . import rng_philox

        ref = rng_philox.Generator(12345)
        expected = ref.randn((257,))
        got = np.empty(257, np.float32)
        lib.philox_randn(12345, 0, 257, got.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if not np.array_equal(expected.reshape(-1), got):
            return None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def randn(seed: int, offset: int, shape) -> Optional[np.ndarray]:
    """Native draw, or None if the native path is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = int(np.prod(shape))
    out = np.empty(n, np.float32)
    lib.philox_randn(
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF), ctypes.c_uint64(offset),
        ctypes.c_uint64(n), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape(shape)
