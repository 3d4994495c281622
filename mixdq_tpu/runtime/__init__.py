"""Native host runtime: ctypes bindings over the C++ library (built on
first use with g++), with pure-numpy fallbacks when no compiler is
available. See native/mixdq_native.cpp for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "native", "mixdq_native.cpp")
_SO = os.path.join(_HERE, "native", "libmixdq_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.warning("native build failed (%s); using numpy fallbacks", e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        lib.pack_int4.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64]
        lib.unpack_int4.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64]
        lib.quantize_per_channel.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def pack_int4(codes: np.ndarray) -> np.ndarray:
    """int8 codes in [-8, 7] -> packed uint8 (2 per byte, low nibble
    first; odd tail gets its own byte). Counterpart of the reference's
    uint4 helpers (nn/utils.py:13-52)."""
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    flat = codes.reshape(-1)
    n = flat.size
    out = np.empty((n + 1) // 2, dtype=np.uint8)
    lib = get_lib()
    if lib is not None:
        lib.pack_int4(flat.ctypes.data, out.ctypes.data, n)
        return out
    b = (flat.astype(np.int16) + 8).astype(np.uint8) & 0xF
    if n % 2:
        b = np.concatenate([b, np.zeros(1, np.uint8)])
    return (b[0::2] | (b[1::2] << 4)).astype(np.uint8)[: (n + 1) // 2]


def unpack_int4(packed: np.ndarray, n: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    out = np.empty(n, dtype=np.int8)
    lib = get_lib()
    if lib is not None:
        lib.unpack_int4(packed.ctypes.data, out.ctypes.data, n)
        return out
    lo = (packed & 0xF).astype(np.int8) - 8
    hi = ((packed >> 4) & 0xF).astype(np.int8) - 8
    out2 = np.empty(packed.size * 2, np.int8)
    out2[0::2] = lo
    out2[1::2] = hi
    return out2[:n]


def quantize_per_channel(w: np.ndarray, delta: np.ndarray,
                         n_bits: int = 8) -> np.ndarray:
    """Threaded host-side per-out-channel symmetric quantization (deploy
    from_float for multi-GB weights). w: [..., C], delta: [C]."""
    lo, hi = -(2 ** (n_bits - 1)), 2 ** (n_bits - 1) - 1
    w2 = np.ascontiguousarray(w, dtype=np.float32).reshape(-1, w.shape[-1])
    delta = np.ascontiguousarray(delta, dtype=np.float32)
    out = np.empty_like(w2, dtype=np.int8)
    lib = get_lib()
    if lib is not None:
        lib.quantize_per_channel(w2.ctypes.data, delta.ctypes.data,
                                 out.ctypes.data, w2.shape[0], w2.shape[1],
                                 lo, hi)
        return out.reshape(w.shape)
    return np.clip(np.round(w2 / delta[None, :]), lo, hi).astype(
        np.int8).reshape(w.shape)
