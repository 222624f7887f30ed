"""ctypes bindings for the native host runtime (libckksrt.so).

Auto-builds with make on first import if the shared object is missing;
falls back to numpy implementations when no toolchain is available (the
public API of embedding.py is unchanged either way).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO = os.path.join(_DIR, "libckksrt.so")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.ckksrt_coeff_transform.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.ckksrt_round_to_rns.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.ckksrt_crt_compose.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_double,
        ctypes.POINTER(ctypes.c_double)]
    lib.ckksrt_compress_bound.restype = ctypes.c_int64
    lib.ckksrt_compress.restype = ctypes.c_int64
    lib.ckksrt_decompress.restype = ctypes.c_int64
    for f in (lib.ckksrt_compress, lib.ckksrt_decompress):
        f.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                      ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.ckksrt_compress_bound.argtypes = [ctypes.c_int64]
    return lib


def available() -> bool:
    return _lib() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _up(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


@lru_cache(maxsize=8)
def _twiddle_tables(n: int) -> tuple:
    """Flat stage-indexed twiddle table (entry i at offset i matches the
    Python _stage_twiddles layout: stage s entries at [2^s, 2^{s+1}))."""
    from ..core.ntt import bit_reverse
    logn = n.bit_length() - 1
    tw = np.zeros(n, dtype=np.complex128)
    zeta = np.exp(-1j * np.pi / n)   # inverse-direction twiddles
    for s in range(logn):
        m = 1 << s
        for i in range(m):
            tw[m + i] = zeta ** bit_reverse(m + i, logn)
    return (np.ascontiguousarray(tw.real), np.ascontiguousarray(tw.imag))


def encode_evals_to_rns(evals: np.ndarray, moduli: list[int]) -> np.ndarray:
    """evals complex128[n] (slot-mapped evaluation vector, already scaled) ->
    uint64[k, n] RNS coefficients. Native path of embedding.encode."""
    lib = _lib()
    n = len(evals)
    re = np.ascontiguousarray(np.real(evals), dtype=np.float64)
    im = np.ascontiguousarray(np.imag(evals), dtype=np.float64)
    twr, twi = _twiddle_tables(n)
    lib.ckksrt_coeff_transform(_dp(re), _dp(im), n, _dp(twr), _dp(twi))
    if np.max(np.abs(re)) >= 2 ** 62:
        raise ValueError("encoded coefficient too large")
    mods = np.asarray(moduli, dtype=np.uint64)
    out = np.empty((len(moduli), n), dtype=np.uint64)
    lib.ckksrt_round_to_rns(_dp(re), n, _up(mods), len(moduli), _up(out))
    return out


def crt_compose(residues: np.ndarray, moduli: list[int],
                scale: float) -> np.ndarray:
    """uint64[k, n] -> centered float64 coefficients / scale (native)."""
    lib = _lib()
    res = np.ascontiguousarray(residues, dtype=np.uint64)
    k, n = res.shape
    mods = np.asarray(moduli, dtype=np.uint64)
    out = np.empty(n, dtype=np.float64)
    lib.ckksrt_crt_compose(_up(res), k, n, _up(mods), float(scale), _dp(out))
    return out


def compress(data: bytes) -> bytes:
    lib = _lib()
    src = np.frombuffer(data, dtype=np.uint8)
    cap = int(lib.ckksrt_compress_bound(len(src)))
    dst = np.empty(cap, dtype=np.uint8)
    sp = src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    dp = dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    out = int(lib.ckksrt_compress(sp, len(src), dp, cap))
    assert out > 0
    return dst[:out].tobytes()


def decompress(data: bytes, raw_size: int) -> bytes:
    lib = _lib()
    src = np.frombuffer(data, dtype=np.uint8)
    dst = np.empty(raw_size, dtype=np.uint8)
    sp = src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    dp = dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    out = int(lib.ckksrt_decompress(sp, len(src), dp, raw_size))
    assert out == raw_size
    return dst.tobytes()
