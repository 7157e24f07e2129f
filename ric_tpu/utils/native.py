"""ctypes loader for the native host runtime (ric_tpu/native/ric_native.cpp).

Builds lazily with g++ on first use (no pybind11; plain C ABI).
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "ric_native.cpp")
_SO = os.path.join(
    os.path.dirname(__file__), "..", "..", "build", "ric_native.so"
)


@functools.lru_cache(maxsize=1)
def lib():
    so = os.path.abspath(_SO)
    src = os.path.abspath(_SRC)
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        os.makedirs(os.path.dirname(so), exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", so],
            check=True,
        )
    l = ctypes.CDLL(so)
    l.rc_enc_new.restype = ctypes.c_void_p
    l.rc_enc_new.argtypes = [ctypes.c_void_p, ctypes.c_int]
    l.rc_enc_symbols.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_long,
    ]
    l.rc_enc_finish.restype = ctypes.c_long
    l.rc_enc_finish.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
    l.rc_dec_new.restype = ctypes.c_void_p
    l.rc_dec_new.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_long,
    ]
    l.rc_dec_symbols.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p,
    ]
    l.rc_dec_free.argtypes = [ctypes.c_void_p]
    l.rc_enc_raw.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_long,
    ]
    l.rc_dec_raw.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p,
    ]
    l.ric_crc32.restype = ctypes.c_uint32
    l.ric_crc32.argtypes = [ctypes.c_void_p, ctypes.c_long]
    l.ric_dither_ed.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p,
    ]
    return l


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class SerialEncoder:
    """Adaptive range-coder encoder over (symbols, table-ids, active)."""

    def __init__(self, seed_freqs: np.ndarray):
        seed = np.ascontiguousarray(seed_freqs, np.int32)
        self._n_tables = seed.shape[0]
        self._h = lib().rc_enc_new(_ptr(seed), self._n_tables)
        self._seed = seed  # keep alive

    def put(self, syms, tids, active):
        syms = np.ascontiguousarray(syms, np.int32).ravel()
        tids = np.ascontiguousarray(tids, np.int32).ravel()
        act = np.ascontiguousarray(active, np.uint8).ravel()
        lib().rc_enc_symbols(self._h, _ptr(syms), _ptr(tids), _ptr(act),
                             len(syms))

    def put_raw(self, vals, widths, active):
        vals = np.ascontiguousarray(vals, np.int32).ravel()
        widths = np.ascontiguousarray(widths, np.int32).ravel()
        act = np.ascontiguousarray(active, np.uint8).ravel()
        lib().rc_enc_raw(self._h, _ptr(vals), _ptr(widths), _ptr(act),
                         len(vals))

    def finish(self) -> bytes:
        cap = 1 << 26
        out = np.empty(cap, np.uint8)
        n = lib().rc_enc_finish(self._h, _ptr(out), cap)
        self._h = None
        assert 0 <= n <= cap
        return out[:n].tobytes()


class SerialDecoder:
    def __init__(self, seed_freqs: np.ndarray, data: bytes):
        seed = np.ascontiguousarray(seed_freqs, np.int32)
        buf = np.frombuffer(data, np.uint8)
        self._h = lib().rc_dec_new(_ptr(seed), seed.shape[0], _ptr(buf),
                                   len(buf))
        self._seed, self._buf = seed, buf

    def get(self, tids, active) -> np.ndarray:
        tids = np.ascontiguousarray(tids, np.int32).ravel()
        act = np.ascontiguousarray(active, np.uint8).ravel()
        out = np.empty(len(tids), np.int32)
        lib().rc_dec_symbols(self._h, _ptr(tids), _ptr(act), len(tids),
                             _ptr(out))
        return out

    def get_raw(self, widths, active) -> np.ndarray:
        widths = np.ascontiguousarray(widths, np.int32).ravel()
        act = np.ascontiguousarray(active, np.uint8).ravel()
        out = np.empty(len(widths), np.int32)
        lib().rc_dec_raw(self._h, _ptr(widths), _ptr(act), len(widths),
                         _ptr(out))
        return out

    def close(self):
        if self._h:
            lib().rc_dec_free(self._h)
            self._h = None


def crc32(data: bytes) -> int:
    buf = np.frombuffer(data, np.uint8)
    return int(lib().ric_crc32(_ptr(buf), len(buf)))


def dither_ed(plane: np.ndarray, shift: int = 4) -> np.ndarray:
    """Serpentine Floyd–Steinberg error diffusion: working-domain (H, W)
    int32 plane (samples ~ (p-128)<<shift) -> uint8. The native twin of
    the reference's serial -d pass (ric.cpp:51-74)."""
    p = np.ascontiguousarray(plane, np.int32)
    h, w = p.shape
    out = np.empty((h, w), np.uint8)
    lib().ric_dither_ed(_ptr(p), h, w, shift, _ptr(out))
    return out


def mv_recon(dy: np.ndarray, dx: np.ndarray, intra: np.ndarray):
    """Median-predictor MV reconstruction (decode side): residual fields
    (gy, gx) int32 -> absolute vectors, in place on copies. Raster
    recurrence over a tiny grid — host-serial by nature."""
    y = np.ascontiguousarray(dy, np.int32).copy()
    x = np.ascontiguousarray(dx, np.int32).copy()
    it = np.ascontiguousarray(intra, np.uint8)
    gy, gx = y.shape
    lib().ric_mv_recon(_ptr(y), _ptr(x), _ptr(it), gy, gx)
    return y, x
