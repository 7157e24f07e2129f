"""ctypes wrapper over the compiled reference library (golden oracle).

Build with tools/oracle/build.sh. Used by tests only.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SO = os.path.join(os.path.dirname(__file__), "..", "..", "build", "oracle.so")


def _load():
    so = os.path.abspath(_SO)
    if not os.path.exists(so):
        subprocess.run(
            ["sh", os.path.join(os.path.dirname(__file__), "build.sh")], check=True
        )
    lib = ctypes.CDLL(so)
    lib.oracle_transform.restype = ctypes.c_int
    lib.oracle_encode.restype = ctypes.c_int
    return lib


_lib = None


def lib():
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


def transform(img: np.ndarray, levels: int, level_chg: int, trans: int) -> np.ndarray:
    """Forward transform; returns all band coeffs concatenated (int32),
    order: per level finest->coarsest D,H,V then final L; bands row-major."""
    h, w = img.shape
    img16 = np.ascontiguousarray(img, dtype=np.int16)
    out = np.empty(w * h + 64, dtype=np.int32)
    n = lib().oracle_transform(
        img16.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        w, h, levels, level_chg, trans,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out[:n]


def encode(img: np.ndarray, levels: int, level_chg: int, trans: int,
           quant: int, lam: int) -> bytes:
    h, w = img.shape
    img16 = np.ascontiguousarray(img, dtype=np.int16)
    cap = w * h * 4 + 4096
    out = np.empty(cap, dtype=np.uint8)
    n = lib().oracle_encode(
        img16.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        w, h, levels, level_chg, trans, quant, lam,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), cap,
    )
    assert n >= 0
    return out[:n].tobytes()


def decode(stream: bytes, w: int, h: int, levels: int, level_chg: int,
           trans: int, quant: int) -> np.ndarray:
    buf = np.frombuffer(stream, dtype=np.uint8)
    out = np.empty(h * w, dtype=np.int16)
    lib().oracle_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(stream),
        w, h, levels, level_chg, trans, quant,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
    )
    return out.reshape(h, w)
