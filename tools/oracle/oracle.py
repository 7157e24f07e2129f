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


class VideoOracle:
    """Reference CRududuCodec driver (rududucodec.cpp) for video parity.

    Frames: (H, W, 3) uint8 RGB. Reconstructions come back as (3, H, W)
    int16 YCoCg planes in the reference's working domain (Y<<4 with -128
    offset, Co/Cg<<3 — image.cpp inputSGI), directly comparable with our
    video codec's internal planes.
    """

    def __init__(self, w: int, h: int, mode: str, quant: int):
        l = lib()
        l.oracle_video_create.restype = ctypes.c_void_p
        l.oracle_video_encode.restype = ctypes.c_int
        l.oracle_video_decode.restype = ctypes.c_int
        self._l = l
        self.w, self.h = w, h
        self._p = l.oracle_video_create(
            w, h, 0 if mode == "encode" else 1, quant)

    @staticmethod
    def to_sgi(frame_rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) RGB -> SGI planar bottom-up bytes (R, G, B planes)."""
        planes = frame_rgb.transpose(2, 0, 1)[:, ::-1, :]  # bottom-up rows
        return np.ascontiguousarray(planes, np.uint8)

    def encode(self, frame_rgb: np.ndarray):
        sgi = self.to_sgi(frame_rgb)
        stream = np.empty(self.w * self.h * 8 + 4096, np.uint8)
        recon = np.empty((3, self.h, self.w), np.int16)
        n = self._l.oracle_video_encode(
            ctypes.c_void_p(self._p),
            sgi.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            self.w, self.h,
            stream.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            recon.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        )
        # n is the logical size (endCoding - buf - 2, rududucodec.cpp:118);
        # the decoder reads from buf[0] and reads ahead, so keep slack
        return stream[: n + 64].tobytes(), n, recon

    def mv_bytes(self) -> int:
        """MV-field bytes of the last encoded frame (0 for key frames) —
        the reference side of the MV/residual rate split."""
        return int(self._l.oracle_video_mv_bytes(ctypes.c_void_p(self._p)))

    def decode(self, stream: bytes):
        buf = np.frombuffer(stream, np.uint8)
        recon = np.empty((3, self.h, self.w), np.int16)
        self._l.oracle_video_decode(
            ctypes.c_void_p(self._p),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            self.w, self.h,
            recon.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        )
        return recon

    def close(self):
        if self._p:
            self._l.oracle_video_destroy(ctypes.c_void_p(self._p))
            self._p = None
