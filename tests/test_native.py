"""Native host runtime tests: adaptive range coder round-trip, CRC, PNM."""
import numpy as np
import pytest

from ric_tpu.utils import native


def test_serial_rc_roundtrip(rng):
    n_tables, alphabet = 8, 32
    seed = rng.integers(1, 200, size=(n_tables, alphabet)).astype(np.int32)
    n = 50000
    tids = rng.integers(0, n_tables, size=n).astype(np.int32)
    # geometric-ish symbols
    syms = np.minimum(
        rng.geometric(0.35, size=n) - 1, alphabet - 1
    ).astype(np.int32)
    act = (rng.random(n) < 0.7).astype(np.uint8)

    enc = native.SerialEncoder(seed)
    enc.put(syms, tids, act)
    data = enc.finish()
    dec = native.SerialDecoder(seed, data)
    out = dec.get(tids, act)
    dec.close()
    sel = act.astype(bool)
    np.testing.assert_array_equal(out[sel], syms[sel])
    # adaptive coding should approach the source entropy
    bits = len(data) * 8
    p = np.bincount(syms[sel], minlength=alphabet) / sel.sum()
    ent = -(p[p > 0] * np.log2(p[p > 0])).sum() * sel.sum()
    assert bits < ent * 1.10, f"{bits} vs entropy {ent:.0f}"


def test_serial_rc_multi_call_chunks(rng):
    seed = np.full((2, 32), 10, np.int32)
    syms = rng.integers(0, 4, size=1000).astype(np.int32)
    tids = (np.arange(1000) % 2).astype(np.int32)
    act = np.ones(1000, np.uint8)
    enc = native.SerialEncoder(seed)
    enc.put(syms[:300], tids[:300], act[:300])
    enc.put(syms[300:], tids[300:], act[300:])
    data = enc.finish()
    dec = native.SerialDecoder(seed, data)
    a = dec.get(tids[:300], act[:300])
    b = dec.get(tids[300:], act[300:])
    dec.close()
    np.testing.assert_array_equal(np.concatenate([a, b]), syms)


def test_crc32():
    import zlib

    data = b"hello ric_tpu native runtime"
    assert native.crc32(data) == zlib.crc32(data)
