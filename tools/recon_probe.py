"""Probe: matched-rate PSNR gain from centroid reconstruction offsets.

The reference dequantizes at the bin center (band.h:94-107 TSUQi:
``pBand[n] *= Quant``) and so do we. For Laplacian-distributed wavelet
coefficients the MSE-optimal reconstruction point sits below the bin
center, so a decoder-side offset x_hat = sign * (mag*Q - delta) raises
PSNR at ZERO rate cost. The encoder can compute the optimal delta per
band (it has the true coefficients) and ship it as a few bits of side
info.

This tool measures the ceiling: for each (image, quant) it rebuilds the
exact coded coefficients (same quantize/prune path as the product
encoder), then compares PSNR of
  (a) bin-center recon (shipped behavior),
  (b) fixed delta = Q>>3 for all mags (no side info),
  (c) per-band optimal delta, separate classes for mag==1 / mag>=2
      (side-info: ~2 x 15 bands x 4 bits ~ 15 B).

Usage: python tools/recon_probe.py [quant ...]   (default 9 13 17 21)
"""
from __future__ import annotations

import glob
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc
_cc.setup(jax)

import jax.numpy as jnp

from ric_tpu.config import CodecConfig, Transform, SHIFT
from ric_tpu.models import image_codec as ic
from ric_tpu.ops import blocks, lifting
from ric_tpu.ops import quant as qops
from ric_tpu.utils import pnm
from ric_tpu.utils.bits import u2s_
from ric_tpu.utils.metrics import psnr


def coded_bands(img, cfg):
    """Returns (pyr_true, {name: (u2d, sig2d, plan)}) for the high bands,
    plus the LL recon (exact, shared by all variants)."""
    plans, _ = ic.make_plane_plans(cfg, chroma=False)
    x = (jnp.asarray(img).astype(jnp.int32) - 128) << SHIFT
    pyr = lifting.dwt(x, Transform(cfg.transform), cfg.levels)
    payload = ic._payload_from_pyramid(plans, pyr, recon=True)
    out = {}
    ll = None
    for pay in payload:
        p = pay["plan"]
        if p.kind == "ll":
            qll = qops.tsuq(pyr[cfg.levels - 1]["L"], p.q)
            ll = qops.tsuq_inverse(qll, p.q)
            continue
        u_eff = jnp.where(pay["sig"][..., None], pay["u"], 0)
        xq = u2s_(u_eff)
        out[p.name] = (blocks.from_blocks(xq, *p.shape), p)
    return pyr, out, ll


def recon_psnr(img, cfg, pyr, bands, ll, deltas):
    """deltas: {name: (d1, d2)} applied to |q|==1 / |q|>=2."""
    nlev = cfg.levels
    coeffs = {}
    for name, (xq, p) in bands.items():
        d1, d2 = deltas.get(name, (0, 0))
        mag = jnp.abs(xq)
        d = jnp.where(mag == 1, d1, d2)
        rec = jnp.sign(xq) * jnp.maximum(mag * p.q - d, 0)
        coeffs[name] = rec.astype(jnp.int32)
    pyramid = []
    for lvl in range(nlev):
        entry = {o: coeffs[f"{o}{lvl}"] for o in ("V", "H", "D")}
        if lvl == nlev - 1:
            entry["L"] = ll
        pyramid.append(entry)
    rec = lifting.idwt(pyramid, cfg.width, cfg.height,
                       Transform(cfg.transform))
    out = jnp.clip(128 + ((rec + (1 << (SHIFT - 1))) >> SHIFT), 0, 255)
    return psnr(np.asarray(out), img.astype(np.int32))


def opt_delta(t2d, xq, q):
    """Per-class optimal delta = mean(mag*q - |t|) over coded coeffs."""
    t = np.asarray(t2d)
    x = np.asarray(xq)
    res = {}
    for cls, m in (("1", np.abs(x) == 1), ("2", np.abs(x) >= 2)):
        if m.sum() == 0:
            res[cls] = 0
            continue
        over = np.abs(x[m]) * q - np.sign(x[m]) * t[m]
        res[cls] = int(round(np.clip(over.mean(), 0, q // 2)))
    return res["1"], res["2"]


def opt_delta_single(t2d, xq, q, nib=True):
    """One LS-optimal delta for all magnitudes, optionally quantized to a
    4-bit nibble delta = (nib * q) >> 5 (the shippable 8 B/plane form)."""
    t = np.asarray(t2d)
    x = np.asarray(xq)
    m = x != 0
    if m.sum() == 0:
        return 0, 0
    over = np.abs(x[m]) * q - np.sign(x[m]) * t[m]
    d = float(np.clip(over.mean(), 0, q / 2))
    if nib:
        dq = int(np.clip(round(d * 32 / q), 0, 15))
        d = (dq * q) >> 5
    return int(round(d)), int(round(d))


def opt_delta_tied(t2d, xq, q):
    """One nibble per band, step q/64, classes tied as d2 = 2*d1: LS fit
    d* = (n1*mu1 + 2*n2*mu2) / (n1 + 4*n2)."""
    t = np.asarray(t2d)
    x = np.asarray(xq)
    m1 = np.abs(x) == 1
    m2 = np.abs(x) >= 2
    n1, n2 = int(m1.sum()), int(m2.sum())
    if n1 + n2 == 0:
        return 0, 0
    mu1 = float((np.abs(x[m1]) * q - np.sign(x[m1]) * t[m1]).mean()) if n1 else 0.0
    mu2 = float((np.abs(x[m2]) * q - np.sign(x[m2]) * t[m2]).mean()) if n2 else 0.0
    d = (n1 * mu1 + 2 * n2 * mu2) / (n1 + 4 * n2)
    dq = int(np.clip(round(d * 64 / q), 0, 15))
    d1 = (dq * q) >> 6
    return d1, 2 * d1


def est_delta(xq, q):
    """Zero-side-info estimator both codec sides can compute from the
    DECODED magnitudes alone: model coefficients as exponential with
    P(mag>=2 | mag>=1) = rho = exp(-q/s); centroid offset below bin
    center = q*(coth(a/2)/2 - 1/a), a = -ln rho. Integer table-driven."""
    x = np.asarray(xq)
    mag = np.abs(x)
    n1 = int((mag == 1).sum())
    n2p = int((mag >= 2).sum())
    nz = n1 + n2p
    if nz == 0:
        return 0, 0
    # rho quantized to 1/256
    r = (256 * n2p) // nz
    a = -np.log(max(r, 1) / 256.0)
    if a < 1e-3:
        frac = 0.5 - 1e-3
    else:
        frac = 0.5 / np.tanh(a / 2) - 1.0 / a
    d2 = int(round(q * min(max(frac, 0.0), 0.5)))
    return d2 // 2, d2  # class-1 bin is R/D-truncated: half offset


def main():
    quants = [int(a) for a in sys.argv[1:]] or [9, 13, 17, 21]
    paths = sorted(glob.glob("corpus/c512_*.pgm"))
    print(f"{'image':16s} q   std      fixedQ/8  per-band  (dB)")
    for q in quants:
        gains_f, gains_b, gains_e = [], [], []
        for path in paths:
            img = pnm.read_pnm(path)
            h, w = img.shape
            cfg = CodecConfig(width=w, height=h, quant=q,
                              transform=Transform.CDF97)
            pyr, bands, ll = coded_bands(img, cfg)
            p_std = recon_psnr(img, cfg, pyr, bands, ll, {})
            fixed = {n: (p.q >> 3, p.q >> 3) for n, (_, p) in bands.items()}
            p_fix = recon_psnr(img, cfg, pyr, bands, ll, fixed)
            opt, est = {}, {}
            for lvl in range(cfg.levels):
                for o in ("V", "H", "D"):
                    name = f"{o}{lvl}"
                    xq, p = bands[name]
                    opt[name] = opt_delta(pyr[lvl][o], xq, p.q)
                    est[name] = opt_delta_tied(pyr[lvl][o], xq, p.q)
            p_opt = recon_psnr(img, cfg, pyr, bands, ll, opt)
            p_est = recon_psnr(img, cfg, pyr, bands, ll, est)
            name = path.split("/")[-1][:16]
            print(f"{name:16s} {q:2d}  {p_std:7.3f}  {p_fix - p_std:+7.3f}"
                  f"  {p_opt - p_std:+7.3f}  {p_est - p_std:+7.3f}")
            gains_f.append(p_fix - p_std)
            gains_b.append(p_opt - p_std)
            gains_e.append(p_est - p_std)
        print(f"{'MEAN':16s} {q:2d}           {np.mean(gains_f):+7.3f}"
              f"  {np.mean(gains_b):+7.3f}  {np.mean(gains_e):+7.3f}")


if __name__ == "__main__":
    main()
