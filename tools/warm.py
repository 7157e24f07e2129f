"""Populate the persistent XLA compile cache for 512^2 gray encode+decode
graphs at the given quants (run several instances with disjoint lists to
compile in parallel ahead of tools/rd_sweep.py).

Usage: python tools/warm.py q [q ...]
"""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
from ric_tpu.utils import cache as _cc

_cc.setup(jax)

import numpy as np

from ric_tpu.config import CodecConfig, Transform
from ric_tpu.models import image_codec as ic
from ric_tpu.utils import pnm


def main():
    img = pnm.read_pnm("corpus/c512_hopper.pgm")
    h, w = img.shape
    for q in [int(a) for a in sys.argv[1:]]:
        cfg = CodecConfig(
            width=w, height=h, quant=q,
            transform=Transform.CDF53 if q == 0 else Transform.CDF97)
        d = ic.encode_image(img, cfg)
        ic.decode_image(d)
        print(f"warm q={q} done ({len(d)} B)", flush=True)


if __name__ == "__main__":
    main()
