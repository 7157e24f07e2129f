"""Build the natural-image RD corpus (BASELINE config #3 analogue).

Collects every photographic image locally available (matplotlib sample
data + dm_control / gymnasium texture photos — this box has no network and
no scikit-image), center-crops/resizes each to EXACTLY 512x512, and writes
corpus/<name>.pgm (luma) + corpus/<name>.ppm (color). One canonical shape
means the rd_sweep compiles one graph set per quantizer and reuses it for
every image (compiles on this 4-vCPU box cost minutes each).

The historical corpus files at other sizes (hopper 512x600, china 640x427,
...) are kept as-is; this adds the `c512_*` set. Deterministic: fixed
sources, LANCZOS resample, no RNG.

Usage: python tools/corpusgen.py
"""
from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, ".")

SOURCES = [
    # (name, path) — photographic content only (no flat synthetic icons)
    ("wood", "/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/wood1.png"),
    ("skin", "/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/skin.png"),
    ("marble", "/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile2.png"),
    ("skybox", "/opt/venv/lib/python3.12/site-packages/dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorSkybox2048.png"),
    ("grass", "/opt/venv/lib/python3.12/site-packages/dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorGrassFloorD.png"),
    ("darkwood", "/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/darkwood.png"),
    ("dogskin", "/opt/venv/lib/python3.12/site-packages/dm_control/suite/dog_assets/skin_texture.png"),
    ("silver", "/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/silverRaw.png"),
    ("hopper", None),   # from the existing corpus (matplotlib grace_hopper)
    ("china", None),
    ("flower", None),
    ("teapot", None),
]


def to512(img: Image.Image) -> np.ndarray:
    img = img.convert("RGB")
    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2,
                    (w - s) // 2 + s, (h - s) // 2 + s))
    if s != 512:
        img = img.resize((512, 512), Image.LANCZOS)
    return np.asarray(img, np.uint8)


def write_pnm(path, arr):
    from ric_tpu.utils import pnm

    pnm.write_pnm(path, arr)


def main():
    os.makedirs("corpus", exist_ok=True)
    from ric_tpu.utils import pnm

    for name, path in SOURCES:
        if path is None:
            src = f"corpus/{name}.ppm"
            rgb = to512(Image.fromarray(
                pnm.read_pnm(src).astype(np.uint8)))
        else:
            rgb = to512(Image.open(path))
        # ITU gray (PIL convert('L') rounding), enough for RD evaluation
        gray = np.asarray(Image.fromarray(rgb).convert("L"), np.uint8)
        write_pnm(f"corpus/c512_{name}.ppm", rgb)
        write_pnm(f"corpus/c512_{name}.pgm", gray)
        print(f"c512_{name}: var={gray.astype(np.float64).var():.1f}")


if __name__ == "__main__":
    main()
