"""Codec configuration.

The reference scatters its knobs over compile-time #defines and CLI flags
(ric.cpp:36-49,310-317; SURVEY.md §5 "Config / flag system"). Here a single
dataclass carries everything and is serialized into the container header.
"""
from __future__ import annotations

import dataclasses
import enum


class Transform(enum.IntEnum):
    """Wavelet family ids (match reference utils.h:28 `trans` for parity)."""

    CDF97 = 0
    CDF53 = 1
    HAAR = 2


# Quantizer ladder, geometric steps of 2^(1/5) (reference ric.cpp:42-49).
_QLADDER = (0x8000, 0x9000, 0xA800, 0xC000, 0xE000)


def quant_step(idx: int) -> int:
    """Quantizer index (1..31+) -> quantization step. 0 => lossless.

    Mirrors reference `Quants` (ric.cpp:42-49): Q[idx%5] rounded-shifted by
    (14 - idx/5).
    """
    if idx <= 0:
        return 0
    idx -= 1
    r = 14 - idx // 5
    return (_QLADDER[idx % 5] + (1 << (r - 1))) >> r


# Headroom shift applied to samples before the transform in lossy mode
# (reference ric.cpp:39 SHIFT): 8-bit input is lifted to 12-bit so the
# deadzone quantizer has sub-LSB resolution.
SHIFT = 4
# Chroma quantizer boost: chroma planes use quant index +8 (ric.cpp:38).
C_Q_BOOST = 8
# Default decomposition depth (ric.cpp:36).
WAV_LEVELS = 5
# Significance-coding block is 4x4 (reference bandcodec.h:28-29).
BLK_PWR = 2
BLK_SIZE = 1 << BLK_PWR

# Distortion weight scale per level: XI^2 for cdf97, 2 for cdf53/haar
# (reference wavelet2d.cpp:30,1009-1032).
XI = 1.149604398


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    width: int
    height: int
    channels: int = 1  # 1 = gray, 3 = RGB (coded as YCoCg)
    quant: int = 0  # 0 = lossless, 1..31 lossy (reference -q)
    transform: Transform = Transform.CDF53
    levels: int = WAV_LEVELS
    input_depth: int = 8  # bits per input sample (8 or 16)
    # Tiling for spatial parallelism: 0 = single tile. Tile dims must be
    # multiples of BLK_SIZE << levels so band/block grids align to tiles.
    tile_w: int = 0
    tile_h: int = 0

    # Optional explicit quantizer/lambda steps (used by the video codec,
    # whose ladder differs from the still-image CLI's — see
    # reference rududucodec.cpp:58-65). -1 = derive from `quant`.
    q_step: int = -1
    lam_step: int = -1

    # rANS lane count override (log2). -1 = auto: a rate-aware budget
    # (models/image_codec._lanes). More lanes = fewer scan steps = faster
    # decode, at 4 bytes/lane of stream flush; the value is recorded in
    # the container so both sides always agree.
    lanes_log2: int = -1

    @property
    def lossless(self) -> bool:
        return self.quant == 0 and self.q_step <= 0

    def luma_quant(self) -> int:
        """Quant step for the luma/gray plane (reference ric.cpp:164,171)."""
        if self.q_step >= 0:
            return self.q_step
        return quant_step(self.quant + SHIFT * 5) if self.quant else 0

    def luma_lambda(self) -> int:
        if self.lam_step >= 0:
            return self.lam_step
        return quant_step(self.quant + SHIFT * 5 - 7) if self.quant else 0

    def chroma_quant(self) -> int:
        return quant_step(self.quant + SHIFT * 5 + C_Q_BOOST) if self.quant else 0

    def chroma_lambda(self) -> int:
        return (
            quant_step(self.quant + SHIFT * 5 - 7 + C_Q_BOOST) if self.quant else 0
        )
