"""ric_tpu — a TPU-native wavelet image codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Rududu Image Codec (reference: /root/reference, C++): reversible integer
lifting DWT (CDF 9/7, 5/3, Haar), reversible YCoCg color, deadzone (TSUQ)
quantization with rate-distortion coefficient pruning, zerotree block
significance, and a block-parallel entropy layer with deterministic
per-tile substream stitching across device meshes.

Layout (SURVEY.md §7):
    ops/       device kernels: lifting, quant, block stats, enum codes, bit packing
    models/    codec orchestration: image codec, (video codec), DCT parity ops
    parallel/  mesh tiling, halo exchange, substream stitching
    utils/     bit tricks, container format, PNM IO, native-extension loader
"""

__version__ = "0.1.0"

from ric_tpu.config import CodecConfig, quant_step  # noqa: F401
