"""Batched TPU DSP ops for the Layer III backend."""

from .dsp import (antialias, freq_invert, hybrid_synthesis, quantize_pack,
                  requantize, reorder, stereo, subband_synthesis)

__all__ = ["requantize", "reorder", "stereo", "antialias",
           "hybrid_synthesis", "freq_invert", "subband_synthesis",
           "quantize_pack"]
