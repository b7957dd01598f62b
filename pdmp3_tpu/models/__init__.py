"""Decoder models: the batched granule pipeline and streaming wrappers."""

from .decoder import (DecoderState, GranuleBatch, decode_granules,
                      frame_to_batches, init_state)

__all__ = ["GranuleBatch", "DecoderState", "decode_granules",
           "frame_to_batches", "init_state"]
