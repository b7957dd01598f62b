"""Serving runtime: stream scheduler, granule packer, batched decode."""

from .multihost import MultiHostStreamDecoder
from .scheduler import (L12StreamDecoder, LoopFeeder, SparseStreamDecoder,
                        StreamDecoder, decode_files_batched)

__all__ = ["L12StreamDecoder", "LoopFeeder", "MultiHostStreamDecoder",
           "SparseStreamDecoder", "StreamDecoder", "decode_files_batched"]
