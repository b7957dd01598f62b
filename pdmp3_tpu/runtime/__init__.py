"""Serving runtime: stream scheduler, granule packer, batched decode."""

from .multihost import MultiHostStreamDecoder
from .scheduler import (LoopFeeder, SparseStreamDecoder, StreamDecoder,
                        decode_files_batched)

__all__ = ["LoopFeeder", "MultiHostStreamDecoder", "SparseStreamDecoder",
           "StreamDecoder", "decode_files_batched"]
