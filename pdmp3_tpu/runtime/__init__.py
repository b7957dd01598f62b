"""Serving runtime: stream scheduler, granule packer, batched decode."""

from .multihost import MultiHostStreamDecoder
from .scheduler import (L12StreamDecoder, LoopFeeder, SlotJoin,
                        SparseStreamDecoder, StreamDecoder,
                        decode_files_batched)

__all__ = ["L12StreamDecoder", "LoopFeeder", "MultiHostStreamDecoder",
           "SlotJoin", "SparseStreamDecoder", "StreamDecoder",
           "decode_files_batched"]
