"""Serving runtime: stream scheduler, granule packer, batched decode."""

from .multihost import MultiHostStreamDecoder
from .scheduler import (SparseStreamDecoder, StreamDecoder,
                        decode_files_batched)

__all__ = ["MultiHostStreamDecoder", "SparseStreamDecoder", "StreamDecoder",
           "decode_files_batched"]
