"""Serving runtime: stream scheduler, granule packer, batched decode."""

from .scheduler import (SparseStreamDecoder, StreamDecoder,
                        decode_files_batched)

__all__ = ["SparseStreamDecoder", "StreamDecoder", "decode_files_batched"]
