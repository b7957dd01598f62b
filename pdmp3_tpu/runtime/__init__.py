"""Serving runtime: stream scheduler, granule packer, batched decode."""

from .scheduler import StreamDecoder, decode_files_batched

__all__ = ["StreamDecoder", "decode_files_batched"]
