"""pdmp3_tpu: a TPU-native MPEG-1 Layer III decode framework.

Rebuild of the capabilities of technosaurus/PDMP3 designed TPU-first:

- host frontend (C++ / Python reference impl) for the control-flow-heavy
  bitstream stages: sync, side info, bit reservoir, scalefactors, Huffman
- JAX/XLA/Pallas DSP backend for the dense per-granule math: requantize,
  stereo, antialias, IMDCT + overlap-add, polyphase synthesis — batched
  over thousands of concurrent streams and sharded over device meshes
- libmpg123-subset streaming API (pdmp3_new/open_feed/feed/read/decode/
  getformat) protocol-compatible with the reference
"""

from . import tables
from .api import PDMP3, decode_file
from .frontend import Frontend
from .metadata import (FrameIndex, StreamInfo, TagInfo, build_frame_index,
                       decode_file_gapless, decode_file_seek,
                       parse_stream_info, parse_tags)
from .oracle import OracleDSP

__version__ = "0.1.0"

__all__ = ["tables", "PDMP3", "decode_file", "Frontend", "OracleDSP",
           "StreamInfo", "FrameIndex", "TagInfo", "parse_stream_info",
           "parse_tags", "build_frame_index", "decode_file_seek",
           "decode_file_gapless", "__version__"]
