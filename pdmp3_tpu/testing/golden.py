"""Golden-reference harness: build & run the upstream C decoder.

Builds the reference decoder from /root/reference with -DOUTPUT_RAW (the
deterministic file-output configuration, Makefile:15) into build/ref/ and
runs it on byte strings, returning the packed S16LE PCM it produces.  Used
by the conformance suite for 1:1 differential testing.
"""
from __future__ import annotations

import os
import subprocess
import tempfile

REF_SRC = "/root/reference"
BUILD_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "build", "ref")
BIN = os.path.join(BUILD_DIR, "pdmp3_ref")

CFLAGS = ("-Os -ffast-math -fassociative-math -fomit-frame-pointer "
          "-ffinite-math-only -fno-math-errno -fno-trapping-math "
          "-freciprocal-math -frounding-math -funsafe-math-optimizations "
          "-DOUTPUT_RAW -DIMDCT_TABLES -DIMDCT_NTABLES -DPOW34_TABLE "
          "-DNDEBUG").split()


def ensure_reference_binary() -> str:
    if os.path.exists(BIN):
        return BIN
    os.makedirs(BUILD_DIR, exist_ok=True)
    srcs = [os.path.join(REF_SRC, "pdmp3.c"), os.path.join(REF_SRC, "main.c")]
    subprocess.run(["gcc", *CFLAGS, "-o", BIN, *srcs, "-lm"], check=True,
                   capture_output=True)
    return BIN


def reference_decode(stream: bytes, timeout: float = 120.0) -> bytes:
    """Decode an MP3 byte string with the reference binary -> S16LE PCM."""
    binpath = ensure_reference_binary()
    with tempfile.TemporaryDirectory() as d:
        mp3 = os.path.join(d, "in.mp3")
        with open(mp3, "wb") as f:
            f.write(stream)
        subprocess.run([binpath, mp3], cwd=d, timeout=timeout,
                       capture_output=True)
        raw = mp3 + ".raw"
        if not os.path.exists(raw):
            return b""
        with open(raw, "rb") as f:
            return f.read()
