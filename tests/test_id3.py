"""ID3v2 tag skipping (PDMP3_PROFILE_ID3 / Frontend(id3=True)).

Capability beyond the reference: its sync scan absorbs tags that fit
the buffered input window, but a tag larger than the 16 KiB ring
(typical with embedded cover art) starves the scan and the bounded
resync kills the stream (pdmp3.c:1322-1340).  The explicit skip is
incremental — oversized tags drain across NEED_MORE round trips.

Also locks the ring-wrap normalization this feature surfaced: a feed
that exactly reaches the buffer end parks iend at INBUF_SIZE (reference
feed parity, pdmp3.c:2406-2410); when a consumer then wraps istart to
0, the ring is exactly empty, but without normalization the parked iend
reads as ghost-full and the sync scan spins forever — a latent defect
present in the reference itself (Get_Byte, pdmp3.c:1464-1474).
"""
from __future__ import annotations

import numpy as np
import pytest

from pdmp3_tpu import api as A
from pdmp3_tpu import tables as T
from pdmp3_tpu.host import (NativePDMP3, PROFILE_ID3, PROFILE_LSF,
                            native_decode_file)
from pdmp3_tpu.testing import mp3gen


def id3v2(size: int, footer: bool = False) -> bytes:
    flags = 0x10 if footer else 0
    hdr = b"ID3" + bytes([4, 0, flags,
                          (size >> 21) & 0x7F, (size >> 14) & 0x7F,
                          (size >> 7) & 0x7F, size & 0x7F])
    # payload bytes < 251: no 0xFF, so no false syncs
    return hdr + bytes((i * 37) % 251 for i in range(size)) + \
        (b"3DI" + hdr[3:] if footer else b"")


@pytest.fixture(scope="module")
def base():
    stream = mp3gen.make_stream(n_frames=10, seed=8, mode=1,
                                mode_extension=2, blocks="varied")
    return stream, native_decode_file(stream)


@pytest.mark.parametrize("tag_kw", [
    dict(size=300),
    dict(size=60000),              # larger than the 16 KiB input ring
    dict(size=2000, footer=True),  # footer flag adds 10 bytes
])
def test_id3_skip_native_and_python(base, tag_kw):
    stream, plain = base
    tagged = id3v2(**tag_kw) + stream
    assert native_decode_file(tagged, profile=PROFILE_ID3) == plain
    assert A.decode_file(tagged, id3=True) == plain


def test_id3_double_tag(base):
    stream, plain = base
    tagged = id3v2(100) + id3v2(40000) + stream
    assert native_decode_file(tagged, profile=PROFILE_ID3) == plain
    assert A.decode_file(tagged, id3=True) == plain


def test_id3_parity_mode_behavior(base):
    """Without the flag: small tags still decode (the reference's sync
    scan absorbs them); ring-overflowing tags kill the stream exactly
    like the reference's bounded resync would."""
    stream, plain = base
    assert native_decode_file(id3v2(300) + stream) == plain
    assert A.decode_file(id3v2(300) + stream) == plain
    assert native_decode_file(id3v2(60000) + stream) == b""
    assert A.decode_file(id3v2(60000) + stream) == b""


def test_id3_lsf_combo():
    lsf = mp3gen.make_stream(n_frames=10, seed=9, family=1, mode=0,
                             bitrate_index=11)
    want = native_decode_file(lsf, profile=PROFILE_LSF)
    got = native_decode_file(id3v2(50000) + lsf,
                             profile=PROFILE_ID3 | PROFILE_LSF)
    assert got == want and want
    assert A.decode_file(id3v2(50000) + lsf, lsf=True, id3=True) == want


def test_id3_not_a_tag_passthrough(base):
    """Bytes that merely start with 'ID3' but fail the header checks
    (non-syncsafe size) must NOT be consumed as a tag."""
    stream, plain = base
    bogus = b"ID3" + bytes([4, 0, 0, 0x80, 0, 0, 0])  # size byte high bit
    # parity: sync scan skips the garbage either way
    assert native_decode_file(bogus + stream,
                              profile=PROFILE_ID3) == plain


def test_id3_checkpoint_mid_tag():
    """id3_remaining rides the handle blob: a checkpoint taken mid-tag
    resumes the skip."""
    stream = mp3gen.make_stream(n_frames=8, seed=12, mode=0)
    plain = native_decode_file(stream)
    data = id3v2(30000) + stream
    h = NativePDMP3()
    h.set_profile(PROFILE_ID3)
    h.open_feed()
    h.feed(data[:8000])        # mid-tag
    res, pcm = h.read(4096)
    assert res == T.NEED_MORE and pcm == b""
    blob = h.save_state()
    h2 = NativePDMP3()
    h2.restore_state(blob)
    pos = 8000
    out = []
    for _ in range(64):
        res, pcm = h2.read(16384)
        out.append(pcm)
        if res == T.ERR:
            break
        if res == T.NEED_MORE:
            if pos >= len(data):
                break
            n = min(4096, len(data) - pos)
            h2.feed(data[pos:pos + n])
            pos += n
    assert b"".join(out) == plain


def test_ring_wrap_normalization_regression():
    """The exact feed pattern that parks iend at INBUF_SIZE and wraps
    istart to 0 (4x4096 feeds fully consumed by a tag skip) used to spin
    forever in the sync scan; it must drain and decode."""
    stream = mp3gen.make_stream(n_frames=8, seed=13, mode=0)
    plain = native_decode_file(stream)
    data = id3v2(60000) + stream
    for make in (lambda: _native(PROFILE_ID3), lambda: _python()):
        h = make()
        pos = 0
        out = []
        for _ in range(128):
            res, pcm = h.read(16384)
            out.append(pcm)
            if res == T.ERR:
                break
            if res == T.NEED_MORE:
                if pos >= len(data):
                    break
                n = min(4096, len(data) - pos)
                h.feed(data[pos:pos + n])
                pos += n
        assert b"".join(out) == plain


def _native(profile):
    h = NativePDMP3()
    h.set_profile(profile)
    h.open_feed()
    return h


def _python():
    h = A.PDMP3(id3=True)
    h.open_feed()
    return h
