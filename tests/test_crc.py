"""CRC-16 verification (PDMP3_PROFILE_CRC / Frontend(crc_check=True)).

The reference reads the two CRC bytes of protected frames and DISCARDS
them (/root/reference/pdmp3.c:1206-1210).  The framework adds real ISO
11172-3 §2.4.3.1 verification as an opt-in profile: a failing Layer III
frame is skipped whole (its main data never enters the bit reservoir),
and decoding resumes at the next frame.

Anchors, strongest first:
- the CRC *law* (poly 0x8005 MSB-first, init 0xFFFF, over header bits
  16-31 + the side info) is validated against libavcodec's
  AV_EF_CRCCHECK|AV_EF_EXPLODE checker — mp3gen's valid-CRC streams
  pass it frame-for-frame, corrupted ones are dropped;
- default-off parity: with the check off, corrupted-CRC streams decode
  byte-identically to the reference binary (which never looks);
- the native C++ and Python frontends skip identically through the full
  streaming-API state machine.
"""
import os
import subprocess
import tempfile

import pytest

from pdmp3_tpu import tables as T
from pdmp3_tpu.api import decode_file
from pdmp3_tpu.host import (PROFILE_CRC, PROFILE_LSF, NativePDMP3,
                            native_decode_file)
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.avref import ensure_av_oracle
from pdmp3_tpu.testing.golden import reference_decode


def _frame_offsets(s: bytes) -> list[int]:
    offs, off = [], 0
    while off + 4 <= len(s):
        hdr = int.from_bytes(s[off:off + 4], "big")
        assert (hdr >> 21) == 0x7FF
        fam = {3: 0, 2: 1, 0: 2}[(hdr >> 19) & 3]
        bi, sf, pad = (hdr >> 12) & 0xF, (hdr >> 10) & 3, (hdr >> 9) & 1
        rate = int(T.SAMPLE_RATES_FAM[fam][sf])
        br = int((T.BITRATES[2] if fam == 0 else T.BITRATES_LSF)[bi])
        size = (144 if fam == 0 else 72) * br // rate + pad
        offs.append(off)
        off += size
    return offs


def _corrupt(s: bytes, frame: int, fam: int = 0) -> bytes:
    """Flip a side-info bit inside ``frame`` (protected stream)."""
    offs = _frame_offsets(s)
    bad = bytearray(s)
    bad[offs[frame] + 6 + 8] ^= 0x55
    return bytes(bad)


@pytest.fixture(scope="module")
def protected():
    return mp3gen.make_stream(n_frames=12, seed=40, protection=True,
                              blocks="varied", mode=1, mode_extension=2,
                              use_reservoir=True)


# ---------------------------------------------------------------------------
# the CRC law, against libavcodec's checker
# ---------------------------------------------------------------------------

@pytest.mark.skipif(ensure_av_oracle() is None,
                    reason="libavcodec unavailable")
@pytest.mark.parametrize("kw", [dict(), dict(mode=3), dict(sfreq=2)],
                         ids=["stereo", "mono", "32k"])
def test_writer_law_vs_libavcodec(kw):
    s = mp3gen.make_stream(n_frames=10, seed=41, protection=True, **kw)

    def av_frames(stream):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "a.mp3")
            open(p, "wb").write(stream)
            r = subprocess.run(
                [ensure_av_oracle(), p, os.path.join(d, "o"), "mp3",
                 "crccheck"], capture_output=True, text=True, check=True)
            return int(r.stdout.split()[-1])

    assert av_frames(s) == 10           # every frame passes ffmpeg's check
    assert av_frames(_corrupt(s, 4)) < 10


# ---------------------------------------------------------------------------
# default-off reference parity
# ---------------------------------------------------------------------------

def test_valid_crc_is_parity_neutral(protected):
    """Valid CRCs change nothing: check on == check off == reference."""
    want = reference_decode(protected)
    assert native_decode_file(protected) == want
    assert native_decode_file(protected, profile=PROFILE_CRC) == want


def test_unchecked_corruption_matches_reference(protected):
    """With the check OFF (default) a corrupted frame decodes as the
    same garbage the reference binary produces — bit parity holds."""
    bad = _corrupt(protected, 3)
    assert native_decode_file(bad) == reference_decode(bad)


# ---------------------------------------------------------------------------
# skip semantics, native == Python through the full state machine
# ---------------------------------------------------------------------------

def test_corrupt_frame_skipped_consistently(protected):
    bad = _corrupt(protected, 3)
    nat = native_decode_file(bad, profile=PROFILE_CRC)
    py = decode_file(bad, crc_check=True)
    assert nat == py
    # the corrupt frame (and any reservoir-starved successor) is gone
    assert len(nat) < len(native_decode_file(bad))
    # and the output is NOT what decoding the garbage yields
    assert nat != native_decode_file(bad)[:len(nat)]


def test_multiple_corrupt_frames(protected):
    bad = _corrupt(_corrupt(protected, 2), 7)
    assert native_decode_file(bad, profile=PROFILE_CRC) == \
        decode_file(bad, crc_check=True)


def test_corrupt_header_half_detected(protected):
    """CRC also covers header bits 16-31: flip the mode-extension bits
    (sync/layer stay intact so the frame still parses)."""
    offs = _frame_offsets(protected)
    bad = bytearray(protected)
    bad[offs[5] + 3] ^= 0x30            # mode_extension
    bad = bytes(bad)
    assert native_decode_file(bad, profile=PROFILE_CRC) == \
        decode_file(bad, crc_check=True)
    assert len(native_decode_file(bad, profile=PROFILE_CRC)) < \
        len(native_decode_file(bad))


def test_drip_feed_need_more(protected):
    """Byte-dripped feeding across a CRC skip matches the one-shot
    decode (the partial-frame NEED_MORE path rolls back cleanly)."""
    bad = _corrupt(protected, 3)
    h = NativePDMP3()
    h.set_profile(PROFILE_CRC)
    h.open_feed()
    out, pos = [], 0
    while True:
        res, pcm = h.read(4096)
        out.append(pcm)
        if res == T.ERR:
            break
        if res == T.NEED_MORE:
            if pos >= len(bad):
                break
            n = min(97, len(bad) - pos)
            h.feed(bad[pos:pos + n])
            pos += n
    assert b"".join(out) == native_decode_file(bad, profile=PROFILE_CRC)


# ---------------------------------------------------------------------------
# LSF profile composition
# ---------------------------------------------------------------------------

def test_lsf_protected_stream(protected):
    s = mp3gen.make_stream(n_frames=12, seed=42, family=1,
                           protection=True)
    prof = PROFILE_LSF | PROFILE_CRC
    assert native_decode_file(s, profile=prof) == \
        native_decode_file(s, profile=PROFILE_LSF)
    bad = _corrupt(s, 4, fam=1)
    nat = native_decode_file(bad, profile=prof)
    py = decode_file(bad, lsf=True, crc_check=True)
    assert nat == py
    assert len(nat) < len(native_decode_file(bad, profile=PROFILE_LSF))


# ---------------------------------------------------------------------------
# Layer I/II (bit-granular protected regions)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(ensure_av_oracle() is None,
                    reason="libavcodec unavailable")
@pytest.mark.parametrize("layer,codec", [(1, "mp1"), (2, "mp2")])
@pytest.mark.parametrize("kw", [dict(), dict(mode=3),
                                dict(mode=1, mode_extension=1)],
                         ids=["stereo", "mono", "joint"])
def test_l12_writer_law_vs_libavcodec(layer, codec, kw):
    """Layer I: FIXED 128/256-bit protected region (the bound-aware
    extent is REJECTED by ffmpeg for joint stereo — this parametrization
    pins that); Layer II: dynamic allocation + scfsi extent."""
    s = mp3gen.make_l12_stream(layer=layer, n_frames=8, seed=53,
                               protection=True, **kw)

    def av_frames(stream):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "a.bin")
            open(p, "wb").write(stream)
            r = subprocess.run(
                [ensure_av_oracle(), p, os.path.join(d, "o"), codec,
                 "crccheck"], capture_output=True, text=True, check=True)
            return int(r.stdout.split()[-1])

    assert av_frames(s) == 8
    bad = bytearray(s)
    bad[len(s) // 8 * 3 + 6] ^= 0x55     # an allocation byte of frame 3
    assert av_frames(bytes(bad)) < 8


@pytest.mark.parametrize("layer", [1, 2])
def test_l12_crc_skip(layer):
    from pdmp3_tpu.host import PROFILE_L12
    s = mp3gen.make_l12_stream(layer=layer, n_frames=10, seed=54,
                               protection=True, mode=1, mode_extension=1)
    prof = PROFILE_L12 | PROFILE_CRC
    assert native_decode_file(s, profile=prof) == \
        native_decode_file(s, profile=PROFILE_L12)
    fsz = len(s) // 10
    bad = bytearray(s)
    bad[4 * fsz + 7] ^= 0x55
    bad = bytes(bad)
    nat = native_decode_file(bad, profile=prof)
    assert nat == decode_file(bad, layers12=True, crc_check=True)
    assert len(nat) < len(native_decode_file(bad, profile=PROFILE_L12))
