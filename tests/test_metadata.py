"""Stream metadata, gapless trim, seeking, and WAV output.

Covers pdmp3_tpu/metadata.py — capability the reference has none of
(it decodes a Xing tag frame as 1152 samples of silence; no "Xing"
string anywhere in /root/reference/pdmp3.c).  The Xing/LAME parser is
validated two ways: against the in-tree mp3gen tag writer and, when
libavformat is present, against ffmpeg's production mp3 muxer
(tools/av_remux.c) — an independent tag *writer* oracle.

The seek contract is the strong one: decode_file_seek(t0, d) must be
byte-identical to the same window cut from a full-file decode, for
both MPEG-1 and LSF streams, through the native decoder.
"""
import io
import struct
import wave

import pytest

from pdmp3_tpu import metadata as M
from pdmp3_tpu.host import PROFILE_LSF, native_decode_file
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.avref import av_remux, ensure_av_remux
from pdmp3_tpu.utils.wav import wav_bytes


# ---------------------------------------------------------------------------
# header probe / frame index
# ---------------------------------------------------------------------------

def test_parse_header_families():
    for fam, kw in ((0, {}), (1, dict(family=1)), (2, dict(family=2))):
        s = mp3gen.make_stream(n_frames=3, **kw)
        h = M.parse_header(s, 0)
        assert h is not None and h.family == fam and h.layer == 3
        assert h.frame_size() > 4
        # the declared frame size lands on the next header
        assert M.parse_header(s, h.frame_size()) is not None


def test_find_first_frame_rejects_false_sync():
    s = mp3gen.make_stream(n_frames=4, seed=1)
    # 0xFF 0xFB prefix garbage: a lone plausible header that chains to
    # nothing must be skipped in favor of the real stream
    junk = b"\x00\xffsync\xff\xfb\x92\x00" + b"\x00" * 7
    off, h = M.find_first_frame(junk + s)
    assert off == len(junk)


def test_frame_index_walks_every_frame():
    s = mp3gen.make_stream(n_frames=25, seed=2)
    idx = M.build_frame_index(s)
    assert idx.n_frames == 25
    assert idx.offsets[0] == 0
    assert all(b > a for a, b in zip(idx.offsets, idx.offsets[1:]))
    # capacities: frame minus header/CRC/side info, always positive
    assert all(c > 0 for c in idx.capacities)


def test_frame_index_id3_and_tag_frame_excluded():
    s, n = mp3gen.make_tagged_stream(n_frames=12, id3_bytes=300, seed=3)
    info = M.parse_stream_info(s)
    assert info.id3v2_bytes == 310
    assert info.first_audio_offset > info.first_frame_offset
    idx = M.build_frame_index(s, info)
    assert idx.n_frames == n            # tag frame not in the index


# ---------------------------------------------------------------------------
# Xing / Info / LAME / VBRI parsing (in-tree writer)
# ---------------------------------------------------------------------------

def test_xing_tag_roundtrip():
    s, n = mp3gen.make_tagged_stream(n_frames=20, seed=4,
                                     encoder_delay=576,
                                     encoder_padding=1152)
    info = M.parse_stream_info(s)
    assert info.vbr_header == "xing" and not info.is_cbr_tag
    assert info.frame_count == n
    assert info.byte_count == len(s)
    assert len(info.toc) == 100
    assert info.lame is not None
    assert info.lame.encoder == "LAME3.100"
    assert info.lame.encoder_delay == 576
    assert info.lame.encoder_padding == 1152
    assert info.lame.tag_crc_ok
    assert info.total_samples == n * 1152 - 576 - 1152
    assert info.duration_seconds == pytest.approx(
        info.total_samples / 44100.0)


def test_info_tag_is_cbr():
    s, _ = mp3gen.make_tagged_stream(n_frames=8, cbr=True, seed=5)
    info = M.parse_stream_info(s)
    assert info.vbr_header == "info" and info.is_cbr_tag


def test_vbri_tag():
    s, n = mp3gen.make_tagged_stream(n_frames=10, tag="vbri", seed=6)
    info = M.parse_stream_info(s)
    assert info.vbr_header == "vbri"
    assert info.frame_count == n
    assert info.byte_count == len(s)
    assert info.lame is None


def test_untagged_stream_estimates_duration():
    s = mp3gen.make_stream(n_frames=30, seed=7)
    info = M.parse_stream_info(s)
    assert info.vbr_header is None and info.frame_count is None
    est = info.estimate_duration(len(s))
    true = 30 * 1152 / 44100.0
    assert est == pytest.approx(true, rel=0.05)


def test_corrupt_tag_payload_never_raises():
    s, _ = mp3gen.make_tagged_stream(n_frames=6, seed=8)
    info0 = M.parse_stream_info(s)
    # truncate the tag frame mid-TOC: parser must degrade, not raise
    cut = info0.first_frame_offset + 60
    info = M.parse_stream_info(s[:cut])
    assert info is not None


def test_tag_crc_detects_corruption():
    s, _ = mp3gen.make_tagged_stream(n_frames=6, seed=9)
    info = M.parse_stream_info(s)
    pos = s.index(b"LAME3.100")
    bad = bytearray(s)
    bad[pos + 1] ^= 0x20
    info2 = M.parse_stream_info(bytes(bad))
    assert info.lame.tag_crc_ok and not info2.lame.tag_crc_ok


# ---------------------------------------------------------------------------
# external tag-writer oracle (libavformat)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(ensure_av_remux() is None,
                    reason="libavformat unavailable")
def test_xing_parser_vs_libavformat_writer():
    s = mp3gen.make_stream(n_frames=40, seed=10)
    out = av_remux(s)
    info = M.parse_stream_info(out)
    assert info.vbr_header in ("xing", "info")
    assert info.frame_count == 40
    assert info.byte_count == len(out)
    assert len(info.toc) == 100
    assert list(info.toc) == sorted(info.toc)       # TOC monotonic
    assert info.lame is not None
    assert info.lame.encoder.startswith("Lavf")
    assert info.lame.tag_crc_ok                     # CRC law matches lavf
    # lavf fills the music CRC over the audio bytes after the tag frame
    audio = out[info.first_audio_offset:]
    assert M.crc16_lame(audio) == info.lame.music_crc
    idx = M.build_frame_index(out, info)
    assert idx.n_frames == 40


# ---------------------------------------------------------------------------
# gapless decode
# ---------------------------------------------------------------------------

def test_gapless_trim_exact_length():
    s, n = mp3gen.make_tagged_stream(n_frames=16, seed=11,
                                     encoder_delay=576,
                                     encoder_padding=1152)
    pcm, info = M.decode_file_gapless(s)
    want = n * 1152 - 576 - 1152
    assert len(pcm) == want * 2 * info.channels
    # and it is the (tail-flushed) full decode shifted by delay + 529;
    # the flush matters: without it the decoder's 1152-byte read gate
    # holds the last frames back forever at EOF (pdmp3.c:2445)
    audio = s[info.first_audio_offset:]
    tail = M._primer_frames(M.parse_header(s, info.first_audio_offset))[0]
    while len(tail) < 2 * 1152:
        tail += tail
    full = native_decode_file(audio + tail)
    skip = (576 + M.DECODER_DELAY) * 2 * info.channels
    assert pcm == full[skip:skip + len(pcm)]
    assert len(full) > len(native_decode_file(audio))  # flush was needed


def test_gapless_untagged_is_identity():
    s = mp3gen.make_stream(n_frames=10, seed=12)
    pcm, _ = M.decode_file_gapless(s)
    assert pcm == native_decode_file(s)


# ---------------------------------------------------------------------------
# seeking
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("t0,dur", [(0.0, 0.1), (0.37, 0.2),
                                    (1.0, None), (1.2, 0.05)])
def test_seek_bit_exact(t0, dur):
    s = mp3gen.make_stream(n_frames=60, seed=13)
    full = native_decode_file(s)
    info = M.parse_stream_info(s)
    pcm, _ = M.decode_file_seek(s, t0, dur)
    a = int(round(t0 * info.sample_rate)) * 2 * info.channels
    assert pcm and pcm == full[a:a + len(pcm)]
    if dur is not None:
        assert len(pcm) == int(round(dur * info.sample_rate)) \
            * 2 * info.channels


def test_seek_bit_exact_lsf():
    s = mp3gen.make_stream(n_frames=60, seed=14, family=1)
    full = native_decode_file(s, profile=PROFILE_LSF)
    info = M.parse_stream_info(s)
    for t0, dur in [(0.2, 0.15), (0.9, 0.1)]:
        pcm, _ = M.decode_file_seek(s, t0, dur)
        a = int(round(t0 * info.sample_rate)) * 2 * info.channels
        assert pcm and pcm == full[a:a + len(pcm)]


def test_seek_bit_exact_mono_low_bitrate():
    # small frames stress the reservoir-reach preroll walkback
    s = mp3gen.make_stream(n_frames=80, seed=15, mode=3, bitrate_index=2)
    full = native_decode_file(s)
    info = M.parse_stream_info(s)
    pcm, _ = M.decode_file_seek(s, 0.8, 0.3)
    a = int(round(0.8 * info.sample_rate)) * 2
    assert pcm and pcm == full[a:a + len(pcm)]


def test_seek_past_end_is_empty():
    s = mp3gen.make_stream(n_frames=8, seed=16)
    pcm, _ = M.decode_file_seek(s, 100.0, 1.0)
    assert pcm == b""


def test_toc_seek_approximates_frame_walk():
    s, n = mp3gen.make_tagged_stream(n_frames=50, seed=17)
    info = M.parse_stream_info(s)
    idx = M.build_frame_index(s, info)
    t = 0.5 * info.duration_seconds
    approx = idx.toc_byte_for_time(t, len(s))
    exact = idx.offsets[idx.frame_for_sample(int(t * info.sample_rate))]
    # a 100-entry TOC is ~1% granular: allow a few frames of slack
    assert abs(approx - exact) < 4 * (len(s) // n)


# ---------------------------------------------------------------------------
# WAV writer
# ---------------------------------------------------------------------------

def test_wav_s16_roundtrip_stdlib():
    s = mp3gen.make_stream(n_frames=4, seed=18)
    pcm = native_decode_file(s)
    blob = wav_bytes(pcm, 44100, 2)
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == 44100
        assert w.getnchannels() == 2
        assert w.getsampwidth() == 2
        assert w.readframes(w.getnframes()) == pcm


def test_wav_f32_header():
    blob = wav_bytes(b"\x00" * 64, 32000, 1, sample_format="f32")
    fmt, nch, rate = struct.unpack_from("<HHI", blob, 20)
    bits = struct.unpack_from("<H", blob, 34)[0]
    assert (fmt, nch, rate, bits) == (3, 1, 32000, 32)
    assert struct.unpack_from("<I", blob, 40)[0] == 64


# ---------------------------------------------------------------------------
# CLI wiring
# ---------------------------------------------------------------------------

def test_cli_info_json(tmp_path, capsys):
    from pdmp3_tpu.cli import main
    s, n = mp3gen.make_tagged_stream(n_frames=12, seed=19)
    p = tmp_path / "a.mp3"
    p.write_bytes(s)
    assert main(["--info", str(p)]) == 0
    import json
    d = json.loads(capsys.readouterr().out)
    assert d["vbr_header"] == "xing" and d["frame_count"] == 12
    assert d["lame"]["encoder"] == "LAME3.100"


def test_cli_seek_wav(tmp_path):
    from pdmp3_tpu.cli import main
    s = mp3gen.make_stream(n_frames=40, seed=20)
    p = tmp_path / "a.mp3"
    p.write_bytes(s)
    out = tmp_path / "cut.wav"
    assert main(["--seek", "0.25", "--duration", "0.1", "--wav",
                 "-o", str(out), str(p)]) == 0
    with wave.open(str(out)) as w:
        assert w.getframerate() == 44100 and w.getnchannels() == 2
        got = w.readframes(w.getnframes())
    full = native_decode_file(s)
    a = int(round(0.25 * 44100)) * 4
    assert got == full[a:a + len(got)]
    assert len(got) == int(round(0.1 * 44100)) * 4


def test_cli_gapless(tmp_path):
    from pdmp3_tpu.cli import main
    s, n = mp3gen.make_tagged_stream(n_frames=10, seed=21,
                                     encoder_delay=576,
                                     encoder_padding=1152)
    p = tmp_path / "a.mp3"
    p.write_bytes(s)
    out = tmp_path / "a.raw"
    assert main(["--gapless", "-o", str(out), str(p)]) == 0
    want = (n * 1152 - 576 - 1152) * 4
    assert out.stat().st_size == want


def test_parser_mutation_robustness():
    """parse_stream_info / build_frame_index / plan_seek never raise on
    mutated tag frames or truncations — they degrade to defaults (the
    metadata plane must survive hostile files; 400 seeded mutations)."""
    import random
    rng = random.Random(99)
    base, _ = mp3gen.make_tagged_stream(n_frames=10, seed=22,
                                        id3_bytes=64)
    vbri, _ = mp3gen.make_tagged_stream(n_frames=8, seed=23, tag="vbri")
    for src in (base, vbri):
        for _ in range(200):
            b = bytearray(src)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            cut = rng.randrange(len(b) + 1)
            data = bytes(b[:cut])
            info = M.parse_stream_info(data)
            if info is None:
                continue
            idx = M.build_frame_index(data, info)
            idx.toc_byte_for_time(1.0, len(data))
            if idx.n_frames:
                M.plan_seek(data, 0.05, 0.1, index=idx)


# ---------------------------------------------------------------------------
# seek state machinery (persistent-scalefactor injection, reservoir tail)
# ---------------------------------------------------------------------------

def test_state_inject_frames_roundtrip():
    """The two injection frames must reconstruct arbitrary persistent
    scalefactor arrays exactly and decode as pure silence (they carry
    big_values == 0 and part2_3_length covering only the scalefactor
    bits, so the Huffman stage reads nothing)."""
    import numpy as np
    from pdmp3_tpu import tables as T
    from pdmp3_tpu.frontend import Frontend

    rng = np.random.default_rng(7)
    sf_l = np.zeros((2, 2, 22), np.int32)
    sf_s = np.zeros((2, 2, 13, 3), np.int32)
    sf_l[:, :, :11] = rng.integers(0, 16, (2, 2, 11))
    sf_l[:, :, 11:21] = rng.integers(0, 8, (2, 2, 10))
    sf_s[:, :, :6] = rng.integers(0, 16, (2, 2, 6, 3))
    sf_s[:, :, 6:12] = rng.integers(0, 8, (2, 2, 6, 3))
    h = M.parse_header(mp3gen.make_stream(n_frames=1, seed=1), 0)
    frames = M._state_inject_frames(h, sf_l, sf_s)
    fe = Frontend()
    fe.feed(frames)
    for _ in range(2):
        res, fd = fe.read_frame()
        assert res == T.OK
        assert int(fd.side.count1.max()) == 0
    assert np.array_equal(fe.scalefac_l[:, :, :21], sf_l[:, :, :21])
    assert np.array_equal(fe.scalefac_s[:, :, :12], sf_s[:, :, :12])
    pcm = native_decode_file(frames)
    assert pcm == b"\x00" * len(pcm)


def test_reservoir_tail_bytes_match_stream():
    """_reservoir_tail_bytes must hand back exactly the main-data bytes
    a full decode's reservoir holds before the join frame."""
    s = mp3gen.make_stream(n_frames=20, seed=44, use_reservoir=True)
    idx = M.build_frame_index(s)
    g = 10
    tail = M._reservoir_tail_bytes(s, idx, g)
    assert len(tail) == 511
    # reconstruct by hand from the frame layout
    chunks = []
    for i in range(g):
        off = idx.offsets[i]
        h = M.parse_header(s, off)
        start = off + 4 + (2 if h.protection_bit == 0 else 0) \
            + h.side_info_size
        chunks.append(s[start:off + h.frame_size()])
    assert b"".join(chunks)[-511:] == tail
