"""Container tags: ID3v1/v1.1, ID3v2.2/2.3/2.4 text frames, APEv2,
Lyrics3 — pdmp3_tpu.metadata.parse_tags and its StreamInfo wiring.

Capability the reference has none of (no tag string appears anywhere in
/root/reference/pdmp3.c; leading tags hit its sync re-search, trailing
tags rot in the ring buffer at EOF).  Validated two ways: hand-built
spec vectors for every container/encoding, and — when libavformat is
present — ID3v2.3/2.4 + ID3v1 written by ffmpeg's production tag writer
(tools/av_remux.c), the same external-anchor pattern test_metadata.py
uses for Xing/LAME.

Decode surfaces must stay reference-parity: a trailing tag stack
changes no PCM byte.
"""
import struct

import pytest

from pdmp3_tpu import metadata as M
from pdmp3_tpu.host import native_decode_file
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.avref import av_remux, ensure_av_remux


# ---------------------------------------------------------------------------
# tag builders (spec-vector writers, independent of the parser)
# ---------------------------------------------------------------------------

def id3v1(title=b"", artist=b"", album=b"", year=b"", comment=b"",
          track=None, genre=255):
    def pad(b, n):
        return b[:n] + b"\x00" * (n - len(b))
    tail = pad(comment, 30)
    if track is not None:                 # ID3v1.1
        tail = pad(comment, 28) + b"\x00" + bytes([track])
    return (b"TAG" + pad(title, 30) + pad(artist, 30) + pad(album, 30)
            + pad(year, 4) + tail + bytes([genre]))


def apev2(items, header=True):
    body = b""
    for key, val in items.items():
        v, fl = (val, 2) if isinstance(val, bytes) \
            else (val.encode("utf-8"), 0)  # item flag bits 2:1 = type
        body += struct.pack("<II", len(v), fl) + key.encode() + b"\x00" + v
    size = len(body) + 32                 # items + footer, excl. header
    flags = 0x80000000 if header else 0   # bit 31: tag has a header
    blk = (b"APETAGEX" + struct.pack("<IIII", 2000, size, len(items),
                                     flags) + b"\x00" * 8)
    hdr = (b"APETAGEX" + struct.pack("<IIII", 2000, size, len(items),
                                     flags | 0x20000000) + b"\x00" * 8)
    return (hdr if header else b"") + body + blk


def lyrics3v2(text=b"[00:00]la"):
    body = b"LYRICSBEGIN" + b"LYR" + b"%05d" % len(text) + text
    return body + b"%06d" % len(body) + b"LYRICS200"


def _frame(fid, payload, major):
    if major == 2:
        return fid[:3] + len(payload).to_bytes(3, "big") + payload
    if major == 4:
        n = len(payload)
        sz = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F, n & 0x7F])
    else:
        sz = struct.pack(">I", len(payload))
    return fid + sz + b"\x00\x00" + payload


def id3v2(frames, major=3, pad=17):
    body = b"".join(_frame(fid, p, major) for fid, p in frames)
    body += b"\x00" * pad
    n = len(body)
    sz = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                (n >> 7) & 0x7F, n & 0x7F])
    return b"ID3" + bytes([major, 0, 0]) + sz + body


# ---------------------------------------------------------------------------
# hand-built spec vectors
# ---------------------------------------------------------------------------

def test_id3v1_plain_and_v11_track():
    t = M.parse_id3v1(id3v1(title=b"Song", artist=b"Band", album=b"LP",
                            year=b"1999", comment=b"hi", genre=17))
    assert (t.title, t.artist, t.album) == ("Song", "Band", "LP")
    assert t.year == "1999" and t.comment == "hi" and t.track is None
    assert t.genre == "Rock"
    t = M.parse_id3v1(id3v1(title=b"S", comment=b"c", track=7))
    assert t.track == 7 and t.comment == "c"
    assert M.parse_id3v1(b"\x00" * 128) is None


def test_apev2_items_and_fields():
    blob = apev2({"Title": "Ape Song", "Artist": "Ape Band",
                  "Track": "4/10", "Year": "2003"})
    n, t = M.trailing_tags(b"junk" + blob)
    assert n == len(blob)
    assert t.title == "Ape Song" and t.artist == "Ape Band"
    assert t.track == 4 and t.year == "2003"
    assert t.sources == ("ape",)
    # footer-only (no header) variant
    blob = apev2({"Album": "X"}, header=False)
    n, t = M.trailing_tags(blob)
    assert n == len(blob) and t.album == "X"


def test_trailing_stack_lyrics_ape_id3v1():
    audio = b"\xAA" * 999
    stack = lyrics3v2() + apev2({"Artist": "A2"}) + \
        id3v1(title=b"T1", artist=b"A1", genre=2)
    n, t = M.trailing_tags(audio + stack)
    assert n == len(stack)
    # precedence: APE over ID3v1 per field; ID3v1 fills the gaps
    assert t.artist == "A2" and t.title == "T1" and t.genre == "Country"
    assert set(t.sources) == {"id3v1", "ape"}
    assert M.trailing_tags(audio)[0] == 0


def test_id3v2_3_text_frames_and_encodings():
    tag = id3v2([
        (b"TIT2", b"\x00Latin Title"),
        (b"TPE1", b"\x01" + "Utf Sixteen".encode("utf-16")),  # BOM'd
        (b"TRCK", b"\x003/12"),
        (b"TCON", b"\x00(17)"),
        (b"COMM", b"\x00engdesc\x00the comment"),
    ], major=3)
    t = M.parse_id3v2_frames(tag)
    assert t.title == "Latin Title"
    assert t.artist == "Utf Sixteen"
    assert t.track == 3
    assert t.genre == "Rock"
    assert t.comment == "the comment"
    assert t.sources == ("id3v2.3",)


def test_id3v2_4_syncsafe_utf8_and_v2_2():
    tag4 = id3v2([(b"TIT2", "\x03Tïtle✓".encode("utf-8")),
                  (b"TDRC", b"\x032011-05"),
                  (b"TCON", b"\x0317")], major=4)
    t = M.parse_id3v2_frames(tag4)
    assert t.title == "Tïtle✓" and t.year == "2011-05"
    assert t.genre == "Rock"
    tag2 = id3v2([(b"TT2", b"\x00Old"), (b"TP1", b"\x00Older")], major=2)
    t = M.parse_id3v2_frames(tag2)
    assert t.title == "Old" and t.artist == "Older"
    assert t.sources == ("id3v2.2",)


def test_id3v2_unknown_and_binary_frames_skipped():
    tag = id3v2([(b"APIC", b"\x00image/png\x00\x03x\x00" + b"\xff" * 40),
                 (b"PRIV", b"owner\x00\x01\x02"),
                 (b"TIT2", b"\x00Still Here")], major=3)
    t = M.parse_id3v2_frames(tag)
    assert t.title == "Still Here"
    assert "APIC" not in t.id3v2


def test_id3v2_frame_format_flags():
    # v2.3 compressed frame (format flag 0x80) skipped, plain one kept
    fr = (b"TIT2" + struct.pack(">I", 6) + b"\x00\x80" + b"\x00zlib?"
          + b"TALB" + struct.pack(">I", 3) + b"\x00\x00" + b"\x00LP")
    body = fr + b"\x00" * 8
    n = len(body)
    tag = (b"ID3\x03\x00\x00" + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                                       (n >> 7) & 0x7F, n & 0x7F]) + body)
    t = M.parse_id3v2_frames(tag)
    assert "TIT2" not in t.id3v2 and t.album == "LP"
    # v2.4 data-length indicator (format flag 0x01): 4-byte prefix skipped
    payload = b"\x00\x00\x00\x05" + b"\x00Len5"
    fr = b"TIT2" + bytes([0, 0, 0, len(payload)]) + b"\x00\x01" + payload
    body = fr + b"\x00" * 8
    n = len(body)
    tag = (b"ID3\x04\x00\x00" + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                                       (n >> 7) & 0x7F, n & 0x7F]) + body)
    t = M.parse_id3v2_frames(tag)
    assert t.title == "Len5"


def test_id3v2_truncated_never_raises():
    tag = id3v2([(b"TIT2", b"\x00Full Title")], major=3)
    for cut in range(len(tag)):
        M.parse_id3v2_frames(tag[:cut])   # must not raise


# ---------------------------------------------------------------------------
# StreamInfo wiring
# ---------------------------------------------------------------------------

def test_stream_info_merges_all_containers():
    s = mp3gen.make_stream(n_frames=12, seed=20)
    lead = id3v2([(b"TIT2", b"\x00V2 Title")], major=3)
    tail = apev2({"Artist": "Ape Artist"}) + id3v1(album=b"V1 Album",
                                                   genre=8)
    info = M.parse_stream_info(lead + s + tail)
    assert info.trailing_tag_bytes == len(tail)
    t = info.tags
    assert t.title == "V2 Title"          # id3v2 wins
    assert t.artist == "Ape Artist"       # ape fills
    assert t.album == "V1 Album"          # id3v1 fills
    assert t.genre == "Jazz"


def test_duration_estimate_excludes_trailing_tags():
    s = mp3gen.make_stream(n_frames=30, seed=21)
    tail = apev2({"Comment": "x" * 4000}) + id3v1(title=b"t")
    info = M.parse_stream_info(s + tail)
    true = 30 * 1152 / 44100.0
    assert info.estimate_duration(len(s) + len(tail)) == pytest.approx(
        true, rel=0.05)
    # without the exclusion a 4 KiB tag on a short stream is way off
    assert len(tail) > 0.2 * len(s)


def test_frame_index_bounded_by_trailing_tags():
    s = mp3gen.make_stream(n_frames=10, seed=22)
    # an APE binary item holding a whole valid frame: a false sync the
    # index walk must not count as audio
    ghost = mp3gen.make_stream(n_frames=2, seed=23)
    tail = apev2({"Binaryish": ghost})
    idx = M.build_frame_index(s + tail)
    assert idx.n_frames == 10


def test_gapless_and_seek_with_big_trailing_tag():
    # a >1152-byte tag stack after the last frame must not disturb the
    # gapless length or the seek contract (tag bytes flush the decoder's
    # read-gate holdback instead of starving it — both the plain and the
    # tagged stream stay consistent with their own full decodes)
    s, _ = mp3gen.make_tagged_stream(n_frames=12, seed=40,
                                     encoder_delay=576,
                                     encoder_padding=1152)
    tail = apev2({"Comment": "x" * 4000}) + id3v1(title=b"t")
    pcm0, info0 = M.decode_file_gapless(s)
    pcm1, _ = M.decode_file_gapless(s + tail)
    assert pcm1 == pcm0
    assert len(pcm0) == info0.total_samples * 2 * info0.channels
    info = M.parse_stream_info(s + tail)
    full = native_decode_file(bytes(s + tail)[info.first_audio_offset:])
    fb = 2 * info.channels
    for t0 in (0.1, 0.2):
        win, _ = M.decode_file_seek(s + tail, t0)
        a = int(round(t0 * info.sample_rate)) * fb
        assert full[a:a + len(win)] == win and win


def test_trailing_tags_change_no_pcm_byte():
    s = mp3gen.make_stream(n_frames=8, seed=24)
    tail = lyrics3v2() + apev2({"Title": "x"}) + id3v1(title=b"y")
    assert native_decode_file(s + tail) == native_decode_file(s)


def test_id3v2_4_appended_tag():
    # v2.4 appended form: header at tag start, "3DI" footer at EOF
    frames = _frame(b"TIT2", b"\x03Appended", 4)
    n = len(frames)
    sz = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F,
                n & 0x7F])
    tag = (b"ID3\x04\x00\x10" + sz + frames           # flag 0x10: footer
           + b"3DI\x04\x00\x10" + sz)
    audio = mp3gen.make_stream(n_frames=4, seed=28)
    nbytes, t = M.trailing_tags(audio + tag + id3v1(artist=b"V1"))
    assert nbytes == len(tag) + 128
    assert t.title == "Appended" and t.artist == "V1"
    assert "id3v2.4" in t.sources and "TIT2" in t.id3v2


def test_tag_parser_mutation_robustness():
    """parse_tags never raises on bit-flipped or truncated tag stacks
    (every container present; 600 seeded mutations) — hostile files
    degrade to partial/empty tags, like the Xing sweep in
    test_metadata.py::test_parser_mutation_robustness."""
    import random
    rng = random.Random(7)
    audio = mp3gen.make_stream(n_frames=4, seed=27)
    src = (id3v2([(b"TIT2", b"\x00T"), (b"TPE1", b"\x01" +
                                        "P".encode("utf-16")),
                  (b"COMM", b"\x00engd\x00c")], major=3)
           + audio + lyrics3v2() + apev2({"Title": "x", "B": b"\xff\x00"})
           + id3v1(title=b"t", track=3))
    for _ in range(600):
        b = bytearray(src)
        for _ in range(rng.randrange(1, 8)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        cut = rng.randrange(len(b) + 1)
        data = bytes(b[:cut])
        n, _tags = M.parse_tags(data)
        assert 0 <= n <= len(data)
        info = M.parse_stream_info(data)
        if info is not None:
            M.build_frame_index(data, info)


# ---------------------------------------------------------------------------
# external writer oracle (libavformat)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(ensure_av_remux() is None,
                    reason="libavformat unavailable")
@pytest.mark.parametrize("ver", [3, 4])
def test_id3v2_parser_vs_libavformat_writer(ver):
    s = mp3gen.make_stream(n_frames=10, seed=25)
    meta = {"title": "Anchor Title", "artist": "Anchor Artist",
            "album": "Anchor Album", "track": "5", "genre": "Jazz"}
    out = av_remux(s, id3v2=ver, metadata=meta)
    assert out[:3] == b"ID3" and out[3] == ver
    info = M.parse_stream_info(out)
    t = info.tags
    assert t.title == "Anchor Title" and t.artist == "Anchor Artist"
    assert t.album == "Anchor Album" and t.track == 5 and t.genre == "Jazz"
    assert t.sources == (f"id3v2.{ver}",)
    # the tag prologue must not disturb the audio probe
    assert info.first_frame_offset >= len(out) - len(s) - 2000
    assert M.build_frame_index(out, info).n_frames == 10


@pytest.mark.skipif(ensure_av_remux() is None,
                    reason="libavformat unavailable")
def test_id3v1_parser_vs_libavformat_writer():
    s = mp3gen.make_stream(n_frames=10, seed=26)
    # this lavf's id3v1_create_tag reads ID3v2-native keys (TIT2/TPE1/
    # TRCK), unlike its ID3v2 writer which converts generic keys
    out = av_remux(s, id3v1=True, metadata={"TIT2": "V1 Anchor",
                                            "TPE1": "V1 Artist",
                                            "TRCK": "9"})
    info = M.parse_stream_info(out)
    assert info.trailing_tag_bytes == 128
    t = info.tags
    assert t.title == "V1 Anchor" and t.artist == "V1 Artist"
    assert t.track == 9


# ---------------------------------------------------------------------------
# round-4 advisor findings (ADVICE.md r3)
# ---------------------------------------------------------------------------

def test_id3v2_2_compression_flag_skips_tag():
    """ID3v2.2 header flag 0x40 means 'compression' (no scheme defined);
    the v2.2 spec says ignore the entire tag — it must not be parsed as
    a v2.3-style extended header."""
    body = _frame(b"TT2", b"\x00Zipped", 2) + b"\x00" * 8
    n = len(body)
    sz = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                (n >> 7) & 0x7F, n & 0x7F])
    tag = b"ID3\x02\x00\x40" + sz + body
    assert M.parse_id3v2_frames(tag) is None
    # same frames without the flag parse fine
    tag_ok = b"ID3\x02\x00\x00" + sz + body
    t = M.parse_id3v2_frames(tag_ok)
    assert t is not None and t.title == "Zipped"


def test_id3v2_grouping_identity_flag():
    """Grouped frames (v2.3 second flag byte 0x20, v2.4 0x40) carry a
    1-byte group ID before the payload; it must not be read as the
    text-encoding byte."""
    # v2.3: group id 0x42, then encoding byte 0 + latin-1 text
    fr = (b"TIT2" + struct.pack(">I", 7) + b"\x00\x20" + b"\x42\x00Group")
    body = fr + b"\x00" * 8
    n = len(body)
    sz = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                (n >> 7) & 0x7F, n & 0x7F])
    t = M.parse_id3v2_frames(b"ID3\x03\x00\x00" + sz + body)
    assert t.title == "Group"
    # v2.4: grouping is format flag 0x40
    payload = b"\x42\x00Grp4"
    fr = b"TIT2" + bytes([0, 0, 0, len(payload)]) + b"\x00\x40" + payload
    body = fr + b"\x00" * 8
    n = len(body)
    sz = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                (n >> 7) & 0x7F, n & 0x7F])
    t = M.parse_id3v2_frames(b"ID3\x04\x00\x00" + sz + body)
    assert t.title == "Grp4"


def test_tcon_refinement_forms():
    """TCON '(nn)Refinement' resolves to the refinement text; bare
    '(nn)' and 'nn' map through the genre table (mpg123 mapping)."""
    for txt, want in ((b"\x00(17)", "Rock"),
                      (b"\x0017", "Rock"),
                      (b"\x00(17)Post-Rock", "Post-Rock"),
                      (b"\x00(255)x", "x")):
        t = M.parse_id3v2_frames(id3v2([(b"TCON", txt)]))
        assert t.genre == want, (txt, t.genre)


def test_ape_stray_header_not_accepted_as_footer():
    """A stray APE *header* block at EOF (footer flag bit 29 set — e.g.
    a tag truncated right after its header) must not be accepted as a
    footer and strip `size` bytes of audio."""
    full = apev2({"Title": "x"}, header=True)
    hdr_block = full[:32]                 # the header (bit 29 set)
    s = mp3gen.make_stream(n_frames=4, seed=5)
    trailing, tags = M.trailing_tags(s + hdr_block)
    assert trailing == 0 and (tags is None or "ape" not in tags.sources)
    # the real footer still parses
    trailing, tags = M.trailing_tags(s + full)
    assert trailing == len(full) and "ape" in tags.sources
