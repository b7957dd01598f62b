"""Streaming-API state machine tests (return-code protocol of
pdmp3.c:2301-2535, SURVEY.md §3.5)."""
import numpy as np
import pytest

from pdmp3_tpu import PDMP3, decode_file, tables as T
from pdmp3_tpu.testing import mp3gen


@pytest.fixture(scope="module")
def stream():
    return mp3gen.make_stream(n_frames=8, seed=5, blocks="long")


def test_need_more_until_1152_bytes(stream):
    h = PDMP3()
    h.open_feed()
    res, pcm = h.read(4096)
    assert res == T.NEED_MORE and pcm == b""
    h.feed(stream[:1151])
    res, pcm = h.read(4096)
    assert res == T.NEED_MORE and pcm == b""
    h.feed(stream[1151:1153])
    # outsize == exactly one frame -> loop exhausts outsize -> status OK,
    # upgraded to NEW_FORMAT on the first decode (pdmp3.c:2470-2472)
    res, pcm = h.read(4608)
    assert res == T.NEW_FORMAT
    assert len(pcm) == 4608
    # larger outsize ends on the buffer running dry -> NEED_MORE even
    # though PCM was produced (reference last-attempt semantics)
    h2 = PDMP3()
    h2.open_feed()
    h2.feed(stream[:2048])
    res, pcm = h2.read(65536)
    assert res == T.NEED_MORE
    assert len(pcm) > 0


def test_new_format_once_and_getformat_ack(stream):
    h = PDMP3()
    h.open_feed()
    h.feed(stream[:4096])
    res, _ = h.read(4608)
    assert res == T.NEW_FORMAT
    ok, rate, channels, enc = h.getformat()
    assert (ok, rate, channels, enc) == (T.OK, 44100, 2, T.ENC_SIGNED_16)
    h.feed(stream[4096:8192])
    res, _ = h.read(4608)
    assert res == T.OK  # no second NEW_FORMAT after getformat ack


def test_no_space_on_overfeed(stream):
    h = PDMP3()
    h.open_feed()
    big = bytes(T.INBUF_SIZE + 1)
    assert h.feed(big) == T.NO_SPACE
    assert h.feed(stream[:1000]) == T.OK
    # all-or-nothing: remaining free is INBUF_SIZE-1000... minus 1 slot
    free = h.fe.inbuf_free()
    assert h.feed(bytes(free + 1)) == T.NO_SPACE
    assert h.feed(bytes(free)) == T.OK


def test_read_zero_outsize_is_no_space(stream):
    h = PDMP3()
    h.open_feed()
    res, _ = h.read(0)
    assert res == T.NO_SPACE


def test_partial_frame_drain(stream):
    """Small output buffers: PCM must resume mid-frame via ostart."""
    h = PDMP3()
    h.open_feed()
    pos = 0
    out = []
    while True:
        res, pcm = h.read(128)  # far less than one frame
        out.append(pcm)
        if res == T.ERR:
            break
        if res == T.NEED_MORE:
            if pos >= len(stream):
                break
            h.feed(stream[pos:pos + 4096])
            pos += 4096
    got = b"".join(out)
    want = decode_file(stream)
    assert got == want


@pytest.mark.parametrize("chunk", [1, 7, 17, 353, 4096])
def test_chunked_feed_invariance(stream, chunk):
    h = PDMP3()
    h.open_feed()
    pos = 0
    out = []
    while True:
        res, pcm = h.read(T.INBUF_SIZE)
        out.append(pcm)
        if res == T.ERR:
            break
        if res == T.NEED_MORE:
            if pos >= len(stream):
                break
            h.feed(stream[pos:pos + chunk])
            pos += chunk
    assert b"".join(out) == decode_file(stream)


def test_reservoir_underflow_skips_frame():
    """Streams entered mid-way (main_data_begin > reservoir) must skip
    frames via NEED_MORE without consuming them destructively."""
    full = mp3gen.make_stream(n_frames=10, seed=9, blocks="long",
                              use_reservoir=True)
    # chop the first frame off: find the second sync
    idx = full.find(b"\xff", 2)
    while not (full[idx] == 0xFF and (full[idx + 1] & 0xE0) == 0xE0):
        idx = full.find(b"\xff", idx + 1)
    chopped = full[idx:]
    pcm = decode_file(chopped)
    # must decode *something* eventually (after reservoir refills) and not
    # crash; output is a suffix-decode so shorter than the full decode
    assert len(pcm) <= len(decode_file(full))


def test_one_shot_decode_equivalence(stream):
    h = PDMP3()
    h.open_feed()
    res, pcm = h.decode(stream[:8192], 65536)
    assert res in (T.OK, T.NEW_FORMAT, T.NEED_MORE)
    assert len(pcm) > 0


def test_decode_header_probe():
    """pdmp3_decode with no output buffer surfaces NEW_FORMAT without
    consuming input (pdmp3.c:2507-2516)."""
    stream = mp3gen.make_stream(n_frames=4, seed=3)
    h = PDMP3()
    h.open_feed()
    res, pcm = h.decode(stream[:2048], 0)
    assert res == T.NEW_FORMAT and pcm == b""
    assert h.fe.processed == 0  # cursor restored
    ok, rate, channels, enc = h.getformat()
    assert rate == 44100 and channels == 2


def test_garbage_only_input_errors():
    h = PDMP3()
    h.open_feed()
    garbage = bytes([0x55] * 4096)
    h.feed(garbage)
    res, pcm = h.read(65536)
    assert res in (T.ERR, T.NEED_MORE)
    assert pcm == b""


def test_mono_pcm_layout():
    stream = mp3gen.make_stream(n_frames=4, seed=11, mode=3)
    pcm = decode_file(stream)
    # mono: one int16 per sample
    assert len(pcm) % (1152 * 2) == 0
