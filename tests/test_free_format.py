"""Free-format bitrate support (ISO 11172-3 §2.4.2.3, bitrate_index 0).

A capability beyond the reference (it rejects free format,
pdmp3.c:1299), gated by Frontend(free_format=True) /
PDMP3_PROFILE_FREE_FORMAT so default behavior keeps bit-parity.  The
decoder deduces the constant frame size from the sync spacing,
chain-verifying a third header to screen false syncs inside main data.

The correctness anchor is framing-independence: a free-format stream
generated from the SAME granule content as a normal-bitrate stream must
decode to identical PCM (the framing carries no signal).
"""
from __future__ import annotations

import numpy as np
import pytest

from pdmp3_tpu import api as A
from pdmp3_tpu import tables as T
from pdmp3_tpu.host import (NativePDMP3, PROFILE_FREE_FORMAT, PROFILE_LSF,
                            native_decode_file)
from pdmp3_tpu.testing import mp3gen

MATRIX = [
    (dict(mode=0), 417),
    (dict(mode=3), 300),
    (dict(blocks="varied", mode=1, mode_extension=2), 500),
    (dict(blocks="short", mode=1, mode_extension=1, intensity_pos=True,
          stereo_extent_ch1=0.4), 520),
    (dict(vary_padding=True, use_reservoir=True, mode=0), 450),
    (dict(protection=True, mode=0, sfreq=1), 380),
    (dict(mode=2, sfreq=2, blocks="mixed"), 440),
]


@pytest.mark.parametrize("idx", range(len(MATRIX)))
def test_native_free_format_matches_python(idx):
    kw, size = MATRIX[idx]
    stream = mp3gen.make_stream(n_frames=8, seed=610 + idx,
                                free_format_size=size, **kw)
    ref = A.decode_file(stream, free_format=True)
    nat = native_decode_file(stream, profile=PROFILE_FREE_FORMAT)
    assert nat == ref
    assert len(ref) >= 5 * 1152 * 2


def test_free_format_rejected_without_flag():
    """Reference parity: bitrate_index 0 is rejected by default
    (pdmp3.c:1299) in both implementations."""
    stream = mp3gen.make_stream(n_frames=6, seed=3, free_format_size=400,
                                mode=0)
    assert A.decode_file(stream) == b""
    assert native_decode_file(stream) == b""


@pytest.mark.parametrize("seed", [1, 5, 9])
def test_free_format_framing_independence(seed):
    """Same granule content, free vs normal framing -> identical PCM on
    the common prefix (tail cutoffs differ with frame size due to the
    1152-byte read gate)."""
    kw = dict(n_frames=8, seed=seed, mode=1, mode_extension=2,
              blocks="varied")
    free = mp3gen.make_stream(free_format_size=500, **kw)
    norm = mp3gen.make_stream(bitrate_index=11, **kw)
    a = A.decode_file(free, free_format=True)
    b = A.decode_file(norm)
    n = min(len(a), len(b))
    assert n >= 5 * 4608
    assert a[:n] == b[:n]


def test_free_format_measurement_waits_for_sync():
    """With only part of the first frame fed, the size cannot be
    measured: read must return NEED_MORE with the cursor rolled back,
    then succeed once the second sync arrives."""
    stream = mp3gen.make_stream(n_frames=8, seed=21, free_format_size=700,
                                mode=0)
    h = NativePDMP3()
    h.set_profile(PROFILE_FREE_FORMAT)
    h.open_feed()
    # 1152-byte gate passes but the second header (at 700) plus its
    # chain-verify partner (at 1400) is not fully buffered yet
    h.feed(stream[:1300])
    res, pcm = h.read(8192)
    assert res == T.NEED_MORE and pcm == b""
    h.feed(stream[1300:])
    res, pcm = h.read(8192)
    assert res == T.NEW_FORMAT and len(pcm) > 0
    whole = native_decode_file(stream, profile=PROFILE_FREE_FORMAT)
    rest = []
    while True:
        res, p = h.read(8192)
        rest.append(p)
        if res in (T.ERR, T.NEED_MORE):
            break
    assert pcm + b"".join(rest) == whole


def test_free_format_lsf_combo():
    """Free format composes with the LSF profile (both extensions)."""
    for fam in (1, 2):
        stream = mp3gen.make_stream(n_frames=8, seed=40 + fam, family=fam,
                                    mode=0, free_format_size=350)
        ref = A.decode_file(stream, lsf=True, free_format=True)
        nat = native_decode_file(stream,
                                 profile=PROFILE_FREE_FORMAT | PROFILE_LSF)
        assert nat == ref and len(ref) > 0


def test_free_format_serving_pool():
    """Free-format streams serve through the standard wire pools — the
    measured frame size is frontend state, invisible to the wire."""
    from pdmp3_tpu.runtime.scheduler import StreamDecoder
    streams = [mp3gen.make_stream(n_frames=8, seed=700 + s,
                                  free_format_size=380 + 40 * s, mode=0)
               for s in range(3)]
    dec = StreamDecoder(3, exact=True, profile=PROFILE_FREE_FORMAT)
    for s, d in enumerate(streams):
        dec.feed(s, d)
    per = [[] for _ in streams]
    while dec.parse_step() > 0:
        pcm = dec.decode_step()
        for s in range(3):
            if dec.active[s]:
                per[s].append(pcm[s].tobytes())
    for s, d in enumerate(streams):
        want = native_decode_file(d, profile=PROFILE_FREE_FORMAT)
        assert b"".join(per[s]) == want, s


def test_free_format_checkpoint_keeps_size():
    """The measured size rides the handle's trivially-copyable state
    blob: a restored decoder continues without re-measuring."""
    stream = mp3gen.make_stream(n_frames=10, seed=77, free_format_size=460,
                                mode=1, mode_extension=2)
    h = NativePDMP3()
    h.set_profile(PROFILE_FREE_FORMAT)
    h.open_feed()
    h.feed(stream)
    first = h.read(4608)[1]
    blob = h.save_state()
    rest_a = []
    while True:
        res, p = h.read(8192)
        rest_a.append(p)
        if res in (T.ERR, T.NEED_MORE):
            break
    h2 = NativePDMP3()
    h2.restore_state(blob)
    rest_b = []
    while True:
        res, p = h2.read(8192)
        rest_b.append(p)
        if res in (T.ERR, T.NEED_MORE):
            break
    assert first and b"".join(rest_a) == b"".join(rest_b)


def test_free_format_many_seeds_false_sync_robustness():
    """Random main-data/ancillary bytes can contain sync-like patterns;
    the chain-verified measurement must never mis-size (decode length
    would collapse or PCM diverge from the Python frontend)."""
    for seed in range(30):
        stream = mp3gen.make_stream(n_frames=6, seed=1000 + seed,
                                    free_format_size=400 + 7 * seed,
                                    mode=seed % 4)
        ref = A.decode_file(stream, free_format=True)
        nat = native_decode_file(stream, profile=PROFILE_FREE_FORMAT)
        assert nat == ref and len(ref) >= 3 * 1152, seed
