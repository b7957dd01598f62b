"""Serving runtime: batched multi-stream decode == per-file native decode;
idle/starved slots never perturb neighbours."""
import numpy as np
import pytest

from pdmp3_tpu.host import native_decode_file
from pdmp3_tpu.runtime import StreamDecoder, decode_files_batched
from pdmp3_tpu.testing import mp3gen


def _mk(seed, **kw):
    return mp3gen.make_stream(n_frames=6, seed=seed, **kw)


@pytest.fixture(scope="module")
def corpus():
    return [
        _mk(70, blocks="long"),
        _mk(71, blocks="short"),
        _mk(72, blocks="varied", mode=1, mode_extension=2),
        _mk(73, blocks="mixed", sfreq=2),
        _mk(74, blocks="long", mode=3),
        _mk(75, blocks="varied", sfreq=1, use_reservoir=True),
    ]


def test_batched_files_equal_native(corpus):
    got = decode_files_batched(corpus, exact=True)
    for i, data in enumerate(corpus):
        want = native_decode_file(data)
        assert got[i] == want, f"file {i}"


def test_uneven_lengths_and_slot_freeze(corpus):
    """Different-length files: early finishers idle while others continue."""
    files = [corpus[0][:1500], corpus[1], corpus[2][:2000]]
    got = decode_files_batched(files, exact=True)
    for i, data in enumerate(files):
        assert got[i] == native_decode_file(data), f"file {i}"


def test_starved_stream_isolated(corpus):
    """A stream fed byte-by-byte must not affect a fully-fed neighbour."""
    dec = StreamDecoder(2, exact=True)
    dec.feed(0, corpus[0])
    full_pcm = []
    drip_pos = 0
    drip = corpus[1]
    for _ in range(40):
        # drip-feed stream 1 in 100-byte morsels
        if drip_pos < len(drip):
            n = min(100, len(drip) - drip_pos)
            dec.feed(1, drip[drip_pos:drip_pos + n])
            drip_pos += n
        if dec.parse_step() == 0:
            continue
        pcm = dec.decode_step()
        if dec.active[0]:
            full_pcm.append(pcm[0].tobytes())
    want = native_decode_file(corpus[0])
    got = b"".join(full_pcm)
    assert got[:len(want)] == want


def test_garbage_stream_isolated(corpus):
    """A garbage stream occupies a slot without corrupting neighbours."""
    dec = StreamDecoder(2, exact=True)
    dec.feed(0, corpus[2])
    dec.feed(1, bytes([0x31] * 4096))
    out = []
    for _ in range(20):
        if dec.parse_step() == 0:
            break
        pcm = dec.decode_step()
        if dec.active[0]:
            out.append(pcm[0].tobytes())
    want = native_decode_file(corpus[2])
    got = b"".join(out)
    assert got[:len(want)] == want


def test_offline_scan_decode_equals_native(corpus):
    """Whole-corpus lax.scan decode (one dispatch) == per-file native."""
    from pdmp3_tpu.models.offline import decode_files_scan
    got = decode_files_scan(corpus)
    for i, data in enumerate(corpus):
        want = native_decode_file(data)
        a = np.frombuffer(got[i], "<i2")
        b = np.frombuffer(want, "<i2")
        n = min(len(a), len(b))
        assert n >= len(b) - 2 * 1152 * 2  # scan may decode trailing frames
        d = np.abs(a[:n].astype(np.int32) - b[:n].astype(np.int32))
        assert d.max() <= 1  # fast-precision path
        assert (d != 0).mean() < 0.01


def test_offline_scan_decode_exact_bit_equal(corpus):
    """exact=True offline scan is bit-identical to the native decoder."""
    from pdmp3_tpu.models.offline import decode_files_scan
    got = decode_files_scan(corpus, exact=True)
    for i, data in enumerate(corpus):
        want = native_decode_file(data)
        n = min(len(got[i]), len(want))
        assert n >= len(want) - 2 * 1152 * 2 * 2
        assert got[i][:n] == want[:n], f"file {i}"


def test_multi_frame_step(corpus):
    """frames_per_step>1: F frames decode per dispatch, equal to the
    native per-file decode."""
    dec = StreamDecoder(2, exact=True, frames_per_step=3)
    dec.feed(0, corpus[0])
    dec.feed(1, corpus[4])  # mono
    out = [[], []]
    for _ in range(4):
        if dec.parse_step() == 0:
            break
        pcm = dec.decode_step()  # [B, 3*1152, 2]
        for s in range(2):
            for f in range(3):
                if dec.active[f, s]:
                    out[s].append(
                        pcm[s, f * 1152:(f + 1) * 1152].tobytes())
    for s, src in enumerate((corpus[0], corpus[4])):
        want = native_decode_file(src)
        got = b"".join(out[s])
        if s == 1:  # mono: native emits 1ch, batch emits duplicated 2ch
            a = np.frombuffer(got, "<i2").reshape(-1, 2)
            assert (a[:, 0] == a[:, 1]).all()
            got = a[:, 0].tobytes()
        assert got[:len(want)] == want[:len(got)], f"stream {s}"


def test_batched_files_grouped_slots(corpus):
    """n_slots < len(files): round-robin grouping must still match."""
    got = decode_files_batched(corpus, n_slots=2, exact=True)
    for i, data in enumerate(corpus):
        assert got[i] == native_decode_file(data), f"file {i}"


def test_pipelined_drain_equals_sync(corpus):
    """decode_step_pipelined returns the same PCM one step late, with the
    async D2H copy overlapping the next step (VERDICT r2 item 5)."""
    B = 4
    streams = [mp3gen.make_stream(n_frames=5, seed=600 + i,
                                  blocks=["long", "short", "varied",
                                          "mixed"][i % 4],
                                  mode=1 if i % 2 else 0,
                                  mode_extension=2 if i % 2 else 0)
               for i in range(B)]
    dec_s = StreamDecoder(B, exact=True)
    dec_p = StreamDecoder(B, exact=True)
    for s in range(B):
        assert dec_s.feed(s, streams[s]) == 0
        assert dec_p.feed(s, streams[s]) == 0
    want, got = [], []
    while True:
        na_s = dec_s.parse_step()
        na_p = dec_p.parse_step()
        assert na_s == na_p
        if na_s == 0:
            break
        want.append(dec_s.decode_step())
        out = dec_p.decode_step_pipelined()
        if out is not None:
            got.append(out)
    tail = dec_p.drain_pending()
    if tail is not None:
        got.append(tail)
    assert dec_p.drain_pending() is None
    assert len(want) == len(got)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# mid-stream join (serving-side seek)
# ---------------------------------------------------------------------------

def _run_join(dec, j, slot, max_steps=120):
    """Pump a SlotJoin and collect the slot's active-step PCM,
    front-anchored trim per the cursor's accounting."""
    got = []
    for _ in range(max_steps):
        j.pump()
        if dec.parse_step() == 0:
            if j.exhausted:
                break
            continue
        pcm = dec.decode_step()
        if dec.active[slot]:
            got.append(pcm[slot].tobytes())
    blob = b"".join(got)
    fb = 2 * 2  # stereo S16
    return blob[j.drop_samples * fb:(j.drop_samples + j.take_samples) * fb]


def test_pool_join_mid_stream():
    """StreamDecoder.join: a slot pointed at t=0.5s of a new stream
    emits PCM bit-exact vs the same window of a full decode."""
    s = mp3gen.make_stream(n_frames=60, seed=80, blocks="varied",
                           mode=1, mode_extension=2, use_reservoir=True)
    full = native_decode_file(s)
    dec = StreamDecoder(2, exact=True)
    dec.feed(0, _mk(81))          # a neighbour stream from t=0
    t0, dur = 0.5, 0.25
    j = dec.join(1, s, t0, dur)
    window = _run_join(dec, j, 1)
    a = int(round(t0 * 44100)) * 4
    assert len(window) == j.take_samples * 4
    assert window == full[a:a + len(window)]


def test_pool_join_reused_slot():
    """A slot that already served another stream joins bit-exactly —
    the preroll rewrites every recurrent carry inside the dropped
    warm-up, so no device-state reset is needed."""
    s = mp3gen.make_stream(n_frames=50, seed=82, use_reservoir=True)
    full = native_decode_file(s)
    dec = StreamDecoder(2, exact=True)
    # serve a different stream in slot 1 first
    dec.feed(1, _mk(83, blocks="short"))
    for _ in range(8):
        if dec.parse_step():
            dec.decode_step()
    t0, dur = 0.7, 0.2
    j = dec.join(1, s, t0, dur)
    window = _run_join(dec, j, 1)
    a = int(round(t0 * 44100)) * 4
    assert len(window) == j.take_samples * 4
    assert window == full[a:a + len(window)]


def test_pool_join_lsf_family():
    """Join works in an LSF family pool (one granule per frame)."""
    from pdmp3_tpu.host import PROFILE_LSF
    s = mp3gen.make_stream(n_frames=60, seed=84, family=1)
    full = native_decode_file(s, profile=PROFILE_LSF)
    dec = StreamDecoder(2, exact=True, family=1)
    t0, dur = 0.4, 0.2
    j = dec.join(0, s, t0, dur)
    window = _run_join(dec, j, 0)
    info_rate = 22050
    a = int(round(t0 * info_rate)) * 4
    assert len(window) == j.take_samples * 4
    assert window == full[a:a + len(window)]


def test_pool_join_family_mismatch_asserts():
    s = mp3gen.make_stream(n_frames=10, seed=85, family=1)
    dec = StreamDecoder(1, exact=True)
    with pytest.raises(AssertionError):
        dec.join(0, s, 0.0)


def test_batched_gapless_and_window():
    """decode_files_batched(gapless=) / (window=): each file trimmed /
    windowed bit-exact vs its single-file metadata decode."""
    from pdmp3_tpu import metadata as M
    tagged = [mp3gen.make_tagged_stream(n_frames=10, seed=s,
                                        encoder_delay=576,
                                        encoder_padding=1152)[0]
              for s in (86, 87)]
    plain = mp3gen.make_stream(n_frames=12, seed=88, use_reservoir=True)
    files = tagged + [plain]

    from pdmp3_tpu.runtime import decode_files_batched
    got = decode_files_batched(files, exact=True, gapless=True)
    for i, f in enumerate(files):
        want, _ = M.decode_file_gapless(f)
        assert got[i] == want, f"gapless file {i}"

    got = decode_files_batched(files, exact=True, window=(0.1, 0.08))
    for i, f in enumerate(files):
        want, _ = M.decode_file_seek(f, 0.1, 0.08)
        assert got[i] == want, f"window file {i}"
