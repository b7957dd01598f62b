"""Native (C++) MPEG-2/2.5 LSF frontend + scalar DSP tests.

Correctness contract (docs/ROADMAP.md LSF design notes): the reference
rejects id==0 streams (pdmp3.c:1295), so there is no external oracle in
this image — LSF correctness rests on 3-way in-tree agreement between
frontend.py (+OracleDSP), the native frame.cc/dsp.cc path behind
PDMP3_PROFILE_LSF, and the batched JAX path, over spec-derived generator
streams (testing/mp3gen LSF mode).
"""
from __future__ import annotations

import numpy as np
import pytest

from pdmp3_tpu import api as A
from pdmp3_tpu import tables as T
from pdmp3_tpu.frontend import Frontend
from pdmp3_tpu.host import (NativePDMP3, PROFILE_LSF, native_decode_file)
from pdmp3_tpu.testing import mp3gen

MATRIX = [
    dict(family=1, mode=0),
    dict(family=1, mode=3, blocks="varied"),
    dict(family=1, mode=1, mode_extension=2, stereo_extent_ch1=0.5),
    dict(family=1, mode=1, mode_extension=1, stereo_extent_ch1=0.3),
    dict(family=1, mode=1, mode_extension=3, blocks="varied",
         stereo_extent_ch1=0.4),
    dict(family=1, blocks="short", mode=0),
    dict(family=1, blocks="mixed", mode=1, mode_extension=1,
         stereo_extent_ch1=0.3),
    dict(family=1, use_reservoir=True, mode=0),
    dict(family=2, mode=0),
    dict(family=2, blocks="varied", mode=1, mode_extension=3,
         stereo_extent_ch1=0.4),
    dict(family=2, blocks="mixed", mode=1, mode_extension=1,
         stereo_extent_ch1=0.3),
    dict(family=2, mode=3, use_reservoir=True),
]


@pytest.mark.parametrize("idx", range(len(MATRIX)))
def test_native_lsf_decode_matches_python(idx):
    """Native streaming decode (PROFILE_LSF) is bit-exact vs the Python
    frontend + NumPy oracle on every sample rate of the matrix row."""
    kw = dict(MATRIX[idx])
    for sf in range(3):
        stream = mp3gen.make_stream(n_frames=6, seed=500 + 7 * idx + sf,
                                    sfreq=sf, bitrate_index=11, **kw)
        ref = A.decode_file(stream, lsf=True)
        nat = native_decode_file(stream, profile=PROFILE_LSF)
        assert nat == ref, f"row {idx} sfreq {sf}"
        assert len(ref) > 0


def test_native_lsf_parse_tensors_and_sidecar():
    """Frame-level parity: native granule tensors, scalefactors and the
    intensity sidecar match frontend.py field-for-field."""
    stream = mp3gen.make_stream(n_frames=6, seed=7, family=1, mode=1,
                                mode_extension=1, stereo_extent_ch1=0.3,
                                blocks="varied", bitrate_index=11)
    h = NativePDMP3()
    h.set_profile(PROFILE_LSF)
    h.open_feed()
    h.feed(stream)
    fe = Frontend(lsf=True)
    fe.feed(stream)
    n_intensity = 0
    for _ in range(6):
        r, g = h.parse_frame()
        r2, fd = fe.read_frame()
        assert r == 0 and r2 == 0
        assert g["family"] == fd.header.family == 1
        np.testing.assert_array_equal(g["ix"], fd.ix)
        np.testing.assert_array_equal(g["scf_l"], fd.scalefac_l)
        np.testing.assert_array_equal(g["scf_s"], fd.scalefac_s)
        for name in ("layout", "block_type", "win_switch", "mixed",
                     "global_gain", "scalefac_scale", "preflag",
                     "count1", "subblock_gain"):
            np.testing.assert_array_equal(
                g[name][:1], getattr_side(fd, name)[:1], err_msg=name)
        if fd.is_eff_l is not None:
            n_intensity += 1
            np.testing.assert_array_equal(g["is_pos_l"], fd.is_eff_l)
            np.testing.assert_array_equal(g["is_pos_s"], fd.is_eff_s)
            assert g["iscale"] == fd.intensity_scale
        else:
            assert (g["is_pos_l"] == T.LSF_IS_ILLEGAL).all()
    assert n_intensity > 0


def getattr_side(fd, name):
    s = fd.side
    h = fd.header
    if name == "layout":
        lay = np.zeros((2, 2), np.int32)
        for gr in range(2):
            for ch in range(2):
                lay[gr, ch] = T.layout_id(
                    h.sampling_frequency, int(s.win_switch_flag[gr][ch]),
                    int(s.block_type[gr][ch]),
                    int(s.mixed_block_flag[gr][ch]))
        return lay
    alias = {"win_switch": "win_switch_flag", "mixed": "mixed_block_flag"}
    return np.asarray(getattr(s, alias.get(name, name)))


def test_mpeg1_bit_identical_under_lsf_profile():
    """The LSF profile only widens sync acceptance; MPEG-1 streams decode
    bit-identically with and without it."""
    for seed in (1, 2):
        s = mp3gen.make_stream(n_frames=8, seed=seed, mode=1,
                               mode_extension=2, blocks="varied",
                               use_reservoir=True)
        assert native_decode_file(s, profile=PROFILE_LSF) == \
            native_decode_file(s)


def test_native_lsf_getformat_rates():
    """getformat reports the family sample rate (13818-3 table)."""
    for fam, sf, rate in ((1, 0, 22050), (1, 1, 24000), (1, 2, 16000),
                          (2, 0, 11025), (2, 1, 12000), (2, 2, 8000)):
        # enough frames to clear the 1152-byte read gate at every rate
        stream = mp3gen.make_stream(n_frames=12, seed=fam * 10 + sf,
                                    family=fam, sfreq=sf, mode=0,
                                    bitrate_index=11)
        h = NativePDMP3()
        h.set_profile(PROFILE_LSF)
        h.open_feed()
        h.feed(stream)
        res, _ = h.read(4096)
        assert res == T.NEW_FORMAT
        _, r, ch, enc = h.getformat()
        assert r == rate and ch == 2 and enc == T.ENC_SIGNED_16


def test_native_lsf_partial_drain_576():
    """LSF frames carry 576 PCM words: small partial reads must drain and
    resume at the one-granule boundary (handle owords accounting).  The
    read size is a sample-frame multiple that never divides 576 — every
    frame boundary is crossed mid-read, exercising the ostart/owords
    wrap (a stale 1152 wrap would emit 576 stale words per frame)."""
    stream = mp3gen.make_stream(n_frames=12, seed=9, family=1, mode=0,
                                bitrate_index=11)
    whole = native_decode_file(stream, profile=PROFILE_LSF)
    assert len(whole) >= 8 * 576 * 2 * 2
    h = NativePDMP3()
    h.set_profile(PROFILE_LSF)
    h.open_feed()
    h.feed(stream)
    got = []
    while True:
        res, pcm = h.read(116)  # 29 stereo samples per read
        got.append(pcm)
        if res in (T.ERR, T.NEED_MORE):
            break
    assert b"".join(got) == whole


def test_native_lsf_checkpoint_roundtrip():
    """Checkpoint mid-LSF-stream and resume bit-identically (the LSF
    profile and owords ride the trivially-copyable handle blob)."""
    stream = mp3gen.make_stream(n_frames=8, seed=11, family=2, mode=1,
                                mode_extension=3, stereo_extent_ch1=0.5,
                                bitrate_index=11)
    h = NativePDMP3()
    h.set_profile(PROFILE_LSF)
    h.open_feed()
    h.feed(stream)
    first = b"".join(h.read(2304)[1] for _ in range(3))
    blob = h.save_state()
    rest_a = []
    while True:
        res, pcm = h.read(4096)
        rest_a.append(pcm)
        if res in (T.ERR, T.NEED_MORE):
            break
    h2 = NativePDMP3()
    h2.restore_state(blob)
    assert h2.get_profile() == PROFILE_LSF
    rest_b = []
    while True:
        res, pcm = h2.read(4096)
        rest_b.append(pcm)
        if res in (T.ERR, T.NEED_MORE):
            break
    assert b"".join(rest_a) == b"".join(rest_b)
    assert first and rest_a[0]


def test_lsf_frame_skipped_by_dense_mpeg1_pool_packer():
    """A PROFILE_LSF handle fed an LSF stream through the dense MPEG-1
    wire packer must never activate a slot (the wire has no one-granule
    layout); the stream is skipped, not livelocked."""
    import ctypes as C

    from pdmp3_tpu.host import lib
    stream = mp3gen.make_stream(n_frames=4, seed=3, family=1, mode=0,
                                bitrate_index=11)
    h = NativePDMP3()
    h.set_profile(PROFILE_LSF)
    h.open_feed()
    h.feed(stream)
    n = 1
    ix = np.zeros((2, n, 2, 576), np.int16)
    scf_l = np.zeros((2, n, 2, 22), np.int16)
    scf_s = np.zeros((2, n, 2, 39), np.int16)
    meta = np.zeros((2, n, 32), np.int16)
    active = np.ones(n, np.int16)
    fn = lib().pdmp3_parse_step_wire16
    fn.argtypes = [C.c_void_p, C.c_size_t, C.c_int, C.c_size_t,
                   C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
                   C.c_void_p]
    handles = (C.c_void_p * n)(h._h)
    for _ in range(8):  # no livelock: frames are consumed
        r = fn(handles, n, 1, 1,
               ix.ctypes.data_as(C.c_void_p),
               scf_l.ctypes.data_as(C.c_void_p),
               scf_s.ctypes.data_as(C.c_void_p),
               meta.ctypes.data_as(C.c_void_p),
               active.ctypes.data_as(C.c_void_p))
        assert r == 0 and active[0] == 0
    assert h.inbuf_filled() < len(stream)


# ---------------------------------------------------------------------------
# LSF serving pools (StreamDecoder(family=...), the dense LSF wire)
# ---------------------------------------------------------------------------

def _serve_pool(streams, family, exact, feed_all=True, **kw):
    from pdmp3_tpu.runtime.scheduler import StreamDecoder
    B = len(streams)
    dec = StreamDecoder(B, exact=exact, family=family, **kw)
    for s, data in enumerate(streams):
        if feed_all:
            dec.feed(s, data)
    per_slot = [[] for _ in range(B)]
    while dec.parse_step() > 0:
        pcm = dec.decode_step()
        act = dec.active if dec.active.ndim == 2 else dec.active[None]
        P = pcm.reshape(B, -1, 576, 2) if pcm is not None else None
        for f in range(act.shape[0]):
            for s in range(B):
                if act[f, s]:
                    p = P[s, f]
                    per_slot[s].append(
                        p.tobytes() if dec.nch(s) == 2
                        else p[:, 0].tobytes())
    return dec, per_slot


@pytest.mark.parametrize("family,exact", [(1, True), (1, False),
                                          (2, True), (2, False)])
def test_lsf_pool_serving_equals_per_stream(family, exact):
    """A mixed-rate/mode/block LSF pool decodes every slot bit-identically
    to (exact) the native per-stream decoder / (fast) within 1 LSB."""
    kws = [dict(mode=0), dict(mode=3),
           dict(mode=1, mode_extension=1, stereo_extent_ch1=0.3,
                blocks="mixed"),
           dict(mode=1, mode_extension=3, blocks="varied",
                stereo_extent_ch1=0.4)]
    streams = [mp3gen.make_stream(n_frames=10, seed=300 + i, family=family,
                                  sfreq=i % 3, bitrate_index=11, **kw)
               for i, kw in enumerate(kws)]
    _, per_slot = _serve_pool(streams, family, exact)
    for s, data in enumerate(streams):
        want = native_decode_file(data, profile=PROFILE_LSF)
        got = b"".join(per_slot[s])
        assert len(got) == len(want), (s, len(got), len(want))
        if exact:
            assert got == want, f"slot {s}"
        else:
            w = np.frombuffer(want, np.int16).astype(np.int32)
            g = np.frombuffer(got, np.int16).astype(np.int32)
            assert np.abs(w - g).max(initial=0) <= 1, f"slot {s}"


def test_lsf_pool_multiframe_step():
    """frames_per_step > 1 chains granule steps on device."""
    streams = [mp3gen.make_stream(n_frames=12, seed=41 + s, family=1,
                                  sfreq=s % 3, mode=0, bitrate_index=11)
               for s in range(3)]
    _, per_slot = _serve_pool(streams, 1, True, frames_per_step=3)
    for s, data in enumerate(streams):
        want = native_decode_file(data, profile=PROFILE_LSF)
        assert b"".join(per_slot[s]) == want, f"slot {s}"


def test_lsf_pool_starved_slot_isolation():
    """A starved (never-fed) slot stays inactive and silent without
    perturbing its batch neighbours."""
    from pdmp3_tpu.runtime.scheduler import StreamDecoder
    streams = [mp3gen.make_stream(n_frames=8, seed=51 + s, family=2,
                                  mode=0, bitrate_index=11)
               for s in range(3)]
    B = 3
    dec = StreamDecoder(B, exact=True, family=2)
    dec.feed(0, streams[0])
    dec.feed(2, streams[2])  # slot 1 starved
    per_slot = [[] for _ in range(B)]
    while dec.parse_step() > 0:
        pcm = dec.decode_step()
        assert dec.active[1] == 0
        assert not pcm[1].any()
        for s in (0, 2):
            if dec.active[s]:
                per_slot[s].append(pcm[s].tobytes())
    for s in (0, 2):
        want = native_decode_file(streams[s], profile=PROFILE_LSF)
        assert b"".join(per_slot[s]) == want


def test_lsf_pool_checkpoint_roundtrip():
    """Pool checkpoint/restore resumes bit-identically mid-stream."""
    from pdmp3_tpu.runtime.scheduler import StreamDecoder
    streams = [mp3gen.make_stream(n_frames=10, seed=61 + s, family=1,
                                  sfreq=s % 3, mode=1, mode_extension=3,
                                  stereo_extent_ch1=0.5, bitrate_index=11)
               for s in range(2)]
    B = 2
    dec = StreamDecoder(B, exact=True, family=1)
    for s, d in enumerate(streams):
        dec.feed(s, d)
    for _ in range(3):
        assert dec.parse_step() > 0
        dec.decode_step()
    ckpt = dec.save_checkpoint()
    rest_a = []
    while dec.parse_step() > 0:
        rest_a.append(np.asarray(dec.decode_step()).copy())
    dec2 = StreamDecoder(B, exact=True, family=1)
    dec2.restore_checkpoint(ckpt)
    rest_b = []
    while dec2.parse_step() > 0:
        rest_b.append(np.asarray(dec2.decode_step()).copy())
    assert len(rest_a) == len(rest_b) > 0
    for a, b in zip(rest_a, rest_b):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# LSF on the fused Pallas kernel (interpret mode here; the compiled
# Mosaic kernel is covered by the on-TPU conformance job)
# ---------------------------------------------------------------------------

def test_lsf_intensity_closed_form_matches_tables():
    """The in-kernel LSF intensity gains use the closed-form 2^(-q/4)
    construction (quarter-step table x exponent bitcast); lock its
    bitwise equality to tables.lsf_intensity_tables over every reachable
    (iscale, position) so the Pallas stereo stage stays bit-identical to
    the XLA path's table gathers."""
    from pdmp3_tpu.ops import dsp as D
    k0t, k1t = T.lsf_intensity_tables()
    qd = np.asarray(D._QUARTER_DOWN4, np.float32)

    def pow2i(n):
        if n < -126 or n > 127:
            return np.float32(0.0)
        return np.int32((n + 127) << 23).view(np.float32)

    for isc in range(2):
        for p in range(32):
            k0e = ((p + 1) >> 1) if (p & 1) else 0
            k1e = 0 if (p & 1) else (p >> 1)
            for tab, e in ((k0t, k0e), (k1t, k1e)):
                q = e * (isc + 1)
                got = np.float32(qd[q & 3] * pow2i(-(q >> 2)))
                assert got.tobytes() == tab[isc][p].tobytes(), \
                    (isc, p, got, tab[isc][p])


def _pool_streams(fam):
    return [mp3gen.make_stream(n_frames=8, seed=700 + i, family=fam,
                               sfreq=i % 3, bitrate_index=11, mode=1,
                               mode_extension=ext, stereo_extent_ch1=0.4,
                               blocks=b)
            for i, (ext, b) in enumerate(
                [(3, "varied"), (1, "mixed"), (2, "long")])]


def _serve(streams, fam, kernel, exact):
    from pdmp3_tpu.runtime.scheduler import StreamDecoder
    B = len(streams)
    dec = StreamDecoder(B, exact=exact, family=fam, kernel=kernel)
    for s, d in enumerate(streams):
        dec.feed(s, d)
    per = [[] for _ in streams]
    while dec.parse_step() > 0:
        pcm = dec.decode_step()
        for s in range(B):
            if dec.active[s]:
                per[s].append(pcm[s].tobytes())
    return [b"".join(p) for p in per]


@pytest.mark.parametrize("fam", [1, 2])
def test_lsf_pallas_exact_pool_bit_exact(fam):
    streams = _pool_streams(fam)
    got = _serve(streams, fam, "pallas", True)
    for s, d in enumerate(streams):
        assert got[s] == native_decode_file(d, profile=PROFILE_LSF), s


@pytest.mark.parametrize("fam", [1, 2])
def test_lsf_pallas_fast_within_1lsb_of_xla(fam):
    streams = _pool_streams(fam)
    fp = _serve(streams, fam, "pallas", False)
    fx = _serve(streams, fam, "xla", False)
    for s in range(len(streams)):
        a = np.frombuffer(fp[s], np.int16).astype(np.int32)
        b = np.frombuffer(fx[s], np.int16).astype(np.int32)
        assert a.shape == b.shape
        assert np.abs(a - b).max(initial=0) <= 1, s


def test_lsf_offline_batched_decode():
    """decode_files_batched(family=) decodes an LSF corpus through the
    per-family pool, matching the native per-stream decoder."""
    from pdmp3_tpu.runtime.scheduler import decode_files_batched
    files = [mp3gen.make_stream(n_frames=8, seed=910 + s, family=1,
                                sfreq=s % 3, mode=0, bitrate_index=11)
             for s in range(3)]
    outs = decode_files_batched(files, exact=True, family=1)
    for s, d in enumerate(files):
        assert outs[s] == native_decode_file(d, profile=PROFILE_LSF), s


def test_partial_drain_then_lsf_frame_no_overread():
    """Regression: an odd-sized read can leave a partially-drained
    1152-word MPEG-1 frame (ostart in (576, 1152)); if an LSF frame
    (owords 576) then decodes, the drain cursor exceeds the new frame's
    word count.  The unsigned difference must clamp (it used to
    underflow and read past id->out in the native convert)."""
    mpeg1 = mp3gen.make_stream(n_frames=4, seed=5, mode=3)  # mono
    lsf = mp3gen.make_stream(n_frames=10, seed=6, family=1, mode=0,
                             bitrate_index=11)
    for h in (NativePDMP3(),):
        h.set_profile(PROFILE_LSF)
        h.open_feed()
        h.feed(mpeg1 + lsf)
        r1, pcm = h.read(1600)          # drain 800 of 1152 mono words
        assert len(pcm) == 1600
        h.read(1)                       # forces decode with stale ostart
        for _ in range(20):             # must not crash / mis-drain
            res, pcm = h.read(4096)
            assert len(pcm) % 4 in (0, 2)
            if res in (T.ERR, T.NEED_MORE):
                break
    # Python impl takes the same interleaving (api.PDMP3 parity)
    from pdmp3_tpu.api import PDMP3
    p = PDMP3(lsf=True)
    p.open_feed()
    p.feed(mpeg1 + lsf)
    p.read(1600)
    p.read(1)
    for _ in range(20):
        res, pcm = p.read(4096)
        if res in (T.ERR, T.NEED_MORE):
            break
