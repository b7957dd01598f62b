"""Native C++ Layer I/II frontend + scalar DSP (PDMP3_PROFILE_L12;
beyond-reference — the reference rejects layer != 3, pdmp3.c:1240/1312).

Correctness contract: 3-way bitwise agreement — the native parse's
requantized subband samples must equal frontend.py's f32-for-f32, and
the native pdmp3_read PCM must equal the oracle synthesis path
byte-for-byte (the same contract the LSF extension ships under,
test_lsf_native.py)."""
import ctypes as C

import numpy as np
import pytest

from pdmp3_tpu import tables as T
from pdmp3_tpu.frontend import Frontend
from pdmp3_tpu.oracle import OracleDSP
from pdmp3_tpu.host import (NativePDMP3, lib, native_decode_file,
                            PROFILE_L12, PROFILE_LSF)
from pdmp3_tpu.testing import mp3gen

CASES = [
    ("l1-44k", 1, dict(bitrate_index=12)),
    ("l1-mono", 1, dict(bitrate_index=8, mode=3)),
    ("l1-joint", 1, dict(bitrate_index=12, mode=1, mode_extension=1)),
    ("l2-tabA", 2, dict(sfreq=1, bitrate_index=8)),
    ("l2-tabB", 2, dict(bitrate_index=12)),
    ("l2-tabC", 2, dict(bitrate_index=4)),
    ("l2-tabD", 2, dict(sfreq=2, bitrate_index=4)),
    ("l2-mono", 2, dict(bitrate_index=8, mode=3)),
    ("l2-joint", 2, dict(bitrate_index=12, mode=1, mode_extension=2)),
    ("l2-lsf", 2, dict(family=1, sfreq=0, bitrate_index=8)),
    ("l2-lsf25", 2, dict(family=2, sfreq=0, bitrate_index=8)),
    ("l1-lsf", 1, dict(family=1, sfreq=0, bitrate_index=8)),
]


def _native(profile=PROFILE_L12 | PROFILE_LSF):
    h = NativePDMP3()
    h.set_profile(profile)
    h.open_feed()
    return h


def oracle_pcm_bytes(stream: bytes) -> bytes:
    fe = Frontend(layers12=True, lsf=True)
    fe.feed(stream)
    dsp = OracleDSP()
    out = []
    while True:
        res, fd = fe.read_frame()
        if res != T.OK:
            break
        w = dsp.decode_frame(fd).reshape(-1)[:fd.header.pcm_samples]
        left = (w >> 16).astype(np.uint16).view(np.int16)
        right = (w & 0xFFFF).astype(np.uint16).view(np.int16)
        if fd.header.nch == 1:
            out.append(right.tobytes())
        else:
            out.append(np.stack([left, right], -1).tobytes())
    return b"".join(out)


@pytest.mark.parametrize("desc,layer,kw", CASES, ids=[c[0] for c in CASES])
def test_native_parse_bitwise_vs_python(desc, layer, kw):
    s = mp3gen.make_l12_stream(layer=layer, n_frames=5, seed=7, **kw)
    fe = Frontend(layers12=True, lsf=True)
    fe.feed(s)
    h = _native()
    h.feed(s)
    nf = 0
    while True:
        res, fd = fe.read_frame()
        if res != T.OK:
            break
        rn, gn = h.parse_frame()
        assert rn == 0
        assert gn["layer"] == layer
        assert gn["nparts"] == fd.sb_samples.shape[1]
        assert gn["nch"] == fd.header.nch
        assert gn["family"] == fd.header.family
        assert gn["sample_rate"] == fd.header.sample_rate
        assert np.array_equal(gn["sb_samples"].view(np.uint32),
                              fd.sb_samples.view(np.uint32))
        nf += 1
    assert nf == 5
    rn, _ = h.parse_frame()
    assert rn != 0  # both frontends exhaust together


@pytest.mark.parametrize("desc,layer,kw", CASES[:8],
                         ids=[c[0] for c in CASES[:8]])
def test_native_streaming_pcm_vs_oracle(desc, layer, kw):
    s = mp3gen.make_l12_stream(layer=layer, n_frames=6, seed=3, **kw)
    want = oracle_pcm_bytes(s)
    got = native_decode_file(s, profile=PROFILE_L12 | PROFILE_LSF)
    assert got == want


def test_native_streaming_chunked_feed():
    """1/7/4096-byte feeds reach the same PCM (NEED_MORE + rollback
    across Layer I/II frame boundaries)."""
    s = mp3gen.make_l12_stream(layer=2, n_frames=4, seed=9,
                               bitrate_index=12)
    want = oracle_pcm_bytes(s)
    for chunk in (7, 501, 4096):
        got = native_decode_file(s, chunk=chunk, profile=PROFILE_L12)
        assert got == want, chunk


def test_profile_off_rejects_l12():
    s = mp3gen.make_l12_stream(layer=2, n_frames=2, seed=5)
    got = native_decode_file(s, profile=0)
    assert got == b""


def test_mpeg1_l3_parity_unaffected_by_profile():
    """An MPEG-1 Layer III stream decodes to an identical PCM prefix
    with PROFILE_L12: the relaxed input gate must not change any decoded
    sample — it may only decode TRAILING frames the reference's
    1152-byte gate strands at end of stream (pdmp3.c:2445)."""
    s = mp3gen.make_stream(n_frames=6, seed=4, blocks="varied")
    a = native_decode_file(s, profile=0)
    b = native_decode_file(s, profile=PROFILE_L12)
    assert len(a) > 0 and len(b) >= len(a)
    assert b[:len(a)] == a
    assert len(b) - len(a) <= 2 * 4608  # only tail frames differ


def _wire_fn():
    fn = lib().pdmp3_parse_step_wire_l12
    fn.argtypes = [C.c_void_p, C.c_size_t, C.c_int, C.c_size_t, C.c_int,
                   C.c_void_p, C.c_void_p, C.c_void_p]
    return fn


@pytest.mark.parametrize("layer,n_threads", [(1, 1), (2, 1), (2, 2)])
def test_wire_l12_matches_python(layer, n_threads):
    S = 12 if layer == 1 else 36
    F, B = 2, 4
    streams = [mp3gen.make_l12_stream(layer=layer, n_frames=5, seed=s,
                                      bitrate_index=12 if s % 2 else 8,
                                      mode=3 if s == 2 else 0)
               for s in range(B - 1)]
    streams.append(mp3gen.make_stream(n_frames=3, seed=1))  # stray L3
    handles = []
    for s in streams:
        h = _native(PROFILE_L12)
        h.feed(s[:16000])
        handles.append(h)
    arr = (C.c_void_p * B)(*[h._h for h in handles])
    sb = np.zeros((F, B, 2, S, 32), np.float32)
    meta = np.zeros((F, B, 4), np.int16)
    active = np.zeros((F, B), np.int16)
    n = _wire_fn()(arr, B, n_threads, F, layer,
                   sb.ctypes.data_as(C.c_void_p),
                   meta.ctypes.data_as(C.c_void_p),
                   active.ctypes.data_as(C.c_void_p))
    assert n == F * (B - 1)
    for b in range(B - 1):
        fe = Frontend(layers12=True)
        fe.feed(streams[b][:16000])
        for f in range(F):
            res, fd = fe.read_frame()
            assert res == T.OK
            assert active[f, b] == 1
            assert np.array_equal(sb[f, b].view(np.uint32),
                                  fd.sb_samples.view(np.uint32))
            assert meta[f, b, 0] == fd.header.nch
            assert meta[f, b, 1] == fd.header.sample_rate // 25
            assert meta[f, b, 2] == layer
    assert active[:, B - 1].sum() == 0  # stray L3 rows stay inactive


def test_wire_l12_wrong_layer_pool_skips():
    """A Layer I stream in a Layer II pool: frames are consumed and
    skipped (no rollback livelock), rows stay inactive."""
    s = mp3gen.make_l12_stream(layer=1, n_frames=4, seed=2)
    h = _native(PROFILE_L12)
    h.feed(s)
    arr = (C.c_void_p * 1)(h._h)
    sb = np.zeros((2, 1, 2, 36, 32), np.float32)
    meta = np.zeros((2, 1, 4), np.int16)
    active = np.ones((2, 1), np.int16)
    n = _wire_fn()(arr, 1, 1, 2, 2,
                   sb.ctypes.data_as(C.c_void_p),
                   meta.ctypes.data_as(C.c_void_p),
                   active.ctypes.data_as(C.c_void_p))
    assert n == 0 and active.sum() == 0


# ---- Python streaming API + CLI (layers12 plumbing) ----

def test_python_streaming_api_l12():
    """api.PDMP3(layers12=True): oracle and JaxDSP backends both match
    the oracle PCM through the full feed/read protocol."""
    from pdmp3_tpu.api import decode_file
    from pdmp3_tpu.models.decoder import JaxDSP
    s = mp3gen.make_l12_stream(layer=2, n_frames=4, seed=6,
                               bitrate_index=12) \
        + mp3gen.make_l12_stream(layer=2, n_frames=2, seed=7,
                                 bitrate_index=12)
    want = oracle_pcm_bytes(s)
    assert decode_file(s, layers12=True) == want
    assert decode_file(s, dsp=JaxDSP(exact=True), layers12=True) == want


def test_cli_layers12(tmp_path):
    from pdmp3_tpu.cli import main
    s = mp3gen.make_l12_stream(layer=1, n_frames=4, seed=4,
                               bitrate_index=12)
    p = tmp_path / "a.mp2"
    p.write_bytes(s)
    assert main(["--layers12", str(p)]) == 0
    assert (tmp_path / "a.mp2.raw").read_bytes() == oracle_pcm_bytes(s)


# ---- serving pool (runtime.L12StreamDecoder) ----

def _pool_decode(streams, layer, **kw):
    """Drive an L12StreamDecoder pool to completion; returns per-slot
    PCM bytes (mono slots keep one channel)."""
    from pdmp3_tpu.runtime import L12StreamDecoder
    dec = L12StreamDecoder(len(streams), layer=layer, **kw)
    pos = [0] * len(streams)
    out = [[] for _ in streams]
    while True:
        for s, data in enumerate(streams):
            while pos[s] < len(data) and dec.inbuf_free(s) >= 4096:
                n = min(4096, len(data) - pos[s])
                dec.feed(s, data[pos[s]:pos[s] + n])
                pos[s] += n
        if dec.parse_step() == 0:
            break
        pcm = dec.decode_step()
        for s in range(len(streams)):
            if dec.active[s]:
                p = pcm[s]
                out[s].append(p[:, 0].tobytes() if dec.nch(s) == 1
                              else p.tobytes())
    return [b"".join(c) for c in out], dec


@pytest.mark.parametrize("layer", [1, 2])
def test_l12_pool_matches_oracle(layer):
    """The serving pool (native wire + batched device synthesis, exact
    mode) reproduces the oracle PCM byte-for-byte per slot, including a
    mono slot and a short slot that starves mid-pool."""
    streams = [
        mp3gen.make_l12_stream(layer=layer, n_frames=5, seed=1,
                               bitrate_index=12),
        mp3gen.make_l12_stream(layer=layer, n_frames=5, seed=2,
                               bitrate_index=8, mode=3),
        mp3gen.make_l12_stream(layer=layer, n_frames=2, seed=3,
                               bitrate_index=12),
    ]
    got, _ = _pool_decode(streams, layer, exact=True)
    for s, stream in enumerate(streams):
        assert got[s] == oracle_pcm_bytes(stream), f"slot {s}"


def test_l12_pool_checkpoint_resume():
    """A pool checkpointed mid-serving resumes bit-identically."""
    streams = [mp3gen.make_l12_stream(layer=2, n_frames=6, seed=s,
                                      bitrate_index=12) for s in range(2)]
    from pdmp3_tpu.runtime import L12StreamDecoder
    dec = L12StreamDecoder(2, layer=2, exact=True)
    for s, d in enumerate(streams):
        dec.feed(s, d)
    outs = []
    for _ in range(3):
        assert dec.parse_step() > 0
        outs.append(dec.decode_step())
    ckpt = dec.save_checkpoint()
    dec2 = L12StreamDecoder(2, layer=2, exact=True)
    dec2.restore_checkpoint(ckpt)
    a = (dec.parse_step(), dec.decode_step())
    b = (dec2.parse_step(), dec2.decode_step())
    assert a[0] == b[0] and np.array_equal(a[1], b[1])


def test_decode_files_batched_l12():
    files = [mp3gen.make_l12_stream(layer=2, n_frames=4, seed=s,
                                    bitrate_index=12) for s in range(3)]
    from pdmp3_tpu.runtime import decode_files_batched
    got = decode_files_batched(files, exact=True, layer=2)
    for f, data in enumerate(files):
        assert got[f] == oracle_pcm_bytes(data)


def test_native_checkpoint_roundtrip_l12():
    """The L12 profile and synthesis FIFO ride the checkpoint blob."""
    s = mp3gen.make_l12_stream(layer=2, n_frames=6, seed=8,
                               bitrate_index=12)
    want = oracle_pcm_bytes(s)
    h = _native(PROFILE_L12)
    h.feed(s)
    got = b""
    res, pcm = h.read(4 * 1152)  # drain some frames
    got += pcm
    blob = h.save_state()
    h2 = NativePDMP3()
    h2.restore_state(blob)
    while True:
        res, pcm = h2.read(16384)
        got += pcm
        if res in (T.ERR, T.NEED_MORE):  # NEW_FORMAT repeats until acked
            break
    assert want.startswith(got) and len(got) >= len(want) - 4 * 1152
