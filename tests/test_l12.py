"""Layer I/II decode (beyond-reference: the reference hard-errors on
layer != 3, pdmp3.c:1240/1312).

Correctness anchors:
- libavcodec cross-validation on generator streams over the full config
  matrix (all four MPEG-1 allocation tables, the LSF table, joint/mono/
  dual modes, both layers, MPEG-2 and 2.5 rates);
- real-encoder round trips: libavcodec's mp2 *encoder* produces the
  stream (independent of our generator's tables — a shared-table
  mistake between our generator and decoder cannot hide), we decode it
  and diff against libavcodec's decoder.

The allocation tables were transcribed from ISO 11172-3 tables B.2a-d /
13818-3 table B.1 and are pinned structurally here; the AV tests are
what validates the values.
"""
import numpy as np
import pytest

from pdmp3_tpu import tables as T
from pdmp3_tpu.frontend import Frontend, _BitReader
from pdmp3_tpu.oracle import OracleDSP
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.avref import (av_decode, av_encode, ensure_av_oracle,
                                     ensure_av_encode)

TOL = 1.5e-3

needs_av = pytest.mark.skipif(ensure_av_oracle() is None,
                              reason="libavcodec unavailable")


def ours_decode(stream: bytes) -> np.ndarray:
    """Chunked-feed decode loop (streams can exceed the 16 KiB ring)
    with the pdmp3_read-style cursor rollback on non-OK results."""
    fe = Frontend(layers12=True, lsf=True)
    dsp = OracleDSP()
    pcm = []
    off = 0
    while True:
        mark_istart, mark_pos = fe.istart, fe.processed
        res, fd = fe.read_frame()
        if res != T.OK:
            fe.istart, fe.processed = mark_istart, mark_pos
            if off >= len(stream):
                break
            chunk = stream[off:off + 4096]
            off += len(chunk)
            assert fe.feed(chunk) == T.OK
            continue
        out = dsp.decode_frame(fd)
        w = out.reshape(-1)[:fd.header.pcm_samples]
        left = (w >> 16).astype(np.int16).astype(np.float32) / 32768.0
        if fd.header.nch == 1:
            pcm.append(left)
        else:
            right = (w & 0xFFFF).astype(np.uint16).view(np.int16) \
                .astype(np.float32) / 32768.0
            pcm.append(np.stack([left, right], -1).reshape(-1))
    assert pcm, "no frames decoded"
    return np.concatenate(pcm)


# ---- structural tests (no libavcodec needed) ----

def test_alloc_table_shapes():
    for tab, sblimit in [(T.L2_ALLOC_A, 27), (T.L2_ALLOC_B, 30),
                         (T.L2_ALLOC_C, 8), (T.L2_ALLOC_D, 12),
                         (T.L2_ALLOC_LSF, 30)]:
        assert len(tab) == sblimit
        for nbal, steps in tab:
            assert len(steps) == (1 << nbal) - 1
            for s in steps:
                assert s in T.L2_CLASSES


def test_alloc_table_selection():
    # 11172-3 §2.4.2.1 / per-channel bitrate rules
    # 48 kHz: >=56 kbps/ch -> A, <=48 -> C
    assert T.l2_alloc_table(8, 1, 2) is T.L2_ALLOC_A      # 128k stereo
    assert T.l2_alloc_table(2, 1, 1) is T.L2_ALLOC_C      # 48k mono
    # 44.1 kHz: 56..80 -> A, >=96 -> B, <=48 -> C
    assert T.l2_alloc_table(9, 0, 2) is T.L2_ALLOC_A      # 160k stereo = 80/ch
    assert T.l2_alloc_table(12, 0, 2) is T.L2_ALLOC_B     # 256k stereo
    assert T.l2_alloc_table(4, 0, 2) is T.L2_ALLOC_C      # 64k stereo = 32/ch
    # 32 kHz: <=48 -> D
    assert T.l2_alloc_table(4, 2, 2) is T.L2_ALLOC_D
    assert T.l2_alloc_table(12, 2, 2) is T.L2_ALLOC_B
    # LSF: always table B.1
    assert T.l2_alloc_table(8, 0, 2, family=1) is T.L2_ALLOC_LSF


def test_frame_sizes():
    from pdmp3_tpu.frontend import Header
    h = Header(layer=2, bitrate_index=12, sampling_frequency=0)
    assert h.frame_size() == 144 * 256000 // 44100
    assert h.pcm_samples == 1152
    h = Header(layer=1, bitrate_index=10, sampling_frequency=0)
    assert h.frame_size() == 4 * (12 * 320000 // 44100)
    assert h.pcm_samples == 384
    h = Header(layer=2, bitrate_index=8, sampling_frequency=0, family=1)
    assert h.frame_size() == 144 * 64000 // 22050
    assert h.pcm_samples == 1152  # LSF halves Layer III only


def test_bitreader_bounds():
    br = _BitReader(b"\xAB\xCD")
    assert br.get(4) == 0xA
    assert br.get(8) == 0xBC
    assert br.get(4) == 0xD
    assert not br.overflow
    assert br.get(1) == 0
    assert br.overflow


def test_forbidden_l1_alloc_is_err():
    # hand-build a Layer I frame with alloc=15 in subband 0
    bw = mp3gen.BitWriter()
    hdr = (0x7FF << 21) | (3 << 19) | (3 << 17) | (1 << 16) \
        | (10 << 12) | (0 << 10) | (3 << 6)
    bw.put(hdr, 32)
    bw.put(15, 4)
    body = bw.to_bytes()
    size = 4 * (12 * 320000 // 44100)
    fe = Frontend(layers12=True)
    fe.feed(bytes(body) + b"\x00" * (size - len(body)))
    res, fd = fe.read_frame()
    assert res == T.ERR and fd is None


def test_truncated_frame_is_need_more():
    s = mp3gen.make_l12_stream(layer=2, n_frames=1, seed=5)
    fe = Frontend(layers12=True)
    fe.feed(s[:len(s) // 2])
    mark = fe.istart, fe.processed
    res, fd = fe.read_frame()
    assert res == T.NEED_MORE and fd is None
    # pdmp3_read-style rollback, then feeding the rest completes it
    fe.istart, fe.processed = mark
    fe.feed(s[len(s) // 2:])
    res, fd = fe.read_frame()
    assert res == T.OK and fd.sb_samples is not None


def test_layers12_off_rejects():
    s = mp3gen.make_l12_stream(layer=2, n_frames=2, seed=5)
    fe = Frontend()
    fe.feed(s)
    res, fd = fe.read_frame()
    assert res != T.OK


# ---- batched JAX device path (models/l12.py) ----

def _frames(stream: bytes, **fe_kw):
    fe = Frontend(layers12=True, lsf=True, **fe_kw)
    fe.feed(stream)
    out = []
    while True:
        res, fd = fe.read_frame()
        if res != T.OK:
            break
        out.append(fd)
    assert out
    return out


@pytest.mark.parametrize("layer,kw", [
    (1, dict(bitrate_index=12)),
    (1, dict(bitrate_index=8, mode=3)),
    (2, dict(bitrate_index=12)),
    (2, dict(bitrate_index=8, mode=3)),
    (2, dict(family=1, sfreq=0, bitrate_index=8)),
], ids=["l1-stereo", "l1-mono", "l2-stereo", "l2-mono", "l2-lsf"])
def test_jax_l12_matches_oracle_bitwise(layer, kw):
    """The batched device path must agree BITWISE with the oracle
    synthesis path (same f32 op order) across the carried v_vec state."""
    from pdmp3_tpu.models.l12 import JaxL12
    fds = _frames(mp3gen.make_l12_stream(layer=layer, n_frames=6, seed=11,
                                         **kw))
    dsp, jx = OracleDSP(), JaxL12(exact=True)
    for i, fd in enumerate(fds):
        a = dsp.decode_frame(fd)
        b = jx.decode_frame(fd)
        assert np.array_equal(a, b), f"frame {i} mismatch"


def test_l12_batched_equals_per_stream():
    """Slot isolation: a batch of distinct streams (incl. starved slots
    freezing their state) produces exactly the per-stream PCM."""
    from pdmp3_tpu.models.l12 import (JaxL12, batch_from_frames,
                                      decode_l12_frames, init_l12_state)
    streams = [
        _frames(mp3gen.make_l12_stream(layer=2, n_frames=4, seed=s,
                                       bitrate_index=12))
        for s in range(3)
    ] + [_frames(mp3gen.make_l12_stream(layer=2, n_frames=2, seed=9,
                                        mode=3, bitrate_index=8))]
    B = len(streams)
    n_steps = max(len(s) for s in streams)
    state = init_l12_state(B)
    got = [[] for _ in range(B)]
    for t in range(n_steps):
        fds = [s[t] if t < len(s) else None for s in streams]
        sb, nch, active = batch_from_frames(fds, layer=2)
        pcm, state = decode_l12_frames(
            jnp_asarray(sb), jnp_asarray(nch), jnp_asarray(active), state)
        pcm = np.asarray(pcm)
        for b in range(B):
            if fds[b] is not None:
                got[b].append(pcm[b])
    for b, s in enumerate(streams):
        jx = JaxL12(exact=True)
        for t, fd in enumerate(s):
            ref = np.asarray(jx.decode_frame(fd))   # packed uint32 [2,576]
            w = ref.reshape(-1)[:fd.header.pcm_samples]
            left = (w >> 16).astype(np.uint16).view(np.int16)
            right = (w & 0xFFFF).astype(np.uint16).view(np.int16)
            gb = got[b][t][:fd.header.pcm_samples]
            assert np.array_equal(gb[:, 0], left)
            assert np.array_equal(gb[:, 1], right)


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def test_l12_float_pcm_matches_i16():
    """float_pcm output is the S16 path within 1 LSB of scaling (shared
    clip/NaN policy, ops/dsp.float_pack)."""
    from pdmp3_tpu.models.l12 import (batch_from_frames, decode_l12_frames,
                                      init_l12_state)
    fds = _frames(mp3gen.make_l12_stream(layer=2, n_frames=3, seed=2,
                                         bitrate_index=12))
    state_i = init_l12_state(1)
    state_f = init_l12_state(1)
    for fd in fds:
        sb, nch, active = batch_from_frames([fd], layer=2)
        sb, nch, active = map(jnp_asarray, (sb, nch, active))
        pcm_i, state_i = decode_l12_frames(sb, nch, active, state_i)
        pcm_f, state_f = decode_l12_frames(sb, nch, active, state_f,
                                           float_pcm=True)
        d = np.abs(np.asarray(pcm_f) -
                   np.asarray(pcm_i).astype(np.float32) / 32767.0)
        assert float(d.max()) <= 1.001 / 32767.0


# ---- libavcodec cross-validation ----

L12_CASES = [
    ("l2-tabA-48k", 2, "mp2", dict(sfreq=1, bitrate_index=8)),
    ("l2-tabA-44k", 2, "mp2", dict(sfreq=0, bitrate_index=9)),
    ("l2-tabB-44k", 2, "mp2", dict(sfreq=0, bitrate_index=12)),
    ("l2-tabC-44k", 2, "mp2", dict(sfreq=0, bitrate_index=4)),
    ("l2-tabC-mono", 2, "mp2", dict(sfreq=0, bitrate_index=2, mode=3)),
    ("l2-tabD-32k", 2, "mp2", dict(sfreq=2, bitrate_index=4)),
    ("l2-joint-ext0", 2, "mp2",
     dict(bitrate_index=12, mode=1, mode_extension=0)),
    ("l2-joint-ext2", 2, "mp2",
     dict(bitrate_index=12, mode=1, mode_extension=2)),
    ("l2-mono", 2, "mp2", dict(bitrate_index=8, mode=3)),
    ("l2-dual", 2, "mp2", dict(bitrate_index=12, mode=2)),
    ("l1-44k", 1, "mp1", dict(bitrate_index=12)),
    ("l1-48k", 1, "mp1", dict(sfreq=1, bitrate_index=10)),
    ("l1-32k", 1, "mp1", dict(sfreq=2, bitrate_index=10)),
    ("l1-mono", 1, "mp1", dict(bitrate_index=8, mode=3)),
    ("l1-joint-ext1", 1, "mp1",
     dict(bitrate_index=12, mode=1, mode_extension=1)),
    ("l1-joint-ext3", 1, "mp1",
     dict(bitrate_index=12, mode=1, mode_extension=3)),
    ("l2-lsf-22k", 2, "mp2", dict(family=1, sfreq=0, bitrate_index=8)),
    ("l2-lsf-24k", 2, "mp2", dict(family=1, sfreq=1, bitrate_index=10)),
    ("l2-lsf-16k", 2, "mp2", dict(family=1, sfreq=2, bitrate_index=6)),
    ("l2-lsf-joint", 2, "mp2",
     dict(family=1, sfreq=0, bitrate_index=8, mode=1, mode_extension=1)),
    ("l2-lsf-mono", 2, "mp2",
     dict(family=1, sfreq=0, bitrate_index=6, mode=3)),
    ("l2-lsf25-11k", 2, "mp2", dict(family=2, sfreq=0, bitrate_index=8)),
    ("l1-lsf-22k", 1, "mp1", dict(family=1, sfreq=0, bitrate_index=8)),
]


@needs_av
@pytest.mark.parametrize("desc,layer,codec,kw",
                         L12_CASES, ids=[c[0] for c in L12_CASES])
def test_l12_vs_libavcodec(desc, layer, codec, kw):
    s = mp3gen.make_l12_stream(layer=layer, n_frames=8, seed=7, **kw)
    o = ours_decode(s)
    av = av_decode(s, codec=codec)
    assert o.size == av.size, (o.size, av.size)
    d = float(np.abs(o - av).max())
    assert d < TOL, f"{desc}: maxdiff {d}"


@pytest.mark.skipif(ensure_av_encode() is None,
                    reason="libavcodec unavailable")
@pytest.mark.parametrize("rate,channels,bitrate", [
    (44100, 2, 192000),
    (48000, 2, 256000),
    (32000, 1, 64000),
    (22050, 2, 64000),   # MPEG-2 LSF
    (16000, 1, 32000),   # MPEG-2 LSF
])
def test_l2_real_encoder_roundtrip(rate, channels, bitrate):
    """libavcodec's mp2 encoder produces the stream — a production
    encoder with its own tables — and we must agree with libavcodec's
    decoder on it."""
    rng = np.random.default_rng(rate + channels)
    t = np.arange(int(rate * 0.8), dtype=np.float64) / rate
    sig = sum(a * np.sin(2 * np.pi * f * t + p) for a, f, p in
              [(0.3, 440, 0.0), (0.2, 0.13 * rate, 1.0),
               (0.1, 0.31 * rate, 2.0)])
    sig = (sig + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    pcm = np.stack([sig] * channels, -1).reshape(-1) if channels == 2 else sig
    stream = av_encode(pcm, "mp2", rate, channels, bitrate)
    o = ours_decode(stream)
    av = av_decode(stream, codec="mp2")
    n = min(o.size, av.size)
    assert n > 0
    d = float(np.abs(o[:n] - av[:n]).max())
    assert d < TOL, f"maxdiff {d}"


@needs_av
def test_l2_scfsi_coverage():
    """All four scfsi patterns occur in generator streams and decode
    consistently (the generator draws scfsi uniformly; 8 frames x 30
    subbands x 2 ch make all patterns overwhelmingly likely)."""
    s = mp3gen.make_l12_stream(layer=2, n_frames=8, seed=3, bitrate_index=12)
    o = ours_decode(s)
    av = av_decode(s, codec="mp2")
    assert float(np.abs(o - av).max()) < TOL
