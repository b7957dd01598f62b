"""JAX batched decoder conformance: exact mode must be bit-exact vs the
reference C binary; fast (MXU) mode within ±1 LSB; batched multi-stream
decode must equal per-stream decode (no cross-slot state leaks)."""
import numpy as np
import pytest

from pdmp3_tpu import PDMP3, decode_file, tables as T
from pdmp3_tpu.frontend import Frontend
from pdmp3_tpu.models import decoder as M
from pdmp3_tpu.oracle import OracleDSP
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.golden import reference_decode

CONFIGS = {
    "long": dict(blocks="long"),
    "varied_ms": dict(blocks="varied", mode=1, mode_extension=2),
    "ms_intensity": dict(blocks="long", mode=1, mode_extension=3,
                         stereo_extent_ch1=0.3, intensity_pos=True),
    "mono_48k": dict(blocks="varied", mode=3, sfreq=1),
    "mixed_32k": dict(blocks="mixed", sfreq=2),
    "reservoir_stuffing": dict(blocks="short", use_reservoir=True,
                               stuffing=4),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_jax_exact_bit_exact(name):
    stream = mp3gen.make_stream(n_frames=8, seed=2, **CONFIGS[name])
    ref = reference_decode(stream)
    mine = decode_file(stream, dsp=M.JaxDSP(exact=True))
    assert mine == ref


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_jax_fast_within_1lsb(name):
    stream = mp3gen.make_stream(n_frames=8, seed=2, **CONFIGS[name])
    ref = np.frombuffer(reference_decode(stream), "<i2")
    mine = np.frombuffer(decode_file(stream, dsp=M.JaxDSP(exact=False)),
                         "<i2")
    assert mine.shape == ref.shape
    d = np.abs(mine.astype(np.int32) - ref.astype(np.int32))
    assert d.max() <= 1
    assert (d != 0).mean() < 0.01


def _band12_zero_bits_stream() -> bytes:
    """Directed fixture for the reference's band-12 OOB scalefactor read
    (scalefac_s[1][1][12][w] aliases the float BITS of is[0][0][w],
    pdmp3.c struct layout; docs/DESIGN.md §6) in the case where the
    aliased sample is exactly +0.0: granule 0 is silent (frame 0, zero
    overlap store => is[0][0][:] == +0.0 => bits 0 => gain 2^0 == 1), and
    granule 1 is pure-short with spectrum extending into band 12.  The
    sentinel-63 zero-gain approximation diverges here; the prev_lines
    carry is required for bit-exactness."""
    import random

    def silent_long():
        g = mp3gen.GranuleSpec()
        g.scalefac_compress = 0
        g.scalefac_l = np.zeros(21, np.int32)
        g.scalefac_s = np.zeros((12, 3), np.int32)
        g.values = np.zeros(576, np.int64)
        g.big_values = 0
        g.n_quads = 0
        return g

    def short_into_band12():
        g = mp3gen.GranuleSpec()
        g.block_type = 2
        g.win_switch = 1
        g.mixed = 0
        g.global_gain = 200
        g.scalefac_compress = 0         # slen (0,0): all scalefacs 0
        g.region0_count, g.region1_count = 8, 12   # implicit for short
        g.table_select = (1, 1, 0)
        g.subblock_gain = (0, 0, 0)
        g.scalefac_l = np.zeros(21, np.int32)
        g.scalefac_s = np.zeros((12, 3), np.int32)
        vals = np.zeros(576, np.int64)
        vals[:560] = 1                   # 32 kHz short band 12 = lines 540+
        g.values = vals
        g.big_values = 280
        g.n_quads = 0
        return g

    frames = []
    for _ in range(3):
        grans = [[silent_long(), silent_long()],
                 [short_into_band12(), short_into_band12()]]
        frames.append(mp3gen.FrameSpec(
            bitrate_index=14, sampling_frequency=2, granules=grans,
            scfsi=np.zeros((2, 4), np.int32)))
    return mp3gen.assemble_stream(frames, rng=random.Random(1234),
                                  use_reservoir=False)


def test_jax_exact_band12_float_bits():
    """JAX exact path reproduces the band-12 OOB float-bits gain
    bit-exactly, including the zero-bits case the sentinel cannot cover
    (VERDICT r1 item 4)."""
    stream = _band12_zero_bits_stream()
    ref = reference_decode(stream)
    assert len(ref) > 0
    mine = decode_file(stream, dsp=M.JaxDSP(exact=True))
    assert mine == ref
    # the starved 320k/32k streams reach the same OOB path with nonzero
    # bit patterns (huge scalefactors -> +0.0 gains)
    for seed, blocks, mode, ext in ((60188, "long", 2, 0),
                                    (60307, "varied", 1, 2)):
        s = mp3gen.make_stream(n_frames=8, seed=seed, sfreq=2,
                               bitrate_index=14, mode=mode,
                               mode_extension=ext, blocks=blocks,
                               use_reservoir=True, amp=20)
        assert decode_file(s, dsp=M.JaxDSP(exact=True)) \
            == reference_decode(s)


def _parse_frames(stream: bytes, n: int):
    fe = Frontend()
    fe.feed(stream)
    fds = []
    while len(fds) < n:
        res, fd = fe.read_frame()
        assert res == T.OK
        fds.append(fd)
    return fds


def test_batched_equals_per_stream():
    """Heterogeneous batch (stereo/mono/short/MS, mixed sample rates) must
    reproduce each stream's solo oracle decode — this is the test the
    reference would fail with its function-static DSP state
    (pdmp3.c:1755,1983)."""
    specs = [
        dict(blocks="long", seed=10),
        dict(blocks="short", seed=11),
        dict(blocks="varied", seed=12, mode=1, mode_extension=2),
        dict(blocks="mixed", seed=13, sfreq=2),
        dict(blocks="long", seed=14, mode=3),
        dict(blocks="varied", seed=15, sfreq=1, use_reservoir=True),
    ]
    n_frames = 4
    streams = [mp3gen.make_stream(n_frames=n_frames + 2, **sp)
               for sp in specs]
    frames = [_parse_frames(s, n_frames) for s in streams]

    # solo oracle decode per stream
    want = []
    for fds in frames:
        o = OracleDSP()
        want.append([o.decode_frame(fd) for fd in fds])

    # batched decode: one slot per stream, frames in lockstep
    B = len(specs)
    state = M.init_state(B)
    got = [[] for _ in range(B)]
    for t in range(n_frames):
        fds = [frames[b][t] for b in range(B)]
        for gr, batch in enumerate(M.frame_to_batches(fds)):
            pcm, state = M.decode_granules(batch, state, exact=True)
            pcm = np.asarray(pcm)
            for b in range(B):
                got[b].append((gr, t, pcm[b]))

    for b in range(B):
        nch = 1 if specs[b].get("mode") == 3 else 2
        for gr, t, pcm in got[b]:
            packed = want[b][t][gr]  # uint32[576]
            want_l = ((packed >> 16) & 0xFFFF).astype(np.uint16)
            want_r = (packed & 0xFFFF).astype(np.uint16)
            if nch == 1:
                want_r = want_l  # reference packs mono duplicated
            np.testing.assert_array_equal(
                pcm[:, 0].astype(np.uint16), want_l,
                err_msg=f"stream {b} frame {t} gr {gr} left")
            np.testing.assert_array_equal(
                pcm[:, 1].astype(np.uint16), want_r,
                err_msg=f"stream {b} frame {t} gr {gr} right")


def test_jit_cache_single_compile():
    """All layout/mode variance is data, not structure: decoding different
    streams must not retrigger compilation."""
    s1 = mp3gen.make_stream(n_frames=3, seed=20, blocks="long")
    s2 = mp3gen.make_stream(n_frames=3, seed=21, blocks="short", sfreq=2,
                            mode=1, mode_extension=2)
    f1 = _parse_frames(s1, 2)
    f2 = _parse_frames(s2, 2)
    state = M.init_state(2)
    batches = M.frame_to_batches([f1[0], f2[0]])
    M.decode_granules(batches[0], state, exact=True)
    n0 = M.decode_granules._cache_size()
    batches = M.frame_to_batches([f1[1], f2[1]])
    M.decode_granules(batches[1], state, exact=True)
    assert M.decode_granules._cache_size() == n0
