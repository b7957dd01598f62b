"""MPEG-2 / MPEG-2.5 low-sampling-frequency (LSF) extension tests.

The reference decoder REJECTS id==0 headers outright (pdmp3.c:1295), so
there is no external oracle for these streams in this image.  Correctness
rests on (a) generator round-trips — mp3gen writes known side info,
scalefactors and spectra, the frontend must recover them bit-for-bit —
(b) spec-derived invariants on the 13818-3 tables, and (c) cross-
implementation agreement (oracle vs JAX vs native, in their own files).
MPEG-1 behavior must be unchanged by the lsf=True acceptance flag.
"""
import numpy as np
import pytest

from pdmp3_tpu import tables as T
from pdmp3_tpu.api import PDMP3, decode_file
from pdmp3_tpu.frontend import Frontend
from pdmp3_tpu.oracle import OracleDSP
from pdmp3_tpu.testing import mp3gen


def _parse_all(stream: bytes, lsf: bool = True):
    fe = Frontend(lsf=lsf)
    fe.feed(stream)
    fds = []
    while True:
        res, fd = fe.read_frame()
        if res != T.OK:
            break
        fds.append(fd)
    return fds


def _decode_direct(stream: bytes, lsf: bool = True) -> bytes:
    """Frame-at-a-time frontend+oracle decode, no 1152-byte read gate."""
    fe = Frontend(lsf=lsf)
    fe.feed(stream)
    dsp = OracleDSP()
    pcm = []
    while True:
        res, fd = fe.read_frame()
        if res != T.OK:
            break
        out = dsp.decode_frame(fd)
        nwords = 576 * fd.header.ngr
        flat = out.reshape(-1)[:nwords]
        if fd.header.nch == 1:
            w = (flat & 0xFFFF).astype(np.uint16)
        else:
            w = np.empty(2 * nwords, np.uint16)
            w[0::2] = (flat >> 16) & 0xFFFF
            w[1::2] = flat & 0xFFFF
        pcm.append(w.astype("<u2").tobytes())
    return b"".join(pcm)


# ---------------------------------------------------------------------------
# 13818-3 table invariants
# ---------------------------------------------------------------------------

def test_lsf_band_tables_tile_576():
    for fam in (1, 2):
        for sf in range(3):
            longs = T.SFB_LONG_FAM[fam][sf]
            shorts = T.SFB_SHORT_FAM[fam][sf]
            assert longs[0] == 0 and longs[22] == 576
            assert shorts[0] == 0 and shorts[13] == 192
            assert np.all(np.diff(longs) > 0)
            assert np.all(np.diff(shorts) > 0)
            # mixed-block switch point: long bands 0..5 end exactly where
            # short band 3 starts (x3 windows)
            assert longs[T.SWITCH_SFB_L[fam]] == 3 * shorts[T.SWITCH_SFB_S]


def test_lsf_slen_partition_sums():
    """Every 9-bit scalefac_compress must yield partitions whose counts
    sum to the band totals (21 long / 36 short / 6+27 mixed) and field
    widths that a 12-bit part2_3_length can carry."""
    for intensity in (False, True):
        for sc in range(512):
            slen, bn, preflag, iscale = T.lsf_slen(sc, intensity)
            assert len(slen) == 4 and all(0 <= w <= 5 for w in slen)
            rows = T.NR_OF_SFB[bn]
            assert [int(x) for x in rows.sum(axis=1)] == [21, 36, 33]
            if intensity:
                assert bn in (3, 4, 5) and preflag == 0
                assert iscale == (sc & 1)
            else:
                assert bn in (0, 1, 2) and iscale == 0
                assert preflag == (1 if sc >= 500 else 0)
            # worst-case scalefactor bits must fit part2_3_length
            assert sum(int(w) * int(c) for w, c in zip(slen, rows[1])) < 4096


def test_lsf_intensity_tables_formula():
    k0, k1 = T.lsf_intensity_tables()
    for iscale in range(2):
        io = 2.0 ** (-0.25 * (iscale + 1))
        for p in range(32):
            if p & 1:
                assert k0[iscale, p] == np.float32(io ** ((p + 1) // 2))
                assert k1[iscale, p] == 1.0
            else:
                assert k0[iscale, p] == 1.0
                assert k1[iscale, p] == np.float32(io ** (p // 2))
        # sentinel region: identity gains (callers also skip the band)
        assert np.all(k0[iscale, 32:] == 1.0)
        assert np.all(k1[iscale, 32:] == 1.0)


def test_lsf_frame_sizes():
    # spot values against 72 * bitrate // rate (13818-3 §2.4.3.1)
    assert T.lsf_frame_size(9, 0, 1, 0) == 72 * 80000 // 22050
    assert T.lsf_frame_size(1, 2, 2, 0) == 72 * 8000 // 8000
    assert T.lsf_frame_size(14, 1, 1, 1) == 72 * 160000 // 24000 + 1


# ---------------------------------------------------------------------------
# generator round-trip: parsed side info / scalefactors / spectrum must
# equal what mp3gen wrote
# ---------------------------------------------------------------------------

MATRIX = [
    dict(family=1, blocks="long"),
    dict(family=1, blocks="short"),
    dict(family=1, blocks="mixed"),
    dict(family=1, blocks="varied", use_reservoir=True),
    dict(family=1, blocks="long", mode=3),
    dict(family=1, blocks="long", mode=1, mode_extension=2),
    dict(family=1, blocks="long", mode=1, mode_extension=1,
         stereo_extent_ch1=0.3),
    dict(family=1, blocks="varied", mode=1, mode_extension=3,
         stereo_extent_ch1=0.4),
    dict(family=1, blocks="varied", sfreq=1),
    dict(family=1, blocks="varied", sfreq=2),
    dict(family=2, blocks="long"),
    dict(family=2, blocks="varied", use_reservoir=True),
    dict(family=2, blocks="short", sfreq=2),      # 8 kHz 2-line tail bands
    dict(family=2, blocks="varied", sfreq=2, mode=1, mode_extension=1,
         stereo_extent_ch1=0.3),
    dict(family=2, blocks="long", mode=3, vary_padding=True),
    dict(family=1, blocks="long", protection=True, stuffing=4),
]


@pytest.mark.parametrize("idx", range(len(MATRIX)))
def test_lsf_generator_roundtrip(idx):
    kw = dict(MATRIX[idx])
    specs = []
    stream = mp3gen.make_stream(n_frames=8, seed=1000 + idx,
                                bitrate_index=11, specs_out=specs, **kw)
    fds = _parse_all(stream)
    assert len(fds) == len(specs) == 8
    fam = kw["family"]
    for fno, (fd, fs) in enumerate(zip(fds, specs)):
        h = fd.header
        assert h.family == fam and h.ngr == 1
        assert h.sampling_frequency == fs.sampling_frequency
        assert h.mode == fs.mode and h.mode_extension == fs.mode_extension
        nch = 1 if fs.mode == 3 else 2
        s = fd.side
        for ch in range(nch):
            g = fs.granules[0][ch]
            ctx = f"frame {fno} ch {ch}"
            assert s.big_values[0][ch] == g.big_values, ctx
            assert s.global_gain[0][ch] == g.global_gain, ctx
            assert s.scalefac_compress[0][ch] == g.scalefac_compress, ctx
            assert s.win_switch_flag[0][ch] == g.win_switch, ctx
            if g.win_switch:
                assert s.block_type[0][ch] == g.block_type, ctx
                assert s.mixed_block_flag[0][ch] == g.mixed, ctx
                assert list(s.subblock_gain[0][ch]) == list(g.subblock_gain), ctx
            assert s.scalefac_scale[0][ch] == g.scalefac_scale, ctx
            assert s.count1table_select[0][ch] == g.count1table_select, ctx
            assert s.preflag[0][ch] == g.preflag, ctx  # derived, not sent
            np.testing.assert_array_equal(
                fd.scalefac_l[0][ch][:21], g.scalefac_l, err_msg=ctx)
            np.testing.assert_array_equal(
                fd.scalefac_s[0][ch][:12], g.scalefac_s, err_msg=ctx)
            # stuffing bits live inside part2_3_length and decode as
            # extra count1 quads (reference semantics, mp3gen module doc)
            # — compare exactly up to the generated extent, bound the rest
            ext = g.big_values * 2 + 4 * g.n_quads
            np.testing.assert_array_equal(fd.ix[0][ch][:ext],
                                          g.values[:ext], err_msg=ctx)
            assert np.abs(fd.ix[0][ch][ext:]).max(initial=0) <= 1, ctx
        # granule 1 of the parse arrays must stay zeroed for LSF
        np.testing.assert_array_equal(fd.ix[1], 0)


def test_lsf_intensity_sidecar_mapping():
    """ch1's transmitted scalefactors double as intensity positions; the
    per-partition all-ones value must map to LSF_IS_ILLEGAL and slen==0
    partitions to position 0."""
    specs = []
    stream = mp3gen.make_stream(n_frames=6, seed=77, family=1, mode=1,
                                mode_extension=1, stereo_extent_ch1=0.3,
                                bitrate_index=11, specs_out=specs)
    fds = _parse_all(stream)
    assert len(fds) == 6
    hit_illegal = hit_legal = False
    for fd, fs in zip(fds, specs):
        assert fd.is_eff_l is not None and fd.is_eff_s is not None
        g = fs.granules[0][1]
        # rebuild expected positions from the generator's flat list
        slen, counts = g.lsf_slen, g.lsf_counts
        exp_pos = []
        k = 0
        for p in range(4):
            w = int(slen[p])
            for _ in range(int(counts[p])):
                v = int(g.lsf_flat[k]); k += 1
                exp_pos.append(T.LSF_IS_ILLEGAL
                               if (w and v == (1 << w) - 1) else v)
        got = list(fd.is_eff_l[:21])  # long blocks in this stream
        assert got == exp_pos[:21]
        hit_illegal |= T.LSF_IS_ILLEGAL in got
        hit_legal |= any(p != T.LSF_IS_ILLEGAL for p in got)
        assert fd.intensity_scale == (g.scalefac_compress & 1)
    assert hit_illegal and hit_legal, "stream did not exercise both cases"


# ---------------------------------------------------------------------------
# oracle decode + API plumbing
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(family=1, blocks="varied"),
    dict(family=1, blocks="varied", mode=1, mode_extension=3,
         stereo_extent_ch1=0.4, use_reservoir=True),
    dict(family=2, blocks="varied", sfreq=2),
    dict(family=1, blocks="long", mode=3),
], ids=["m2-varied", "m2-js-resv", "m25-8k", "m2-mono"])
def test_lsf_decode_file_matches_direct(kw):
    stream = mp3gen.make_stream(n_frames=10, seed=5, bitrate_index=11, **kw)
    direct = _decode_direct(stream)
    nch = 1 if kw.get("mode") == 3 else 2
    assert len(direct) == 10 * 576 * 2 * nch   # ONE granule per frame
    via_api = decode_file(stream, lsf=True)
    # the API's 1152-byte read gate may strand the last few frames (LSF
    # frames are ~365 B here, so up to ~4); everything it does emit must
    # match the direct decode exactly
    assert len(via_api) >= 6 * 576 * 2 * nch
    assert direct[:len(via_api)] == via_api
    pcm = np.frombuffer(direct, "<i2")
    assert np.abs(pcm.astype(np.int32)).max() > 0


def test_lsf_partial_reads_drain_correctly():
    """576-word frames through the ostart resume path: tiny outsize reads
    must concatenate to the same PCM as one big read."""
    stream = mp3gen.make_stream(n_frames=6, seed=9, family=1,
                                bitrate_index=11, blocks="long")
    big = decode_file(stream, lsf=True)
    h = PDMP3(lsf=True)
    h.open_feed()
    h.feed(stream)
    chunks = []
    while True:
        res, pcm = h.read(100)   # deliberately unaligned with 576 frames
        chunks.append(pcm)
        if res in (T.ERR, T.NEED_MORE):
            break
    small = b"".join(chunks)
    assert small == big


def test_lsf_getformat_rates():
    for fam, sfreq, rate in ((1, 0, 22050), (1, 2, 16000),
                             (2, 1, 12000), (2, 2, 8000)):
        stream = mp3gen.make_stream(n_frames=3, seed=2, family=fam,
                                    sfreq=sfreq, bitrate_index=11)
        h = PDMP3(lsf=True)
        h.open_feed()
        res, _ = h.decode(stream, 0)
        assert res == T.NEW_FORMAT
        _, got_rate, ch, enc = h.getformat()
        assert got_rate == rate and ch == 2


# ---------------------------------------------------------------------------
# batched JAX path: cross-implementation agreement with the oracle (no
# reference binary exists for LSF — the oracle is the semantic contract)
# ---------------------------------------------------------------------------

JAX_MATRIX = [
    dict(family=1, blocks="varied"),
    dict(family=1, blocks="varied", mode=1, mode_extension=3,
         stereo_extent_ch1=0.4, use_reservoir=True),
    dict(family=1, blocks="mixed", sfreq=1),
    dict(family=2, blocks="varied", sfreq=2, mode=1, mode_extension=1,
         stereo_extent_ch1=0.3),
    dict(family=2, blocks="short"),
    dict(family=1, blocks="long", mode=3),
]
_JAX_IDS = ["m2-varied", "m2-js-resv", "m2-mixed-24k", "m25-8k-is",
            "m25-short", "m2-mono"]


def _decode_frames(stream: bytes, dsp) -> list[np.ndarray]:
    fe = Frontend(lsf=True)
    fe.feed(stream)
    outs = []
    while True:
        res, fd = fe.read_frame()
        if res != T.OK:
            break
        outs.append(dsp.decode_frame(fd).copy())
    return outs


@pytest.mark.parametrize("kw", JAX_MATRIX, ids=_JAX_IDS)
def test_lsf_jax_exact_matches_oracle(kw):
    from pdmp3_tpu.models import decoder as M
    stream = mp3gen.make_stream(n_frames=8, seed=31, bitrate_index=11, **kw)
    ref = _decode_frames(stream, OracleDSP())
    got = _decode_frames(stream, M.JaxDSP(exact=True))
    assert len(ref) == len(got) == 8
    for fno, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {fno}")


@pytest.mark.parametrize("kw", JAX_MATRIX, ids=_JAX_IDS)
def test_lsf_jax_fast_within_1lsb(kw):
    from pdmp3_tpu.models import decoder as M
    stream = mp3gen.make_stream(n_frames=8, seed=31, bitrate_index=11, **kw)
    ref = _decode_frames(stream, OracleDSP())
    got = _decode_frames(stream, M.JaxDSP(exact=False))
    for fno, (a, b) in enumerate(zip(ref, got)):
        for half, shift in (("L", 16), ("R", 0)):
            ra = ((a[0] >> shift) & 0xFFFF).astype(np.uint16) \
                .astype(np.int16).astype(np.int32)
            rb = ((b[0] >> shift) & 0xFFFF).astype(np.uint16) \
                .astype(np.int16).astype(np.int32)
            d = np.abs(ra - rb)
            assert d.max() <= 1, f"frame {fno} {half}: {d.max()}"


def test_lsf_batched_equals_per_stream():
    """B=3 LSF slots (different rates/modes, same family) through ONE
    batched program must equal three per-stream decodes — no cross-slot
    leaks through the family-keyed constant maps."""
    from pdmp3_tpu.models import decoder as M
    kws = [dict(family=1, blocks="varied"),
           dict(family=1, blocks="short", sfreq=2, mode=1, mode_extension=3,
                stereo_extent_ch1=0.3),
           dict(family=1, blocks="long", mode=3, sfreq=1)]
    streams = [mp3gen.make_stream(n_frames=6, seed=41 + i, bitrate_index=11,
                                  **kw) for i, kw in enumerate(kws)]
    fes = []
    for s in streams:
        fe = Frontend(lsf=True)
        fe.feed(s)
        fes.append(fe)
    # per-stream
    solo = [_decode_frames(s, M.JaxDSP(exact=True)) for s in streams]
    # batched
    state = M.init_state(3)
    for fno in range(6):
        fds = []
        for fe in fes:
            res, fd = fe.read_frame()
            assert res == T.OK
            fds.append(fd)
        (batch,) = M.frame_to_batches(fds)
        pcm, state = M.decode_granules(batch, state, exact=True,
                                       family=1)
        pcm = np.asarray(pcm).astype(np.uint16)        # [3,576,2]
        for b in range(3):
            words = ((pcm[b, :, 0].astype(np.uint32) << 16)
                     | pcm[b, :, 1])
            np.testing.assert_array_equal(
                words, solo[b][fno][0], err_msg=f"frame {fno} slot {b}")


# ---------------------------------------------------------------------------
# MPEG-1 must be unaffected by lsf=True (only sync acceptance differs)
# ---------------------------------------------------------------------------

def test_mpeg1_identical_under_lsf_flag():
    for seed, kw in ((1, dict(blocks="varied", use_reservoir=True)),
                     (2, dict(blocks="long", mode=1, mode_extension=3,
                              stereo_extent_ch1=0.3))):
        stream = mp3gen.make_stream(n_frames=8, seed=seed, **kw)
        assert decode_file(stream, lsf=True) == decode_file(stream)


def test_lsf_stream_rejected_without_flag():
    """Parity mode must keep the reference's id==0 rejection
    (pdmp3.c:1295): no LSF frame may decode without lsf=True."""
    stream = mp3gen.make_stream(n_frames=4, seed=3, family=1,
                                bitrate_index=11)
    assert _parse_all(stream, lsf=False) == []
    assert decode_file(stream) == b""
