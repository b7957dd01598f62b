"""Conformance: oracle decoder PCM must be bit-exact vs the reference C
binary across the full format matrix (BASELINE.json configs[0..2])."""
import numpy as np
import pytest

from pdmp3_tpu import decode_file
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.golden import reference_decode


def assert_bit_exact(stream: bytes):
    ref = reference_decode(stream)
    mine = decode_file(stream)
    assert len(mine) == len(ref), (len(mine), len(ref))
    a = np.frombuffer(mine, "<i2")
    b = np.frombuffer(ref, "<i2")
    bad = np.nonzero(a != b)[0]
    assert bad.size == 0, \
        f"{bad.size}/{a.size} PCM mismatches, first at {bad[:8]}"
    assert len(ref) > 0, "reference produced no PCM (bad fixture?)"


MATRIX = {
    "long_stereo_441": dict(blocks="long"),
    "long_mono": dict(blocks="long", mode=3),
    "short_blocks": dict(blocks="short"),
    "mixed_blocks": dict(blocks="mixed"),
    "varied_blocks": dict(blocks="varied"),
    "ms_stereo": dict(blocks="long", mode=1, mode_extension=2),
    "intensity_long": dict(blocks="long", mode=1, mode_extension=1,
                           stereo_extent_ch1=0.25, intensity_pos=True),
    "ms_plus_intensity": dict(blocks="long", mode=1, mode_extension=3,
                              stereo_extent_ch1=0.3, intensity_pos=True),
    "sfreq_48k": dict(blocks="varied", sfreq=1),
    "sfreq_32k": dict(blocks="varied", sfreq=2),
    "bitrate_320k": dict(blocks="long", bitrate_index=14),
    "bitrate_64k": dict(blocks="long", bitrate_index=5),
    "padding": dict(blocks="long", vary_padding=True),
    "crc_frames": dict(blocks="long", protection=True),
    "bit_reservoir": dict(blocks="long", use_reservoir=True),
    "reservoir_varied": dict(blocks="varied", use_reservoir=True,
                             vary_padding=True),
    "stuffing_bits": dict(blocks="short", stuffing=6),
    "scfsi_sharing": dict(blocks="long", scfsi=True),
    "count1_table_b": dict(blocks="long", seed=7),  # broken table 33
    "leading_garbage": dict(blocks="long", leading_garbage=300),
    "dual_channel": dict(blocks="long", mode=2),
    "high_amp_linbits": dict(blocks="long", amp=4000),
}


@pytest.mark.parametrize("name", sorted(MATRIX))
def test_golden_bit_exact(name):
    kw = dict(MATRIX[name])
    seed = kw.pop("seed", hash(name) % 10000)
    stream = mp3gen.make_stream(n_frames=12, seed=seed, **kw)
    assert_bit_exact(stream)


def test_golden_bit_exact_count1b():
    # explicit broken-table-33 coverage: force count1table_select=1 streams
    import random
    rng = random.Random(3)
    frames = []
    for f in range(10):
        grans = []
        for gr in range(2):
            row = []
            for ch in range(2):
                g = mp3gen.make_granule(rng, sfreq=0, block="long",
                                        max_lines=120)
                g.count1table_select = 1
                # regenerate quads in broken format
                big2 = g.big_values * 2
                g.values[big2:] = 0
                for q in range(g.n_quads):
                    i = big2 + 4 * q
                    g.values[i + 2] = rng.choice([-1, 1])
                    g.values[i + 3] = rng.choice([-1, 1])
                row.append(g)
            grans.append(row)
        frames.append(mp3gen.FrameSpec(granules=grans,
                                       scfsi=np.zeros((2, 4), np.int32)))
    stream = mp3gen.assemble_stream(frames, rng=rng, use_reservoir=False)
    assert_bit_exact(stream)


def test_golden_long_run():
    # longer soak with reservoir + everything cycling
    stream = mp3gen.make_stream(n_frames=60, seed=42, blocks="varied",
                                use_reservoir=True, vary_padding=True,
                                mode=1, mode_extension=2)
    assert_bit_exact(stream)


def test_short_block_intensity_bug_compat():
    """The reference's short-block intensity transcription bug
    (pdmp3.c:2212-2213, unsigned-assignment chain) is emulated bit-exactly;
    spec-correct mode diverges, proving the path is exercised."""
    from pdmp3_tpu.oracle import OracleDSP

    stream = mp3gen.make_stream(n_frames=8, seed=99, blocks="short", mode=1,
                                mode_extension=1, stereo_extent_ch1=0.3,
                                intensity_pos=True)
    ref = reference_decode(stream)
    assert decode_file(stream) == ref  # bug-compat default
    spec = decode_file(
        stream, dsp=OracleDSP(bug_compat_short_intensity=False))
    assert spec != ref


def test_vbr_with_reservoir():
    """True VBR (per-frame bitrate) with bit-reservoir chaining."""
    stream = mp3gen.make_stream(n_frames=30, seed=61, blocks="varied",
                                vbr=True, use_reservoir=True,
                                vary_padding=True)
    assert_bit_exact(stream)


from pdmp3_tpu.testing.golden import first_oob_frame as _first_oob_frame  # noqa: E402 (shared with tools/soak.py)


def test_midstream_corruption_resync():
    """Corrupt bytes mid-stream: decoders resync identically.  Bit parity
    holds up to any frame that drives the reference into its
    out-of-bounds scalefactor reads (count1 past the last band —
    undefined in the reference, policy-zeroed here); our two
    implementations must stay consistent throughout."""
    import random
    from pdmp3_tpu.host import native_decode_file
    stream = bytearray(mp3gen.make_stream(n_frames=20, seed=62,
                                          blocks="long"))
    rng = random.Random(0)
    start = len(stream) // 3
    for i in range(start, start + 40):
        stream[i] = rng.randrange(256)
    stream = bytes(stream)
    ref = reference_decode(stream)
    mine = decode_file(stream)
    nat = native_decode_file(stream)
    assert mine == nat  # implementation self-consistency, always
    oob = _first_oob_frame(stream)
    if oob is None:
        assert mine == ref
    else:
        assert mine[:oob] == ref[:oob]


def test_truncated_stream():
    full = mp3gen.make_stream(n_frames=10, seed=63, blocks="varied")
    for cut in (len(full) // 2, len(full) - 100, 1500):
        stream = full[:cut]
        assert decode_file(stream) == reference_decode(stream), cut


def test_format_change_midstream():
    """Concatenated streams with different rates/modes: the decoder (like
    the reference) keeps going, re-reading the header per frame."""
    a = mp3gen.make_stream(n_frames=6, seed=70, blocks="long", sfreq=0,
                           mode=1, mode_extension=2)
    b = mp3gen.make_stream(n_frames=6, seed=71, blocks="short", sfreq=1,
                           mode=3)
    c = mp3gen.make_stream(n_frames=6, seed=72, blocks="varied", sfreq=2,
                           bitrate_index=14)
    assert_bit_exact(a + b + c)


def test_layer12_and_mpeg2_frames_skipped():
    """Layer I/II and MPEG-2 (id=0) headers must be skipped by the sync
    search exactly like the reference (pdmp3.c:1293-1331)."""
    good = mp3gen.make_stream(n_frames=6, seed=73, blocks="long")
    # valid-looking MPEG1 Layer II header + payload bytes
    l2 = bytes([0xFF, 0xFD, 0x90, 0x00]) + bytes(100)
    # MPEG-2 (id=0) Layer III header
    m2 = bytes([0xFF, 0xE3, 0x90, 0x00]) + bytes(80)
    stream = l2 + m2 + good[:2000] + l2 + good[2000:]
    assert_bit_exact(stream)


def test_count1_table_b_spec_mode():
    """Spec-correct table B decode (the capability the reference's stale
    pointer bug forecloses): quads encoded with the real ISO tree round-
    trip through Frontend(count1_table_b_spec=True)."""
    import random
    from pdmp3_tpu.frontend import Frontend
    from pdmp3_tpu import tables as TT

    rng = random.Random(4)
    frames = []
    intended = []
    for _ in range(4):
        grans = []
        for gr in range(2):
            row = []
            for ch in range(2):
                g = mp3gen.make_granule(rng, sfreq=0, block="long",
                                        max_lines=100)
                g.count1table_select = 1
                g.count1_spec = True
                big2 = g.big_values * 2
                g.values[big2:] = 0
                for q in range(g.n_quads):
                    i = big2 + 4 * q
                    for k in range(4):
                        g.values[i + k] = rng.choice([-1, 0, 1])
                row.append(g)
            grans.append(row)
        frames.append(mp3gen.FrameSpec(granules=grans,
                                       scfsi=np.zeros((2, 4), np.int32)))
        intended.append(grans)
    stream = mp3gen.assemble_stream(frames, rng=rng, use_reservoir=False)

    fe = Frontend(count1_table_b_spec=True)
    fe.feed(stream)
    for t, grans in enumerate(intended):
        res, fd = fe.read_frame()
        assert res == 0, t
        for gr in range(2):
            for ch in range(2):
                g = grans[gr][ch]
                n = g.big_values * 2 + 4 * g.n_quads
                np.testing.assert_array_equal(
                    fd.ix[gr][ch][:n], g.values[:n],
                    err_msg=f"frame {t} gr {gr} ch {ch}")


def test_starved_big_frames_320k_32k():
    """320 kbps @ 32 kHz frames (1440 B) exceed the reference's 1152-byte
    read gate, so the CLI feed pattern starves mid-frame reads; the
    garbage tail can push count1 past band 21/12, taking the reference
    through its struct-aliased OOB scalefactor reads — emulated via
    persistent scalefactor state + alias slots (docs/DESIGN.md §6)."""
    for seed, blocks, mode, ext in ((60188, "long", 2, 0),
                                    (60307, "varied", 1, 2)):
        stream = mp3gen.make_stream(n_frames=8, seed=seed, sfreq=2,
                                    bitrate_index=14, mode=mode,
                                    mode_extension=ext, blocks=blocks,
                                    use_reservoir=True, amp=20)
        assert_bit_exact(stream)
