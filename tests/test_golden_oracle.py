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
