"""Randomized differential fuzzing: many random format combinations, every
stream decoded by the reference binary, the native C++ decoder, and the
NumPy oracle — all three must agree bit-for-bit."""
import random

import pytest

from pdmp3_tpu import decode_file
from pdmp3_tpu.host import native_decode_file
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.golden import reference_decode


def _random_config(rng: random.Random) -> dict:
    mode = rng.choice([0, 1, 1, 2, 3])
    cfg = dict(
        n_frames=rng.randrange(4, 10),
        sfreq=rng.randrange(3),
        bitrate_index=rng.choice([5, 9, 11, 14]),
        mode=mode,
        blocks=rng.choice(["long", "short", "mixed", "varied"]),
        use_reservoir=rng.random() < 0.5,
        protection=rng.random() < 0.3,
        vary_padding=rng.random() < 0.5,
        stuffing=rng.choice([0, 0, 3, 8]),
        scfsi=rng.random() < 0.4,
        amp=rng.choice([3, 6, 20, 3000]),
        leading_garbage=rng.choice([0, 0, 0, 111]),
    )
    if mode == 1:
        ext = rng.randrange(1, 4)
        cfg["mode_extension"] = ext
        if ext & 1:
            cfg["intensity_pos"] = True
            cfg["stereo_extent_ch1"] = rng.uniform(0.2, 0.8)
    return cfg


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_three_way_bit_exact(seed):
    rng = random.Random(1000 + seed)
    cfg = _random_config(rng)
    try:
        stream = mp3gen.make_stream(seed=2000 + seed, **cfg)
    except (AssertionError, RuntimeError):
        pytest.skip(f"generator infeasible for {cfg}")
    ref = reference_decode(stream)
    assert native_decode_file(stream) == ref, cfg
    assert decode_file(stream) == ref, cfg
