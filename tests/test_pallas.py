"""Fused feature-major Pallas kernel (ops/pallas_step.py) conformance.

On this CPU test mesh the kernel runs in interpreter mode — the same
kernel body with jnp semantics.  The compiled-on-TPU equivalence (both
precision modes bit-identical to the XLA path at B=8192) is measured by
bench.py on hardware and recorded in the bench artifact.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdmp3_tpu.frontend import Frontend
from pdmp3_tpu.models import decoder as M
from pdmp3_tpu.ops import pallas_step as PSF
from pdmp3_tpu.testing import mp3gen


def _frames(n_frames=3):
    specs = [
        dict(blocks="long", seed=10),
        dict(blocks="short", seed=11),
        dict(blocks="varied", seed=12, mode=1, mode_extension=2),
        dict(blocks="mixed", seed=13, sfreq=2),
        dict(blocks="long", seed=14, mode=3),          # mono
        dict(blocks="varied", seed=15, sfreq=1, use_reservoir=True),
        dict(blocks="short", seed=16, mode=1, mode_extension=3,
             stereo_extent_ch1=0.3, intensity_pos=True),
        dict(blocks="long", seed=17, bitrate_index=14),
    ]
    streams = [mp3gen.make_stream(n_frames=n_frames + 2, **sp)
               for sp in specs]
    out = []
    for s in streams:
        fe = Frontend()
        fe.feed(s)
        fds = []
        for _ in range(n_frames):
            r, fd = fe.read_frame()
            assert r == 0
            fds.append(fd)
        out.append(fds)
    return out


def _run_paths(exact: bool, n_frames: int = 3):
    frames = _frames(n_frames)
    B = len(frames)
    st_x = M.init_state(B)
    st_p = PSF.init_pallas_state(B)
    diffs = []
    for t in range(n_frames):
        fds = [frames[b][t] for b in range(B)]
        for batch in M.frame_to_batches(fds):
            px, st_x = M.decode_granules(batch, st_x, exact=exact)
            pp, st_p = PSF.decode_granules_pallas(batch, st_p, exact=exact,
                                                  block_lanes=8)
            diffs.append((np.asarray(px, np.int64),
                          np.asarray(pp, np.int64)))
    return diffs, st_x, st_p


def test_pallas_exact_bitwise_equals_xla():
    """Exact mode: the kernel replays the reference accumulation order —
    PCM is bit-identical to the (golden-proven) XLA exact path."""
    diffs, st_x, st_p = _run_paths(exact=True)
    for i, (a, b) in enumerate(diffs):
        np.testing.assert_array_equal(a, b, err_msg=f"step {i}")


def test_pallas_fast_within_1lsb():
    diffs, st_x, st_p = _run_paths(exact=False)
    for i, (a, b) in enumerate(diffs):
        d = np.abs(a - b)
        assert d.max() <= 1, f"step {i}: max {d.max()}"
        assert (d != 0).mean() < 0.01


def test_pallas_state_roundtrip_and_carry():
    """State layout conversion round-trips, and the prev_lines band-12
    carry matches the XLA path through granule steps."""
    _, st_x, st_p = _run_paths(exact=True, n_frames=2)
    back = PSF.state_from_pallas(st_p)
    np.testing.assert_array_equal(np.asarray(back.store),
                                  np.asarray(st_x.store))
    np.testing.assert_array_equal(np.asarray(back.v_blocks),
                                  np.asarray(st_x.v_blocks))
    np.testing.assert_array_equal(np.asarray(back.prev_lines),
                                  np.asarray(st_x.prev_lines))
    rt = PSF.state_to_pallas(back)
    np.testing.assert_array_equal(np.asarray(rt.store_t),
                                  np.asarray(st_p.store_t))


def test_pallas_inactive_slots_frozen():
    """Inactive slots keep their state frozen and emit silence."""
    frames = _frames(1)
    B = len(frames)
    batch = M.frame_to_batches([frames[b][0] for b in range(B)])[0]
    act = np.ones(B, np.int32)
    act[2] = 0
    act[5] = 0
    batch = batch._replace(active=jnp.asarray(act))
    rng = np.random.RandomState(0)
    st0 = PSF.PallasState(
        store_t=jnp.asarray(rng.randn(2, 18, 32, B).astype(np.float32)),
        v_t=jnp.asarray(rng.randn(2, 15, 64, B).astype(np.float32)),
        prev_lines=jnp.asarray(rng.randn(B, 3).astype(np.float32)))
    pcm, st1 = PSF.decode_granules_pallas(batch, st0, exact=False,
                                          block_lanes=8)
    pcm = np.asarray(pcm)
    for s in (2, 5):
        assert (pcm[s] == 0).all()
        np.testing.assert_array_equal(np.asarray(st1.store_t[..., s]),
                                      np.asarray(st0.store_t[..., s]))
        np.testing.assert_array_equal(np.asarray(st1.v_t[..., s]),
                                      np.asarray(st0.v_t[..., s]))
        np.testing.assert_array_equal(np.asarray(st1.prev_lines[s]),
                                      np.asarray(st0.prev_lines[s]))
    assert (pcm[0] != 0).any()


def test_pallas_small_batch_fallback():
    """B below block_lanes clamps the block to B (single-block grid)."""
    frames = _frames(1)
    fds = [frames[b][0] for b in range(5)]   # B=5 < block_lanes=8
    batch = M.frame_to_batches(fds)[0]
    st_p = PSF.init_pallas_state(5)
    st_x = M.init_state(5)
    pp, _ = PSF.decode_granules_pallas(batch, st_p, exact=True,
                                       block_lanes=8)
    px, _ = M.decode_granules(batch, st_x, exact=True)
    np.testing.assert_array_equal(np.asarray(pp), np.asarray(px))
