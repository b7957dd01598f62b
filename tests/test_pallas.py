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


# ---------------------------------------------------------------------------
# Round-5 fused EXACT kernel (requantize-through-quantize in one
# pallas_call; ops/pallas_step.py exact=True path).
# ---------------------------------------------------------------------------

def test_kernel_pow43_exact_exhaustive():
    """The kernel-form correctly-rounded pow43 (_k_pow43_exact — the
    f32-multiply seed variant of dsp._pow43_ff_exact) is bit-identical
    to the reference's frozen 8207-entry table over its ENTIRE domain."""
    from pdmp3_tpu import tables as T
    mags = np.arange(8207, dtype=np.float32)
    got = np.asarray(jax.jit(PSF._k_pow43_exact)(mags))
    want = np.asarray(T.POW43[:8207], np.float32)
    bad = np.nonzero(got.view(np.uint32) != want.view(np.uint32))[0]
    assert bad.size == 0, f"{bad.size} mismatches, first at {bad[:5]}"


def test_exact_emulations_structured():
    """Structured + random sample of the f32 emulations of the exact
    path's f64 rounding points against the float64 formulas — the fast
    in-suite slice of the exhaustive proofs (tools/prove_exact_emulations
    sweeps ALL 2^32 inputs on the host transcription;
    tools/prove_on_tpu.py checksum-matches the kernel's jnp originals on
    the chip, where subnormal arithmetic works — XLA:CPU flushes it)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(
        __file__).resolve().parents[1] / "tools"))
    import prove_exact_emulations as P
    rng = np.random.default_rng(7)
    bits = np.concatenate([
        # full-range random, subnormal/tiny band, negatives of both
        rng.integers(0, 2 ** 32, 1 << 18, dtype=np.uint64),
        rng.integers(0, 2 ** 25, 1 << 17, dtype=np.uint64),
        rng.integers(0, 2 ** 25, 1 << 17, dtype=np.uint64) + 0x80000000,
        # quantize borrow boundaries: values near n/32767
        (np.abs(np.round(rng.integers(1, 32767, 1 << 16)
                         / np.float32(32767.0)).astype(np.float32)
         ).view(np.uint32)).astype(np.uint64),
    ]).astype(np.uint32)
    x = bits.view(np.float32)
    with np.errstate(all="ignore"):
        for name, emu, ref in (("ms", P.ms_emulated, P.ms_reference),
                               ("uq", P.uq_emulated, P.uq_reference),
                               ("qz", P.qz_emulated, P.qz_reference)):
            a, b = emu(x.copy()), ref(x.copy())
            eq = (a.view(np.uint32) == b.view(np.uint32)) \
                | (np.isnan(a) & np.isnan(b))
            if name == "uq":
                eq |= ~np.isfinite(x)    # site unreachable by inf/nan
            bad = np.nonzero(~eq)[0]
            assert bad.size == 0, \
                f"{name}: {bad.size} mismatches, first x={x[bad[0]]!r}"


def test_fused_exact_interpret_structure(monkeypatch):
    """The fused exact kernel (interpret mode) vs the split XLA exact
    path: state carries BITWISE equal; PCM within 1 LSB.  The PCM bound
    is an XLA:CPU artifact — the interpret-mode 'kernel' is traced into
    an XLA program whose fuser evaluates the f32 quantize construction
    differently per fusion context (and FTZ flushes subnormal
    arithmetic) — while on the real chip the Mosaic-compiled kernel is
    BITWISE equal, PCM and state (test_tpu_conformance leg + the
    on-chip 2^32 construction sweep, EXACT_EMU_PROOF_TPU_r05)."""
    from pdmp3_tpu.ops import dsp
    monkeypatch.setattr(dsp, "_ABL", "fexact")
    steps = 3
    frames = _frames(steps)
    B = len(frames)
    st_x = M.init_state(B)
    st_p = PSF.init_pallas_state(B)
    worst = 0
    for t in range(steps):
        fds = [frames[b][t] for b in range(B)]
        for batch in M.frame_to_batches(fds):
            px, st_x = M.decode_granules(batch, st_x, exact=True)
            pp, st_p = PSF.decode_granules_pallas.__wrapped__(
                batch, st_p, True, True, 8)
            d = np.abs(np.asarray(px, np.int64) - np.asarray(pp, np.int64))
            worst = max(worst, int(d.max()))
            sx = PSF.state_to_pallas(st_x)
            np.testing.assert_array_equal(np.asarray(sx.store_t),
                                          np.asarray(st_p.store_t))
            np.testing.assert_array_equal(np.asarray(sx.v_t),
                                          np.asarray(st_p.v_t))
            np.testing.assert_array_equal(np.asarray(sx.prev_lines),
                                          np.asarray(st_p.prev_lines))
    assert worst <= 1, worst
