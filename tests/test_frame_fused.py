"""Frame-fused fast kernel (ops/pallas_step.decode_frames_pallas).

The fused step runs ALL granules of a serving step in one pallas_call:
state crosses granules in VMEM scratch and the band-12 OOB carry (prev3)
chains in-register, substituting granule-1 ch1 scf_s rows 36:39
in-kernel.  On-chip it measured a perf DEAD END (tools/frame_fused_ab.py:
~8% slower than the per-granule chain at B=8192 despite halving state
HBM traffic), so serving keeps the per-granule route and the fused form
stays behind the PDMP3_FRAME_FUSED=1 opt-in.  These tests lock it
BITWISE to chaining decode_granules_pallas over the same granules (which
is itself locked to the XLA path and the reference binary), on CPU in
interpreter mode, so the recorded measurement stays reproducible.
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
        dict(blocks="long", seed=20),
        dict(blocks="short", seed=21),
        dict(blocks="varied", seed=22, mode=1, mode_extension=2),
        dict(blocks="mixed", seed=23, sfreq=2),
        dict(blocks="long", seed=24, mode=3),          # mono
        dict(blocks="varied", seed=25, sfreq=1, use_reservoir=True),
        dict(blocks="short", seed=26, mode=1, mode_extension=3,
             stereo_extent_ch1=0.3, intensity_pos=True),
        dict(blocks="long", seed=27, bitrate_index=14),
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


def _granule_batches(n_frames=3):
    frames = _frames(n_frames)
    B = len(frames)
    steps = []
    for t in range(n_frames):
        fds = [frames[b][t] for b in range(B)]
        steps.append(M.frame_to_batches(fds))   # [gr0, gr1]
    return steps, B


def test_frame_fused_bitwise_equals_per_granule():
    """PCM and the FULL state (store, v, prev_lines) of the fused frame
    step match the per-granule chain bitwise across multiple frames —
    incl. short/mixed blocks, MS+intensity, mono, and the reservoir."""
    steps, B = _granule_batches(3)
    st_g = PSF.init_pallas_state(B)
    st_f = PSF.init_pallas_state(B)
    for t, (b0, b1) in enumerate(steps):
        p0, st_g = PSF.decode_granules_pallas(b0, st_g, exact=False,
                                              block_lanes=8)
        p1, st_g = PSF.decode_granules_pallas(b1, st_g, exact=False,
                                              block_lanes=8)
        ref = np.concatenate([np.asarray(p0), np.asarray(p1)], axis=1)
        pf, st_f = PSF.decode_frames_pallas((b0, b1), st_f, (0, 1),
                                            block_lanes=8)
        np.testing.assert_array_equal(np.asarray(pf), ref,
                                      err_msg=f"frame {t}")
        for name in ("store_t", "v_t", "prev_lines"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_f, name)),
                np.asarray(getattr(st_g, name)),
                err_msg=f"frame {t}: {name}")


def test_frame_fused_band12_carry():
    """The in-kernel band-12 substitution (gr1 ch1 scf_s rows 36:39 from
    gr0's prev3 bit patterns) matches the per-granule XLA substitution:
    seed prev-sensitive state by running from a nonzero store so gr0's
    x_time rows are nonzero bit patterns."""
    steps, B = _granule_batches(2)
    rng = np.random.RandomState(7)
    st0 = PSF.PallasState(
        store_t=jnp.asarray(rng.randn(2, 18, 32, B).astype(np.float32)),
        v_t=jnp.asarray(rng.randn(2, 15, 64, B).astype(np.float32)),
        prev_lines=jnp.asarray(rng.randn(B, 3).astype(np.float32)))
    st_g, st_f = st0, st0
    for b0, b1 in steps:
        p0, st_g = PSF.decode_granules_pallas(b0, st_g, exact=False,
                                              block_lanes=8)
        p1, st_g = PSF.decode_granules_pallas(b1, st_g, exact=False,
                                              block_lanes=8)
        ref = np.concatenate([np.asarray(p0), np.asarray(p1)], axis=1)
        pf, st_f = PSF.decode_frames_pallas((b0, b1), st_f, (0, 1),
                                            block_lanes=8)
        np.testing.assert_array_equal(np.asarray(pf), ref)
    np.testing.assert_array_equal(np.asarray(st_f.prev_lines),
                                  np.asarray(st_g.prev_lines))


def test_frame_fused_inactive_slots_frozen():
    """Inactive slots emit silence and keep state (incl. prev_lines)
    frozen through the fused frame step."""
    steps, B = _granule_batches(1)
    b0, b1 = steps[0]
    act = np.ones(B, np.int32)
    act[1] = 0
    act[4] = 0
    b0 = b0._replace(active=jnp.asarray(act))
    b1 = b1._replace(active=jnp.asarray(act))
    rng = np.random.RandomState(1)
    st0 = PSF.PallasState(
        store_t=jnp.asarray(rng.randn(2, 18, 32, B).astype(np.float32)),
        v_t=jnp.asarray(rng.randn(2, 15, 64, B).astype(np.float32)),
        prev_lines=jnp.asarray(rng.randn(B, 3).astype(np.float32)))
    pcm, st1 = PSF.decode_frames_pallas((b0, b1), st0, (0, 1),
                                        block_lanes=8)
    pcm = np.asarray(pcm)
    for s in (1, 4):
        assert (pcm[s] == 0).all()
        np.testing.assert_array_equal(np.asarray(st1.store_t[..., s]),
                                      np.asarray(st0.store_t[..., s]))
        np.testing.assert_array_equal(np.asarray(st1.v_t[..., s]),
                                      np.asarray(st0.v_t[..., s]))
        np.testing.assert_array_equal(np.asarray(st1.prev_lines[s]),
                                      np.asarray(st0.prev_lines[s]))
    assert (pcm[0] != 0).any()


def _soa_from_batches(b0, b1):
    """Rebuild decode_frame_soa's SoA tensors from two granule batches
    (the inverse of _batch_from_meta's field map)."""
    def meta_of(b):
        B = np.asarray(b.ix).shape[0]
        m = np.zeros((B, 32), np.int32)
        m[:, 0:2] = np.asarray(b.layout)
        m[:, 2:4] = np.asarray(b.block_type)
        m[:, 4:6] = np.asarray(b.win_switch)
        m[:, 6:8] = np.asarray(b.mixed)
        m[:, 8:10] = np.asarray(b.global_gain)
        m[:, 10:12] = np.asarray(b.scalefac_scale)
        m[:, 12:14] = np.asarray(b.preflag)
        m[:, 14:16] = np.asarray(b.count1)
        m[:, 16:22] = np.asarray(b.subblock_gain).reshape(B, 6)
        m[:, 22] = np.asarray(b.ms_flag)
        m[:, 23] = np.asarray(b.is_flag)
        m[:, 24] = np.asarray(b.nch)
        return m
    ix2 = np.stack([np.asarray(b0.ix), np.asarray(b1.ix)])
    scf_l2 = np.stack([np.asarray(b0.scf_l), np.asarray(b1.scf_l)])
    B = ix2.shape[1]
    scf_s2 = np.stack([np.asarray(b0.scf_s).reshape(B, 2, 39),
                       np.asarray(b1.scf_s).reshape(B, 2, 39)])
    meta2 = np.stack([meta_of(b0), meta_of(b1)])
    return ix2, scf_l2, scf_s2, meta2, np.asarray(b0.active)


def test_frame_soa_fused_optin_matches_per_granule(monkeypatch):
    """decode_frame_soa(kernel="pallas", exact=False) under the
    PDMP3_FRAME_FUSED=1 opt-in (a measured perf dead end kept
    reproducible, docs/ROADMAP.md) is bitwise equal to the default
    per-granule route and within 1 LSB of the XLA path."""
    steps, B = _granule_batches(2)
    st_p = PSF.init_pallas_state(B)
    st_g = PSF.init_pallas_state(B)
    st_x = M.init_state(B)
    # the opt-in is read once at module import (jit-trace consistency);
    # tests flip the module attribute, not the env var
    monkeypatch.setattr(M, "_FRAME_FUSED", True)
    for b0, b1 in steps:
        soa = _soa_from_batches(b0, b1)
        # __wrapped__: eager (the jitted wrapper would cache the trace)
        pp, st_p = M.decode_frame_soa.__wrapped__(
            *soa, st_p, exact=False, kernel="pallas")
        px, st_x = M.decode_frame_soa.__wrapped__(
            *soa, st_x, exact=False, kernel="xla")
        p0, st_g = PSF.decode_granules_pallas(b0, st_g, exact=False,
                                              block_lanes=8)
        p1, st_g = PSF.decode_granules_pallas(b1, st_g, exact=False,
                                              block_lanes=8)
        ref = np.concatenate([np.asarray(p0), np.asarray(p1)], axis=1)
        np.testing.assert_array_equal(np.asarray(pp), ref)
        d = np.abs(np.asarray(pp, np.int64) - np.asarray(px, np.int64))
        assert d.max() <= 1
        assert (d != 0).mean() < 0.01
