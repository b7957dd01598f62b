"""Fused Pallas back-half kernel vs the XLA stage pipeline (interpret mode
on CPU; the compiled kernel is exercised on real TPU by bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdmp3_tpu.frontend import Frontend
from pdmp3_tpu.models import decoder as M
from pdmp3_tpu.ops import dsp
from pdmp3_tpu.ops.pallas_synth import synthesis_pipeline
from pdmp3_tpu.testing import mp3gen


def _batch(n=8):
    streams = [mp3gen.make_stream(n_frames=3, seed=200 + i,
                                  blocks=["long", "short", "mixed",
                                          "varied"][i % 4],
                                  mode=[0, 1, 3, 1][i % 4],
                                  mode_extension=[0, 2, 0, 3][i % 4])
               for i in range(n)]
    fds = []
    for s in streams:
        fe = Frontend()
        fe.feed(s)
        res, fd = fe.read_frame()
        assert res == 0
        fds.append(fd)
    return M.frame_to_batches(fds)[0]


def _xla_back(x, st, b):
    xt, store = dsp.hybrid_synthesis(x, st.store, b.win_switch,
                                     b.block_type, b.mixed, exact=False)
    xt = dsp.freq_invert(xt)
    sums, v = dsp.subband_synthesis(xt, st.v_blocks, exact=False)
    pcm = dsp.quantize_pack(sums, b.nch, exact=False)
    act = b.active
    pcm = jnp.where((act != 0)[:, None, None], pcm, 0)
    store = jnp.where((act != 0)[:, None, None, None], store, st.store)
    v = jnp.where((act != 0)[:, None, None, None], v, st.v_blocks)
    return pcm, store, v


def test_pallas_back_half_matches_xla():
    b = _batch(8)
    st = M.init_state(8)
    # some inactive slots + nonzero incoming state
    b = b._replace(active=jnp.asarray(np.array([1, 1, 0, 1, 1, 1, 1, 0],
                                               np.int32)))
    rng = np.random.RandomState(0)
    st = M.DecoderState(
        store=jnp.asarray(rng.randn(8, 2, 32, 18).astype(np.float32) * .1),
        v_blocks=jnp.asarray(rng.randn(8, 2, 15, 64).astype(np.float32) * .1))
    x = dsp.requantize(b.ix, b.scf_l, b.scf_s, b.layout, b.global_gain,
                       b.scalefac_scale, b.preflag, b.subblock_gain,
                       exact=False)
    x = dsp.reorder(x, b.layout)
    x = dsp.stereo(x, b.layout, b.scf_l, b.scf_s, b.count1, b.ms_flag,
                   b.is_flag, exact=False)
    x = dsp.antialias(x, b.layout, b.win_switch, b.block_type, b.mixed)

    p1, s1, v1 = _xla_back(x, st, b)
    p2, s2, v2 = synthesis_pipeline(x, st.store, st.v_blocks, b.win_switch,
                                    b.block_type, b.mixed, b.nch, b.active,
                                    block_slots=4)
    assert np.abs(np.asarray(p1).astype(np.int32)
                  - np.asarray(p2).astype(np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-7,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2e-7,
                               atol=1e-6)
    # inactive slots: state must be frozen exactly
    for slot in (2, 7):
        np.testing.assert_array_equal(np.asarray(s2)[slot],
                                      np.asarray(st.store)[slot])
        np.testing.assert_array_equal(np.asarray(v2)[slot],
                                      np.asarray(st.v_blocks)[slot])
        assert (np.asarray(p2)[slot] == 0).all()


def test_pallas_padding_path():
    b = _batch(6)  # 6 is not a multiple of block_slots=4 -> padding
    st = M.init_state(6)
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(6, 2, 576).astype(np.float32) * 0.01)
    p, s, v = synthesis_pipeline(x, st.store, st.v_blocks, b.win_switch,
                                 b.block_type, b.mixed, b.nch, b.active,
                                 block_slots=4)
    assert p.shape == (6, 576, 2)
    assert s.shape == (6, 2, 32, 18) and v.shape == (6, 2, 15, 64)
