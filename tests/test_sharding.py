"""Multi-device sharding: SPMD decode over an 8-device CPU mesh must equal
the single-device result; telemetry psum must count globally."""
import numpy as np
import jax
import pytest

from pdmp3_tpu.frontend import Frontend
from pdmp3_tpu.models import decoder as M
from pdmp3_tpu.parallel import (decode_granules_sharded, make_mesh,
                                place_batch, place_state)
from pdmp3_tpu.testing import mp3gen


@pytest.fixture(scope="module")
def batch16():
    streams = [mp3gen.make_stream(n_frames=3, seed=100 + i,
                                  blocks=["long", "short", "mixed",
                                          "varied"][i % 4])
               for i in range(16)]
    fds = []
    for s in streams:
        fe = Frontend()
        fe.feed(s)
        res, fd = fe.read_frame()
        assert res == 0
        fds.append(fd)
    return M.frame_to_batches(fds)[0], M.init_state(16)


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_sharded_equals_unsharded(batch16):
    batch, state = batch16
    pcm_ref, state_ref = M.decode_granules(batch, state, exact=False)

    mesh = make_mesh(jax.devices()[:8])
    sb = place_batch(batch, mesh)
    ss = place_state(state, mesh)
    pcm, new_state, clipped = decode_granules_sharded(sb, ss, mesh,
                                                      exact=False)
    np.testing.assert_array_equal(np.asarray(pcm), np.asarray(pcm_ref))
    np.testing.assert_array_equal(np.asarray(new_state.store),
                                  np.asarray(state_ref.store))
    want_clip = int(((np.asarray(pcm_ref) == 32767)
                     | (np.asarray(pcm_ref) == -32767)).sum())
    assert int(clipped) == want_clip


def test_sharded_pallas_exact_bitwise(batch16):
    """GranuleBatch-level shard_map of the Pallas kernel: exact mode is
    bitwise identical to the unsharded pallas decode (the sequential
    accumulation order is shard-shape independent)."""
    from pdmp3_tpu.ops import pallas_step as PSF
    from pdmp3_tpu.parallel import place_pallas_state

    batch, state = batch16
    pstate = PSF.state_to_pallas(state)
    pcm_ref, pstate_ref = PSF.decode_granules_pallas(batch, pstate,
                                                     exact=True)
    mesh = make_mesh(jax.devices()[:8])
    sb = place_batch(batch, mesh)
    sp = place_pallas_state(pstate, mesh)
    pcm, new_state, _ = decode_granules_sharded(sb, sp, mesh, exact=True,
                                                kernel="pallas")
    np.testing.assert_array_equal(np.asarray(pcm), np.asarray(pcm_ref))
    for a, b in zip(new_state, pstate_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    shard_devs = {s.device.id for s in new_state.store_t.addressable_shards}
    assert len(shard_devs) == 8


def test_sharding_is_real(batch16):
    """The batch axis must actually be partitioned over devices."""
    batch, state = batch16
    mesh = make_mesh(jax.devices()[:8])
    sb = place_batch(batch, mesh)
    shard_devs = {s.device.id for s in sb.ix.addressable_shards}
    assert len(shard_devs) == 8
    assert sb.ix.addressable_shards[0].data.shape[0] == 2  # 16/8


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    pcm, state = fn(*args)
    assert pcm.shape == (8, 576, 2)
    g.dryrun_multichip(8)
