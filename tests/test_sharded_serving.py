"""Pod-scale serving path: sharded StreamDecoder over the 8-device CPU
mesh must reproduce the unsharded decode, with state actually partitioned."""
import numpy as np
import jax

from pdmp3_tpu.parallel import make_mesh
from pdmp3_tpu.runtime import StreamDecoder
from pdmp3_tpu.runtime.sharded import ShardedStreamDecoder
from pdmp3_tpu.testing import mp3gen


def test_sharded_serving_equals_unsharded():
    B = 16
    streams = [mp3gen.make_stream(n_frames=5, seed=400 + i,
                                  blocks=["long", "short", "varied",
                                          "mixed"][i % 4])
               for i in range(B)]
    mesh = make_mesh(jax.devices()[:8])
    dec_s = ShardedStreamDecoder(B, mesh=mesh, exact=True, parse_threads=1)
    dec_u = StreamDecoder(B, exact=True)
    for s in range(B):
        dec_s.feed(s, streams[s])
        dec_u.feed(s, streams[s])
    for step in range(4):
        na_s = dec_s.parse_step()
        na_u = dec_u.parse_step()
        assert na_s == na_u
        if na_s == 0:
            break
        p_s = dec_s.decode_step()
        p_u = dec_u.decode_step()
        np.testing.assert_array_equal(p_s, p_u, err_msg=f"step {step}")
    # state is genuinely partitioned over the mesh
    devs = {sh.device.id for sh in dec_s.state.store.addressable_shards}
    assert len(devs) == 8


def test_sharded_serving_pallas_kernel():
    """The fused Pallas kernel under shard_map (round-2 VERDICT item 3):
    sharded pallas serving must match unsharded pallas serving bitwise in
    exact mode, and the state must be genuinely partitioned."""
    B = 16
    streams = [mp3gen.make_stream(n_frames=5, seed=430 + i,
                                  blocks=["long", "short", "varied",
                                          "mixed"][i % 4],
                                  mode=1 if i % 2 else 0,
                                  mode_extension=2 if i % 2 else 0)
               for i in range(B)]
    mesh = make_mesh(jax.devices()[:8])
    dec_s = ShardedStreamDecoder(B, mesh=mesh, exact=True,
                                 parse_threads=1, kernel="pallas")
    dec_u = StreamDecoder(B, exact=True, kernel="pallas")
    for s in range(B):
        dec_s.feed(s, streams[s])
        dec_u.feed(s, streams[s])
    for step in range(4):
        na_s = dec_s.parse_step()
        na_u = dec_u.parse_step()
        assert na_s == na_u
        if na_s == 0:
            break
        p_s = dec_s.decode_step()
        p_u = dec_u.decode_step()
        np.testing.assert_array_equal(p_s, p_u, err_msg=f"step {step}")
    devs = {sh.device.id for sh in dec_s.state.store_t.addressable_shards}
    assert len(devs) == 8


def test_sharded_pallas_fast_within_1lsb_of_xla():
    """Fast mode: the sharded pallas path stays inside the fast-mode
    contract (±1 LSB) vs the sharded XLA path on the same streams."""
    B = 16
    streams = [mp3gen.make_stream(n_frames=4, seed=460 + i,
                                  blocks="varied")
               for i in range(B)]
    mesh = make_mesh(jax.devices()[:8])
    dec_p = ShardedStreamDecoder(B, mesh=mesh, exact=False,
                                 parse_threads=1, kernel="pallas")
    dec_x = ShardedStreamDecoder(B, mesh=mesh, exact=False,
                                 parse_threads=1)
    for s in range(B):
        dec_p.feed(s, streams[s])
        dec_x.feed(s, streams[s])
    for _ in range(3):
        na_p = dec_p.parse_step()
        na_x = dec_x.parse_step()
        assert na_p == na_x
        if na_p == 0:
            break
        p_p = dec_p.decode_step()
        p_x = dec_x.decode_step()
        assert int(np.abs(p_p.astype(np.int64)
                          - p_x.astype(np.int64)).max()) <= 1


def test_sharded_serving_dump_and_dumps_module():
    # exercise the debug dump facility (SURVEY.md §5 / reference dmp_*)
    import io
    from pdmp3_tpu.frontend import Frontend
    from pdmp3_tpu.utils import dumps
    stream = mp3gen.make_stream(n_frames=3, seed=5, blocks="short")
    fe = Frontend()
    fe.feed(stream)
    res, fd = fe.read_frame()
    assert res == 0
    buf = io.StringIO()
    dumps.dump_frame(fd, out=buf)
    text = buf.getvalue()
    assert "HUFFMAN" in text and "main_data_begin" in text
    buf = io.StringIO()
    dumps.dump_samples(np.zeros(8, np.float32), 1, out=buf)
    assert "SAMPLES1" in buf.getvalue()


def test_sharded_lsf_pool_both_kernels():
    """LSF pools shard like MPEG-1 (per-family compiled program under
    shard_map for pallas / pjit for xla): sharded serving must equal the
    unsharded LSF pool bitwise in exact mode on both kernels, with the
    state genuinely partitioned."""
    B = 16
    streams = [mp3gen.make_stream(n_frames=6, seed=460 + i, family=1,
                                  sfreq=i % 3, bitrate_index=11,
                                  mode=1 if i % 2 else 0,
                                  mode_extension=3 if i % 2 else 0,
                                  stereo_extent_ch1=0.4)
               for i in range(B)]
    mesh = make_mesh(jax.devices()[:8])
    for kernel in ("xla", "pallas"):
        dec_s = ShardedStreamDecoder(B, mesh=mesh, exact=True,
                                     parse_threads=1, kernel=kernel,
                                     family=1)
        dec_u = StreamDecoder(B, exact=True, kernel=kernel, family=1)
        for s in range(B):
            dec_s.feed(s, streams[s])
            dec_u.feed(s, streams[s])
        steps = 0
        for step in range(6):
            na_s = dec_s.parse_step()
            na_u = dec_u.parse_step()
            assert na_s == na_u
            if na_s == 0:
                break
            p_s = dec_s.decode_step()
            p_u = dec_u.decode_step()
            assert p_s.shape[1] == 576  # one granule per LSF frame
            np.testing.assert_array_equal(p_s, p_u,
                                          err_msg=f"{kernel} step {step}")
            steps += 1
        assert steps >= 2
        leaf = (dec_s.state.store if kernel == "xla"
                else dec_s.state.store_t)
        devs = {sh.device.id for sh in leaf.addressable_shards}
        assert len(devs) == 8


def test_sharded_l12_pool_equals_unsharded():
    """Layer I/II pools shard like the rest (synthesis-only device step
    under shard_map): sharded serving equals the unsharded L12 pool
    bitwise in exact mode, state genuinely partitioned, checkpoint
    round-trips across the sharded/unsharded boundary."""
    from pdmp3_tpu.runtime import L12StreamDecoder
    from pdmp3_tpu.runtime.sharded import ShardedL12StreamDecoder
    B = 16
    mesh = make_mesh(jax.devices()[:8])
    for layer in (1, 2):
        streams = [mp3gen.make_l12_stream(layer=layer, n_frames=5,
                                          seed=500 + i, bitrate_index=12,
                                          mode=3 if i % 3 == 2 else 0)
                   for i in range(B)]
        dec_s = ShardedL12StreamDecoder(B, layer=layer, mesh=mesh,
                                        exact=True)
        dec_u = L12StreamDecoder(B, layer=layer, exact=True)
        for s in range(B):
            dec_s.feed(s, streams[s])
            dec_u.feed(s, streams[s])
        steps = 0
        for step in range(5):
            na_s = dec_s.parse_step()
            na_u = dec_u.parse_step()
            assert na_s == na_u
            if na_s == 0:
                break
            p_s = dec_s.decode_step()
            p_u = dec_u.decode_step()
            np.testing.assert_array_equal(
                p_s, p_u, err_msg=f"layer {layer} step {step}")
            steps += 1
        assert steps >= 3
        devs = {sh.device.id
                for sh in dec_s.state.v_blocks.addressable_shards}
        assert len(devs) == 8
    # checkpoint from the sharded pool resumes in an unsharded one
    ckpt = dec_s.save_checkpoint()
    dec_r = L12StreamDecoder(B, layer=2, exact=True)
    dec_r.restore_checkpoint(ckpt)
    a = (dec_s.parse_step(), dec_s.decode_step())
    b = (dec_r.parse_step(), dec_r.decode_step())
    assert a[0] == b[0]
    if a[1] is not None:
        np.testing.assert_array_equal(a[1], b[1])
