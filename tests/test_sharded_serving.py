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
