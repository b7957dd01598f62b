"""Native (C++) host library conformance: bit-exact PCM, protocol parity
with the Python implementation, frontend tensor equality, CLI parity."""
import subprocess

import numpy as np
import pytest

from pdmp3_tpu import PDMP3, decode_file, tables as T
from pdmp3_tpu.frontend import Frontend
from pdmp3_tpu.host import NativePDMP3, cli_path, native_decode_file
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.golden import reference_decode

MATRIX = {
    "long": dict(blocks="long"),
    "short": dict(blocks="short"),
    "mixed_32k": dict(blocks="mixed", sfreq=2),
    "varied_48k": dict(blocks="varied", sfreq=1),
    "ms": dict(blocks="varied", mode=1, mode_extension=2),
    "ms_intensity": dict(blocks="long", mode=1, mode_extension=3,
                         stereo_extent_ch1=0.3, intensity_pos=True),
    "mono": dict(blocks="varied", mode=3),
    "reservoir": dict(blocks="varied", use_reservoir=True,
                      vary_padding=True),
    "crc_stuffing": dict(blocks="short", protection=True, stuffing=5),
    "count1b": dict(blocks="long", seed=7),
    "garbage_prefix": dict(blocks="long", leading_garbage=200),
    "linbits": dict(blocks="long", amp=4000, bitrate_index=14),
}


@pytest.mark.parametrize("name", sorted(MATRIX))
def test_native_bit_exact_vs_reference(name):
    kw = dict(MATRIX[name])
    seed = kw.pop("seed", hash(name) % 10000)
    stream = mp3gen.make_stream(n_frames=10, seed=seed, **kw)
    ref = reference_decode(stream)
    mine = native_decode_file(stream)
    assert len(ref) > 0
    assert mine == ref


def test_native_cli_bit_exact(tmp_path):
    stream = mp3gen.make_stream(n_frames=12, seed=21, blocks="varied",
                                mode=1, mode_extension=2,
                                use_reservoir=True)
    f = tmp_path / "in.mp3"
    f.write_bytes(stream)
    subprocess.run([cli_path(), str(f)], check=True, cwd=tmp_path,
                   capture_output=True)
    got = (tmp_path / "in.mp3.raw").read_bytes()
    assert got == reference_decode(stream)


def test_native_frontend_matches_python():
    """Granule tensors from the C++ frontend == Python frontend."""
    stream = mp3gen.make_stream(n_frames=8, seed=33, blocks="varied",
                                mode=1, mode_extension=2,
                                use_reservoir=True)
    py = Frontend()
    py.feed(stream)
    h = NativePDMP3()
    h.open_feed()
    h.feed(stream)
    nframes = 0
    while True:
        res_py, fd = py.read_frame()
        res_c, g = h.parse_frame()
        assert res_c == (0 if res_py == T.OK else res_c)
        if res_py != T.OK:
            assert res_c != 0
            break
        nframes += 1
        np.testing.assert_array_equal(g["ix"], fd.ix, err_msg="ix")
        np.testing.assert_array_equal(g["scf_l"], fd.scalefac_l)
        np.testing.assert_array_equal(g["scf_s"], fd.scalefac_s)
        s = fd.side
        np.testing.assert_array_equal(g["count1"], s.count1)
        np.testing.assert_array_equal(g["global_gain"], s.global_gain)
        np.testing.assert_array_equal(g["block_type"], s.block_type)
        assert g["nch"] == fd.header.nch
    assert nframes >= 6


def test_native_protocol_matches_python():
    """Return codes + PCM for an adversarial feed/read schedule."""
    stream = mp3gen.make_stream(n_frames=6, seed=44, blocks="long")
    py = PDMP3()
    py.open_feed()
    nat = NativePDMP3()
    nat.open_feed()
    pos = 0
    schedule = [1151, 2, 500, 4096, 1, 7, 4096, 4096, 4096]
    for chunk in schedule:
        data = stream[pos:pos + chunk]
        pos += chunk
        if data:
            assert py.feed(data) == nat.feed(data)
        for outsize in (0, 128, 4608, 65536):
            r1, p1 = py.read(outsize)
            r2, p2 = nat.read(outsize)
            assert r1 == r2, (chunk, outsize)
            assert p1 == p2
    # NEW_FORMAT handshake parity
    assert py.getformat()[:3] == nat.getformat()[:3]


def test_native_no_space_and_errors():
    nat = NativePDMP3()
    nat.open_feed()
    assert nat.feed(bytes(T.INBUF_SIZE + 1)) == T.NO_SPACE
    res, pcm = nat.read(0)
    assert res == T.NO_SPACE
    nat.feed(bytes([0x55]) * 4096)
    res, pcm = nat.read(65536)
    assert res in (T.ERR, T.NEED_MORE) and pcm == b""


def test_native_dsp_frame_api():
    """pdmp3_parse_frame + pdmp3_dsp_frame == full read path."""
    stream = mp3gen.make_stream(n_frames=4, seed=55, blocks="varied")
    want = decode_file(stream)
    h = NativePDMP3()
    h.open_feed()
    h.feed(stream)
    from pdmp3_tpu.host import _Granules, lib
    import ctypes as C
    out = []
    while True:
        g = _Granules()
        res = lib().pdmp3_parse_frame(h._h, C.byref(g))
        if res != 0:
            break
        pcm = h.dsp_frame(g)
        w = pcm.reshape(-1)
        s = np.empty(2 * w.size, np.int16)
        s[0::2] = ((w >> 16) & 0xFFFF).astype(np.uint16).view(np.int16)
        s[1::2] = (w & 0xFFFF).astype(np.uint16).view(np.int16)
        out.append(s.tobytes())
    got = b"".join(out)
    assert got[:len(want)] == want


def test_native_short_intensity_bug_compat():
    stream = mp3gen.make_stream(n_frames=8, seed=99, blocks="short", mode=1,
                                mode_extension=1, stereo_extent_ch1=0.3,
                                intensity_pos=True)
    assert native_decode_file(stream) == reference_decode(stream)


def _table_b_spec_fixture():
    """Frames whose count1 quads are encoded with the REAL ISO table B
    (the capability the reference's stale-pointer bug forecloses)."""
    import random
    rng = random.Random(4)
    frames, intended = [], []
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
    return mp3gen.assemble_stream(frames, rng=rng,
                                  use_reservoir=False), intended


def test_native_count1_table_b_spec_mode():
    """PDMP3_PROFILE_COUNT1B_SPEC: the native frontend decodes real
    table-B quads, matching both the intended values and the Python
    spec-mode frontend (VERDICT r1 item 5)."""
    from pdmp3_tpu.host import PROFILE_COUNT1B_SPEC

    stream, intended = _table_b_spec_fixture()
    h = NativePDMP3()
    h.set_profile(PROFILE_COUNT1B_SPEC)
    assert h.get_profile() == PROFILE_COUNT1B_SPEC
    h.open_feed()
    assert h.get_profile() == PROFILE_COUNT1B_SPEC  # survives open_feed
    h.feed(stream)
    fe = Frontend(count1_table_b_spec=True)
    fe.feed(stream)
    for t, grans in enumerate(intended):
        res, out = h.parse_frame()
        assert res == 0, t
        pres, fd = fe.read_frame()
        assert pres == 0, t
        np.testing.assert_array_equal(out["ix"], fd.ix,
                                      err_msg=f"frame {t} native vs python")
        for gr in range(2):
            for ch in range(2):
                g = grans[gr][ch]
                n = g.big_values * 2 + 4 * g.n_quads
                np.testing.assert_array_equal(
                    out["ix"][gr][ch][:n], g.values[:n],
                    err_msg=f"frame {t} gr {gr} ch {ch}")


def test_native_spec_intensity_profile():
    """PDMP3_PROFILE_SPEC_INTENSITY: native spec decode matches the
    oracle's spec mode and diverges from the reference's transcription
    bug (VERDICT r1 item 5)."""
    from pdmp3_tpu.host import PROFILE_SPEC_INTENSITY
    from pdmp3_tpu.oracle import OracleDSP

    stream = mp3gen.make_stream(n_frames=8, seed=99, blocks="short", mode=1,
                                mode_extension=1, stereo_extent_ch1=0.3,
                                intensity_pos=True)
    spec = native_decode_file(stream, profile=PROFILE_SPEC_INTENSITY)
    assert spec != reference_decode(stream)
    want = decode_file(stream,
                       dsp=OracleDSP(bug_compat_short_intensity=False))
    assert spec == want


def _thread_corpus(tmp_path):
    paths = []
    for i, kw in enumerate((dict(blocks="long"),
                            dict(blocks="short"),
                            dict(blocks="varied", mode=1, mode_extension=2),
                            dict(blocks="mixed", sfreq=2),
                            dict(blocks="long", mode=3),
                            dict(blocks="varied", use_reservoir=True))):
        p = tmp_path / f"s{i}.mp3"
        p.write_bytes(mp3gen.make_stream(n_frames=12, seed=500 + i, **kw))
        paths.append(str(p))
    return paths


def test_threaded_parse_equals_single_thread(tmp_path):
    """pdmp3_parse_step_wire16 with 4 worker threads produces tensors
    byte-identical to the single-threaded parse (VERDICT r1 item 6).
    128 slots engages the pool (the <64-slot fast path is serial)."""
    import subprocess
    from pdmp3_tpu.host.build import selftest_bin

    exe = selftest_bin()
    r = subprocess.run([exe, "128", "4", "8", *_thread_corpus(tmp_path)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "threaded parse == single-threaded" in r.stdout


def test_threaded_parse_tsan_clean(tmp_path):
    """ThreadSanitizer profile over the threaded parse: no data-race
    reports (VERDICT r1 item 6)."""
    import subprocess
    from pdmp3_tpu.host.build import selftest_bin

    exe = selftest_bin(sanitize="thread")
    r = subprocess.run([exe, "128", "4", "4", *_thread_corpus(tmp_path)],
                       capture_output=True, text=True,
                       env={"TSAN_OPTIONS": "halt_on_error=1"})
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "ThreadSanitizer" not in r.stderr, r.stderr


def test_stream_decoder_multithread_parse():
    """StreamDecoder(parse_threads=4) wire == parse_threads=1 wire."""
    from pdmp3_tpu.runtime import StreamDecoder

    streams = [mp3gen.make_stream(n_frames=6, seed=520 + i,
                                  blocks=["long", "short", "varied",
                                          "mixed"][i % 4])
               for i in range(8)]
    decs = [StreamDecoder(128, parse_threads=t) for t in (1, 4)]
    for dec in decs:
        for s in range(128):
            dec.feed(s, streams[s % 8])
    for step in range(8):
        na = decs[0].parse_step()
        nb = decs[1].parse_step()
        assert na == nb
        np.testing.assert_array_equal(decs[0].wire, decs[1].wire,
                                      err_msg=f"step {step}")
        if na == 0:
            break


def test_batch_spec_profile_end_to_end():
    """StreamDecoder(profile=...) routes both spec flags through the
    serving path: native parse (real table B) + device DSP
    (bug_compat=False), equal to the native spec decode."""
    from pdmp3_tpu.host import PROFILE_COUNT1B_SPEC, PROFILE_SPEC_INTENSITY
    from pdmp3_tpu.runtime import StreamDecoder

    prof = PROFILE_COUNT1B_SPEC | PROFILE_SPEC_INTENSITY
    streams = [
        _table_b_spec_fixture()[0],
        mp3gen.make_stream(n_frames=6, seed=99, blocks="short", mode=1,
                           mode_extension=1, stereo_extent_ch1=0.3,
                           intensity_pos=True),
    ]
    dec = StreamDecoder(2, exact=True, profile=prof)
    for s, data in enumerate(streams):
        dec.feed(s, data)
    out = [[] for _ in streams]
    while dec.parse_step():
        pcm = dec.decode_step()
        for s in range(2):
            if dec.active[s]:
                out[s].append(pcm[s].tobytes())
    for s, data in enumerate(streams):
        want = native_decode_file(data, profile=prof)
        got = b"".join(out[s])
        n = min(len(got), len(want))
        assert n >= len(want) - 2 * 4608
        assert got[:n] == want[:n], f"stream {s}"


def test_native_vbr_and_corruption():
    stream = mp3gen.make_stream(n_frames=30, seed=61, blocks="varied",
                                vbr=True, use_reservoir=True)
    assert native_decode_file(stream) == reference_decode(stream)
    # corruption: native must equal the Python implementation everywhere;
    # vs the reference, parity is defined only until a frame drives it
    # into OOB scalefactor reads (see test_golden_oracle)
    broken = bytearray(stream)
    for i in range(len(broken) // 3, len(broken) // 3 + 40):
        broken[i] ^= 0xA5
    broken = bytes(broken)
    nat = native_decode_file(broken)
    assert nat == decode_file(broken)
    from tests.test_golden_oracle import _first_oob_frame
    oob = _first_oob_frame(broken)
    ref = reference_decode(broken)
    n = len(ref) if oob is None else oob
    assert nat[:n] == ref[:n]
