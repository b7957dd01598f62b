"""Auxiliary subsystems (SURVEY.md §5): checkpoint/resume, CLI backends,
config, tracing."""
import subprocess
import sys

import numpy as np
import pytest

from pdmp3_tpu.host import NativePDMP3, native_decode_file
from pdmp3_tpu.runtime import StreamDecoder
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.utils import DecodeConfig, StageTimer


@pytest.fixture(scope="module")
def stream():
    return mp3gen.make_stream(n_frames=8, seed=81, blocks="varied",
                              mode=1, mode_extension=2, use_reservoir=True)


def test_native_handle_checkpoint_resume(stream):
    """Mid-stream save/restore must continue bit-identically."""
    ref = native_decode_file(stream)

    h = NativePDMP3()
    h.open_feed()
    h.feed(stream[:4096])
    res, pcm1 = h.read(3 * 4608)
    blob = h.save_state()

    # continue original
    h.feed(stream[4096:])
    out_a = [pcm1]
    while True:
        res, p = h.read(16384)
        out_a.append(p)
        if res in (-1, -10):
            break

    # restore into a fresh handle and continue identically
    h2 = NativePDMP3()
    h2.open_feed()
    h2.restore_state(blob)
    h2.feed(stream[4096:])
    out_b = [pcm1]
    while True:
        res, p = h2.read(16384)
        out_b.append(p)
        if res in (-1, -10):
            break

    a, b = b"".join(out_a), b"".join(out_b)
    assert a == b
    assert a[:len(ref)] == ref[:len(a)]


def test_stream_decoder_checkpoint(stream):
    want = native_decode_file(stream)
    dec = StreamDecoder(1, exact=True)
    dec.feed(0, stream)
    out = []
    # decode 2 frames, checkpoint, decode 2 more
    for _ in range(2):
        assert dec.parse_step() == 1
        out.append(dec.decode_step()[0].tobytes())
    ckpt = dec.save_checkpoint()
    cont = []
    for _ in range(2):
        assert dec.parse_step() == 1
        cont.append(dec.decode_step()[0].tobytes())
    # restore into a fresh decoder: must reproduce the same continuation
    dec2 = StreamDecoder(1, exact=True)
    dec2.restore_checkpoint(ckpt)
    cont2 = []
    for _ in range(2):
        assert dec2.parse_step() == 1
        cont2.append(dec2.decode_step()[0].tobytes())
    assert cont == cont2
    got = b"".join(out + cont)
    assert got[:len(want)] == want[:len(got)]


def test_cli_native_backend(tmp_path, stream):
    f = tmp_path / "x.mp3"
    f.write_bytes(stream)
    r = subprocess.run([sys.executable, "-m", "pdmp3_tpu.cli",
                        "--backend", "native", str(f)],
                       capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "x.mp3.raw").read_bytes() == \
        native_decode_file(stream)


def test_cli_stdout_and_devdsp_compat(tmp_path, stream):
    f = tmp_path / "y.mp3"
    f.write_bytes(stream)
    r = subprocess.run([sys.executable, "-m", "pdmp3_tpu.cli",
                        "--backend", "oracle", "-o", "-",
                        "/dev/dsp0", str(f)],
                       capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert r.stdout == native_decode_file(stream)


def test_config_env(monkeypatch):
    monkeypatch.setenv("PDMP3_PRECISION", "fast")
    monkeypatch.setenv("PDMP3_BATCH_SLOTS", "128")
    cfg = DecodeConfig.from_env()
    assert cfg.precision == "fast" and not cfg.exact
    assert cfg.batch_slots == 128
    assert DecodeConfig().exact


def test_stage_timer():
    t = StageTimer()
    with t.stage("parse"):
        sum(range(1000))
    t.count("frames", 3)
    rep = t.report()
    assert rep["parse"]["count"] == 1 and rep["parse"]["seconds"] >= 0
    assert rep["frames"]["count"] == 3


def test_fuzzer_smoke(tmp_path):
    """The coverage-guided frontend fuzzer (host/src/fuzz_main.cc:
    trace-pc edge bitmap + ASan/UBSan library build) builds, discovers
    coverage from the seed corpus, and survives a mutation burst with no
    sanitizer findings.  Full campaigns: tools/fuzz.py (FUZZ_r02.json)."""
    import json
    import subprocess
    from tools import fuzz
    from pdmp3_tpu.host.build import fuzzer_bin

    exe = fuzzer_bin()
    seeds = tmp_path / "seeds"
    seeds.mkdir()
    n = fuzz.make_seeds(str(seeds))
    assert n >= 9
    p = subprocess.run(
        [exe, str(seeds), "800", str(tmp_path / "cur.bin"), "3"],
        capture_output=True, text=True, timeout=240)
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads(p.stdout.strip().splitlines()[-1])
    assert stats["edges"] > 300      # real coverage, not a dead harness
    assert stats["execs"] == 800


def test_native_stage_dumps_match_python():
    """The native frontend's PDMP3_DEBUG_DUMPS output (frame.cc
    dump_frame_state) is line-identical to utils/dumps.py — the
    production C++ path now has the reference's dmp_* debugging tap
    (pdmp3.c:894-965; its own DEBUG build is bit-rotted), closing the
    round-2 C28 partial."""
    import io
    import os
    import subprocess
    import sys

    from pdmp3_tpu.frontend import Frontend
    from pdmp3_tpu.testing import mp3gen
    from pdmp3_tpu.utils import dumps as D

    stream = mp3gen.make_stream(n_frames=3, seed=44, mode=1,
                                mode_extension=2, blocks="varied")
    fe = Frontend()
    fe.feed(stream)
    buf = io.StringIO()
    for _ in range(3):
        r, fd = fe.read_frame()
        assert r == 0
        D.dump_header(fd, buf)
        D.dump_side_info(fd, buf)
        for gr in range(2):
            for ch in range(fd.header.nch):
                D.dump_scalefactors(fd, gr, ch, buf)
                D.dump_huffman(fd, gr, ch, buf)
    code = (
        "import sys\n"
        "from pdmp3_tpu.host import NativePDMP3\n"
        "h = NativePDMP3(); h.open_feed()\n"
        "h.feed(open(sys.argv[1], 'rb').read())\n"
        "for _ in range(3):\n"
        "    r, g = h.parse_frame()\n"
        "    assert r == 0\n")
    p = None
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.mp3")
        with open(p, "wb") as f:
            f.write(stream)
        env = dict(os.environ, PDMP3_DEBUG_DUMPS="1")
        r = subprocess.run([sys.executable, "-c", code, p], env=env,
                           capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stderr.splitlines() == buf.getvalue().splitlines()
