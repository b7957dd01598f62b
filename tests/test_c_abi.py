"""C ABI: a real C consumer compiled against pdmp3.h + libpdmp3host.so
must decode bit-exact (drop-in replacement check), and independent handles
must be thread-safe (the reference's function-static DSP state would fail
this, pdmp3.c:1755/1983)."""
import concurrent.futures
import os
import subprocess

import pytest

from pdmp3_tpu.host import NativePDMP3, native_decode_file
from pdmp3_tpu.host.build import BUILD_DIR, LIB, ensure_built
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.golden import reference_decode

C_CONSUMER = r"""
#include <stdio.h>
#include <stdlib.h>
#include "pdmp3.h"

/* minimal libmpg123-style consumer: feed stdin, write PCM to stdout */
int main(void) {
  pdmp3_handle *h = pdmp3_new(NULL, NULL);
  if (!h || pdmp3_open_feed(h) != PDMP3_OK) return 1;
  unsigned char in[4096], out[16384];
  size_t done;
  int res;
  long rate; int ch, enc, got_format = 0;
  while ((res = pdmp3_read(h, out, sizeof out, &done)) != PDMP3_ERR) {
    fwrite(out, 1, done, stdout);
    if (res == PDMP3_NEW_FORMAT && !got_format) {
      pdmp3_getformat(h, &rate, &ch, &enc);
      fprintf(stderr, "format %ld %d %d\n", rate, ch, enc);
      got_format = 1;
    }
    if (res == PDMP3_NEED_MORE) {
      size_t n = fread(in, 1, sizeof in, stdin);
      if (!n) break;
      if (pdmp3_feed(h, in, n) != PDMP3_OK) break;
    }
  }
  pdmp3_delete(h);
  return 0;
}
"""


@pytest.fixture(scope="module")
def consumer_bin(tmp_path_factory):
    ensure_built()
    d = tmp_path_factory.mktemp("cabi")
    src = d / "consumer.c"
    src.write_text(C_CONSUMER)
    exe = d / "consumer"
    inc = os.path.join(os.path.dirname(LIB), "..", "..",
                       "pdmp3_tpu", "host", "include")
    inc = os.path.abspath(os.path.join(BUILD_DIR, "..", "..",
                                       "pdmp3_tpu", "host", "include"))
    subprocess.run(["gcc", "-std=c11", "-O2", "-o", str(exe), str(src),
                    f"-I{inc}", LIB, f"-Wl,-rpath,{os.path.dirname(LIB)}"],
                   check=True, capture_output=True)
    return str(exe)


def test_c_consumer_bit_exact(consumer_bin):
    stream = mp3gen.make_stream(n_frames=10, seed=91, blocks="varied",
                                mode=1, mode_extension=2,
                                use_reservoir=True)
    r = subprocess.run([consumer_bin], input=stream, capture_output=True)
    assert r.returncode == 0
    assert b"format 44100 2" in r.stderr
    assert r.stdout == reference_decode(stream)


def test_concurrent_handles_thread_safe():
    """N handles decoding different streams on concurrent threads must
    each produce their stream's exact PCM (ctypes releases the GIL)."""
    streams = [mp3gen.make_stream(n_frames=8, seed=92 + i,
                                  blocks=["long", "short", "varied",
                                          "mixed"][i % 4])
               for i in range(8)]
    want = [native_decode_file(s) for s in streams]

    def decode(i):
        h = NativePDMP3()
        h.open_feed()
        pos, out = 0, []
        while True:
            res, pcm = h.read(16384)
            out.append(pcm)
            if res == -1:
                break
            if res == -10:
                if pos >= len(streams[i]):
                    break
                h.feed(streams[i][pos:pos + 1024])
                pos += 1024
        return b"".join(out)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        got = list(ex.map(decode, range(8)))
    for i in range(8):
        assert got[i] == want[i], f"stream {i}"


def test_free_format_rejected():
    """bitrate_index=0 (free format) is rejected like the reference
    (pdmp3.c:1297-1300)."""
    hdr = bytes([0xFF, 0xFA, 0x00, 0x00])  # L3, bitrate_index=0
    stream = (hdr + bytes(400)) * 4
    assert native_decode_file(stream) == reference_decode(stream) == b""


def test_memory_safety_under_asan():
    """The native decoder must be memory-clean under ASan+UBSan on
    hostile inputs (the reference has OOB reads/writes on these —
    docs/DESIGN.md §6)."""
    import random
    from pdmp3_tpu.host.build import sanitizer_cli
    exe = sanitizer_cli("address")
    rng = random.Random(7)
    cases = []
    base = mp3gen.make_stream(n_frames=12, seed=95, blocks="varied",
                              vbr=True, use_reservoir=True)
    cases.append(base)
    b = bytearray(base)
    for i in range(0, len(b), 37):       # heavy corruption
        b[i] ^= rng.randrange(256)
    cases.append(bytes(b))
    cases.append(bytes(rng.randrange(256) for _ in range(8000)))  # noise
    cases.append(base[: len(base) // 2])  # truncation
    import tempfile
    for i, data in enumerate(cases):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "x.mp3")
            with open(p, "wb") as f:
                f.write(data)
            r = subprocess.run([exe, p], cwd=d, capture_output=True,
                               timeout=120)
            assert b"ERROR" not in r.stderr, (i, r.stderr[:2000])
            assert r.returncode == 0, (i, r.returncode, r.stderr[:2000])
