"""OSS /dev/dsp sink (host/src/api.cc audio_write, mirroring
pdmp3.c:2264-2293): no sound device exists in CI, so an LD_PRELOAD shim
intercepts open/ioctl/write on the device path and records the exact
syscall sequence the CLI drives — format negotiation order, ioctl
request codes and values, and the PCM byte stream."""
import os
import subprocess
import textwrap

import pytest

from pdmp3_tpu.host.build import BUILD_DIR, ensure_built
from pdmp3_tpu.host import cli_path
from pdmp3_tpu.testing import mp3gen
from pdmp3_tpu.testing.golden import reference_decode

_SHIM = textwrap.dedent(r"""
    /* Fake /dev/dsp: logs open/ioctl/write to $PDMP3_OSS_LOG and sinks
       PCM into $PDMP3_OSS_PCM. */
    #define _GNU_SOURCE
    #include <dlfcn.h>
    #include <fcntl.h>
    #include <stdarg.h>
    #include <stdio.h>
    #include <stdlib.h>
    #include <string.h>
    #include <sys/ioctl.h>
    #include <sys/soundcard.h>
    #include <unistd.h>

    static int dsp_fd = -1;
    static FILE *logf(void) {
      static FILE *f = NULL;
      if (!f) f = fopen(getenv("PDMP3_OSS_LOG"), "a");
      return f;
    }
    static int (*real_open)(const char *, int, ...) = NULL;

    int open(const char *path, int flags, ...) {
      va_list ap; va_start(ap, flags);
      mode_t mode = va_arg(ap, mode_t); va_end(ap);
      if (!real_open) real_open = dlsym(RTLD_NEXT, "open");
      if (strncmp(path, "/dev/dsp", 8) == 0) {
        dsp_fd = real_open(getenv("PDMP3_OSS_PCM"),
                           O_WRONLY | O_CREAT | O_TRUNC, 0644);
        fprintf(logf(), "open %s flags=%d\n", path, flags);
        fflush(logf());
        return dsp_fd;
      }
      return real_open(path, flags, mode);
    }
    int open64(const char *path, int flags, ...) {
      va_list ap; va_start(ap, flags);
      mode_t mode = va_arg(ap, mode_t); va_end(ap);
      return open(path, flags, mode);
    }

    int ioctl(int fd, unsigned long req, ...) {
      va_list ap; va_start(ap, req);
      void *argp = va_arg(ap, void *); va_end(ap);
      if (fd == dsp_fd && fd >= 0) {
        const char *name = req == SNDCTL_DSP_SETFMT ? "SETFMT"
                         : req == SNDCTL_DSP_CHANNELS ? "CHANNELS"
                         : req == SNDCTL_DSP_SPEED ? "SPEED" : "?";
        fprintf(logf(), "ioctl %s %d\n", name, argp ? *(int *)argp : -1);
        fflush(logf());
        return 0;
      }
      static int (*real)(int, unsigned long, ...) = NULL;
      if (!real) real = dlsym(RTLD_NEXT, "ioctl");
      return real(fd, req, argp);
    }
""")


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    if not os.path.exists("/usr/include/sys/soundcard.h") and \
       not os.path.exists("/usr/include/linux/soundcard.h"):
        pytest.skip("no OSS headers on this system")
    d = tmp_path_factory.mktemp("oss")
    src = d / "shim.c"
    src.write_text(_SHIM)
    so = d / "shim.so"
    subprocess.run(["gcc", "-shared", "-fPIC", "-o", str(so), str(src),
                    "-ldl"], check=True, capture_output=True)
    return str(so)


def test_oss_ioctl_sequence_and_pcm(shim, tmp_path):
    """`pdmp3 /dev/dsp file.mp3` must negotiate S16LE -> 2ch -> rate in
    the reference's order (pdmp3.c:2277-2286) and write exactly the PCM
    the reference's raw sink produces."""
    ensure_built()
    stream = mp3gen.make_stream(n_frames=6, seed=77, blocks="varied",
                                mode=1, mode_extension=2)
    mp3 = tmp_path / "t.mp3"
    mp3.write_bytes(stream)
    log = tmp_path / "oss.log"
    pcm = tmp_path / "oss.pcm"
    log.touch()
    env = dict(os.environ, LD_PRELOAD=shim, PDMP3_OSS_LOG=str(log),
               PDMP3_OSS_PCM=str(pcm))
    r = subprocess.run([cli_path(), "/dev/dsp", str(mp3)], env=env,
                       cwd=tmp_path, capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()

    lines = log.read_text().strip().splitlines()
    assert lines[0].startswith("open /dev/dsp"), lines
    AFMT_S16_LE = 0x00000010  # sys/soundcard.h
    assert lines[1] == f"ioctl SETFMT {AFMT_S16_LE}", lines
    assert lines[2] == "ioctl CHANNELS 2", lines
    assert lines[3] == "ioctl SPEED 44100", lines
    # rate is latched: no further ioctls while the format is unchanged
    assert all(not ln.startswith("ioctl") for ln in lines[4:]), lines

    assert pcm.read_bytes() == reference_decode(stream)


def test_oss_rate_change_reissues_speed(shim, tmp_path):
    """A mid-stream sample-rate change must re-issue SNDCTL_DSP_SPEED
    (and only SPEED — format/channels stay latched)."""
    ensure_built()
    s1 = mp3gen.make_stream(n_frames=4, seed=78, blocks="long", sfreq=0)
    s2 = mp3gen.make_stream(n_frames=4, seed=79, blocks="long", sfreq=2)
    mp3 = tmp_path / "t.mp3"
    mp3.write_bytes(s1 + s2)
    log = tmp_path / "oss.log"
    pcm = tmp_path / "oss.pcm"
    log.touch()
    env = dict(os.environ, LD_PRELOAD=shim, PDMP3_OSS_LOG=str(log),
               PDMP3_OSS_PCM=str(pcm))
    r = subprocess.run([cli_path(), "/dev/dsp", str(mp3)], env=env,
                       cwd=tmp_path, capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    ioctls = [ln for ln in log.read_text().splitlines()
              if ln.startswith("ioctl")]
    assert ioctls[:3] == [f"ioctl SETFMT {0x10}", "ioctl CHANNELS 2",
                          "ioctl SPEED 44100"], ioctls
    assert ioctls[3:] == ["ioctl SPEED 32000"], ioctls
