"""Build the native host library + CLI with g++.

Invoked on demand by pdmp3_tpu.host (ctypes loader) and by tests; builds
into build/host/.  -ffp-contract=off is load-bearing: FMA contraction
would break the scalar DSP's bit parity with the reference decoder.
"""
from __future__ import annotations

import os
import subprocess
import sys

HOST_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HOST_DIR))
BUILD_DIR = os.path.join(REPO, "build", "host")
LIB = os.path.join(BUILD_DIR, "libpdmp3host.so")
CLI = os.path.join(BUILD_DIR, "pdmp3")

SRCS = ["tables.cc", "frame.cc", "dsp.cc", "api.cc"]
CXXFLAGS = ["-std=c++17", "-O3", "-Wall", "-Wextra", "-fPIC", "-pthread",
            "-ffp-contract=off", "-fno-fast-math"]

# sanitizer builds (SURVEY.md §5): PDMP3_SANITIZE=address|undefined|thread
_SAN = os.environ.get("PDMP3_SANITIZE")


def _mtime(path: str) -> float:
    return os.path.getmtime(path) if os.path.exists(path) else -1.0


def _stale(target: str, deps: list[str]) -> bool:
    t = _mtime(target)
    return t < 0 or any(_mtime(d) > t for d in deps)


def sanitizer_cli(kind: str = "address") -> str:
    """Build (cached) a sanitizer-instrumented CLI for memory-safety
    verification of the frontend/DSP on hostile inputs."""
    src_dir = os.path.join(HOST_DIR, "src")
    ensure_built()
    exe = os.path.join(BUILD_DIR, f"pdmp3_{kind[:4]}")
    srcs = [os.path.join(src_dir, s) for s in SRCS + ["main.cc"]]
    if _stale(exe, srcs):
        flags = [f for f in CXXFLAGS if f != "-O3"] + [
            "-O1", "-g", f"-fsanitize={kind},undefined"
            if kind == "address" else f"-fsanitize={kind}",
            "-fno-omit-frame-pointer"]
        subprocess.run(["g++", *flags, "-o", exe, *srcs], check=True,
                       capture_output=True)
    return exe


def selftest_bin(sanitize: str | None = None) -> str:
    """Build (cached) the threaded-frontend selftest driver
    (src/selftest.cc), optionally under a sanitizer ('thread' for the
    TSan race profile over pdmp3_parse_step_wire16)."""
    src_dir = os.path.join(HOST_DIR, "src")
    ensure_built()
    tag = f"_{sanitize[:4]}" if sanitize else ""
    exe = os.path.join(BUILD_DIR, f"pdmp3_selftest{tag}")
    srcs = [os.path.join(src_dir, s) for s in SRCS + ["selftest.cc"]]
    if _stale(exe, srcs):
        flags = list(CXXFLAGS)
        if sanitize:
            flags = [f for f in flags if f != "-O3"] + [
                "-O1", "-g", f"-fsanitize={sanitize}",
                "-fno-omit-frame-pointer"]
        subprocess.run(["g++", *flags, "-o", exe, *srcs], check=True,
                       capture_output=True)
    return exe


def parsebench_bin(profile: bool = False, stats: bool = False) -> str:
    """Build (cached) the native parse-throughput benchmark
    (src/parsebench.cc).  profile=True adds -pg for gprof; stats=True
    compiles the PDMP3_PARSE_STATS rdtsc stage counters (slower — the
    counters sit in the hot loops) and prints the per-stage cycle
    split in the JSON."""
    src_dir = os.path.join(HOST_DIR, "src")
    ensure_built()
    exe = os.path.join(BUILD_DIR, "pdmp3_parsebench"
                       + ("_pg" if profile else "")
                       + ("_stats" if stats else ""))
    srcs = [os.path.join(src_dir, s) for s in SRCS + ["parsebench.cc"]]
    if _stale(exe, srcs):
        flags = list(CXXFLAGS) + (["-pg", "-g"] if profile else []) \
            + (["-DPDMP3_PARSE_STATS"] if stats else [])
        subprocess.run(["g++", *flags, "-o", exe, *srcs], check=True,
                       capture_output=True)
    return exe


def fuzzer_bin() -> str:
    """Build (cached) the coverage-guided frontend fuzzer: library TUs
    instrumented with GCC trace-pc edge coverage + ASan/UBSan, the
    uninstrumented driver (src/fuzz_main.cc) collecting the bitmap."""
    src_dir = os.path.join(HOST_DIR, "src")
    ensure_built()
    exe = os.path.join(BUILD_DIR, "pdmp3_fuzz")
    srcs = [os.path.join(src_dir, s) for s in SRCS]
    drv = os.path.join(src_dir, "fuzz_main.cc")
    if _stale(exe, srcs + [drv]):
        base = [f for f in CXXFLAGS if f != "-O3"] + [
            "-O1", "-g", "-fno-omit-frame-pointer",
            "-fsanitize=address,undefined"]
        objs = []
        for s in srcs:
            o = os.path.join(BUILD_DIR,
                             os.path.basename(s).replace(".cc", "_fz.o"))
            subprocess.run(["g++", *base, "-fsanitize-coverage=trace-pc",
                            "-c", "-o", o, s], check=True,
                           capture_output=True)
            objs.append(o)
        subprocess.run(["g++", *base, "-o", exe, drv, *objs], check=True,
                       capture_output=True)
    return exe


def ensure_built(verbose: bool = False) -> str:
    src_dir = os.path.join(HOST_DIR, "src")
    inc = os.path.join(src_dir, "gen_tables.inc")
    if not os.path.exists(inc):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "gen_host_tables.py"),
                        inc], check=True, cwd=REPO)
    deps = ([os.path.join(src_dir, s) for s in SRCS + ["internal.h",
                                                       "main.cc"]]
            + [inc, os.path.join(HOST_DIR, "include", "pdmp3.h")])
    os.makedirs(BUILD_DIR, exist_ok=True)
    if _stale(LIB, deps) or _stale(CLI, deps):
        srcs = [os.path.join(src_dir, s) for s in SRCS]
        cmd = ["g++", *CXXFLAGS, "-shared", "-o", LIB, *srcs]
        if verbose:
            print(" ".join(cmd))
        subprocess.run(cmd, check=True)
        cmd = ["g++", *CXXFLAGS, "-o", CLI,
               os.path.join(src_dir, "main.cc"), *srcs]
        subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(ensure_built(verbose=True))
