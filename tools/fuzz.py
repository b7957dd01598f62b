#!/usr/bin/env python3
"""Coverage-guided fuzz campaign over the native frontend.

Builds the mini-AFL driver (host/src/fuzz_main.cc: GCC trace-pc edge
coverage + ASan/UBSan over the library TUs), seeds it with mp3gen
streams spanning the format matrix plus hostile variants, runs the
requested number of iterations, and merges the stats into the cumulative
artifact (default FUZZ_r04.json, carried forward from the r03 totals).
A sanitizer abort exits nonzero; the
offending input is saved under tools/fuzz_crashes/ with its RNG seed for
reproduction:

    python tools/fuzz.py --iters 200000
    python tools/fuzz.py --iters 50000 --rng-seed 7
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_seeds(d: str) -> int:
    from pdmp3_tpu.testing import mp3gen

    specs = [
        dict(n_frames=6, seed=900, blocks="varied", mode=1,
             mode_extension=2, use_reservoir=True),
        dict(n_frames=4, seed=901, blocks="short", mode=3, sfreq=1),
        dict(n_frames=4, seed=902, blocks="mixed", sfreq=2,
             mode=1, mode_extension=3, intensity_pos=True),
        dict(n_frames=4, seed=903, blocks="long", mode=2, stuffing=4),
        dict(n_frames=5, seed=904, blocks="varied", use_reservoir=True,
             scfsi=True),
        # MPEG-2/2.5 LSF seeds (parsed when the harness draws the
        # PDMP3_PROFILE_LSF round; otherwise exercise sync rejection)
        dict(n_frames=5, seed=905, family=1, blocks="varied", mode=1,
             mode_extension=1, stereo_extent_ch1=0.4, bitrate_index=11),
        dict(n_frames=4, seed=906, family=2, blocks="mixed", sfreq=2,
             mode=1, mode_extension=3, bitrate_index=11),
        dict(n_frames=4, seed=907, family=1, mode=3, use_reservoir=True,
             bitrate_index=11),
        # free-format seed (bitrate_index 0; parsed when the harness
        # draws PDMP3_PROFILE_FREE_FORMAT, else exercises rejection)
        dict(n_frames=5, seed=908, free_format_size=420, mode=0),
    ]
    extra_raw = [
        # Layer I/II seeds (parsed when the harness draws the
        # PDMP3_PROFILE_L12 round or an L12 wire-pool round; otherwise
        # exercise the reference's layer != 3 rejection)
        mp3gen.make_l12_stream(layer=1, n_frames=4, seed=910,
                               bitrate_index=12),
        mp3gen.make_l12_stream(layer=2, n_frames=4, seed=911,
                               bitrate_index=12, mode=3),
        mp3gen.make_l12_stream(layer=2, n_frames=3, seed=912,
                               bitrate_index=8),
    ]
    # ID3-tagged seed: small tag + stream (the mutator grows/splices
    # tags; PDMP3_PROFILE_ID3 rounds exercise the incremental skip and
    # the ring-wrap normalization)
    tag_size = 3000
    hdr = b"ID3" + bytes([4, 0, 0, (tag_size >> 21) & 0x7F,
                          (tag_size >> 14) & 0x7F,
                          (tag_size >> 7) & 0x7F, tag_size & 0x7F])
    extra_raw.append(hdr + bytes((i * 37) % 251 for i in range(tag_size))
                     + mp3gen.make_stream(n_frames=4, seed=909, mode=0))
    # real-encoder seeds: libshine/libmp3lame output carries structure
    # mp3gen never emits (real psychoacoustic block switching, LAME VBR
    # reservoir, ancillary bytes) — fresh mutation territory; a
    # muxer-written Xing/LAME tag seed drives the tag-frame path
    try:
        from pdmp3_tpu.testing.avref import (av_encmux, av_encode,
                                             ensure_av_encmux,
                                             ensure_av_encode)
        from pdmp3_tpu.testing.signals import make_pcm
        if ensure_av_encode() is not None:
            pcm = make_pcm("transient", 44100, 2, seconds=0.35, seed=913)
            extra_raw.append(av_encode(pcm, "libmp3lame", 44100, 2,
                                       128000, "vbr:4"))
            extra_raw.append(av_encode(
                make_pcm("tonal", 32000, 1, seconds=0.3, seed=914),
                "libshine", 32000, 1, 64000))
        if ensure_av_encmux() is not None:
            extra_raw.append(av_encmux(
                make_pcm("sweep", 48000, 2, seconds=0.3, seed=915),
                48000, 2, 128000, "vbr:5"))
    except Exception:
        pass                     # libav unavailable: mp3gen seeds only
    n = 0
    for j, raw in enumerate(extra_raw):
        with open(os.path.join(d, f"r{j}.mp3"), "wb") as fh:
            fh.write(raw)
        n += 1
    for i, sp in enumerate(specs):
        data = mp3gen.make_stream(**sp)
        with open(os.path.join(d, f"s{i}.mp3"), "wb") as f:
            f.write(data)
        n += 1
        # hostile variants: truncation + mid-stream corruption
        with open(os.path.join(d, f"s{i}_trunc.mp3"), "wb") as f:
            f.write(data[:len(data) * 2 // 3 + 1])
        corrupt = bytearray(data)
        for k in range(50, len(corrupt), 97):
            corrupt[k] ^= 0xA5
        with open(os.path.join(d, f"s{i}_corrupt.mp3"), "wb") as f:
            f.write(bytes(corrupt))
        n += 2
    return n


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=200_000)
    ap.add_argument("--rng-seed", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "FUZZ_r04.json"))
    args = ap.parse_args()

    from pdmp3_tpu.host.build import fuzzer_bin

    exe = fuzzer_bin()
    crash_dir = os.path.join(REPO, "tools", "fuzz_crashes")
    with tempfile.TemporaryDirectory() as td:
        seeds = make_seeds(td)
        cur = os.path.join(td, "cur_input.bin")
        t0 = time.time()
        p = subprocess.run(
            [exe, td, str(args.iters), cur, str(args.rng_seed)],
            capture_output=True, text=True,
            env={**os.environ,
                 "ASAN_OPTIONS": "abort_on_error=1:detect_leaks=1"})
        el = time.time() - t0
        if p.returncode != 0:
            os.makedirs(crash_dir, exist_ok=True)
            dst = os.path.join(
                crash_dir, f"crash_seed{args.rng_seed}_{int(t0)}.bin")
            if os.path.exists(cur):
                shutil.copy(cur, dst)
            sys.stderr.write(p.stderr[-4000:] + "\n")
            print(f"CRASH (rc={p.returncode}): reproducer saved to {dst}")
            sys.exit(1)
        stats = json.loads(p.stdout.strip().splitlines()[-1])
        stats.update(seeds=seeds, rng_seed=args.rng_seed,
                     execs_per_sec=round(args.iters / max(el, 1e-9), 1))

    merged = {"runs": [], "total_execs": 0, "crashes_found": 0}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    merged["runs"].append(stats)
    merged["total_execs"] = sum(r["execs"] for r in merged["runs"])
    merged["edges_peak"] = max(r["edges"] for r in merged["runs"])
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(stats))
    print(f"merged -> {args.out} (total execs "
          f"{merged['total_execs']}, 0 crashes)")


if __name__ == "__main__":
    main()
