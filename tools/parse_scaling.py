"""Host-frontend throughput scaling artifact (VERDICT r2 item 1).

Runs the native parse benchmark (host/src/parsebench.cc — the serving
parse path: sync, side info, reservoir, scalefactors, LUT+fused-sign
Huffman, line-ordered wire pack) across thread counts and writes
HOST_PARSE_r{N}.json with per-thread-count medians and the bench.py
harness counterpart.

This harness exposes ONE vCPU (os.cpu_count() == 1), so the curve can
only document that constraint: thread counts >1 measure oversubscription
on a single core, not scaling.  The per-core number is the
chip-saturation denominator: the fused Pallas kernel consumes ~2.26M
frames/s per chip (BENCH r2), so cores_to_saturate = 2.26e6 / per_core.

Usage: python tools/parse_scaling.py [--out HOST_PARSE_r03.json]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_native(exe: str, n_slots: int, threads: int, seconds: float,
               files: list[str], trials: int) -> dict:
    rates = []
    for _ in range(trials):
        out = subprocess.run(
            [exe, str(n_slots), str(threads), str(seconds), *files],
            capture_output=True, text=True, check=True).stdout
        rates.append(json.loads(out)["frames_per_sec"])
    return {"n_threads": threads, "trials": trials,
            "frames_per_sec_median": round(statistics.median(rates), 1),
            "frames_per_sec_max": round(max(rates), 1),
            "frames_per_sec_all": [round(r, 1) for r in rates]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="HOST_PARSE_r05.json")
    ap.add_argument("--slots", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    from pdmp3_tpu.host.build import parsebench_bin
    from pdmp3_tpu.testing import mp3gen

    exe = parsebench_bin()
    with tempfile.TemporaryDirectory() as td:
        files = []
        for i in range(8):
            p = os.path.join(td, f"s{i}.mp3")
            with open(p, "wb") as f:
                f.write(mp3gen.make_stream(
                    n_frames=60, seed=40 + i, blocks="varied", mode=1,
                    mode_extension=2, use_reservoir=True))
            files.append(p)
        rows = [run_native(exe, args.slots, t, args.seconds, files,
                           args.trials) for t in (1, 2, 4)]
        # per-stage cycle split (round-5 VERDICT #5): a separate
        # PDMP3_PARSE_STATS build — rdtsc pairs sit in the hot loops,
        # so its frames/s is NOT the throughput number, only the split
        stats_exe = parsebench_bin(stats=True)
        stats_out = subprocess.run(
            [stats_exe, str(args.slots), "1", str(args.seconds), *files],
            capture_output=True, text=True, check=True).stdout
        stage_stats = json.loads(stats_out)

    # the bench.py harness counterpart (includes the Python serving loop)
    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    ns: dict = {}
    exec(compile(src.split("def main(")[0], "bench.py", "exec"), ns)
    harness = [round(ns["_bench_parse"](), 1) for _ in range(3)]

    per_core = max(r["frames_per_sec_max"] for r in rows)
    result = {
        "host_cpus": os.cpu_count(),
        "note": ("this harness exposes ONE vCPU: rows with n_threads>1 "
                 "measure oversubscription, not scaling; the per-core "
                 "number is the scaling denominator"),
        "native_rows": rows,
        "bench_harness_frames_per_sec": harness,
        "per_core_frames_per_sec": per_core,
        "chip_consume_frames_per_sec": 2.26e6,
        "cores_to_saturate_chip": round(2.26e6 / per_core, 2),
        "stage_cycles_note": ("separate -DPDMP3_PARSE_STATS build; "
                              "rdtsc pairs inflate total runtime, use "
                              "only the RATIOS between stages"),
        "stage_stats": stage_stats,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
