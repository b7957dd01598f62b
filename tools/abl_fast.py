"""Fast-kernel stage attribution (round-3 VERDICT item 2).

Runs the fully-fused fast-mode Pallas granule step (`_kernel_full`,
ops/pallas_step.py) at B=8192 under the PDMP3_ABL_FAST stage-skip hooks,
one fresh process per config (the hook is read at trace time):

    (none)    — true fast mode (baseline)
    nopow     — pow-4/3 Newton exp2/log2 chain skipped
    nogain    — requantize gain chains + one-hot expansions skipped
    nostereo  — MS butterfly + intensity chains folded away
    noaa      — antialias butterflies skipped
    noimdct   — IMDCT matmuls (36-pt long + folded-short) -> broadcast
    nopoly    — polyphase matrixing matmul -> broadcast
    nofir     — 16-tap D-window FIR -> 1 tap
    noquant   — quantize/clip -> raw float sums

delta_ms vs baseline attributes the on-chip cost of each stage (DCE
removes the skipped stage's whole dependency chain).  Output is wrong
by design under any ablation — these are bench-only configs.  Results
land in KERNEL_PROFILE_r05.json (override with ABL_FAST_OUT).  Match: the hot loops the kernel fuses,
/root/reference/pdmp3.c:1649-1700,1978-2045.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_enable_x64", True)
import bench
pool = bench.build_pool()
rtf = bench._measure(pool, 8192, "pallas", False, 128, repeats=3)
step_ms = 8192 * 576 / 44100.0 / rtf * 1000.0
print(json.dumps({"abl": os.environ.get("PDMP3_ABL_FAST", ""),
                  "rtf": round(rtf, 1), "step_ms": round(step_ms, 3)}))
"""

ABLS = ["", "noall", "nopow", "nogain", "nostereo", "noaa", "noimdct",
        "nopoly", "nofir", "noquant"]
# ABL_FAST_MODES=a,b,c selects a subset (e.g. the round-5 fixed-overhead
# probe pair '',noall without re-timing the full stage sweep)
if os.environ.get("ABL_FAST_MODES"):
    ABLS = os.environ["ABL_FAST_MODES"].split(",")


def main() -> None:
    out_path = os.path.join(
        REPO, os.environ.get("ABL_FAST_OUT", "KERNEL_PROFILE_r05.json"))
    results = []
    errored = False
    for abl in ABLS:
        env = dict(os.environ)
        if abl:
            env["PDMP3_ABL_FAST"] = abl
        else:
            env.pop("PDMP3_ABL_FAST", None)
        out = subprocess.run(
            [sys.executable, "-c", _CHILD % {"repo": REPO}],
            env=env, capture_output=True, text=True, timeout=3600)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if out.returncode != 0 or not line.startswith("{"):
            # record the failed leg in the artifact too: a silently
            # partial profile must not be mistakable for a complete one
            errored = True
            rec = {"abl": abl, "error": out.stderr[-800:]}
            results.append(rec)
            print(json.dumps(rec))
            continue
        r = json.loads(line)
        results.append(r)
        print(json.dumps(r), flush=True)
    if results:
        ok = [r for r in results if "error" not in r]
        base = next((r for r in ok if r["abl"] == ""), None)
        if base:
            for r in ok:
                r["delta_ms_vs_fast"] = round(
                    base["step_ms"] - r["step_ms"], 3)
        if errored:
            results.append({"abl": "_summary", "complete": False,
                            "note": "one or more legs errored; deltas "
                                    "cover the successful legs only"})
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
