"""Exact-mode cost attribution (round-2 VERDICT item 7).

Runs the exact Pallas-path granule step at B=8192 under the temporary
ABL= env-var ablation hooks in ops/dsp.py / ops/pallas_step.py:

    (none)    — true exact mode (baseline: float-float closed-form
                pow43, round-4)
    rqgather  — the superseded bf16x3 one-hot pow43 gather (round-3
                baseline, kept reproducible)
    ms32      — MS butterfly + short-intensity truncation in f32, not f64
    rqfast    — fast requantize (Newton exp2) instead of exact pow43
    q32       — final quantize rounds through f32, not f64

plus fast mode for the ceiling.  Each config runs in a fresh process
(the hooks are read at trace time).  Prints one JSON line per config.
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
exact = os.environ.get("PDMP3_ABL") != "FASTMODE"
rtf = bench._measure(pool, 8192, "pallas", exact, 128, repeats=3)
step_ms = 8192 * 576 / 44100.0 / rtf * 1000.0
print(json.dumps({"abl": os.environ.get("PDMP3_ABL", ""), "exact": exact,
                  "rtf": round(rtf, 1), "step_ms": round(step_ms, 3)}))
"""


def main() -> None:
    results = []
    for abl in ["", "rqgather", "ms32", "rqfast", "q32", "FASTMODE"]:
        env = dict(os.environ)
        if abl:
            env["PDMP3_ABL"] = abl
        else:
            env.pop("PDMP3_ABL", None)
        out = subprocess.run(
            [sys.executable, "-c", _CHILD % {"repo": REPO}],
            env=env, capture_output=True, text=True, timeout=3600)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if out.returncode != 0 or not line.startswith("{"):
            print(json.dumps({"abl": abl, "error": out.stderr[-800:]}))
            continue
        r = json.loads(line)
        results.append(r)
        print(json.dumps(r), flush=True)
    if results:
        base = next((r for r in results if r["abl"] == ""), None)
        if base:
            for r in results:
                r["delta_ms_vs_exact"] = round(
                    base["step_ms"] - r["step_ms"], 3)
        with open(os.path.join(REPO, "ABL_EXACT_r04.json"), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
