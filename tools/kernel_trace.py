"""Capture a profiler (xplane/perfetto) trace of the fully-fused
fast-mode Pallas kernel at serving batch (VERDICT r3 item 2's trace
artifact, complementing tools/abl_fast.py's stage ablations).

Runs the device-only step loop bench._measure times (inputs resident,
no host feed) under jax.profiler.trace, so the trace shows the Mosaic
kernel's on-chip duration and any inter-step gaps.  Writes the trace
directory plus a JSON summary with the host-measured step time.

    python tools/kernel_trace.py --batch 8192 --steps 32 --out KERNEL_TRACE_r04

Match: the hot loops the kernel fuses,
/root/reference/pdmp3.c:1649-1700,1978-2045.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--out", default="KERNEL_TRACE_r04")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import bench

    pool = bench.build_pool()
    from pdmp3_tpu.ops import pallas_step as PSF

    dev_pool = [jax.device_put(bench.tile_batch(b, args.batch))
                for b in pool[:4]]
    state = PSF.init_pallas_state(args.batch)
    step_fn = bench._step_fn("pallas", False)
    outs, state = step_fn(*dev_pool, state)     # warm compile
    jax.block_until_ready(outs)

    trace_dir = os.path.abspath(args.out)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(max(1, args.steps // bench.K)):
            outs, state = step_fn(*dev_pool, state)
        jax.block_until_ready(outs)
    el = time.perf_counter() - t0
    n_steps = max(1, args.steps // bench.K) * bench.K
    step_ms = el / n_steps * 1e3
    rtf = args.batch * 576 / 44100.0 / (el / n_steps)
    summary = {
        "batch": args.batch, "steps": n_steps,
        "step_ms": round(step_ms, 3), "rtf": round(rtf, 1),
        "trace_dir": args.out,
    }
    with open(os.path.join(trace_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
