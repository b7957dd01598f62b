"""Interleaved on-chip A/B: per-granule fast kernel vs the frame-fused
variant (both granules of a frame in ONE pallas_call, state crossing
granules in VMEM scratch; PDMP3_FRAME_FUSED=1 routes serving through it).

Measured verdict (2026-08-19, TPU v5e via the shared tunnel, B=8192,
5 interleaved rounds x 48 frames): per-granule median 1.515 ms/granule
(spread 1.489-1.576), frame-fused median 1.633 (1.618-1.666) —
non-overlapping, fused LOSES ~8% despite halving the store/v state HBM
traffic (~200 MB/step) and removing the prev3 kernel->front edge.  The
doubled per-grid-step working set (two ix/pcm blocks resident) costs
Mosaic's revolving-buffer pipelining more than the state round trip
saves; a write-only-outputs scratch variant measured the same.  Kept
reproducible here and bitwise-locked by tests/test_frame_fused.py.

Usage: python tools/frame_fused_ab.py [B] [rounds]
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
from bench import build_pool, tile_batch  # noqa: E402
from pdmp3_tpu.ops import pallas_step as PSF  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    pool = build_pool()
    b0, b1 = [jax.device_put(tile_batch(b, B)) for b in pool[:2]]

    def run_fused(N=48):
        st = PSF.init_pallas_state(B)
        pf, st = PSF.decode_frames_pallas((b0, b1), st, (0, 1))
        jax.block_until_ready(pf)
        t0 = time.perf_counter()
        for _ in range(N):
            pf, st = PSF.decode_frames_pallas((b0, b1), st, (0, 1))
        jax.block_until_ready((pf, st))
        return (time.perf_counter() - t0) / N / 2 * 1e3

    def run_pg(N=48):
        st = PSF.init_pallas_state(B)
        p, st = PSF.decode_granules_pallas(b0, st, exact=False)
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        for _ in range(N):
            p, st = PSF.decode_granules_pallas(b0, st, exact=False)
            p, st = PSF.decode_granules_pallas(b1, st, exact=False)
        jax.block_until_ready((p, st))
        return (time.perf_counter() - t0) / N / 2 * 1e3

    pg, fused = [], []
    for _ in range(rounds):
        pg.append(run_pg())
        fused.append(run_fused())
    out = {
        "B": B,
        "per_granule_ms": sorted(pg)[len(pg) // 2],
        "frame_fused_ms": sorted(fused)[len(fused) // 2],
        "per_granule_all": pg,
        "frame_fused_all": fused,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
