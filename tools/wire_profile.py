#!/usr/bin/env python3
"""Adjudicate the sparse count1-bounded wire vs the dense wire with data.

Round-2 BENCH showed the sparse wire LOSING e2e on this harness (460x vs
623x dense) despite halving wire bytes — this tool breaks a serving step
into its stages and attributes the loss:

  parse   : native host frontend -> wire buffer (pdmp3_parse_step_*)
  upload  : jax.device_put(wire) wall time, blocked (the tunnel transfer)
  decode  : device step wall time, blocked (includes sparse re-densify)
  drain   : np.asarray(pcm) D2H wall time, blocked

plus (a) the unblocked pipelined e2e rate (what bench.py reports), (b)
the zlib-compressibility of each wire buffer — this harness's TPU tunnel
compresses its transport, and the dense wire's bytes are mostly zeros
(rzero tails), so raw byte counts do NOT predict tunnel transfer time —
and (c) the sparse bucket trajectory (sticky-upward growth triggers one
jit specialization per bucket level; a growth inside a timed window is a
recompile, ~seconds).

Writes WIRE_PROFILE_r{N}.json at the repo root.
"""
from __future__ import annotations

import json
import sys
import time
import zlib

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")


def corpus(n_distinct: int = 128):
    from pdmp3_tpu.testing import mp3gen

    streams = []
    i = 0
    while len(streams) < n_distinct:
        try:
            streams.append(mp3gen.make_stream(
                n_frames=40, seed=300 + i,
                blocks=["long", "varied", "short", "mixed"][i % 4],
                mode=[0, 1, 1, 3][i % 4],
                mode_extension=(2 if i % 2 else 0) | (1 if i % 8 >= 6 else 0),
                bitrate_index=[9, 11, 14, 7][(i // 4) % 4],
                sfreq=i % 3,
                use_reservoir=i % 5 == 0))
        except AssertionError:
            pass
        i += 1
    return streams


def profile(streams, B: int, sparse: bool, kernel: str, steps: int,
            drain: bool) -> dict:
    from pdmp3_tpu.models import decoder as M
    from pdmp3_tpu.runtime import SparseStreamDecoder, StreamDecoder

    dec = (SparseStreamDecoder if sparse else StreamDecoder)(
        B, exact=False, kernel=kernel)
    n_distinct = len(streams)
    src = [streams[i % n_distinct] for i in range(B)]
    pos = [0] * B

    def refill():
        for s in range(B):
            if pos[s] >= len(src[s]):
                pos[s] = 0
            if dec.inbuf_free(s) >= 4096:
                n = min(4096, len(src[s]) - pos[s])
                dec.feed(s, src[s][pos[s]:pos[s] + n])
                pos[s] += n

    # ---- warmup: parse a few steps so the sparse sticky bucket reaches
    # its steady level BEFORE any timing, then compile the decode at that
    # bucket (matches what a fixed bench should do)
    buckets = []
    for _ in range(6):
        refill()
        dec.parse_step()
        if sparse:
            buckets.append(int(dec._bucket_blocks()))
    p = dec.decode_step(fetch=False)
    jax.block_until_ready(p)

    wire_view = (dec.wire[:dec._lay["fixed"]
                          + dec._bucket_blocks() * M.SPARSE_BLOCK]
                 if sparse else dec.wire)
    wire_bytes = 2 * wire_view.size
    z1 = len(zlib.compress(wire_view.tobytes(), 1))

    # ---- blocked per-stage attribution
    t_parse = t_up = t_dec = t_drain = 0.0
    for _ in range(steps):
        refill()
        t0 = time.perf_counter()
        dec.parse_step()
        t_parse += time.perf_counter() - t0
        upload = (dec.wire[:dec._lay["fixed"]
                           + dec._bucket_blocks() * M.SPARSE_BLOCK]
                  if sparse else dec.wire)
        t0 = time.perf_counter()
        d = jax.device_put(upload)
        d.block_until_ready()
        t_up += time.perf_counter() - t0
        # decode from the already-uploaded buffer (device_put of an
        # on-device array is a no-op), isolating compute+re-densify
        if sparse:
            cap = dec._bucket_blocks()
            t0 = time.perf_counter()
            pcm, dec.state = M.decode_frame_sparse(
                d, dec.state, B=dec.n, F=1, cap_blocks=cap,
                exact=False, bug_compat=dec.bug_compat, kernel=kernel)
        else:
            t0 = time.perf_counter()
            pcm, dec.state = M.decode_frame_packed(
                d, dec.state, B=dec.n, F=1,
                exact=False, bug_compat=dec.bug_compat, kernel=kernel)
        jax.block_until_ready(pcm)
        t_dec += time.perf_counter() - t0
        if sparse:
            buckets.append(int(dec._bucket_blocks()))
        act, meta = dec.active.copy(), dec.meta.copy()
        dec._cur ^= 1
        dec._bind_views()
        dec.active[:] = act
        dec.meta[:] = meta
        if drain:
            t0 = time.perf_counter()
            np.asarray(pcm)
            t_drain += time.perf_counter() - t0

    # ---- unblocked pipelined e2e (the bench.py form)
    granules = 0
    last = None
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 6.0:
        refill()
        na = dec.parse_step()
        if na == 0:
            continue
        last = dec.decode_step(fetch=False)
        granules += 2 * na
    if last is not None:
        jax.block_until_ready(last)
    e2e_rtf = granules * 576 / 44100.0 / (time.perf_counter() - t0)

    g_per_step = 2 * B
    ms = lambda t: round(t / steps * 1000.0, 2)
    return {
        "wire": "sparse" if sparse else "dense",
        "kernel": kernel,
        "B": B,
        "steps": steps,
        "wire_bytes_per_step": wire_bytes,
        "wire_bytes_per_granule": round(wire_bytes / g_per_step, 1),
        "zlib1_bytes_per_step": z1,
        "zlib1_ratio": round(wire_bytes / max(z1, 1), 2),
        "parse_ms": ms(t_parse),
        "upload_ms": ms(t_up),
        "decode_ms": ms(t_dec),
        "drain_ms": ms(t_drain) if drain else None,
        "blocked_step_ms": ms(t_parse + t_up + t_dec
                              + (t_drain if drain else 0.0)),
        "pipelined_e2e_rtf": round(e2e_rtf, 1),
        "sparse_buckets": sorted(set(buckets)) if sparse else None,
    }


def ab_compare(streams, B: int, trials: int = 5, secs: float = 3.0):
    """Interleaved A/B e2e: the shared tunnel chip has huge run-to-run
    variance (round-2 measured the same code at 256x and 967x within one
    session), so dense-vs-sparse is only resolvable with alternating
    windows and per-config medians."""
    from pdmp3_tpu.runtime import SparseStreamDecoder, StreamDecoder

    configs = [("dense", "xla"), ("sparse", "xla"),
               ("dense", "pallas"), ("sparse", "pallas")]
    decs, poss, srcs = {}, {}, {}
    n_distinct = len(streams)
    for wire, kernel in configs:
        dec = (SparseStreamDecoder if wire == "sparse"
               else StreamDecoder)(B, exact=False, kernel=kernel)
        decs[(wire, kernel)] = dec
        srcs[(wire, kernel)] = [streams[i % n_distinct] for i in range(B)]
        poss[(wire, kernel)] = [0] * B

    def refill(key):
        dec, src, pos = decs[key], srcs[key], poss[key]
        for s in range(B):
            if pos[s] >= len(src[s]):
                pos[s] = 0
            if dec.inbuf_free(s) >= 4096:
                n = min(4096, len(src[s]) - pos[s])
                dec.feed(s, src[s][pos[s]:pos[s] + n])
                pos[s] += n

    # warm every config (compile + sticky bucket) before any timing
    for key in configs:
        for _ in range(4):
            refill(key)
            decs[key].parse_step()
        p = decs[key].decode_step(fetch=False)
        jax.block_until_ready(p)

    results = {key: [] for key in configs}
    for _ in range(trials):
        for key in configs:
            dec = decs[key]
            granules = 0
            last = None
            t0 = time.perf_counter()
            while time.perf_counter() - t0 < secs:
                refill(key)
                na = dec.parse_step()
                if na == 0:
                    continue
                last = dec.decode_step(fetch=False)
                granules += 2 * na
            if last is not None:
                jax.block_until_ready(last)
            rtf = granules * 576 / 44100.0 / (time.perf_counter() - t0)
            results[key].append(round(rtf, 1))
    meds = {f"{w}_{k}": float(np.median(v))
            for (w, k), v in results.items()}
    return {"trials": {f"{w}_{k}": v for (w, k), v in results.items()},
            "medians": meds}


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    mode = sys.argv[3] if len(sys.argv) > 3 else "stages"
    streams = corpus(128)

    out = {}
    if mode in ("stages", "both"):
        rows = []
        for sparse in (False, True):
            for kernel in ("xla", "pallas"):
                r = profile(streams, B, sparse, kernel, steps, drain=False)
                rows.append(r)
                print(json.dumps(r), flush=True)
        out["rows"] = rows
    if mode in ("ab", "both"):
        ab = ab_compare(streams, B)
        print(json.dumps(ab), flush=True)
        out["ab"] = ab
    out["note"] = ("blocked per-stage attribution + interleaved-A/B "
                   "pipelined e2e; this harness's TPU attaches via a "
                   "compressing network tunnel, so upload time tracks "
                   "zlib bytes, not raw wire bytes, and absolute e2e "
                   "numbers carry large shared-chip noise — only "
                   "within-run medians are meaningful")
    with open("WIRE_PROFILE_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote WIRE_PROFILE_r03.json")


if __name__ == "__main__":
    main()
