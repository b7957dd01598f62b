#!/usr/bin/env python3
"""On-hardware serving differential: N distinct randomized streams
through the REAL serving decoder (SparseStreamDecoder, fused Pallas
kernel, sparse count1-bounded wire) on the attached TPU, diffed against
the reference C binary per stream.

This is the serving-shaped counterpart of the CPU soak: it exercises the
native threaded parse -> line-ordered sparse wire -> device re-densify ->
fused kernel -> PCM drain pipeline end-to-end on the chip, in both
precision modes (exact must be bit-identical; fast within ±1 LSB on
<1% of samples).  Writes TPU_DIFF_r02.json.

    python tools/tpu_serving_diff.py --streams 64
"""
from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_streams(n: int, seed_base: int):
    from pdmp3_tpu.testing import mp3gen

    rng = random.Random(seed_base)
    streams = []
    tries = 0
    while len(streams) < n and tries < n * 20:
        tries += 1
        # 32 kHz @ 320 kbps is excluded: its 1440-byte frames exceed the
        # reference's 1152-byte read gate (pdmp3.c:2445), so the
        # reference CLI decodes some frames from a partially-filled
        # buffer (stale reservoir bytes, Get_Bytes EOF semantics) and
        # its output near those points depends on the FEED CADENCE.
        # Parity for that regime is covered by native_decode_file, which
        # replays the CLI cadence bit-exactly (tools/soak.py); a serving
        # decoder with its own cadence legitimately differs there.
        sfreq = rng.randrange(3)
        cfg = dict(
            n_frames=rng.randrange(8, 24),
            sfreq=sfreq,
            bitrate_index=rng.choice([5, 9, 11]
                                     if sfreq == 2 else [5, 9, 11, 14]),
            mode=rng.choice([0, 1, 1, 2, 3]),
            blocks=rng.choice(["long", "short", "mixed", "varied"]),
            use_reservoir=rng.random() < 0.5,
            scfsi=rng.random() < 0.4,
            seed=seed_base + 1000 + tries,
        )
        if cfg["mode"] == 1:
            cfg["mode_extension"] = rng.randrange(4)
        try:
            streams.append(mp3gen.make_stream(**cfg))
        except AssertionError:
            continue  # generator-infeasible config (same as tools/soak.py)
    assert len(streams) == n
    return streams


def golden(streams):
    from pdmp3_tpu.testing.golden import ensure_reference_binary

    ref = ensure_reference_binary()
    out = []
    with tempfile.TemporaryDirectory() as td:
        for i, s in enumerate(streams):
            p = os.path.join(td, f"s{i}.mp3")
            with open(p, "wb") as f:
                f.write(s)
            subprocess.run([ref, p], cwd=td, check=True,
                           capture_output=True)
            with open(p + ".raw", "rb") as f:
                out.append(f.read())
    return out


def serve(streams, exact: bool):
    import jax
    from pdmp3_tpu.runtime import SparseStreamDecoder

    if exact:
        jax.config.update("jax_enable_x64", True)
    dec = SparseStreamDecoder(len(streams), exact=exact, kernel="pallas")
    got = [bytearray() for _ in streams]
    pos = [0] * len(streams)
    for _ in range(600):
        # streams can exceed the 16 KiB ring and feed is all-or-nothing
        # (reference semantics) — drip like a real serving frontend
        for i, s in enumerate(streams):
            free = dec.inbuf_free(i) - 1
            if pos[i] < len(s) and free >= 2048:
                chunk = s[pos[i]:pos[i] + min(free, 4096)]
                if dec.feed(i, chunk) == 0:
                    pos[i] += len(chunk)
        if dec.parse_step() == 0:
            if all(p >= len(s) for p, s in zip(pos, streams)):
                break
            continue
        active = dec.active.copy()
        pcm = dec.decode_step()
        for i in range(len(streams)):
            if active[i]:
                got[i] += np.asarray(pcm[i]).tobytes()
    nch = [dec.nch(i) for i in range(len(streams))]
    return got, nch, jax.default_backend()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--seed-base", type=int, default=300000)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "TPU_DIFF_r02.json"))
    args = ap.parse_args()

    streams = make_streams(args.streams, args.seed_base)
    want = golden(streams)
    t0 = time.time()
    res = {"streams": args.streams, "seed_base": args.seed_base}
    for exact in (False, True):
        got, nch, backend = serve(streams, exact)
        worst_lsb, worst_rate, n_bitexact = 0, 0.0, 0
        for g, w, c in zip(got, want, nch):
            a = np.frombuffer(bytes(g), "<i2")
            if c == 1:
                # the batched PCM contract duplicates mono into stereo
                # (pdmp3.c:2035); the reference's raw file is 1-channel
                a = np.ascontiguousarray(a.reshape(-1, 2)[:, 0])
            b = np.frombuffer(w, "<i2")
            n = min(len(a), len(b))
            assert n > 0 and abs(len(a) - len(b)) <= 3 * 1152 * 2, \
                (len(a), len(b), c)
            a = a[:n].astype(np.int32)
            b = b[:n].astype(np.int32)
            d = np.abs(a - b)
            worst_lsb = max(worst_lsb, int(d.max()))
            worst_rate = max(worst_rate, float((d != 0).mean()))
            n_bitexact += int(d.max() == 0)
        mode = "exact" if exact else "fast"
        res[mode] = {"worst_lsb": worst_lsb,
                     "worst_diff_rate": round(worst_rate, 6),
                     "streams_bitexact": n_bitexact}
        res["backend"] = backend
        if exact:
            assert worst_lsb == 0, "exact mode must be bit-identical"
        else:
            assert worst_lsb <= 1 and worst_rate < 0.01
    res["seconds"] = round(time.time() - t0, 1)
    res["note"] = ("randomized streams through the real serving pipeline "
                   "(threaded native parse, line-ordered sparse wire, "
                   "fused Pallas kernel) on the attached device, diffed "
                   "per stream against the reference C binary")
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
