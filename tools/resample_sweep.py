#!/usr/bin/env python3
"""Resampler quality sweep artifact (round-3 VERDICT #7).

Measures, for every (from_rate -> to_rate) pair the serving layer
offers, the streaming polyphase resampler's

- passband SNR against the ideal delayed sine at a low probe (1 kHz)
  and a high probe (0.35 x the narrower Nyquist) — the β=9 Kaiser
  prototype designs ~90 dB stopband attenuation; the test bar in
  tests/test_resample.py (>= 85 dB) is backed by this artifact;
- passband ripple: per-tone RMS gain deviation across a 10-tone comb
  spanning 0.04..0.40 of the narrower sample rate.

Writes RESAMPLE_SWEEP_r04.json at the repo root.

Usage: python tools/resample_sweep.py [--out PATH]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from pdmp3_tpu.ops.resample import StreamResampler  # noqa: E402

#: decoder rates (MPEG-1 + LSF) x common serving targets
PAIRS = sorted({(f, t)
                for f in (8000, 11025, 12000, 16000, 22050, 24000,
                          32000, 44100, 48000)
                for t in (44100, 48000) if f != t})


def _resample(from_rate, to_rate, x):
    rs = StreamResampler(from_rate, to_rate, 1, 1, dtype=jnp.float32)
    blk = 1152
    n = (x.shape[0] // blk) * blk
    return np.concatenate(
        [np.asarray(rs(jnp.asarray(x[None, i:i + blk, None])))
         for i in range(0, n, blk)], axis=1)[0, :, 0]


def _delay(from_rate, to_rate):
    up = to_rate // math.gcd(from_rate, to_rate)
    return (up * 24 - 1) / (2 * up * from_rate)


def probe_snr(from_rate, to_rate, freq, seconds=0.6) -> float:
    t = np.arange(int(from_rate * seconds) // 1152 * 1152 + 1152 * 4) \
        / from_rate
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = _resample(from_rate, to_rate, x)
    t2 = np.arange(len(y)) / to_rate
    ref = np.sin(2 * np.pi * freq * (t2 - _delay(from_rate, to_rate)))
    seg = slice(2000, len(y) - 2000)
    err = y[seg] - ref[seg]
    return float(10 * np.log10(np.mean(ref[seg] ** 2) / np.mean(err ** 2)))


def passband_ripple_db(from_rate, to_rate) -> float:
    """Max |gain| deviation (dB) over a 10-tone comb in the passband."""
    lo_rate = min(from_rate, to_rate)
    gains = []
    for frac in np.linspace(0.04, 0.40, 10):
        freq = frac * lo_rate
        t = np.arange(1152 * 16) / from_rate
        x = np.sin(2 * np.pi * freq * t).astype(np.float32)
        y = _resample(from_rate, to_rate, x)
        seg = y[2000:-2000]
        gains.append(np.sqrt(2.0) * np.sqrt(np.mean(seg ** 2)))
    g = np.asarray(gains)
    return float(np.max(np.abs(20 * np.log10(g))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RESAMPLE_SWEEP_r04.json"))
    args = ap.parse_args()
    rows = []
    for f, t in PAIRS:
        hi = 0.35 * min(f, t)
        row = {
            "from": f, "to": t,
            "snr_1k_db": round(probe_snr(f, t, 1000.0), 1),
            "snr_hi_db": round(probe_snr(f, t, hi), 1),
            "hi_probe_hz": round(hi, 1),
            "ripple_db": round(passband_ripple_db(f, t), 4),
        }
        rows.append(row)
        print(row, flush=True)
    worst_snr = min(min(r["snr_1k_db"], r["snr_hi_db"]) for r in rows)
    worst_ripple = max(r["ripple_db"] for r in rows)
    summary = {
        "design": "Kaiser beta=9, 24 taps/phase (~90 dB stopband)",
        "pairs": rows,
        "worst_snr_db": worst_snr,
        "worst_ripple_db": worst_ripple,
        "test_bar_db": 85,
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({"worst_snr_db": worst_snr,
                      "worst_ripple_db": worst_ripple,
                      "pairs": len(rows)}))


if __name__ == "__main__":
    main()
