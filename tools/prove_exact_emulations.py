#!/usr/bin/env python3
"""Exhaustive proofs for the f32-only emulations of the exact path's
float64 rounding points (round-5 VERDICT item 2: fuse the exact mode
into one Pallas kernel — TPU has no f64, so the three places the
reference rounds through double must be reproduced with f32 ops).

The three points (all per-sample, all with a single f32 input):

  MS   y = fl32( f64(m) * C_INV_SQRT_2 )          pdmp3.c:1923-1925
  UQ   u = fl32( mod( trunc(f64(l)), 2**32 ) )    pdmp3.c:2212-2213
  QZ   t = trunc( f64(s) * 32767.0 ) with cvttsd2si
       out-of-int32 semantics                     pdmp3.c:2028-2031

Each emulation below is pure f32 (+ int32 bit ops) — the vocabulary
Mosaic lowers — and this script replays EVERY f32 bit pattern (2^32)
against the float64 formula, in numpy chunks.  Run once per change to
the constructions; the fast structured sweep (exponent x mantissa
boundaries + random fill) lives in tests/test_exact_emulations.py.

Writes EXACT_EMU_PROOF_r05.json with per-construction mismatch counts
(must be 0) and domain notes.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

F32 = np.float32
INV_SQRT2 = 0.70710678118654752440  # the reference's C_INV_SQRT_2 (f64)


# ---------------------------------------------------------------------------
# shared f32 building blocks (mirrors ops/dsp.py _vsplit/_two_prod)
# ---------------------------------------------------------------------------

def vsplit(a):
    bits = a.view(np.uint32)
    hi = (bits & np.uint32(0xFFFFF000)).view(F32)
    return hi, (a - hi).astype(F32)


def two_prod(a, b):
    p = (a * b).astype(F32)
    ah, al = vsplit(a)
    bh, bl = vsplit(b)
    e = (((ah * bh - p) + ah * bl + al * bh) + al * bl).astype(F32)
    return p, e


def two_sum(a, b):
    s = (a + b).astype(F32)
    bb = (s - a).astype(F32)
    e = ((a - (s - bb)) + (b - bb)).astype(F32)
    return s, e


# ---------------------------------------------------------------------------
# MS: y = fl32(f64(m) * INV_SQRT2)
#
# INV_SQRT2 splits exactly into three f32 terms c1+c2+c3.  The f32
# expansion p1+(e1+p2)+(p3+e2) reproduces the double-rounded result;
# the proof below replays all 2^32 inputs.
# ---------------------------------------------------------------------------

_C1 = F32(INV_SQRT2)
_C2 = F32(INV_SQRT2 - float(_C1))
_C3 = F32(INV_SQRT2 - float(_C1) - float(_C2))
assert float(_C1) + float(_C2) + float(_C3) == INV_SQRT2

_UP = F32(2.0 ** 80)      # lifts |m| in [2^-149, 2^-45) to normal range
_DOWN = F32(2.0 ** -80)
_TINY = F32(2.0 ** -45)   # below this, two_prod error terms go subnormal
_SUBR = F32(2.0 ** -125)  # below this, the RESULT is subnormal: integer path
_2P75 = F32(2.0 ** 75)    # 2^149 overflows f32: scale up in two steps
_2P74 = F32(2.0 ** 74)
_M2P149 = F32(2.0 ** -149)
_2P23M = F32(2.0 ** 23)  # magic add: rounds |x|<2^23 to int, ties-even


def _ms_core(m):
    """round24(round53(m * INV_SQRT2)) for m in the all-normal regime
    (|m| and the two_prod error terms comfortably normal)."""
    p1, e1 = two_prod(m, _C1)
    p2, e2 = two_prod(m, _C2)
    p3 = (m * _C3).astype(F32)
    lo = ((e1 + p2) + (p3 + e2)).astype(F32)
    return (p1 + lo).astype(F32)


def ms_emulated(m):
    """fl32(f64(m) * INV_SQRT2) in f32 ops, all 2^32 inputs.

    Three regimes, selected branchlessly:
      |m| >= 2^-45: the expansion core directly;
      2^-125 <= |m| < 2^-45: core on m * 2^80 (exact scale), result
        scaled back down — exact because the final value is normal;
      |m| < 2^-125 (subnormal RESULT): integer-domain rounding — the
        value k = m * 2^149 is an exact <=2^24 integer, the result is
        nearest-even-int(k * C) * 2^-149, and no k lands near enough a
        half-integer tie for the 53-bit intermediate rounding to
        matter (the sweep proves it).
    """
    tiny = np.abs(m) < _TINY
    sub = np.abs(m) < _SUBR
    # regime 1+2: scaled core
    mu = (m * np.where(tiny, _UP, F32(1.0))).astype(F32)
    y12 = (_ms_core(mu) * np.where(tiny, _DOWN, F32(1.0))).astype(F32)
    # regime 3: integer domain
    k = ((m * _2P75).astype(F32) * _2P74).astype(F32)  # exact integer
    p1, e1 = two_prod(k, _C1)
    p2, e2 = two_prod(k, _C2)
    p3 = (k * _C3).astype(F32)
    s, r = two_sum(p1, (p2 + (e1 + (p3 + e2))).astype(F32))
    # rint(s) ties-even via the magic-add trick on |s| (valid for
    # |s| < 2^23; above that s is already integer-valued, ulp >= 1)
    sgn = np.where(np.signbit(s), F32(-1.0), F32(1.0))
    sa = np.abs(s)
    ia = np.where(sa >= _2P23M, sa,
                  ((sa + _2P23M) - _2P23M).astype(F32))
    i = (sgn * ia).astype(F32)
    f = ((s - i) + r).astype(F32)                # residual, |f| <~ 0.5
    half = F32(0.5)
    i = (i + np.where(f > half, F32(1.0), F32(0.0))
         - np.where(f < -half, F32(1.0), F32(0.0))).astype(F32)
    # f == +-0.5 exactly: ties-even on the ADJUSTED integer
    at_tie = np.abs(f) == half
    odd = (np.abs(i) % F32(2.0)) == F32(1.0)
    i = (i + np.where(at_tie & odd & (f > 0), F32(1.0), F32(0.0))
         - np.where(at_tie & odd & (f < 0), F32(1.0), F32(0.0))).astype(F32)
    y3 = (i * _M2P149).astype(F32)
    y3 = np.where(np.signbit(m) & (y3 == 0), F32(-0.0), y3)
    y = np.where(sub, y3, y12)
    special = (m == 0) | np.isnan(m) | np.isinf(m)
    return np.where(special, (m * _C1).astype(F32), y).astype(F32)


def ms_reference(m):
    return (m.astype(np.float64) * INV_SQRT2).astype(F32)


# ---------------------------------------------------------------------------
# UQ: u = fl32(mod(trunc(f64(l)), 2^32))   (numpy/Python mod: result >= 0)
# ---------------------------------------------------------------------------

_2P32 = F32(2.0 ** 32)
_2P32_INV = F32(2.0 ** -32)


def uq_emulated(l):
    """fl32(mod(trunc(f64(l)), 2**32)) in f32 ops.

    trunc is exact in f32.  The reduction t - floor(t/2^32)*2^32 is
    exact whenever |t| >= 2^32 (the remainder needs <= 23 bits, see
    proof artifact); below that the wrap is a single two_sum head,
    which IS the correctly rounded f32 of the exact integer sum.
    NaN/inf propagate like the f64 path (mod -> NaN).
    """
    t = np.trunc(l).astype(F32)
    # reduce |t| below 2^32: k = floor(t * 2^-32) (exact: t*2^-32 is an
    # exact scale; floor of it is exact f32); r = t - k*2^32 exact
    k = np.floor((t * _2P32_INV).astype(F32)).astype(F32)
    km, ke = two_prod(k, _2P32)
    # r = t - k*2^32: with |r| < 2^32 and everything multiples of
    # ulp(t), the two-step subtract is exact (ke is 0 here: k*2^32 is
    # an exact product — k has <= 24 bits, scaling by 2^32 exact)
    r = ((t - km) - ke).astype(F32)
    # numpy floor-mod already lands in [0, 2^32) except the r == 2^32
    # edge cannot happen (floor) — but r can be 0 with sign -0.0: the
    # f64 path yields +0.0; normalize
    r = r + F32(0.0)
    # inf: f64 mod(inf) = nan
    r = np.where(np.isinf(l), F32(np.nan), r)
    return r


def uq_reference(l):
    with np.errstate(invalid="ignore"):
        t = np.trunc(l.astype(np.float64))
        return np.mod(t, 2.0 ** 32).astype(F32)


# ---------------------------------------------------------------------------
# QZ: t = trunc(f64(s) * 32767.0); oob = isnan(scaled) | t out of int32;
#     q = where(oob, -32767, clip(t, -32767, 32767))  — emitted as the
#     final f32 quantized value (the caller casts to int16 after)
# ---------------------------------------------------------------------------

_SCALE = F32(32767.0)
_2P23 = F32(2.0 ** 23)
_2P31 = F32(2.0 ** 31)


def qz_emulated(s):
    """The f64 quantize point in f32 ops.

    s*32767 is EXACT in f64 (24+15 = 39 bits), so there is no double
    rounding — only exact truncation of the two_prod pair and the
    cvttsd2si out-of-range check.  Returns the clipped float value in
    [-32767, 32767] (integer-valued)."""
    p, e = two_prod(s, _SCALE)
    pa = np.abs(p)
    sgn = np.where(np.signbit(p), F32(-1.0), F32(1.0))
    ea = (e * sgn).astype(F32)           # error of |product|
    # |product| < 2^23: exact floor of pa + ea
    t_head = np.floor(pa).astype(F32)
    frac = (pa - t_head).astype(F32)     # exact
    borrow = ((frac == 0) & (ea < 0)).astype(F32)
    small = (t_head - borrow).astype(F32)
    # 2^23 <= |product|: result clips to 32767 unless out of int32
    # range.  pa is integer-valued and a multiple of ulp >= 1; the
    # int32 boundary check needs pa vs 2^31 with the error's sign:
    #   positive: trunc fits iff product < 2^31
    #   negative: trunc fits iff |product| < 2^31 + 1
    pos = ~np.signbit(p)
    oob = np.where(
        pos,
        (pa > _2P31) | ((pa == _2P31) & (ea >= 0)),
        (pa > _2P31) | ((pa == _2P31) & (ea >= 1)))
    mag = np.where(pa < _2P23, small, F32(2.0 ** 23))  # big => clips anyway
    val = np.clip(sgn * mag, F32(-32767.0), F32(32767.0)).astype(F32)
    bad = np.isnan(s) | oob
    return np.where(bad, F32(-32767.0), val).astype(F32)


def qz_reference(s):
    with np.errstate(invalid="ignore"):
        scaled = s.astype(np.float64) * 32767.0
        t = np.trunc(scaled)
        oob = np.isnan(scaled) | (t < -2147483648.0) | (t > 2147483647.0)
        q = np.where(oob, np.float64(-32767.0),
                     np.clip(t, -32767.0, 32767.0))
        return q.astype(F32)


# ---------------------------------------------------------------------------
# exhaustive driver
# ---------------------------------------------------------------------------

def sweep(name, emu, ref, chunk_bits=24):
    n_chunks = 1 << (32 - chunk_bits)
    chunk = 1 << chunk_bits
    bad_total = 0
    first_bad = None
    t0 = time.time()
    for c in range(n_chunks):
        base = np.uint32(c * chunk)
        bits = (np.arange(chunk, dtype=np.uint32) + base)
        x = bits.view(F32)
        a = emu(x.copy())
        b = ref(x.copy())
        # NaN payloads: compare as "both NaN" equivalence
        eq = (a.view(np.uint32) == b.view(np.uint32)) | \
             (np.isnan(a) & np.isnan(b))
        bad = np.nonzero(~eq)[0]
        if bad.size:
            bad_total += int(bad.size)
            if first_bad is None:
                i = int(bad[0])
                first_bad = {
                    "input_bits": hex(int(bits[i])),
                    "input": float(x[i]),
                    "emulated": float(a[i]),
                    "reference": float(b[i]),
                }
        if c % 32 == 31:
            print(f"  {name}: {c+1}/{n_chunks} chunks, bad={bad_total}",
                  flush=True)
    dt = time.time() - t0
    print(f"{name}: {bad_total} mismatches over 2^32 inputs ({dt:.0f}s)",
          flush=True)
    return {"construction": name, "inputs": 2 ** 32,
            "mismatches": bad_total, "first_bad": first_bad,
            "elapsed_s": round(dt, 1)}


def main():
    results = [
        sweep("ms_inv_sqrt2", ms_emulated, ms_reference),
        sweep("unsigned_quirk_mod32", uq_emulated, uq_reference),
        sweep("quantize_trunc_f64", qz_emulated, qz_reference),
    ]
    out = os.path.join(REPO, "EXACT_EMU_PROOF_r05.json")
    with open(out, "w") as f:
        json.dump({"note": "f32-only emulations of the exact path's "
                           "float64 rounding points, replayed against "
                           "the f64 formulas over every f32 bit "
                           "pattern", "results": results}, f, indent=1)
    print("wrote", out)
    sys.exit(1 if any(r["mismatches"] for r in results) else 0)


if __name__ == "__main__":
    main()
