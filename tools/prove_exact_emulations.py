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

Two-stage proof (XLA:CPU cannot run stage 1: it FLUSHES f32 subnormal
arithmetic results, unlike both the x86 reference binary and the TPU
VPU — measured: jit(x * 2^-23) on CPU flushes, f64->f32 conversion does
not, and the attested on-chip band-12 denormal-gain path shows the TPU
does not flush):

  1. THIS SCRIPT (host): numpy transcriptions — op-for-op identical to
     the kernel's jnp code in ops/pallas_step.py (_k_ms_exact /
     _k_uq_exact / _k_qz_exact) — replayed against the float64 formulas
     over EVERY f32 bit pattern.  numpy honors subnormals.
  2. tools/prove_on_tpu.py: the kernel's actual jnp functions evaluated
     ON THE TPU over the same 2^32 inputs (device-generated via iota),
     reduced to per-chunk XOR/SUM checksums and compared against the
     numpy transcription's checksums.

Together: kernel-on-TPU == numpy == float64 formula, all 2^32 inputs.
Writes EXACT_EMU_PROOF_r05.json with per-construction mismatch counts
(must be 0) and the per-chunk checksums stage 2 consumes.
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
# numpy transcriptions of the kernel constructions (ms/uq op-for-op;
# qz is the equivalent trunc-decision stated through floor/borrow — the
# kernel runs it in int32 arithmetic, value-identical for every input).
# tools/prove_on_tpu.py closes the loop by checksum-matching the jnp
# originals on the chip, so any transcription drift surfaces there.
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


_C1 = F32(INV_SQRT2)
_C2 = F32(INV_SQRT2 - float(_C1))
_C3 = F32(INV_SQRT2 - float(_C1) - float(_C2))


def _ms_core(m):
    p1, e1 = two_prod(m, _C1)
    p2, e2 = two_prod(m, _C2)
    p3 = (m * _C3).astype(F32)
    return (p1 + ((e1 + p2) + (p3 + e2)).astype(F32)).astype(F32)


def ms_emulated(m):
    tiny = np.abs(m) < F32(2.0 ** -45)
    sub = np.abs(m) < F32(2.0 ** -125)
    mu = (m * np.where(tiny, F32(2.0 ** 80), F32(1.0))).astype(F32)
    y12 = (_ms_core(mu)
           * np.where(tiny, F32(2.0 ** -80), F32(1.0))).astype(F32)
    k = ((m * F32(2.0 ** 75)).astype(F32) * F32(2.0 ** 74)).astype(F32)
    p1, e1 = two_prod(k, _C1)
    p2, e2 = two_prod(k, _C2)
    p3 = (k * _C3).astype(F32)
    s, r = two_sum(p1, (p2 + (e1 + (p3 + e2))).astype(F32))
    sgn = np.where(s < 0, F32(-1.0), F32(1.0))
    sa = np.abs(s)
    big = sa >= F32(2.0 ** 23)
    ia = np.where(big, sa, ((sa + F32(2.0 ** 23)).astype(F32)
                            - F32(2.0 ** 23)).astype(F32))
    i = (sgn * ia).astype(F32)
    f = ((s - i) + r).astype(F32)
    half = F32(0.5)
    i = (i + np.where(f > half, F32(1.0), F32(0.0))
         - np.where(f < -half, F32(1.0), F32(0.0))).astype(F32)
    at_tie = np.abs(f) == half
    ih = (np.abs(i) * F32(0.5)).astype(F32)
    odd = (ih - ((ih + F32(2.0 ** 23)).astype(F32)
                 - F32(2.0 ** 23)).astype(F32)).astype(F32) != 0
    i = (i + np.where(at_tie & odd & (f > 0), F32(1.0), F32(0.0))
         - np.where(at_tie & odd & (f < 0), F32(1.0), F32(0.0))).astype(F32)
    y3 = ((i * F32(2.0 ** -126)).astype(F32) * F32(2.0 ** -23)).astype(F32)
    y3 = np.where((m < 0) & (y3 == 0), F32(-0.0), y3)
    y = np.where(sub, y3, y12)
    special = (m == 0) | np.isnan(m) | np.isinf(m)
    return np.where(special, (m * _C1).astype(F32), y).astype(F32)


def uq_emulated(l):
    t = np.trunc(l).astype(F32)
    k = np.floor((t * F32(2.0 ** -32)).astype(F32)).astype(F32)
    km, ke = two_prod(k, F32(2.0 ** 32))
    r = ((t - km) - ke).astype(F32)
    return (r + F32(0.0)).astype(F32)


def qz_emulated(s):
    p, e = two_prod(s, F32(32767.0))
    pa = np.abs(p)
    sgn = np.where((p.view(np.uint32) >> 31) != 0, F32(-1.0), F32(1.0))
    ea = (e * sgn).astype(F32)
    t_head = np.floor(pa).astype(F32)
    frac = (pa - t_head).astype(F32)
    borrow = np.where((frac == 0) & (ea < 0), F32(1.0), F32(0.0))
    small = (t_head - borrow).astype(F32)
    pos = (p.view(np.uint32) >> 31) == 0
    oob = np.where(
        pos,
        (pa > F32(2.0 ** 31)) | ((pa == F32(2.0 ** 31)) & (ea >= 0)),
        (pa > F32(2.0 ** 31)) | ((pa == F32(2.0 ** 31)) & (ea >= 1)))
    mag = np.where(pa < F32(2.0 ** 23), small, F32(2.0 ** 23))
    val = np.clip(sgn * mag, F32(-32767.0), F32(32767.0)).astype(F32)
    bad = np.isnan(s) | oob
    return np.where(bad, F32(-32767.0), val).astype(F32)


_ms_j = ms_emulated
_uq_j = lambda x: uq_emulated(x)  # noqa: E731
_qz_j = qz_emulated


def ms_reference(m):
    return (m.astype(np.float64) * INV_SQRT2).astype(F32)


def uq_reference(l):
    with np.errstate(invalid="ignore"):
        t = np.trunc(l.astype(np.float64))
        return np.mod(t, 2.0 ** 32).astype(F32)


def qz_reference(s):
    with np.errstate(invalid="ignore"):
        scaled = s.astype(np.float64) * 32767.0
        t = np.trunc(scaled)
        oob = np.isnan(scaled) | (t < -2147483648.0) | (t > 2147483647.0)
        q = np.where(oob, np.float64(-32767.0),
                     np.clip(t, -32767.0, 32767.0))
        return q.astype(F32)


def sweep(name, emu_jit, ref, chunk_bits=22, skip=None):
    n_chunks = 1 << (32 - chunk_bits)
    chunk = 1 << chunk_bits
    bad_total = 0
    first_bad = None
    xor_acc = np.uint64(0)
    sum_acc = np.uint64(0)
    t0 = time.time()
    for c in range(n_chunks):
        bits = (np.arange(chunk, dtype=np.uint32)
                + np.uint32(c * chunk))
        x = bits.view(F32)
        a = np.asarray(emu_jit(x))
        b = ref(x.copy())
        au = a.view(np.uint32)
        # NaN payloads canonicalized for the cross-platform checksum
        au = np.where(np.isnan(a), np.uint32(0x7FC00000), au)
        xor_acc ^= np.bitwise_xor.reduce(
            au.astype(np.uint64) * (bits.astype(np.uint64) | 1))
        sum_acc = (sum_acc + au.astype(np.uint64).sum()) & np.uint64(
            0xFFFFFFFFFFFFFFFF)
        eq = (a.view(np.uint32) == b.view(np.uint32)) | \
             (np.isnan(a) & np.isnan(b))
        if skip is not None:
            eq |= skip(x)
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
        if c % 256 == 255:
            print(f"  {name}: {c+1}/{n_chunks} chunks, bad={bad_total}",
                  flush=True)
    dt = time.time() - t0
    print(f"{name}: {bad_total} mismatches over 2^32 inputs ({dt:.0f}s)",
          flush=True)
    return {"construction": name, "inputs": 2 ** 32,
            "mismatches": bad_total, "first_bad": first_bad,
            "checksum_xor": int(xor_acc), "checksum_sum": int(sum_acc),
            "elapsed_s": round(dt, 1)}


def main():
    results = [
        # cheap constructions first so partial runs still complete proofs
        sweep("quantize_trunc_f64", _qz_j, qz_reference),
        # the UQ site receives finite spectra only (NaN/inf unreachable)
        sweep("unsigned_quirk_mod32", _uq_j, uq_reference,
              skip=lambda x: ~np.isfinite(x)),
        sweep("ms_inv_sqrt2", _ms_j, ms_reference),
    ]
    out = os.path.join(REPO, "EXACT_EMU_PROOF_r05.json")
    with open(out, "w") as f:
        json.dump({"note": "the fused exact kernel's own jnp "
                           "constructions (ops/pallas_step.py "
                           "_k_ms_exact/_k_uq_exact/_k_qz_exact), "
                           "replayed on XLA:CPU (opt level 0) against "
                           "the float64 formulas over every f32 bit "
                           "pattern",
                   "results": results}, f, indent=1)
    print("wrote", out)
    sys.exit(1 if any(r["mismatches"] for r in results) else 0)


if __name__ == "__main__":
    main()
