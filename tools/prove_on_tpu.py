#!/usr/bin/env python3
"""Stage 2 of the exact-emulation proof (see prove_exact_emulations.py):
run the fused exact kernel's f32 constructions (_k_ms_exact /
_k_uq_exact / _k_qz_exact) INSIDE a Pallas kernel on the real TPU over
EVERY f32 bit pattern, and checksum-compare each 2^24 chunk against the
host numpy transcription (which stage 1 proves equal to the float64
formulas).

Domain scoping: the TPU FLUSHES f32 subnormals — both as inputs (DAZ)
and as arithmetic results (FTZ), in Mosaic and XLA:TPU alike (measured:
an in-kernel x*2^75 of a subnormal and an x*2^-23 producing a subnormal
both return 0).  Both the fused kernel AND the split XLA path flush
identically (their bitwise equality is attested on-chip by
tests/test_tpu_conformance and the fused-vs-split matrix), and the
flushed magnitudes are ~2^-126 — dozens of orders below the S16
quantization step, which is why the serving output remains bit-exact
vs the x86 reference binary.  The sweep therefore masks lanes in each
construction's flush domain (recorded per construction below); the
constructions' correctness WHERE SUBNORMALS EXIST is stage 1's job.

Inputs are generated on-device (iota -> bitcast), outputs reduced
on-device to two int32 checksums (order-mixing xor + wrapping sum) over
the unmasked lanes, so the tunnel moves ~8 bytes per chunk.

Writes EXACT_EMU_PROOF_TPU_r05.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from pdmp3_tpu.ops import pallas_step as PS  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tools"))
import prove_exact_emulations as HOST  # noqa: E402

CHUNK_BITS = 24
CHUNK = 1 << CHUNK_BITS
N_CHUNKS = 1 << (32 - CHUNK_BITS)
# PROVE_TPU_STRIDE=N sweeps chunk 0 (the subnormal/flush boundary) plus
# every Nth chunk — a documented density knob for time-boxed runs (the
# HOST stage is always exhaustive; this stage checks Mosaic lowering
# fidelity, which is structural, not value-dependent)
STRIDE = int(os.environ.get("PROVE_TPU_STRIDE", "1"))
ROWS = CHUNK // 128
BLOCK_ROWS = 1024
_MIX = np.int32(np.uint32(2654435761).view(np.int32))

# per-construction flush-domain masks (True = EXCLUDE the lane):
#   ms: |m| < 2^-125 -> the integer-domain regime's subnormal result
#       flushes (and subnormal inputs are DAZ'd); above it every
#       intermediate and the result are normal.
#   uq: trunc outputs are integers (never subnormal); inf/NaN cannot
#       reach the site (spectra are finite) and subnormal inputs
#       trunc to +-0 identically -> no mask beyond non-finite.
#   qz: |s| < 2^-126 (subnormal s is DAZ'd in the first multiply; the
#       f64 path truncates those to 0 as well, but the Dekker error
#       path differs under DAZ).
def _np_mask(x, skip, nonfinite):
    m = np.zeros(x.shape, bool)
    if skip is not None:
        m |= skip(np.abs(x))
    if nonfinite:
        m |= ~np.isfinite(x)
    return m


def _checksum_np(out_bits, bits, mask):
    au = out_bits.view(np.int32).copy()
    mixed = au ^ (bits.view(np.int32) * _MIX)
    mixed[mask] = 0
    return (int(np.bitwise_xor.reduce(mixed)),
            int(np.add.reduce(mixed.view(np.uint32),
                              dtype=np.int64) & 0xFFFFFFFF))


def _device_fn(fn, skip_thresh, nonfinite):
    def kern(x_ref, o_ref):
        o_ref[...] = fn(x_ref[...])

    @jax.jit
    def run(base):
        iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128 \
            + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1) + base
        x = jax.lax.bitcast_convert_type(iota, jnp.float32)
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kern,
                grid=(ROWS // BLOCK_ROWS,),
                in_specs=[pl.BlockSpec((BLOCK_ROWS, 128),
                                       lambda i: (i, 0))],
                out_specs=pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
            )(x)
        ob = jax.lax.bitcast_convert_type(out, jnp.int32)
        ob = jnp.where(jnp.isnan(out), jnp.int32(0x7FC00000), ob)
        mixed = ob ^ (iota * _MIX)
        mask = jnp.zeros(x.shape, bool)
        if skip_thresh is not None:
            mask |= jnp.abs(x) < jnp.float32(skip_thresh)
        if nonfinite:
            mask |= ~jnp.isfinite(x)
        mixed = jnp.where(mask, jnp.int32(0), mixed)
        return (jax.lax.reduce(mixed, jnp.int32(0),
                               jax.lax.bitwise_xor, (0, 1)),
                jnp.sum(mixed.astype(jnp.uint32), dtype=jnp.uint32))
    return run


CONSTRUCTIONS = [
    ("ms_inv_sqrt2", PS._k_ms_exact, HOST.ms_emulated,
     2.0 ** -125, False),
    ("unsigned_quirk_mod32",
     lambda v: PS._k_uq_exact(jnp.trunc(v)),
     lambda v: HOST.uq_emulated(v), None, True),
    ("quantize_trunc_f64", PS._k_qz_exact, HOST.qz_emulated,
     2.0 ** -126, False),
]


def main():
    only = os.environ.get("PROVE_TPU_ONLY")
    results = []
    for name, dev, host, thresh, nonfin in CONSTRUCTIONS:
        if only and only not in name:
            continue
        run = _device_fn(dev, thresh, nonfin)
        skip = (lambda ax, t=thresh: ax < np.float32(t)) \
            if thresh is not None else None
        bad_chunks = []
        t0 = time.time()
        chunks = [c for c in range(N_CHUNKS) if c == 0 or c % STRIDE == 0]
        for c in chunks:
            base = np.int32(np.uint32(c * CHUNK).view(np.int32))
            dx, ds = run(base)
            bits = (np.arange(CHUNK, dtype=np.uint32)
                    + np.uint32(c * CHUNK))
            x = bits.view(np.float32)
            hout = host(x.copy())
            hb = hout.view(np.uint32)
            hb = np.where(np.isnan(hout), np.uint32(0x7FC00000),
                          hb).view(np.int32)
            mask = _np_mask(x, skip, nonfin)
            hx, hs = _checksum_np(hb, bits, mask)
            ok = (int(np.int32(dx)) == hx
                  and int(np.uint32(ds)) == (hs & 0xFFFFFFFF))
            if not ok:
                bad_chunks.append(c)
                print(f"{name}: chunk {c} MISMATCH", flush=True)
            if c % (16 * STRIDE) == 0:
                print(f"  {name}: chunk {c}/{N_CHUNKS}, "
                      f"bad={len(bad_chunks)}", flush=True)
        dt = time.time() - t0
        print(f"{name}: {len(bad_chunks)} bad chunks of "
              f"{len(chunks)} swept ({dt:.0f}s)", flush=True)
        results.append({"construction": name,
                        "chunks_swept": len(chunks),
                        "chunks_total": N_CHUNKS,
                        "stride": STRIDE,
                        "inputs_swept": len(chunks) * CHUNK,
                        "excluded": ("|x| < 2^-125 (TPU DAZ/FTZ flush "
                                     "domain)" if name == "ms_inv_sqrt2"
                                     else "|x| < 2^-126 (DAZ)"
                                     if name == "quantize_trunc_f64"
                                     else "non-finite (site unreachable)"),
                        "bad_chunks": bad_chunks,
                        "elapsed_s": round(dt, 1)})
    out = os.path.join(REPO, "EXACT_EMU_PROOF_TPU_r05.json")
    if only and os.path.exists(out):
        prev = json.load(open(out))["results"]
        keep = [r for r in prev
                if all(r["construction"] != n["construction"]
                       for n in results)]
        results = keep + results
    with open(out, "w") as f:
        json.dump({"note": "Mosaic-compiled kernel constructions vs the "
                           "host numpy transcriptions, checksum-compared "
                           "per 2^24-input chunk over every f32 bit "
                           "pattern outside the TPU's subnormal flush "
                           "domain (the TPU flushes subnormal inputs "
                           "AND results; both exact paths flush "
                           "identically and the magnitudes are ~2^-126, "
                           "far below the S16 quantization step)",
                   "device": str(jax.devices()[0]),
                   "results": results}, f, indent=1)
    print("wrote", out)
    sys.exit(1 if any(r["bad_chunks"] for r in results) else 0)


if __name__ == "__main__":
    main()
