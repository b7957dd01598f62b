#!/usr/bin/env python3
"""Large-scale differential soak: thousands of randomized format-matrix
streams, each decoded by the reference C binary, the native C++ decoder,
and the Python/NumPy oracle — all three must agree bit-for-bit (or, for
streams that drive the reference into its is[]-overflow UB regime, hold
the bit-exact-prefix contract up to the first OOB frame; see
tests/test_fuzz_differential.py's module docstring for the mechanism).

Seed ranges are resumable and the summary artifact is cumulative: each
run merges its range into --out (default SOAK_r02.json), so a soak can
be split across sessions:

    python tools/soak.py --start 0 --count 2000
    python tools/soak.py --start 2000 --count 8000     # later

Seed bases match the round-1 soak convention (config RNG 200000+i,
stream seed 201000+i) so any failure here reproduces directly as a
`_SOAK_SEEDS` regression entry in tests/test_fuzz_differential.py.
Every 64th stream additionally runs through the batched JAX exact path
(CPU) as a fourth implementation.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Env vars alone are NOT enough here: the axon sitecustomize imports jax
# at interpreter startup (before this module runs), freezing the config
# with x64 off and the tunnel-TPU platform registered.  Exact mode needs
# x64 (f64 rounding points) and the soak belongs on CPU (deterministic,
# leaves the chip to the bench), so pin via jax.config, which wins.
flags = os.environ.get("XLA_FLAGS", "")
if "backend_optimization_level" not in flags:
    # XLA:CPU FMA contraction breaks scalar-exact bit parity (conftest)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_backend_optimization_level=0").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
if jax.default_backend() != "cpu":  # backend already initialized on axon
    from jax._src.api import clear_backends
    clear_backends()

CFG_BASE = 200000
STREAM_BASE = 201000


def random_config(rng: random.Random) -> dict:
    """Format-matrix sampler (mirrors tests/test_fuzz_differential.py)."""
    mode = rng.choice([0, 1, 1, 2, 3])
    cfg = dict(
        n_frames=rng.randrange(4, 10),
        sfreq=rng.randrange(3),
        bitrate_index=rng.choice([5, 9, 11, 14]),
        mode=mode,
        blocks=rng.choice(["long", "short", "mixed", "varied"]),
        use_reservoir=rng.random() < 0.5,
        protection=rng.random() < 0.3,
        vary_padding=rng.random() < 0.5,
        stuffing=rng.choice([0, 0, 3, 8]),
        scfsi=rng.random() < 0.4,
        amp=rng.choice([3, 6, 20, 3000]),
        leading_garbage=rng.choice([0, 0, 0, 111]),
    )
    if mode == 1:
        ext = rng.randrange(1, 4)
        cfg["mode_extension"] = ext
        if ext & 1:
            cfg["intensity_pos"] = True
            cfg["stereo_extent_ch1"] = rng.uniform(0.2, 0.8)
    return cfg


def random_lsf_config(rng: random.Random) -> dict:
    """LSF format-matrix sampler (families 1/2; 13818-3 fields)."""
    mode = rng.choice([0, 1, 1, 3])
    cfg = dict(
        family=rng.choice([1, 2]),
        n_frames=rng.randrange(5, 12),
        sfreq=rng.randrange(3),
        bitrate_index=rng.choice([5, 9, 11, 14]),
        mode=mode,
        blocks=rng.choice(["long", "short", "mixed", "varied"]),
        use_reservoir=rng.random() < 0.5,
        protection=rng.random() < 0.3,
        vary_padding=rng.random() < 0.5,
        stuffing=rng.choice([0, 0, 3, 8]),
        amp=rng.choice([3, 6, 20, 3000]),
    )
    if mode == 1:
        cfg["mode_extension"] = rng.randrange(1, 4)
        if cfg["mode_extension"] & 1:
            cfg["stereo_extent_ch1"] = rng.uniform(0.2, 0.8)
    return cfg


LSF_SEED_OFF = 500000


def soak_one_lsf(i: int, jax_every: int) -> str:
    """LSF differential soak: no external oracle exists (the reference
    rejects id=0), so the contract is 3-way in-tree agreement — Python
    frontend+oracle (truth anchor) vs native C++ vs (every Nth) the
    batched JAX exact path.  Returns ok / infeasible / FAIL:<detail>."""
    from pdmp3_tpu import decode_file
    from pdmp3_tpu.host import PROFILE_LSF, native_decode_file
    from pdmp3_tpu.testing import mp3gen

    rng = random.Random(CFG_BASE + LSF_SEED_OFF + i)
    cfg = random_lsf_config(rng)
    try:
        stream = mp3gen.make_stream(seed=STREAM_BASE + LSF_SEED_OFF + i,
                                    **cfg)
    except (AssertionError, RuntimeError):
        return "infeasible"
    want = decode_file(stream, lsf=True)
    outs = {"native": native_decode_file(stream, profile=PROFILE_LSF)}
    if jax_every and i % jax_every == 0:
        from pdmp3_tpu.models.decoder import JaxDSP
        outs["jax"] = decode_file(stream, dsp=JaxDSP(exact=True),
                                  lsf=True)
    bad = [k for k, o in outs.items() if o != want]
    if not bad:
        return "ok"
    return (f"FAIL:lsf-mismatch:{','.join(bad)}:"
            f"{_forensics(stream, want, outs, bad, LSF_SEED_OFF + i)}:"
            f"{cfg}")


REAL_LSF_SEED_OFF = 900000


def random_real_lsf_config(rng: random.Random) -> dict:
    """Real-encoder LSF sampler: libmp3lame over every MPEG-2/2.5 rate
    (families 1 and 2), all LAME rate-control modes, randomized program
    material.  Breaks the table-provenance loop for the LSF subsystem
    (round-5 VERDICT item 1)."""
    rate = rng.choice([24000, 22050, 16000, 12000, 11025, 8000])
    mode = rng.choice(["cbr", "abr", f"vbr:{rng.randrange(10)}"])
    hi = rate >= 16000
    bitrate = rng.choice([32000, 48000, 64000, 96000, 144000] if hi
                         else [16000, 24000, 32000, 48000, 64000])
    # the reference-parity 1152-byte read gate means a stream shorter
    # than ~2 gates emits nothing by design — keep low-bitrate streams
    # comfortably longer (16 kbps: >=1.5 s ~ 3 KB)
    seconds = max(rng.uniform(0.4, 0.9), 24000.0 / bitrate)
    return dict(
        codec="libmp3lame", mode=mode, rate=rate,
        channels=rng.choice([1, 2, 2]),
        bitrate=bitrate,
        material=rng.choice(MATERIALS),
        seconds=seconds,
    )


def soak_one_real_lsf(i: int, jax_every: int) -> str:
    """Real-encoder LSF differential soak: LAME MPEG-2/2.5 streams
    decoded by our LSF path (python + native bit-equal) and anchored
    tolerance-based against BOTH external production decoders —
    libmpg123 always, libavcodec except 24 kHz (band-table ecosystem
    split, DESIGN.md §6b).  Every Nth stream also runs the batched JAX
    exact path (must equal the python decode bitwise)."""
    import numpy as np

    from pdmp3_tpu import decode_file
    from pdmp3_tpu.host import PROFILE_LSF, native_decode_file
    from pdmp3_tpu.testing.avref import av_decode, ensure_av_encode, av_encode
    from pdmp3_tpu.testing.mpg123ref import have_mpg123, mpg123_decode
    from pdmp3_tpu.testing.signals import make_pcm

    if ensure_av_encode() is None or not have_mpg123():
        return "infeasible"
    rng = random.Random(CFG_BASE + REAL_LSF_SEED_OFF + i)
    cfg = random_real_lsf_config(rng)
    pcm = make_pcm(cfg["material"], cfg["rate"], cfg["channels"],
                   seconds=cfg["seconds"],
                   seed=STREAM_BASE + REAL_LSF_SEED_OFF + i)
    try:
        stream = av_encode(pcm, cfg["codec"], cfg["rate"], cfg["channels"],
                           cfg["bitrate"], cfg["mode"])
    except Exception:
        return "infeasible"                # encoder rejected the config
    if len(stream) < 400:
        return "infeasible"
    py = decode_file(stream, lsf=True)
    nat = native_decode_file(stream, profile=PROFILE_LSF)
    if nat[:len(py)] != py:
        return f"FAIL:lsf-real-native-vs-python:{cfg}"
    if jax_every and i % jax_every == 0:
        from pdmp3_tpu.models.decoder import JaxDSP
        jx = decode_file(stream, dsp=JaxDSP(exact=True), lsf=True)
        if jx != py:
            return f"FAIL:lsf-real-jax-vs-python:{cfg}"
    ours = np.frombuffer(py, "<i2").astype(np.float32) / 32768.0
    if ours.size == 0:
        # reference-parity read gate: a stream shorter than a few
        # 1152-byte gates legitimately emits nothing (LAME VBR/ABR
        # silence at low rates compresses below the gate)
        if len(stream) < 4 * 1152:
            return "gate_short"
        return f"FAIL:lsf-real-no-output:{cfg}"
    anchors = {"mpg123": mpg123_decode(stream)}
    if cfg["rate"] != 24000:
        anchors["libav"] = av_decode(stream)
    for name, ref in anchors.items():
        n = min(ours.size, ref.size)
        if n == 0 or ours.size - n > 8 * 576 * cfg["channels"]:
            return f"FAIL:lsf-real-length:{name}:{ours.size}/{ref.size}:{cfg}"
        d = float(np.abs(ours[:n] - ref[:n]).max())
        if d > 2e-3:
            dump = f"/tmp/soak_lsf_real_{REAL_LSF_SEED_OFF + i}.mp3"
            with open(dump, "wb") as f:
                f.write(stream)
            return f"FAIL:lsf-real-vs-{name}:maxdiff={d}:dump={dump}:{cfg}"
    return "ok"


REAL_SEED_OFF = 800000

# program-material classes (testing/signals.py) — round 5 widened the
# original transient/tonal/sweep trio with noise, speech-envelope,
# digital-black, hard-clipped, and DC-offset material
MATERIALS = ["transient", "transient", "tonal", "sweep",
             "noise", "speech", "silence", "clipped", "dc"]


def _one_real_segment(rng: random.Random) -> dict:
    """One encoded segment's config (codec, format, material, presets)."""
    codec = rng.choice(["libshine", "libmp3lame", "libmp3lame"])
    mode = "cbr"
    extras = {}
    if codec == "libmp3lame":
        mode = rng.choice(["cbr", "abr", f"vbr:{rng.randrange(10)}"])
        # LAME preset axes (round 5): algorithmic quality -q0..9,
        # --lowpass, joint-stereo off, reservoir off
        if rng.random() < 0.4:
            extras["q"] = rng.randrange(10)
        if rng.random() < 0.25:
            extras["cutoff"] = rng.choice([4000, 8000, 12000, 16000])
        if rng.random() < 0.2:
            extras["js"] = 0
        if rng.random() < 0.15:
            extras["reservoir"] = 0
    rate = rng.choice([32000, 44100, 48000])
    channels = rng.choice([1, 2, 2])
    return dict(
        codec=codec, mode=mode, rate=rate, channels=channels,
        bitrate=rng.choice([64000, 96000, 128000, 192000, 320000]),
        material=rng.choice(MATERIALS),
        seconds=rng.uniform(0.4, 0.9),
        extras=extras,
    )


def random_real_config(rng: random.Random) -> dict:
    """Real-encoder sampler: production codecs over randomized program
    material (no mp3gen anywhere — independent table provenance).

    ~15% of configs are CONCATENATED multi-segment streams with
    mid-stream rate/mode/channel changes — the real-stream analogue of
    test_golden_oracle.test_format_change_midstream, exercising the
    NEW_FORMAT protocol (pdmp3.c:1252-1320, 2470-2472) on production
    bitstreams."""
    segs = [_one_real_segment(rng)]
    if rng.random() < 0.15:
        segs.append(_one_real_segment(rng))
        if rng.random() < 0.3:
            segs.append(_one_real_segment(rng))
    return dict(segments=segs)


def soak_one_real(i: int, jax_every: int) -> str:
    """Real-encoder differential soak: libshine/libmp3lame streams
    (production encoders, independent table provenance) decoded by the
    reference binary vs the native C++ decoder — strict bit-equality
    (conformant encoder output never enters the reference's is[]-OOB
    regime).  Every Nth stream also runs the Python oracle and the
    batched JAX exact path."""
    from pdmp3_tpu import decode_file
    from pdmp3_tpu.host import native_decode_file
    from pdmp3_tpu.testing.avref import av_encode, ensure_av_encode
    from pdmp3_tpu.testing.golden import reference_decode
    from pdmp3_tpu.testing.signals import make_pcm

    if ensure_av_encode() is None:
        return "infeasible"
    rng = random.Random(CFG_BASE + REAL_SEED_OFF + i)
    cfg = random_real_config(rng)
    stream = b""
    for k, seg in enumerate(cfg["segments"]):
        pcm = make_pcm(seg["material"], seg["rate"], seg["channels"],
                       seconds=seg["seconds"],
                       seed=STREAM_BASE + REAL_SEED_OFF + i + 7777 * k)
        try:
            stream += av_encode(pcm, seg["codec"], seg["rate"],
                                seg["channels"], seg["bitrate"],
                                seg["mode"], **seg["extras"])
        except Exception:
            return "infeasible"            # encoder rejected the config
    if len(stream) < 400:
        return "infeasible"
    import subprocess
    try:
        # short timeout: the reference decodes these sub-second streams
        # in milliseconds; a timeout means the binary hung in its
        # ring-wrap ghost-full livelock (DESIGN.md §6 — cumulative
        # 4096-byte CLI feeds hit the 16384 boundary exactly while VBR
        # reservoir stalls park consumption; REACHED BY REAL LAME VBR
        # STREAMS, first seen at seed 800819)
        ref = reference_decode(stream, timeout=30.0)
    except subprocess.TimeoutExpired:
        # adjudicated divergence: a livelock has no output to be
        # bit-compatible with; require our two host decoders to agree
        # with each other instead
        if native_decode_file(stream) == decode_file(stream):
            return "ref_livelock"
        dump = f"/tmp/soak_ref_hang_{REAL_SEED_OFF + i}.mp3"
        with open(dump, "wb") as f:
            f.write(stream)
        return f"FAIL:ref-hang-and-internal-mismatch:dump={dump}:{cfg}"
    outs = {"native": native_decode_file(stream)}
    if jax_every and i % jax_every == 0:
        from pdmp3_tpu.models.decoder import JaxDSP
        outs["oracle"] = decode_file(stream)
        outs["jax"] = decode_file(stream, dsp=JaxDSP(exact=True))
    bad = [k for k, o in outs.items() if o != ref]
    if not bad:
        return "ok"
    # 320 kbps @ 32 kHz (1440-byte frames vs the 1152-byte read gate):
    # the reference's output for this format is feed-cadence-dependent
    # (DESIGN.md §6) — when every implementation agrees on the common
    # prefix and only the tail length differs, that is the adjudicated
    # gate divergence, not a decode mismatch
    if any(seg["rate"] == 32000 and seg["bitrate"] == 320000
           for seg in cfg["segments"]):
        n = min(len(ref), *(len(o) for o in outs.values()))
        if all(o[:n] == ref[:n] for o in outs.values()):
            return "gate_1440_prefix_ok"
    return (f"FAIL:real-mismatch:{','.join(bad)}:"
            f"{_forensics(stream, ref, outs, bad, REAL_SEED_OFF + i)}:{cfg}")


def soak_one(i: int, jax_every: int) -> str:
    """Returns one of: ok / oob_prefix_ok / infeasible / FAIL:<detail>."""
    from pdmp3_tpu import decode_file
    from pdmp3_tpu.host import native_decode_file
    from pdmp3_tpu.testing import mp3gen
    from pdmp3_tpu.testing.golden import first_oob_frame, reference_decode

    rng = random.Random(CFG_BASE + i)
    cfg = random_config(rng)
    try:
        stream = mp3gen.make_stream(seed=STREAM_BASE + i, **cfg)
    except (AssertionError, RuntimeError):
        return "infeasible"
    ref = reference_decode(stream)
    outs = {"native": native_decode_file(stream),
            "oracle": decode_file(stream)}
    if jax_every and i % jax_every == 0:
        from pdmp3_tpu.models.decoder import JaxDSP
        outs["jax"] = decode_file(stream, dsp=JaxDSP(exact=True))
    if all(o == ref for o in outs.values()):
        return "ok"
    oob = first_oob_frame(stream)
    if oob is None:
        bad = [k for k, o in outs.items() if o != ref]
        return f"FAIL:strict-mismatch:{','.join(bad)}:{_forensics(stream, ref, outs, bad, i)}:{cfg}"
    n = min(oob, len(ref))
    bad = [k for k, o in outs.items() if o[:n] != ref[:n]]
    if bad:
        return f"FAIL:prefix-mismatch@{oob}:{','.join(bad)}:{_forensics(stream, ref, outs, bad, i)}:{cfg}"
    return "oob_prefix_ok"


def _forensics(stream: bytes, ref: bytes, outs: dict, bad: list,
               seed: int) -> str:
    """On mismatch: diff stats, config snapshot, in-process retry (flaky
    vs sticky), and a stream dump for post-mortem."""
    import numpy as np
    import jax
    from pdmp3_tpu import decode_file

    bits = [f"x64={jax.config.jax_enable_x64}",
            f"backend={jax.default_backend()}"]
    b = np.frombuffer(ref, np.int16)
    for k in bad:
        a = np.frombuffer(outs[k], np.int16)
        n = min(len(a), len(b))
        d = np.nonzero(a[:n] != b[:n])[0]
        mx = int(np.abs(a[d].astype(np.int64)
                        - b[d].astype(np.int64)).max()) if len(d) else 0
        bits.append(f"{k}:ndiff={len(d)},max={mx},lens={len(a)}/{len(b)}")
    if "jax" in bad:
        from pdmp3_tpu.models.decoder import JaxDSP
        retry = decode_file(stream, dsp=JaxDSP(exact=True))
        bits.append(f"retry_jax={'match' if retry == ref else 'again'}")
    dump = f"/tmp/soak_fail_{seed}.mp3"
    try:
        with open(dump, "wb") as f:
            f.write(stream)
        bits.append(f"dump={dump}")
    except OSError:
        pass
    return ";".join(bits)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=2000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SOAK_r02.json"))
    ap.add_argument("--jax-every", type=int, default=64,
                    help="run every Nth stream through the batched JAX "
                         "exact path too (0 = never)")
    ap.add_argument("--progress-every", type=int, default=200)
    ap.add_argument("--lsf", action="store_true",
                    help="soak the MPEG-2/2.5 LSF profile instead "
                         "(3-way in-tree differential; use a separate "
                         "--out artifact)")
    ap.add_argument("--real-lsf", action="store_true",
                    help="soak real libmp3lame MPEG-2/2.5 streams through "
                         "the LSF path, anchored vs libmpg123 + libavcodec "
                         "(separate --out artifact)")
    ap.add_argument("--real-encoder", action="store_true",
                    help="soak real libshine/libmp3lame streams instead "
                         "of mp3gen output (breaks the generator/decoder "
                         "table-provenance loop; separate --out artifact)")
    args = ap.parse_args()

    tally = {"ok": 0, "oob_prefix_ok": 0, "infeasible": 0,
             "ref_livelock": 0, "gate_short": 0, "gate_1440_prefix_ok": 0}
    coverage: dict[str, dict] = {}

    def cover(i: int) -> None:
        """Config-coverage histogram for the real-encoder samplers."""
        rng2 = random.Random(CFG_BASE + (REAL_LSF_SEED_OFF if args.real_lsf
                                         else REAL_SEED_OFF) + i)
        if args.real_lsf:
            segs = [random_real_lsf_config(rng2)]
        else:
            segs = random_real_config(rng2)["segments"]
        axes = coverage
        axes.setdefault("n_segments", {})
        key = str(len(segs))
        axes["n_segments"][key] = axes["n_segments"].get(key, 0) + 1
        for seg in segs:
            for ax in ("codec", "rate", "channels", "material"):
                b = axes.setdefault(ax, {})
                key = str(seg[ax])
                b[key] = b.get(key, 0) + 1
            b = axes.setdefault("mode", {})
            key = seg["mode"].split(":")[0]
            b[key] = b.get(key, 0) + 1
            for ex in seg.get("extras", ()):
                b = axes.setdefault("extras", {})
                b[ex] = b.get(ex, 0) + 1

    failures: list[dict] = []
    t0 = time.time()
    for k, i in enumerate(range(args.start, args.start + args.count)):
        fn = (soak_one_real_lsf if args.real_lsf
              else soak_one_real if args.real_encoder
              else soak_one_lsf if args.lsf else soak_one)
        if args.real_lsf or args.real_encoder:
            cover(i)
        r = fn(i, args.jax_every)
        if r.startswith("FAIL"):
            failures.append({"seed": i, "detail": r})
            print(f"seed {i}: {r}", flush=True)
        else:
            tally[r] += 1
        if args.progress_every and (k + 1) % args.progress_every == 0:
            rate = (k + 1) / (time.time() - t0)
            print(f"[{k + 1}/{args.count}] {tally} fails={len(failures)} "
                  f"({rate:.1f} streams/s)", flush=True)

    summary = {"ranges": [], "streams": 0, "ok": 0, "oob_prefix_ok": 0,
               "infeasible": 0, "ref_livelock": 0, "gate_short": 0,
               "gate_1440_prefix_ok": 0, "failures": [],
               "seed_bases": {"config": CFG_BASE, "stream": STREAM_BASE}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            summary.update(json.load(f))
    summary["ranges"].append([args.start, args.count])
    summary["streams"] += args.count
    for key in tally:
        summary[key] = summary.get(key, 0) + tally[key]
    summary["failures"].extend(failures)
    if coverage:
        cov = summary.setdefault("coverage", {})
        for ax, buckets in coverage.items():
            dst = cov.setdefault(ax, {})
            for key, n in buckets.items():
                dst[key] = dst.get(key, 0) + n
    summary["elapsed_s"] = round(
        summary.get("elapsed_s", 0) + time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("streams", "ok", "oob_prefix_ok", "infeasible")}
                     | {"failures": len(summary["failures"])}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
