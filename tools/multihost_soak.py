"""Randomized multi-host serving soak (round-2 VERDICT item 9): repeated
multi-process mesh decodes with randomized process counts, stream
formats, kernels and step phasing, each checked bit-exact against the
native scalar decoder.  Exercises the jax.distributed/Gloo edges the
single deterministic test (tests/test_multihost.py) cannot: varying
slot/device ratios, uneven stream lengths (stragglers keep stepping
collectively while idle), mono/stereo mixes, reservoir streams.

Resumable + cumulative like tools/soak.py:

    python tools/multihost_soak.py --rounds 10 --seed-base 0
"""
from __future__ import annotations

import argparse
import json
import os
import random
import socket
import subprocess
import sys
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WORKER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1]); pid = int(sys.argv[2])
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "1"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={cfg['dev_per_proc']} "
        "--xla_backend_optimization_level=0")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{cfg['port']}",
        num_processes=cfg["procs"], process_id=pid)
    import numpy as np
    from pdmp3_tpu.host import native_decode_file
    from pdmp3_tpu.runtime.multihost import MultiHostStreamDecoder
    from pdmp3_tpu.testing import mp3gen

    n_local = cfg["n_global"] // cfg["procs"]
    streams = [mp3gen.make_stream(**spec) for spec in cfg["streams"]]
    dec = MultiHostStreamDecoder(cfg["n_global"], exact=True,
                                 kernel=cfg["kernel"])
    for s in range(n_local):
        assert dec.feed(s, streams[pid * n_local + s]) == 0
    outs = [[] for _ in range(n_local)]
    for _ in range(cfg["max_steps"]):
        na = dec.parse_step()
        if dec.global_active(na) == 0:
            break
        pcm = dec.decode_step()
        for s in range(n_local):
            if dec.active[s]:
                outs[s].append(pcm[s][:, 0].tobytes() if dec.nch(s) == 1
                               else pcm[s].tobytes())
    for s in range(n_local):
        want = native_decode_file(streams[pid * n_local + s])
        got = b"".join(outs[s])
        assert got[:len(want)] == want, f"slot {s} PCM mismatch"
        assert len(got) >= len(want)
    with open(os.path.join(cfg["outdir"], f"ok{pid}"), "w") as f:
        f.write("MH_OK")
""")


def run_round(rng: random.Random, tmpdir: str) -> dict:
    procs = rng.choice([2, 2, 4])
    dev_per_proc = rng.choice([2, 4])
    n_global = procs * dev_per_proc * rng.choice([1, 2])
    kernel = rng.choice(["xla", "pallas"])
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    specs = []
    for g in range(n_global):
        specs.append(dict(
            n_frames=rng.randint(3, 9),
            seed=rng.randint(0, 10 ** 6),
            blocks=rng.choice(["long", "varied", "short", "mixed"]),
            mode=rng.choice([0, 1, 1, 3]),
            mode_extension=rng.choice([0, 1, 2, 3]),
            sfreq=rng.choice([0, 0, 1, 2]),
            use_reservoir=rng.random() < 0.4))
    cfg = dict(procs=procs, dev_per_proc=dev_per_proc, n_global=n_global,
               kernel=kernel, port=port, streams=specs, max_steps=64,
               outdir=tmpdir)
    worker = os.path.join(tmpdir, "worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + env.get("PYTHONPATH", "").split(os.pathsep))
    t0 = time.time()
    ps = [subprocess.Popen([sys.executable, worker, json.dumps(cfg),
                            str(pid)], env=env, stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT)
          for pid in range(procs)]
    ok = True
    log = ""
    for p in ps:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in ps:
                q.kill()
            raise
        log += out.decode(errors="replace")
        ok &= p.returncode == 0
    for pid in range(procs):
        okf = os.path.join(tmpdir, f"ok{pid}")
        ok &= (os.path.exists(okf) and open(okf).read() == "MH_OK")
        if os.path.exists(okf):
            os.remove(okf)
    if not ok:
        sys.stderr.write(log[-8000:])
    return dict(procs=procs, dev_per_proc=dev_per_proc,
                n_global=n_global, kernel=kernel, ok=ok,
                seconds=round(time.time() - t0, 1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--seed-base", type=int, default=0)
    ap.add_argument("--out", default="MULTIHOST_SOAK_r03.json")
    args = ap.parse_args()

    import tempfile
    prior = {"rounds": [], "total_ok": 0, "total": 0}
    if os.path.exists(args.out):
        prior = json.load(open(args.out))
    fails = 0
    with tempfile.TemporaryDirectory() as td:
        for i in range(args.rounds):
            rng = random.Random(args.seed_base + i)
            r = run_round(rng, td)
            r["seed"] = args.seed_base + i
            prior["rounds"].append(r)
            prior["total"] += 1
            prior["total_ok"] += int(r["ok"])
            fails += int(not r["ok"])
            print(f"[{i + 1}/{args.rounds}] {r}")
            if not r["ok"]:
                break
    with open(args.out, "w") as f:
        json.dump(prior, f, indent=1)
    print(json.dumps({"total": prior["total"],
                      "total_ok": prior["total_ok"]}))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
