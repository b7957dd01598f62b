"""On-hardware conformance (round-2 VERDICT item 6): the COMPILED Mosaic
kernel — not interpret mode — must match the XLA pipeline bitwise in
exact mode (±1 LSB in fast mode) and the reference binary's PCM through
the serving path, on the attached real TPU.

The suite's conftest pins the process to a virtual CPU mesh, so these
tests drive the chip from a subprocess with the axon environment.  They
are gated behind PDMP3_TPU_TESTS=1 (first on-chip compile is minutes
over the tunnel); the round ritual runs

    PDMP3_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

on hardware and archives the result in TPU_CONFORMANCE_r{N}.json.
"""
import json
import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(os.environ.get("PDMP3_TPU_TESTS") != "1",
                       reason="set PDMP3_TPU_TESTS=1 to run on the "
                              "attached real TPU (slow: on-chip compile)"),
]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import json, os, subprocess, sys, tempfile
    import numpy as np
    import jax
    jax.config.update("jax_enable_x64", True)
    assert jax.devices()[0].platform != "cpu", jax.devices()

    from pdmp3_tpu.frontend import Frontend
    from pdmp3_tpu.models import decoder as M
    from pdmp3_tpu.ops import pallas_step as PSF
    from pdmp3_tpu.runtime import StreamDecoder
    from pdmp3_tpu.testing import mp3gen
    from pdmp3_tpu.testing.golden import ensure_reference_binary

    out = {"device": str(jax.devices()[0])}

    # --- kernel-vs-XLA: compiled Mosaic, batched mixed-coverage batch ---
    fds = []
    for i in range(4):
        s = mp3gen.make_stream(n_frames=4, seed=77 + i,
                               blocks=["long", "short", "mixed",
                                       "varied"][i],
                               mode=1 if i % 2 else 0,
                               mode_extension=2 if i % 2 else 0)
        fe = Frontend(); fe.feed(s)
        r, fd = fe.read_frame(); assert r == 0
        fds.append(fd)
    batch = M.frame_to_batches([fds[i % 4] for i in range(16)])[0]
    batch = jax.tree.map(jax.device_put, batch)
    state = M.init_state(16)
    # exact: bitwise PCM + state equality
    pcm_x, st_x = M.decode_granules(batch, state, exact=True)
    pcm_p, pst = PSF.decode_granules_pallas(batch,
                                            PSF.state_to_pallas(state),
                                            exact=True)
    np.testing.assert_array_equal(np.asarray(pcm_p), np.asarray(pcm_x))
    st_p = PSF.state_from_pallas(pst)
    np.testing.assert_array_equal(np.asarray(st_p.store),
                                  np.asarray(st_x.store))
    np.testing.assert_array_equal(np.asarray(st_p.v_blocks),
                                  np.asarray(st_x.v_blocks))
    out["exact_kernel_vs_xla"] = "bitwise"
    # fast: +-1 LSB contract
    pcm_fx, _ = M.decode_granules(batch, state, exact=False)
    pcm_fp, _ = PSF.decode_granules_pallas(batch,
                                           PSF.state_to_pallas(state),
                                           exact=False)
    d = int(np.abs(np.asarray(pcm_fp, np.int64)
                   - np.asarray(pcm_fx, np.int64)).max())
    assert d <= 1, d
    out["fast_kernel_vs_xla_max_lsb"] = d

    # --- serving vs reference binary (both kernels, exact mode) ---
    ref = ensure_reference_binary()
    B = 4
    streams = [mp3gen.make_stream(n_frames=12, seed=880 + i,
                                  blocks=["varied", "short", "mixed",
                                          "long"][i],
                                  mode=[1, 1, 0, 3][i],
                                  mode_extension=2 if i < 2 else 0,
                                  use_reservoir=True) for i in range(B)]
    golden = []
    with tempfile.TemporaryDirectory() as td:
        for i, s in enumerate(streams):
            p = os.path.join(td, f"s{i}.mp3")
            open(p, "wb").write(s)
            subprocess.run([ref, f"s{i}.mp3"], cwd=td, check=True,
                           capture_output=True)
            golden.append(open(p + ".raw", "rb").read())
    for kernel in ("xla", "pallas"):
        dec = StreamDecoder(B, exact=True, kernel=kernel)
        for s in range(B):
            assert dec.feed(s, streams[s]) == 0
        got = [b""] * B
        while dec.parse_step():
            pcm = dec.decode_step()
            for s in range(B):
                if dec.active[s]:
                    got[s] += pcm[s].tobytes()
        for s in range(B):
            g = got[s]
            if dec.nch(s) == 1:
                a = np.frombuffer(g, "<i2").reshape(-1, 2)[:, 0]
                g = np.ascontiguousarray(a).tobytes()
            n = min(len(g), len(golden[s]))
            assert n >= len(golden[s]) - 3 * 4608, (kernel, s, n)
            assert g[:n] == golden[s][:n], (kernel, s)
    out["serving_vs_reference"] = f"{B}/{B} streams bit-exact x 2 kernels"

    # --- LSF pools on-chip (capability beyond the reference): compiled
    # per-family Mosaic kernel, exact bitwise vs the native C++ decoder,
    # fast within +-1 LSB of XLA ---
    from pdmp3_tpu.host import PROFILE_LSF, native_decode_file
    for fam in (1, 2):
        ls = [mp3gen.make_stream(n_frames=8, seed=990 + fam * 10 + i,
                                 family=fam, sfreq=i % 3, bitrate_index=11,
                                 mode=1 if i % 2 else 0,
                                 mode_extension=3 if i % 2 else 0,
                                 stereo_extent_ch1=0.4) for i in range(3)]
        outs = {}
        for kernel, exact in (("pallas", True), ("pallas", False),
                              ("xla", False)):
            dec = StreamDecoder(len(ls), exact=exact, kernel=kernel,
                                family=fam)
            for s, d in enumerate(ls):
                assert dec.feed(s, d) == 0
            got = [b""] * len(ls)
            while dec.parse_step():
                pcm = dec.decode_step()
                for s in range(len(ls)):
                    if dec.active[s]:
                        got[s] += pcm[s].tobytes()
            outs[(kernel, exact)] = got
        for s, d in enumerate(ls):
            want = native_decode_file(d, profile=PROFILE_LSF)
            assert outs[("pallas", True)][s] == want, (fam, s)
            a = np.frombuffer(outs[("pallas", False)][s], np.int16)
            b = np.frombuffer(outs[("xla", False)][s], np.int16)
            assert np.abs(a.astype(np.int32)
                          - b.astype(np.int32)).max(initial=0) <= 1
    out["lsf_pools_on_chip"] = ("fam1+fam2: pallas exact bitwise vs "
                                "native, fast within 1 LSB of xla")
    print("TPU_CONFORMANCE_JSON " + json.dumps(out))
""")


def test_tpu_kernel_and_serving_conformance(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        ["/root/.axon_site", _REPO]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    for var in ("JAX_PLATFORMS", "XLA_FLAGS"):
        env.pop(var, None)
    orig = env.pop("PDMP3_AXON_POOL_IPS_ORIG", "")
    if orig:
        env["PALLAS_AXON_POOL_IPS"] = orig  # conftest wiped it in-process
    r = subprocess.run([sys.executable, str(worker)], env=env, cwd=_REPO,
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("TPU_CONFORMANCE_JSON ")]
    assert line, r.stdout[-2000:]
    result = json.loads(line[0].split(" ", 1)[1])
    assert result["exact_kernel_vs_xla"] == "bitwise"
    assert result["fast_kernel_vs_xla_max_lsb"] <= 1
