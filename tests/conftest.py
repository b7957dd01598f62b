import os
import sys

# JAX tests run on a virtual 8-device CPU mesh; the real-TPU path is
# exercised by bench.py / __graft_entry__.py on hardware.  The axon
# sitecustomize force-registers the TPU backend whenever
# PALLAS_AXON_POOL_IPS is set, so clear it and pin the platform to cpu.
# stash the original so the on-TPU conformance subprocess (marker `tpu`)
# can restore the axon plugin in its own environment
os.environ.setdefault("PDMP3_AXON_POOL_IPS_ORIG",
                      os.environ.get("PALLAS_AXON_POOL_IPS", ""))
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU contracts mul+add into FMA inside fused kernels at the default
# optimization level, which breaks the exact-precision decode path's
# bit-parity with the reference (single-rounded FMA vs the reference's
# separate mul+add).  Level 0 disables the contraction; the TPU backend
# does not contract and needs no flag.
if "backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()
# exact-precision decode mode reproduces the reference's float64 rounding
# points (MS butterfly, final quantize) and needs x64 enabled
os.environ.setdefault("JAX_ENABLE_X64", "1")

# The axon sitecustomize may have already registered + pinned the TPU
# backend at interpreter startup; jax.config wins over env vars, so pin
# the platform explicitly before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
