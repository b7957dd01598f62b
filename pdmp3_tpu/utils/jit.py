"""Backend-lazy jit with TPU-specific compiler options.

XLA:TPU's scheduler parks the fused granule kernel's outputs in VMEM in
multi-step serving chains, and Pallas double-buffers block IO on
multi-block grids — either pushes scoped VMEM past the compiler's
conservative 16M default (physical VMEM is far larger).  The raising
option is TPU-only (other backends reject it) and XLA_FLAGS cannot carry
it through the remote-compile tunnel, so jit binds it lazily, per
backend, at first call.  Deferring also keeps module import from
initializing a backend, which would break jax.distributed setup in
runtime/multihost.py.
"""
from __future__ import annotations

import functools

import jax

try:  # private API: present in current JAX, may move on upgrade
    from jax._src.core import trace_state_clean as _trace_state_clean
except ImportError:  # pragma: no cover - future-JAX fallback
    def _trace_state_clean():
        # conservative fallback: always take the nested-jit path (plain
        # jax.jit, no compiler_options) — correct everywhere, merely
        # loses the TPU scoped-VMEM raise until the import is fixed
        return False

TPU_COMPILER_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "40960"}


def lazy_jit(fun, **jit_kwargs):
    cache = {}

    @functools.wraps(fun)
    def wrapper(*a, **k):
        # compiler_options is only legal on the OUTERMOST jit; under an
        # enclosing trace fall back to a plain nested jit (the outer
        # compile carries the options)
        key = ("nested" if not _trace_state_clean()
               else jax.default_backend())
        fn = cache.get(key)
        if fn is None:
            opts = TPU_COMPILER_OPTS if key == "tpu" else None
            fn = jax.jit(fun, compiler_options=opts, **jit_kwargs)
            cache[key] = fn
        return fn(*a, **k)

    return wrapper
