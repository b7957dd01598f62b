"""Multi-host serving: per-process native frontends feeding one global
mesh decode (BASELINE.json configs[4], 100k streams on a pod).

The single-controller form (runtime/sharded.py) assumes every device is
addressable from one process.  On a real pod each host runs its own
process: `jax.distributed.initialize` stitches the per-host device sets
into one global mesh, every process parses ITS OWN slice of the streams
with the native C frontend, and the decode step is one SPMD program over
globally-sharded arrays — per-process step tensors become global arrays
with `jax.make_array_from_process_local_data`, the jit executes on all
hosts' devices, and each host reads back only its addressable PCM
shards.  No collectives run on the decode path (streams are
embarrassingly parallel, SURVEY.md §2.6); the only cross-host traffic is
the Gloo/ICI barrier inside jit dispatch and the optional active-count
reduction.

Launch (one process per host):

    jax.distributed.initialize(coordinator_address, num_processes, pid)
    dec = MultiHostStreamDecoder(n_slots_global)   # after initialize()
    dec.feed(local_slot, bytes)                    # local slots only
    dec.parse_step(); pcm_local = dec.decode_step()

Tested with 2 local processes on a virtual CPU mesh
(tests/test_multihost.py) — the path is identical on a pod, with ICI/DCN
instead of Gloo.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import decoder as M
from ..parallel.sharding import STREAM_AXIS, make_mesh
from .scheduler import StreamDecoder


class MultiHostStreamDecoder(StreamDecoder):
    """StreamDecoder spanning all processes of a jax.distributed job.

    ``n_slots`` is the GLOBAL slot count; each process owns the
    contiguous slice ``[pid * n_local, (pid+1) * n_local)`` and only
    feeds/parses those slots.  ``decode_step`` is collective — every
    process must call it the same number of times (pass the step even
    when locally idle; use :meth:`global_active` to coordinate
    termination)."""

    def __init__(self, n_slots: int, mesh=None, exact: bool = False,
                 bug_compat: bool = True, parse_threads: int = 1,
                 kernel: str = "xla", family: int = 0):
        self.procs = jax.process_count()
        self.pid = jax.process_index()
        assert n_slots % self.procs == 0, (n_slots, self.procs)
        self.n_global = n_slots
        super().__init__(n_slots // self.procs, exact=exact,
                         bug_compat=bug_compat,
                         parse_threads=parse_threads, kernel=kernel,
                         family=family)
        assert self.F == 1, "multi-host serving uses one frame per step"
        self.mesh = mesh if mesh is not None else make_mesh()
        assert n_slots % self.mesh.size == 0, (n_slots, self.mesh.size)
        # recurrent DSP state lives globally sharded from birth: jit with
        # explicit out_shardings materializes it on every host's devices
        # without any host->device broadcast
        def sh(ndim):
            return NamedSharding(self.mesh,
                                 P(STREAM_AXIS, *([None] * (ndim - 1))))
        if kernel == "pallas":
            # fused Pallas kernel via shard_map (pjit cannot partition a
            # pallas_call); state in the kernel's feature-major layout,
            # slot axis minor
            from ..ops.pallas_step import init_pallas_state
            from ..parallel.sharding import (pallas_state_specs,
                                             sharded_frame_soa_step)
            specs = pallas_state_specs(STREAM_AXIS)
            self.state = jax.jit(
                lambda: init_pallas_state(self.n_global),
                out_shardings=jax.tree.map(
                    lambda s: NamedSharding(self.mesh, s), specs))()
            self._step = sharded_frame_soa_step(
                self.mesh, STREAM_AXIS, self.exact, self.bug_compat,
                "pallas")
        else:
            self.state = jax.jit(
                lambda: M.init_state(self.n_global),
                out_shardings=M.DecoderState(store=sh(4), v_blocks=sh(4),
                                             prev_lines=sh(2)))()
            self._step = None
        if family:
            # LSF pools: one-granule frames + intensity sidecar; the
            # shard_map body serves both kernels (parallel/sharding)
            from ..parallel.sharding import sharded_frame_lsf_step
            self._step = sharded_frame_lsf_step(
                self.mesh, STREAM_AXIS, family, self.exact,
                self.bug_compat, kernel)

    # ---- device side (collective) ----

    def _global(self, local: np.ndarray, batch_axis: int):
        """Assemble the global view of a per-process step tensor (the
        slot axis concatenates across processes in pid order)."""
        shape = list(local.shape)
        shape[batch_axis] *= self.procs
        spec = [None] * local.ndim
        spec[batch_axis] = STREAM_AXIS
        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P(*spec)), np.ascontiguousarray(local),
            tuple(shape))

    def decode_step(self, fetch: bool = True):
        """One global SPMD decode step.  Returns this process's local PCM
        int16 [n_local, 1152, 2] ([n_local, 576, 2] for LSF pools —
        one granule per frame) with zeros for inactive slots; with
        fetch=False returns the global on-device array."""
        ix2 = self._global(self.ix, 1)
        scf_l2 = self._global(self.scf_l, 1)
        scf_s2 = self._global(self.scf_s, 1)
        meta2 = self._global(self.meta, 1)
        if self.family:
            ip2 = self._global(self.is_pos, 1)
            act2 = self._global(self.active.reshape(1, -1), 1)
            pcm, self.state = self._step(ix2, scf_l2, scf_s2, meta2,
                                         ip2, act2, self.state)
            act, meta = self.active.copy(), self.meta.copy()
            self._cur ^= 1
            self._bind_views()
            self.active[:] = act
            self.meta[:] = meta
            if not fetch:
                return pcm
            shards = sorted(pcm.addressable_shards,
                            key=lambda s: s.index[0].start)
            return np.concatenate([np.asarray(s.data) for s in shards],
                                  axis=0)
        active = self._global(self.active, 0)
        if self.kernel == "pallas":
            pcm, self.state = self._step(ix2, scf_l2, scf_s2, meta2,
                                         active, self.state)
        else:
            with self.mesh:
                pcm, self.state = M.decode_frame_soa(
                    ix2, scf_l2, scf_s2, meta2, active, self.state,
                    exact=self.exact, bug_compat=self.bug_compat)
        act, meta = self.active.copy(), self.meta.copy()
        self._cur ^= 1
        self._bind_views()
        self.active[:] = act
        self.meta[:] = meta
        if not fetch:
            return pcm
        # each host materializes only its addressable shards, in slot order
        shards = sorted(pcm.addressable_shards, key=lambda s: s.index[0].start)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    def global_active(self, local_count: int) -> int:
        """Collective sum of per-process active-slot counts (drives
        termination without asymmetric control flow)."""
        arr = jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P(STREAM_AXIS)),
            np.full(self.mesh.size // self.procs, local_count, np.int32),
            (self.mesh.size,))
        with self.mesh:
            return int(jax.jit(jnp.sum)(arr)) // (self.mesh.size // self.procs)
