"""Pod-scale serving: the stream scheduler sharded over a device mesh.

BASELINE.json configs[4] (100k concurrent streams on a pod): slots are
sharded over the mesh's stream axis with NamedSharding; the recurrent DSP
state never leaves its device, the per-step SoA tensors upload sharded,
and the decode step runs SPMD (no collectives on the decode path — the
psum telemetry in parallel/sharding.py is the only cross-chip traffic).

Both device kernels shard: the XLA pipeline partitions under pjit, and
the fused Pallas kernel (the fastest path, kernel="pallas") runs under
``jax.shard_map`` — streams are embarrassingly parallel, so each device
executes the same pallas_call on its local slot shard with zero
collectives (parallel/sharding.sharded_frame_soa_step).

This class expresses the single-controller form (one process addresses
every device), which is also what the virtual-device tests exercise.
The per-host form — one process per host running its own native
frontend, stitched by jax.distributed into one global mesh — is
runtime/multihost.MultiHostStreamDecoder, tested with two real OS
processes in tests/test_multihost.py.
"""
from __future__ import annotations

import numpy as np
import jax

from ..models import decoder as M
from ..parallel.sharding import (STREAM_AXIS, batch_sharding, make_mesh,
                                 pallas_state_specs, sharded_l12_step,
                                 sharded_frame_soa_step)
from .scheduler import L12StreamDecoder, StreamDecoder


class ShardedStreamDecoder(StreamDecoder):
    """StreamDecoder whose device state + step tensors are sharded over a
    mesh.  n_slots must be a multiple of the mesh size."""

    def __init__(self, n_slots: int, mesh=None, exact: bool = False,
                 bug_compat: bool = True, parse_threads: int = 0,
                 kernel: str = "xla", family: int = 0):
        super().__init__(n_slots, exact=exact, bug_compat=bug_compat,
                         parse_threads=parse_threads, kernel=kernel,
                         family=family)
        assert self.F == 1, "sharded serving uses one frame per step"
        self.mesh = mesh if mesh is not None else make_mesh()
        assert n_slots % self.mesh.size == 0, (n_slots, self.mesh.size)
        if kernel == "pallas":
            # PallasState keeps the slot axis MINOR (feature-major
            # kernel layout); shard that axis
            specs = pallas_state_specs(STREAM_AXIS)
            self.state = jax.tree.map(
                lambda x, s: jax.device_put(
                    x, jax.sharding.NamedSharding(self.mesh, s)),
                self.state, specs)
            self._step = sharded_frame_soa_step(
                self.mesh, STREAM_AXIS, self.exact, self.bug_compat,
                "pallas")
        else:
            shard = lambda x: jax.device_put(
                x, batch_sharding(self.mesh, x.ndim))
            self.state = M.DecoderState(
                store=shard(self.state.store),
                v_blocks=shard(self.state.v_blocks),
                prev_lines=shard(self.state.prev_lines))
            self._step = None
        if family:
            # LSF pools shard identically (streams stay embarrassingly
            # parallel); one shard_map body serves both kernels
            from ..parallel.sharding import sharded_frame_lsf_step
            self._step = sharded_frame_lsf_step(
                self.mesh, STREAM_AXIS, family, self.exact,
                self.bug_compat, kernel)

    def decode_step(self, fetch: bool = True):
        if not self.active.any():
            return None
        # upload the per-granule tensors sharded on the slot axis (axis 1
        # of the [2, B, ...] step tensors)
        def put(x):
            sh = jax.sharding.NamedSharding(
                self.mesh,
                jax.sharding.PartitionSpec(None, STREAM_AXIS,
                                           *([None] * (x.ndim - 2))))
            return jax.device_put(x, sh)

        ix2 = put(self.ix)
        scf_l2 = put(self.scf_l)
        scf_s2 = put(self.scf_s)
        meta2 = put(self.meta)
        if self.family:
            pcm, self.state = self._step(
                ix2, scf_l2, scf_s2, meta2, put(self.is_pos),
                put(self.active.reshape(1, -1)), self.state)
            return np.asarray(pcm) if fetch else pcm
        active = jax.device_put(
            self.active, batch_sharding(self.mesh, 1))
        if self.kernel == "pallas":
            pcm, self.state = self._step(ix2, scf_l2, scf_s2, meta2,
                                         active, self.state)
        else:
            with self.mesh:
                pcm, self.state = M.decode_frame_soa(
                    ix2, scf_l2, scf_s2, meta2, active, self.state,
                    exact=self.exact, bug_compat=self.bug_compat)
        return np.asarray(pcm) if fetch else pcm


class ShardedL12StreamDecoder(L12StreamDecoder):
    """L12StreamDecoder (per-layer Layer I/II pool) sharded over a mesh.

    Same pure-data-placement story as the Layer III pools: the device
    step is synthesis-only, streams are embarrassingly parallel, and the
    v_blocks FIFO shards on the slot axis and never moves between chips.
    n_slots must be a multiple of the mesh size."""

    def __init__(self, n_slots: int, layer: int = 2, mesh=None,
                 exact: bool = False, parse_threads: int = 1,
                 profile: int = 0, float_pcm: bool = False):
        super().__init__(n_slots, layer=layer, exact=exact,
                         parse_threads=parse_threads, frames_per_step=1,
                         profile=profile, float_pcm=float_pcm)
        from ..models.l12 import L12State
        self.mesh = mesh if mesh is not None else make_mesh()
        assert n_slots % self.mesh.size == 0, (n_slots, self.mesh.size)
        self.state = L12State(v_blocks=jax.device_put(
            self.state.v_blocks, batch_sharding(self.mesh, 4)))
        self._sharded_step = sharded_l12_step(
            self.mesh, STREAM_AXIS, exact, float_pcm)

    def decode_step(self, fetch: bool = True):
        if not self.active.any():
            return None
        put = lambda x, nd: jax.device_put(
            np.ascontiguousarray(x), batch_sharding(self.mesh, nd))
        pcm, self.state = self._sharded_step(
            put(self.sb[0], 4),
            put(self.meta[0, :, 0].astype(np.int32), 1),
            put(self.active.reshape(-1).astype(np.int32), 1),
            self.state)
        self._cur ^= 1
        act_h, meta_h = self.active.copy(), self.meta.copy()
        self._bind_views()
        self.active[:] = act_h
        self.meta[:] = meta_h
        return np.asarray(pcm) if fetch else pcm

    def restore_checkpoint(self, ckpt: dict) -> None:
        super().restore_checkpoint(ckpt)
        from ..models.l12 import L12State
        self.state = L12State(v_blocks=jax.device_put(
            np.asarray(self.state.v_blocks),
            batch_sharding(self.mesh, 4)))
