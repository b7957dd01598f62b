"""Stream-axis sharding over a TPU device mesh.

The decode workload is embarrassingly parallel across streams (SURVEY.md
§2.6): no collectives are algorithmically required, so the multi-chip
design is pure data placement — shard the granule-slot axis B over the
mesh's ``streams`` axis with `jax.sharding.NamedSharding`, keep constant
tables replicated, and let the jit-compiled decode step run SPMD.  The
per-stream recurrent state (overlap store, polyphase FIFO) is sharded
identically, so it never moves between chips; the only cross-device traffic
is an optional psum for aggregate serving metrics.

This replaces what a CPU/GPU design would do with worker pools + NCCL: here
a single pjit program spans the pod and ICI handles any reduction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.decoder import DecoderState, GranuleBatch, decode_granules

STREAM_AXIS = "streams"


def make_mesh(devices=None, axis: str = STREAM_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices, stream-parallel."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = STREAM_AXIS
                   ) -> NamedSharding:
    """Shard the leading (slot) axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def _shard_tree(tree, mesh: Mesh, axis: str):
    def put(x):
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))
    return jax.tree.map(put, tree)


def place_batch(batch: GranuleBatch, mesh: Mesh,
                axis: str = STREAM_AXIS) -> GranuleBatch:
    """Place a GranuleBatch sharded over the stream axis.  B must be a
    multiple of the mesh size."""
    return _shard_tree(batch, mesh, axis)


def place_state(state: DecoderState, mesh: Mesh,
                axis: str = STREAM_AXIS) -> DecoderState:
    return _shard_tree(state, mesh, axis)


def replicate_tables(mesh: Mesh):
    """Constant tables are baked into the jit program (numpy constants), so
    XLA replicates them automatically; nothing to place."""
    return None


@functools.partial(jax.jit, static_argnames=("exact", "bug_compat"))
def _decode_with_stats(batch, state, exact, bug_compat):
    pcm, new_state = decode_granules(batch, state, exact=exact,
                                     bug_compat=bug_compat)
    # serving telemetry: how many samples hit the ±32767 clip rails —
    # a global reduction XLA lowers to an ICI all-reduce when sharded
    clipped = jnp.sum((pcm == 32767) | (pcm == -32767))
    return pcm, new_state, clipped


def pallas_state_specs(axis: str = STREAM_AXIS):
    """PartitionSpecs for a PallasState (slot axis is MINOR in the
    kernel's feature-major layout, unlike DecoderState's leading axis)."""
    from ..ops.pallas_step import PallasState
    return PallasState(store_t=P(None, None, None, axis),
                       v_t=P(None, None, None, axis),
                       prev_lines=P(axis, None))


def place_pallas_state(pstate, mesh: Mesh, axis: str = STREAM_AXIS):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        pstate, pallas_state_specs(axis))


@functools.lru_cache(maxsize=8)
def _sharded_pallas_step(mesh: Mesh, axis: str, exact: bool,
                         bug_compat: bool):
    """jit(shard_map) of the fused Pallas granule step over the stream
    axis.  pallas_call is not auto-partitioned by pjit, but the decode is
    embarrassingly parallel across slots, so shard_map runs the SAME
    kernel per device on its local shard — pure data placement, zero
    collectives, and the sharded serving path keeps the fastest kernel
    (round-2 VERDICT item 3)."""
    from ..ops.pallas_step import decode_granules_pallas

    bspec = GranuleBatch(*(P(axis, *([None] * (nd - 1)))
                           for nd in _BATCH_NDIMS))
    sspec = pallas_state_specs(axis)

    def step(batch, pstate):
        return decode_granules_pallas.__wrapped__(
            batch, pstate, exact, bug_compat, 128)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-
    # axes annotation; the decode is per-slot independent (no collectives)
    # so the replication check has nothing to verify anyway
    fn = jax.shard_map(step, mesh=mesh,
                       in_specs=(bspec, sspec),
                       out_specs=(P(axis, None, None), sspec),
                       check_vma=False)
    return jax.jit(fn)


# per-field ndims of GranuleBatch's REQUIRED fields (leading axis =
# slots, see the class docstring) — used to build PartitionSpec pytrees
# without materializing a batch: ix, scf_l, scf_s, layout, block_type,
# win_switch, mixed, global_gain, scalefac_scale, preflag, subblock_gain,
# count1, ms_flag, is_flag, nch, active, gr1.  The defaulted LSF sidecar
# fields stay None here: the SoA serving wire is MPEG-1 (None spec leaves
# match the batch's None leaves as empty pytrees).
_BATCH_NDIMS = [3, 3, 4, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1]
assert len(_BATCH_NDIMS) == len(GranuleBatch._fields) - len(
    GranuleBatch._field_defaults)


def decoder_state_specs(axis: str = STREAM_AXIS):
    return DecoderState(store=P(axis, None, None, None),
                        v_blocks=P(axis, None, None, None),
                        prev_lines=P(axis, None))


@functools.lru_cache(maxsize=8)
def sharded_frame_soa_step(mesh: Mesh, axis: str, exact: bool,
                           bug_compat: bool, kernel: str):
    """jit(shard_map) of the whole-frame SoA decode (two granule steps)
    over the stream axis — the serving form (runtime/sharded.py,
    runtime/multihost.py) for kernel="pallas", where pjit cannot
    auto-partition the pallas_call.  Step tensors carry the slot axis at
    position 1 ([2, B, ...]); state is a PallasState (slot axis minor)."""
    from ..models.decoder import decode_frame_soa

    sspec = (pallas_state_specs(axis) if kernel == "pallas"
             else decoder_state_specs(axis))

    def step(ix2, scf_l2, scf_s2, meta2, active, state):
        return decode_frame_soa.__wrapped__(
            ix2, scf_l2, scf_s2, meta2, active, state, exact,
            bug_compat, kernel, False)

    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None),
                  P(None, axis, None, None), P(None, axis, None),
                  P(axis), sspec),
        out_specs=(P(axis, None, None), sspec),
        check_vma=False)  # see _sharded_pallas_step
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def sharded_frame_lsf_step(mesh: Mesh, axis: str, family: int,
                           exact: bool, bug_compat: bool, kernel: str):
    """jit(shard_map) of the LSF one-granule frame decode
    (models.decoder.decode_frame_lsf_soa) over the stream axis — the
    sharded/multi-host serving form for LSF pools.  Section tensors
    carry the slot axis at position 1 ([F, B, ...]); is_pos is the
    [F, B, 64] intensity sidecar.  Zero collectives, both kernels."""
    from ..models.decoder import decode_frame_lsf_soa

    sspec = (pallas_state_specs(axis) if kernel == "pallas"
             else decoder_state_specs(axis))

    def step(ix, scf_l, scf_s, meta, is_pos, active, state):
        return decode_frame_lsf_soa.__wrapped__(
            ix, scf_l, scf_s, meta, is_pos, active, state, family,
            exact, bug_compat, False, kernel)

    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None),
                  P(None, axis, None, None), P(None, axis, None),
                  P(None, axis, None), P(None, axis), sspec),
        out_specs=(P(axis, None, None), sspec),
        check_vma=False)  # see _sharded_pallas_step
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def sharded_l12_step(mesh: Mesh, axis: str, exact: bool,
                     float_pcm: bool = False):
    """jit(shard_map) of the batched Layer I/II frame step
    (models.l12.decode_l12_frames) over the stream axis — the sharded
    serving form for the per-layer pools (beyond-reference capability).
    The step is synthesis-only (the frontend requantizes on the host),
    so like the Layer III paths it is pure data placement: sb_samples
    [B,2,S,32], nch/active [B], and the v_blocks FIFO [B,2,15,64] all
    shard on B; zero collectives."""
    from ..models.l12 import L12State, decode_l12_frames

    def step(sb, nch, active, state):
        return decode_l12_frames.__wrapped__(sb, nch, active, state,
                                             exact, float_pcm)

    sspec = L12State(v_blocks=P(axis, None, None, None))
    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(axis, None, None, None), P(axis), P(axis), sspec),
        out_specs=(P(axis, None, None), sspec),
        check_vma=False)  # see _sharded_pallas_step
    return jax.jit(fn)


def decode_granules_sharded(batch: GranuleBatch, state, mesh: Mesh,
                            exact: bool = False, bug_compat: bool = True,
                            kernel: str = "xla"):
    """SPMD decode step over a sharded batch.  Inputs must already be
    placed (place_batch/place_state, or place_pallas_state for
    kernel="pallas" with a PallasState).  Returns (pcm, new_state,
    clipped_count)."""
    if kernel == "pallas":
        fn = _sharded_pallas_step(mesh, STREAM_AXIS, exact, bug_compat)
        pcm, new_state = fn(batch, state)
        clipped = jnp.sum((pcm == 32767) | (pcm == -32767))
        return pcm, new_state, clipped
    assert kernel == "xla", kernel
    with mesh:
        return _decode_with_stats(batch, state, exact, bug_compat)
