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


def decode_granules_sharded(batch: GranuleBatch, state: DecoderState,
                            mesh: Mesh, exact: bool = False,
                            bug_compat: bool = True):
    """SPMD decode step over a sharded batch.  Inputs must already be
    placed (place_batch/place_state); outputs inherit the input sharding.
    Returns (pcm, new_state, clipped_count)."""
    with mesh:
        return _decode_with_stats(batch, state, exact, bug_compat)
