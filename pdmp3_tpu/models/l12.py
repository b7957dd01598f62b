"""Batched Layer I/II decode (beyond-reference: layer != 3 is rejected
by the reference, pdmp3.c:1240/1312).

The Layer I/II DSP is the polyphase synthesis filterbank alone: the
frontend (Python or native) already requantized the subband samples
(frontend._parse_l1/_parse_l2), so the device step is

    sb_samples f32 [B, 2, S, 32]  ->  synthesis  ->  PCM [B, S*32, 2]

with S = 12 (Layer I) or 36 (Layer II) synthesis steps per frame and the
same per-stream v_blocks FIFO state as Layer III (ops/dsp.py
subband_synthesis is step-count agnostic).  Frames from many streams
batch on axis B; layer selects the compiled program (static S), exactly
like the LSF family pools.

There is no reference bit-parity target here — the contract is bitwise
agreement with the oracle path (same f32 op order) plus libavcodec
cross-validation at quantization-noise tolerance (tests/test_l12.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..frontend import FrameData
from ..ops import dsp


class L12State(NamedTuple):
    """Per-slot recurrent synthesis state (the reference's function-
    static v_vec, pdmp3.c:1983, correctly per-stream here)."""
    v_blocks: jax.Array       # f32 [B,2,15,64] polyphase FIFO (oldest first)


def init_l12_state(batch_size: int) -> L12State:
    return L12State(
        v_blocks=jnp.zeros((batch_size, 2, 15, 64), jnp.float32))


@functools.partial(jax.jit, static_argnames=("exact", "float_pcm"))
def decode_l12_frames(sb_samples: jax.Array, nch: jax.Array,
                      active: jax.Array, state: L12State,
                      exact: bool = True, float_pcm: bool = False
                      ) -> tuple[jax.Array, L12State]:
    """One batched Layer I/II frame step.

    sb_samples: f32 [B, 2, S, 32] frontend-requantized subband samples
    (S static: 12 = Layer I, 36 = Layer II; mixing layers in one batch
    is not possible — route streams to per-layer pools).
    Returns (pcm i16 [B, S*32, 2] — or f32 with float_pcm — and state').
    """
    x_time = sb_samples.transpose(0, 1, 3, 2)          # [B,2,32,S]
    sums, v_blocks = dsp.subband_synthesis(x_time, state.v_blocks,
                                           exact=exact)
    if float_pcm:
        pcm = dsp.float_pack(sums, nch)
    else:
        pcm = dsp.quantize_pack(sums, nch, exact=exact)
    # starved/finished slots freeze state and emit silence (same failure
    # isolation as the Layer III pools, SURVEY.md §5)
    act = (active != 0)
    v_blocks = jnp.where(act[:, None, None, None], v_blocks, state.v_blocks)
    pcm = jnp.where(act[:, None, None], pcm, 0)
    return pcm, L12State(v_blocks=v_blocks)


def batch_from_frames(fds: list[FrameData | None], layer: int
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack per-stream FrameData (or None for starved slots) into the
    step's (sb_samples, nch, active) tensors."""
    S = 12 if layer == 1 else 36
    B = len(fds)
    sb = np.zeros((B, 2, S, 32), np.float32)
    nch = np.ones(B, np.int32)
    active = np.zeros(B, np.int32)
    for b, fd in enumerate(fds):
        if fd is None or fd.sb_samples is None:
            continue
        assert fd.sb_samples.shape[1] == S, (fd.sb_samples.shape, S)
        sb[b] = fd.sb_samples
        nch[b] = fd.header.nch
        active[b] = 1
    return sb, nch, active


class JaxL12:
    """Per-stream wrapper with the OracleDSP.decode_frame interface:
    packed PCM uint32 [2, 576] per frame (Layer I fills the first 384
    words; Layer II fills all 1152).  Used by the 3-way equivalence
    tests."""

    def __init__(self, exact: bool = True):
        self.exact = exact
        self.state = init_l12_state(1)

    def reset(self) -> None:
        self.state = init_l12_state(1)

    def decode_frame(self, fd: FrameData) -> np.ndarray:
        assert fd.sb_samples is not None
        S = fd.sb_samples.shape[1]
        sb = jnp.asarray(fd.sb_samples[None])
        nch = jnp.asarray([fd.header.nch], jnp.int32)
        act = jnp.ones(1, jnp.int32)
        pcm, self.state = decode_l12_frames(sb, nch, act, self.state,
                                            exact=self.exact)
        pcm = np.asarray(pcm[0])                      # [S*32, 2]
        left = pcm[:, 0].astype(np.uint16).astype(np.uint32)
        right = pcm[:, 1].astype(np.uint16).astype(np.uint32)
        out = np.zeros(1152, np.uint32)
        out[:S * 32] = (left << 16) | right
        return out.reshape(2, 576)
