"""Batched streaming polyphase resampler (serving option).

Serving consumers often want one common output rate (e.g. 48 kHz) from
pools decoding at 32/44.1/48 kHz or the LSF rates — a capability the
reference lacks entirely.  This is the TPU-idiomatic formulation: a
windowed-sinc polyphase filter bank applied as a batched
gather-multiply-reduce over ``[B, N, C]`` PCM blocks, with the
inter-block carry (the last taps-1 input samples per stream) threaded as
explicit state like the decoder's overlap/FIFO carries.

Rational ratio L/M (e.g. 44100->48000 = 160/147): output j of a step
reads input window ``m_j`` with phase ``p_j`` where
``(m_j, p_j) = divmod(phase0 + j*M, L)``.  Per-step output length
depends only on the running phase, which the host tracks as a scalar —
so each step's jit specializes on one of at most two ``n_out`` values
(the phase cycles with period L/gcd).
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.jit import lazy_jit as _lazy_jit


@functools.lru_cache(maxsize=None)
def polyphase_filter(up: int, down: int, taps_per_phase: int = 24,
                     beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype split into ``up`` phases:
    [up, taps_per_phase] float32, unit DC gain per phase."""
    ntaps = up * taps_per_phase
    cutoff = min(1.0 / up, 1.0 / down)  # of Nyquist*up
    n = np.arange(ntaps, dtype=np.float64) - (ntaps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * n) * np.kaiser(ntaps, beta)
    h *= up / h.sum()
    # phase p holds taps h[p], h[p+up], ... (standard polyphase split);
    # normalize each phase to unit DC so constant inputs stay constant
    ph = h.reshape(taps_per_phase, up).T.copy()   # [up, taps]
    ph /= ph.sum(axis=1, keepdims=True) * np.float64(1.0)
    return np.ascontiguousarray(ph[:, ::-1]).astype(np.float32)


@functools.partial(_lazy_jit, static_argnames=("n_out", "taps"))
def _resample_block(x, m_idx, p_idx, H, n_out: int, taps: int):
    """x f32 [B, Nin+taps-1, C] (carry prefix + this block);
    m_idx/p_idx i32 [n_out]; H f32 [up, taps].
    Returns y f32 [B, n_out, C]."""
    # window gather: [n_out, taps] absolute input indices
    win = m_idx[:, None] + jnp.arange(taps, dtype=jnp.int32)[None, :]
    xg = jnp.take(x, win, axis=1)                 # [B, n_out, taps, C]
    hg = jnp.take(H, p_idx, axis=0)               # [n_out, taps]
    return jnp.einsum("bntc,nt->bnc", xg, hg)


class StreamResampler:
    """Streaming rational resampler over batched PCM steps.

    Feed successive ``[B, N, C]`` int16 (or float) PCM blocks from a
    rate-homogeneous pool; returns ``[B, n_out, C]`` blocks in the same
    dtype with gapless stitching (one-shot and streaming outputs are
    identical up to the filter's warmup).  State per stream is the last
    taps-1 input samples."""

    def __init__(self, from_rate: int, to_rate: int, batch: int,
                 channels: int = 2, taps_per_phase: int = 24,
                 dtype=jnp.int16):
        g = math.gcd(from_rate, to_rate)
        self.up = to_rate // g
        self.down = from_rate // g
        self.taps = taps_per_phase
        self.H = jnp.asarray(polyphase_filter(self.up, self.down,
                                              taps_per_phase))
        self.phase = 0            # in units of 1/up input samples
        self.carry = jnp.zeros((batch, self.taps - 1, channels),
                               jnp.float32)
        self.dtype = dtype

    def __call__(self, pcm):
        """pcm [B, N, C] -> [B, n_out, C]; n_out varies by at most one
        between steps (phase-dependent), so jit compiles two shapes."""
        x = jnp.concatenate([self.carry, pcm.astype(jnp.float32)], axis=1)
        n_in = int(pcm.shape[1])
        # output j reads input m_j = (phase + j*down) // up at phase
        # p_j = (phase + j*down) % up; consume all outputs whose window
        # [m_j, m_j + taps) fits in the carried-plus-new samples
        n_out = (n_in * self.up - self.phase + self.down - 1) // self.down
        ph = self.phase + np.arange(n_out, dtype=np.int64) * self.down
        m = (ph // self.up).astype(np.int32)
        p = (ph % self.up).astype(np.int32)
        y = _resample_block(x, jnp.asarray(m), jnp.asarray(p), self.H,
                            n_out=n_out, taps=self.taps)
        self.phase = int(ph[-1] + self.down - n_in * self.up)
        self.carry = x[:, x.shape[1] - (self.taps - 1):, :]
        if self.dtype == jnp.int16:
            return jnp.clip(jnp.round(y), -32768, 32767).astype(jnp.int16)
        return y.astype(self.dtype)
