"""Fused Pallas TPU kernel for the decode back half.

One kernel fuses: hybrid synthesis (36/12-pt IMDCT as MXU contractions vs
the frozen cosine bases + windowing + overlap-add against the store state),
frequency inversion (sign mask), and the 32-subband polyphase filterbank
(64x32 matrixing on the MXU + 16-tap windowed FIR as static sliding-window
multiply-adds over 33 v-blocks).  Every intermediate (IMDCT outputs, the
v-block window) stays in VMEM; the XLA path (ops/dsp.py) materializes them
between fusions.

Mosaic layout constraints shape the formulation: no lane-dim splits, so
the 3 interleaved 12-pt short-block IMDCTs are folded into one 18x36
expanded basis matrix (C3[k, i3*12+p] = cos12[k/3, p] when k%3 == i3), and
quantize/interleave stays outside the kernel.

Reference provenance: pdmp3.c:1649-1700 (IMDCT), 1752-1780 (overlap),
1738-1746 (inversion), 1978-2045 (synthesis).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables as T

F32 = jnp.float32
_HIGH = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=1)
def _consts():
    # expanded short-IMDCT basis: sums12_flat[.., i3*12+p] =
    #   sum_k xw[.., k] * C3[k, i3*12+p],   tin index k = i3 + 3m
    cos12 = np.asarray(T.COS_N12)  # [m, p]
    c3 = np.zeros((18, 36), np.float32)
    for k in range(18):
        i3, m = k % 3, k // 3
        c3[k, i3 * 12:(i3 + 1) * 12] = cos12[m]
    win2_tiled = np.tile(np.asarray(T.IMDCT_WIN[2][:12]), 3)  # [36]
    return dict(
        cos36=np.asarray(T.COS_N36),            # [18,36]
        c3=c3,
        win=np.asarray(T.IMDCT_WIN),            # [4,36]
        win2=win2_tiled,
        nwin=np.asarray(T.SYNTH_NWIN),          # [64,32]
        d=np.asarray(T.SYNTH_D).reshape(16, 32),
        inv=T.freq_inversion_sign(),            # [32,18]
    )


def _kernel(xw_ref, store_ref, v_ref, bt4_ref, act4_ref,
            cos36_ref, c3_ref, win_ref, win2_ref, nwin_ref, d_ref, inv_ref,
            sums_ref, store_out_ref, v_out_ref):
    # bt4: effective block type [N,2,32,1] (precomputed in XLA); act4:
    # active mask [N,1,1,1].  Mosaic cannot rank-expand vectors, but
    # broadcasting an existing size-1 minor dim is native, so all masks
    # enter pre-rank-expanded and are broadcast_to'd here.
    N = xw_ref.shape[0]
    xw = xw_ref[:]                               # [N,2,32,18]
    x2 = xw.reshape(N * 64, 18)
    bt4 = bt4_ref[:]

    # --- long 36-pt IMDCT + per-(slot,ch,sb) window select ---
    long_sums = jax.lax.dot_general(
        x2, cos36_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=_HIGH).reshape(N, 2, 32, 36)
    onehot = (jnp.broadcast_to(bt4, (N, 2, 32, 4)) ==
              jax.lax.broadcasted_iota(jnp.int32, (N, 2, 32, 4), 3)
              ).astype(F32)
    wsel = jax.lax.dot_general(
        onehot.reshape(N * 64, 4), win_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=_HIGH).reshape(N, 2, 32, 36)
    long_out = long_sums * wsel

    # --- short 3x12-pt IMDCT via the expanded basis, then overlap ---
    s12 = jax.lax.dot_general(
        x2, c3_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=_HIGH).reshape(N, 2, 32, 36)
    contrib = s12 * win2_ref[:]
    z6 = jnp.zeros((N, 2, 32, 6), F32)
    c0 = contrib[..., 0:12]
    c1 = contrib[..., 12:24]
    c2 = contrib[..., 24:36]
    # overlap layout (pdmp3.c:1684): [6:18)=c0, [12:24)+=c1, [18:30)+=c2
    short_out = jnp.concatenate(
        [z6, c0[..., :6], c0[..., 6:] + c1[..., :6],
         c1[..., 6:] + c2[..., :6], c2[..., 6:], z6], axis=-1)

    short_mask = jnp.broadcast_to(bt4, (N, 2, 32, 36)) == 2
    out36 = jnp.where(short_mask, short_out, long_out)

    # --- overlap-add + store + frequency inversion ---
    x_time = (out36[..., :18] + store_ref[:]) * inv_ref[:]
    new_store = out36[..., 18:]

    # --- polyphase matrixing (MXU) + sliding-window FIR ---
    s_all = x_time.swapaxes(2, 3)                # [N,2,18,32]
    new_blocks = jax.lax.dot_general(
        s_all.reshape(N * 36, 32), nwin_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=F32, precision=_HIGH).reshape(N, 2, 18, 64)
    blocks = jnp.concatenate([v_ref[:], new_blocks], axis=2)  # [N,2,33,64]

    d = d_ref[:]
    acc = jnp.zeros((N, 2, 18, 32), F32)
    for j in range(16):
        half = 32 * (j & 1)
        blk = blocks[:, :, 15 - j:33 - j, half:half + 32]
        acc = acc + d[j] * blk

    act4 = act4_ref[:]
    sums_ref[:] = jnp.where(
        jnp.broadcast_to(act4, (N, 2, 18, 32)) != 0, acc, 0.0)
    store_out_ref[:] = jnp.where(
        jnp.broadcast_to(act4, (N, 2, 32, 18)) != 0, new_store, store_ref[:])
    v_out_ref[:] = jnp.where(
        jnp.broadcast_to(act4, (N, 2, 15, 64)) != 0,
        blocks[:, :, 18:, :], v_ref[:])


@functools.partial(jax.jit, static_argnames=("block_slots",))
def synthesis_pipeline(x, store, v_blocks, win_switch, block_type, mixed,
                       nch, active, block_slots: int = 16):
    """Fused back half: x [B,2,576] (post-antialias) -> (pcm i16 [B,576,2],
    new_store, new_v).  Pads B up to a block_slots multiple."""
    from . import dsp

    B = x.shape[0]
    n = min(block_slots, B)
    pad = (-B) % n
    if pad:
        padded = [(0, pad)] + [(0, 0)]
        x = jnp.pad(x, [(0, pad), (0, 0), (0, 0)])
        store = jnp.pad(store, [(0, pad)] + [(0, 0)] * 3)
        v_blocks = jnp.pad(v_blocks, [(0, pad)] + [(0, 0)] * 3)
        win_switch = jnp.pad(win_switch, padded)
        block_type = jnp.pad(block_type, padded)
        mixed = jnp.pad(mixed, padded)
        nch = jnp.pad(nch, (0, pad))
        active = jnp.pad(active, (0, pad))
    Bp = x.shape[0]
    c = _consts()
    xw = x.reshape(Bp, 2, 32, 18)
    # effective block type (mixed forces long windows for sb<2) — computed
    # here so the kernel only sees pre-rank-expanded tensors
    sb = jnp.arange(32, dtype=jnp.int32)
    bt_eff = jnp.where(((win_switch == 1) & (mixed == 1))[..., None]
                       & (sb < 2), 0, block_type[..., None])
    bt4 = bt_eff.reshape(Bp, 2, 32, 1)
    act4 = active.reshape(Bp, 1, 1, 1)

    def cspec(arr):
        nd = np.asarray(arr).ndim
        return pl.BlockSpec(np.asarray(arr).shape,
                            (lambda i: (0,) * nd), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((n, 2, 32, 18), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 2, 32, 18), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 2, 15, 64), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 2, 32, 1), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 1, 1, 1), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        cspec(c["cos36"]), cspec(c["c3"]), cspec(c["win"]),
        cspec(c["win2"]), cspec(c["nwin"]), cspec(c["d"]), cspec(c["inv"]),
    ]
    out_specs = (
        pl.BlockSpec((n, 2, 18, 32), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 2, 32, 18), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 2, 15, 64), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bp, 2, 18, 32), jnp.float32),
        jax.ShapeDtypeStruct((Bp, 2, 32, 18), jnp.float32),
        jax.ShapeDtypeStruct((Bp, 2, 15, 64), jnp.float32),
    )
    sums, new_store, new_v = pl.pallas_call(
        _kernel,
        grid=(Bp // n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(xw, store, v_blocks, bt4, act4,
      jnp.asarray(c["cos36"]), jnp.asarray(c["c3"]), jnp.asarray(c["win"]),
      jnp.asarray(c["win2"]), jnp.asarray(c["nwin"]), jnp.asarray(c["d"]),
      jnp.asarray(c["inv"]))
    pcm = dsp.quantize_pack(sums, nch, exact=False)
    pcm = jnp.where((active != 0)[:, None, None], pcm, 0)
    if pad:
        return pcm[:B], new_store[:B], new_v[:B]
    return pcm, new_store, new_v
