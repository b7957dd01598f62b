"""Feature-major fused Pallas TPU kernel for the decode back half.

The round-1 kernel tiled slot-major tensors like [N, 2, 32, 18], paying
up to 7x VMEM/VPU padding on the 18/36-wide minor dims — it never beat
the XLA path.  This kernel flips the layout: **batch-in-lanes**.  Every tensor is [features..., B] with the slot axis
minor; B blocks are multiples of 128 lanes, so nothing pads, and every
contraction becomes a clean [M, K] @ [K, n*128] MXU matmul with the
constant basis on the left:

    IMDCT     : COS36^T[36,18] @ x[18, 32*BN]      (pdmp3.c:1649-1700)
    polyphase : NWIN[64,32]    @ x_t[32, 18*BN]    (pdmp3.c:1989-2014)

One kernel fuses hybrid synthesis (long + folded-short IMDCT bases,
window select, overlap-add against the store carry), frequency inversion
(constant sign mask), the polyphase filterbank (matrixing + 16-tap
D-window FIR over a 33-block sliding window), PCM quantization, and
active-slot state freezing.  Intermediates never touch HBM.

Precision: `exact=False` matches ops/dsp.py's fast path (HIGHEST-precision
matmuls, ±1 LSB PCM); `exact=True` replays the reference's sequential
accumulation order with VPU broadcast multiply-adds and returns raw f32
sums so the caller can apply the float64 quantization rounding point
(pdmp3.c:2028) outside the kernel — Mosaic has no f64.

State lives in the transposed layout across steps (PallasState), so the
only per-step layout cost is one transpose of the freshly-computed
spectra into [2, 18, 32, B].
"""
from __future__ import annotations

import functools
from typing import NamedTuple

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
    cos12 = np.asarray(T.COS_N12)  # [m, p]
    # folded short-IMDCT basis: the 3 interleaved 12-pt IMDCTs become one
    # 18x36 matrix with C3[k, i3*12+p] = cos12[k//3, p] where i3 = k%3
    # (tin index k = i3 + 3m, pdmp3.c:1678-1686)
    c3 = np.zeros((18, 36), np.float32)
    for k in range(18):
        i3, m = k % 3, k // 3
        c3[k, i3 * 12:(i3 + 1) * 12] = cos12[m]
    win2_tiled = np.tile(np.asarray(T.IMDCT_WIN[2][:12]), 3)  # [36]
    inv = T.freq_inversion_sign()  # [32, 18] -> want [18, 32]
    del inv
    return dict(
        cos36_t=np.ascontiguousarray(np.asarray(T.COS_N36).T),  # [36, 18]
        c3_t=np.ascontiguousarray(c3.T),                        # [36, 18]
        win_t=np.ascontiguousarray(np.asarray(T.IMDCT_WIN).T),  # [36, 4]
        win2=win2_tiled.reshape(36, 1),
        nwin=np.asarray(T.SYNTH_NWIN),                          # [64, 32]
        d=np.asarray(T.SYNTH_D).reshape(16, 32),
        inv_t=np.ascontiguousarray(T.freq_inversion_sign().T),  # [18, 32]
    )


class PallasState(NamedTuple):
    """Recurrent DSP state in the kernel's feature-major layout."""
    store_t: jax.Array       # f32 [2, 18, 32, B]
    v_t: jax.Array           # f32 [2, 15, 64, B]
    prev_lines: jax.Array    # f32 [B, 3] (band-12 OOB carry, slot-major)


def init_pallas_state(batch_size: int) -> PallasState:
    return PallasState(
        store_t=jnp.zeros((2, 18, 32, batch_size), F32),
        v_t=jnp.zeros((2, 15, 64, batch_size), F32),
        prev_lines=jnp.zeros((batch_size, 3), F32),
    )


def state_to_pallas(state) -> PallasState:
    """DecoderState [B,2,32,18]/[B,2,15,64] -> feature-major."""
    prev = state.prev_lines
    if prev is None:
        prev = jnp.zeros((state.store.shape[0], 3), F32)
    return PallasState(
        store_t=state.store.transpose(1, 3, 2, 0),
        v_t=state.v_blocks.transpose(1, 2, 3, 0),
        prev_lines=prev,
    )


def state_from_pallas(pstate: PallasState):
    from ..models.decoder import DecoderState
    return DecoderState(
        store=pstate.store_t.transpose(3, 0, 2, 1),
        v_blocks=pstate.v_t.transpose(3, 0, 1, 2),
        prev_lines=pstate.prev_lines,
    )


def _prev3(xa_t, store_t, bt_t, exact: bool) -> jax.Array:
    """The band-12 OOB carry — x_time[0:3] of (ch0, sb0) — computed in
    XLA from the kernel's INPUTS rather than read from its output.

    This is not duplication for fun: the carry feeds the NEXT step's
    requantize, and routing it through the kernel serializes step k+1's
    whole front half behind step k's kernel (measured +1.4 ms/step at
    B=8192 — the front halves stop pipelining under the kernels).  Rows
    0-2 of subband 0 need only a [3,18] slice of the IMDCT basis, the
    window select, the overlap store, and no frequency inversion (even
    subband, rows 0-2 even/odd pattern starts +1): identical operation
    order to the kernel's rows, so the carried bits are identical (the
    Pallas conformance tests assert state equality bitwise)."""
    c = _consts()
    x0 = xa_t[0, :, 0, :]                       # [18, B]
    cos3 = jnp.asarray(c["cos36_t"][0:3])       # [3, 18]
    if exact:
        s = cos3[:, 0:1] * x0[0:1]
        for m in range(1, 18):
            s = s + cos3[:, m:m + 1] * x0[m:m + 1]
    else:
        s = jax.lax.dot_general(cos3, x0, (((1,), (0,)), ((), ())),
                                preferred_element_type=F32,
                                precision=_HIGH)
    bt0 = bt_t[0, 0, :]                         # [B]
    oh = (bt0[None, :] ==
          jnp.arange(4, dtype=jnp.int32)[:, None]).astype(F32)  # [4, B]
    wsel = jax.lax.dot_general(jnp.asarray(c["win_t"][0:3]), oh,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=F32,
                               precision=_HIGH)                 # [3, B]
    long3 = s * wsel
    # pure short blocks: rows 0-5 of the 36-sample output are zero
    out3 = jnp.where(bt0[None, :] == 2, F32(0.0), long3)
    return out3 + store_t[0, 0:3, 0, :]


def _kernel(exact: bool,
            xa_ref, store_ref, v_ref, bt_ref, act_ref,
            cos36t_ref, c3t_ref, wint_ref, win2_ref, nwin_ref, d_ref,
            inv_ref,
            out_ref, store_out_ref, v_out_ref, prev_ref):
    BN = xa_ref.shape[-1]
    act = act_ref[0].reshape(1, 1, BN) != 0      # [1,1,BN]
    win2 = win2_ref[:][:, :, None]               # [36,1,1]
    inv = inv_ref[:][:, :, None]                 # [18,32,1]

    for ch in range(2):
        xa = xa_ref[ch]                          # [18, 32, BN]
        x2 = xa.reshape(18, 32 * BN)
        if exact:
            # reference accumulation order: sequential over the 18 inputs
            # (pdmp3.c:1673-1699), VPU broadcast multiply-adds
            long_sums = cos36t_ref[:, 0:1] * x2[0:1]
            s12 = c3t_ref[:, 0:1] * x2[0:1]
            for m in range(1, 18):
                xm = x2[m:m + 1]                 # [1, 32*BN]
                long_sums = long_sums + cos36t_ref[:, m:m + 1] * xm
                # the folded short basis has one nonzero band per m, so
                # per-output sums still accumulate in tin order
                s12 = s12 + c3t_ref[:, m:m + 1] * xm
        else:
            long_sums = jax.lax.dot_general(
                cos36t_ref[:], x2, (((1,), (0,)), ((), ())),
                preferred_element_type=F32, precision=_HIGH)  # [36, 32*BN]
            s12 = jax.lax.dot_general(
                c3t_ref[:], x2, (((1,), (0,)), ((), ())),
                preferred_element_type=F32, precision=_HIGH)

        long_sums = long_sums.reshape(36, 32, BN)
        s12 = s12.reshape(36, 32, BN)

        # per-(sb, slot) window select via one-hot MXU matmul (bit-exact:
        # one nonzero 1.0 per column; a lane->sublane vector reshape is
        # the one form Mosaic rejects, so no where-chains of win rows)
        bt = bt_ref[ch]                          # [32, BN]
        iota4 = jax.lax.broadcasted_iota(jnp.int32, (4, 32, BN), 0)
        bt_oh = (bt.reshape(1, 32, BN) == iota4).astype(F32)
        wsel = jax.lax.dot_general(
            wint_ref[:], bt_oh.reshape(4, 32 * BN),
            (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=_HIGH)
        long_out = long_sums * wsel.reshape(36, 32, BN)

        # short blocks: 3 windowed 12-pt IMDCTs overlapped into 36
        # (pdmp3.c:1684): [6:18)=c0, [12:24)+=c1, [18:30)+=c2
        contrib = s12 * win2
        z6 = jnp.zeros((6, 32, BN), F32)
        c0, c1, c2 = contrib[0:12], contrib[12:24], contrib[24:36]
        short_out = jnp.concatenate(
            [z6, c0[:6], c0[6:] + c1[:6], c1[6:] + c2[:6], c2[6:], z6],
            axis=0)

        out36 = jnp.where(bt.reshape(1, 32, BN) == 2, short_out, long_out)

        # overlap-add + store + frequency inversion (pdmp3.c:1752-1780,
        # 1738-1746); inv is the constant ±1 mask
        x_time = (out36[:18] + store_ref[ch]) * inv
        store_out_ref[ch] = jnp.where(act, out36[18:], store_ref[ch])

        if ch == 0:
            # band-12 OOB carry: granule-0 ch0 lines 0..2 = sb0 samples
            prev_ref[:] = x_time[0:3, 0, :]

        # polyphase: matrix 32 subband samples per output step through
        # NWIN (pdmp3.c:2006-2014); needs sb-major layout
        xt = x_time.swapaxes(0, 1)               # [32, 18, BN]
        x3 = xt.reshape(32, 18 * BN)
        if exact:
            # reference j-order accumulation over subbands
            nb = nwin_ref[:, 0:1] * x3[0:1]
            for j in range(1, 32):
                nb = nb + nwin_ref[:, j:j + 1] * x3[j:j + 1]
        else:
            nb = jax.lax.dot_general(
                nwin_ref[:], x3, (((1,), (0,)), ((), ())),
                preferred_element_type=F32, precision=_HIGH)  # [64,18*BN]
        nb = nb.reshape(64, 18, BN).swapaxes(0, 1)  # [18, 64, BN]

        blocks = jnp.concatenate([v_ref[ch], nb], axis=0)  # [33, 64, BN]
        acc = jnp.zeros((18, 32, BN), F32)
        for j in range(16):
            half = 32 * (j & 1)
            blk = blocks[15 - j:33 - j, half:half + 32, :]
            acc = acc + d_ref[j:j + 1][:, :, None] * blk
        v_out_ref[ch] = jnp.where(act, blocks[18:], v_ref[ch])

        acc = jnp.where(act, acc, 0.0)
        if exact:
            out_ref[ch] = acc.reshape(576, BN)
        else:
            # quantize: x32767, trunc toward zero, clip, with the
            # reference's cvttsd2si NaN/overflow -> -32767 (dsp.py)
            scaled = acc.reshape(576, BN) * F32(32767.0)
            t = jnp.trunc(scaled)
            oob = jnp.isnan(scaled) | (t < -2147483648.0) | \
                (t > 2147483647.0)
            out_ref[ch] = jnp.where(
                oob, F32(-32767.0), jnp.clip(t, -32767.0, 32767.0))


@functools.partial(jax.jit, static_argnames=("block_lanes", "exact"))
def back_half_t(xa_t, store_t, v_t, bt_t, active,
                block_lanes: int = 128, exact: bool = False):
    """Fused back half in feature-major layout.

    xa_t f32 [2,18,32,B] (post-antialias, i-major per subband);
    store_t [2,18,32,B]; v_t [2,15,64,B]; bt_t i32 [2,32,B] effective
    block types; active i32 [B].  B must be a multiple of block_lanes
    (callers pad).

    Returns (pcm_t, new_store_t, new_v_t, prev3):
    pcm_t f32 [2,576,B] (quantized samples as floats in fast mode, raw
    sums in exact mode), prev3 f32 [3,B].
    """
    B = xa_t.shape[-1]
    # Mosaic needs 128-aligned lane blocks for the in-kernel minor-dim
    # merges; pad the slot axis with inactive lanes when B is small/ragged
    BN = min(block_lanes, B)
    pad = (-B) % BN if B >= BN else 0
    if B < BN or (BN % 128 and jax.default_backend() == "tpu"):
        BN = 128 if jax.default_backend() == "tpu" else BN
        pad = (-B) % BN
    if pad:
        padw = [(0, 0)] * 3 + [(0, pad)]
        xa_t = jnp.pad(xa_t, padw)
        store_t = jnp.pad(store_t, padw)
        v_t = jnp.pad(v_t, padw)
        bt_t = jnp.pad(bt_t, [(0, 0), (0, 0), (0, pad)])
        active = jnp.pad(active, (0, pad))
    Bp = xa_t.shape[-1]
    c = _consts()
    act2 = active.reshape(1, Bp).astype(jnp.int32)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((*shape[:-1], BN),
                            lambda i, _n=nd: (0,) * (_n - 1) + (i,),
                            memory_space=pltpu.VMEM)

    def cspec(arr):
        shape = np.asarray(arr).shape
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    in_specs = [
        bspec((2, 18, 32, Bp)), bspec((2, 18, 32, Bp)),
        bspec((2, 15, 64, Bp)), bspec((2, 32, Bp)), bspec((1, Bp)),
        cspec(c["cos36_t"]), cspec(c["c3_t"]), cspec(c["win_t"]),
        cspec(c["win2"]), cspec(c["nwin"]), cspec(c["d"]),
        cspec(c["inv_t"]),
    ]
    out_specs = (
        bspec((2, 576, Bp)), bspec((2, 18, 32, Bp)),
        bspec((2, 15, 64, Bp)), bspec((3, Bp)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((2, 576, Bp), F32),
        jax.ShapeDtypeStruct((2, 18, 32, Bp), F32),
        jax.ShapeDtypeStruct((2, 15, 64, Bp), F32),
        jax.ShapeDtypeStruct((3, Bp), F32),
    )
    # x64 mode promotes the index-map literals to i64, which Mosaic cannot
    # legalize (failed 'func.return'); the kernel itself is pure f32/i32
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, exact),
            grid=(Bp // BN,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=jax.default_backend() != "tpu",
        )(xa_t, store_t, v_t, bt_t, act2,
          jnp.asarray(c["cos36_t"]), jnp.asarray(c["c3_t"]),
          jnp.asarray(c["win_t"]), jnp.asarray(c["win2"]),
          jnp.asarray(c["nwin"]), jnp.asarray(c["d"]),
          jnp.asarray(c["inv_t"]))
    if pad:
        outs = tuple(o[..., :B] for o in outs)
    return outs


@functools.partial(jax.jit,
                   static_argnames=("block_lanes", "exact", "bug_compat"))
def decode_granules_pallas(batch, pstate: PallasState,
                           exact: bool = False, bug_compat: bool = True,
                           block_lanes: int = 128):
    """One batched granule step on the Pallas path.

    Front half (requantize/stereo/antialias; reorder is folded into the
    host wire packer) runs as XLA ops from ops/dsp.py; the back half is
    the fused feature-major kernel.  Same
    (pcm, state) contract as models.decoder.decode_granules, with state
    in PallasState layout.
    """
    from . import dsp

    x = dsp.requantize(batch.ix, batch.scf_l, batch.scf_s, batch.layout,
                       batch.global_gain, batch.scalefac_scale,
                       batch.preflag, batch.subblock_gain, exact=exact,
                       gr1=batch.gr1, prev_lines=pstate.prev_lines,
                       pre_reordered=True)
    x = dsp.stereo(x, batch.layout, batch.scf_l, batch.scf_s, batch.count1,
                   batch.ms_flag, batch.is_flag, exact=exact,
                   bug_compat_short_intensity=bug_compat)
    x = dsp.antialias(x, batch.layout, batch.win_switch, batch.block_type,
                      batch.mixed)

    B = x.shape[0]
    xa_t = x.reshape(B, 2, 32, 18).transpose(1, 3, 2, 0)  # [2,18,32,B]
    sb = jnp.arange(32, dtype=jnp.int32)
    bt_eff = jnp.where(((batch.win_switch == 1) & (batch.mixed == 1))
                       [..., None] & (sb < 2), 0,
                       batch.block_type[..., None])       # [B,2,32]
    bt_t = bt_eff.transpose(1, 2, 0)                      # [2,32,B]

    pcm_t, store_t, v_t, _ = back_half_t(
        xa_t, pstate.store_t, pstate.v_t, bt_t, batch.active,
        block_lanes=block_lanes, exact=exact)
    # the carry comes from _prev3 (kernel inputs), NOT the kernel output:
    # reading it from the kernel serializes the next step's front half
    # behind this step's kernel (see _prev3's docstring)
    prev3 = _prev3(xa_t, pstate.store_t, bt_t, exact)

    act = batch.active
    if exact:
        # reference quantization rounds through float64 (pdmp3.c:2028)
        scaled = pcm_t.astype(jnp.float64) * 32767.0
        t = jnp.trunc(scaled)
        oob = jnp.isnan(scaled) | (t < -2147483648.0) | (t > 2147483647.0)
        q = jnp.where(oob, jnp.float64(-32767.0),
                      jnp.clip(t, -32767.0, 32767.0))
    else:
        q = pcm_t
    # interleave in the kernel's feature-major layout and cast to int16
    # BEFORE the [2,576,B] -> [B,576,2] relayout: the batch-minor ->
    # batch-major transpose is the single most expensive op in the step
    # (measured 1.5 ms at B=8192), and on packed int16 it costs ~2.4x
    # less than on the int32 it used to run on
    q16 = q.astype(jnp.int16)                             # [2,576,B]
    left = q16[0]
    right = jnp.where((batch.nch == 1)[None, :], left, q16[1])
    out = jnp.stack([left, right], axis=0)                # [2,576,B]
    out = jnp.where((act != 0)[None, None, :], out, 0)
    out = out.transpose(2, 1, 0)                          # [B,576,2]

    new_prev = jnp.where(((batch.gr1 == 0) & (act != 0))[:, None],
                         prev3.T, pstate.prev_lines)
    return out, PallasState(store_t=store_t, v_t=v_t, prev_lines=new_prev)
