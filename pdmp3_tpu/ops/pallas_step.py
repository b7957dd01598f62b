"""Feature-major fused Pallas TPU granule kernels.

The round-1 kernel tiled slot-major tensors like [N, 2, 32, 18], paying
up to 7x VMEM/VPU padding on the 18/36-wide minor dims — it never beat
the XLA path.  These kernels flip the layout: **batch-in-lanes**.  Every
tensor is [features..., B] with the slot axis minor; B blocks are
multiples of 128 lanes, so nothing pads, and every contraction is an
[M, K] @ [K, n*128] MXU matmul with the constant basis on the left.

Round 4 restructured the fast kernel's contractions once more: the
original forms merged the subband axis into lanes around each matmul
(IMDCT COS36^T[36,18] @ x[18, 32*BN]; polyphase NWIN[64,32] @
x_t[32, 18*BN]), and KERNEL_PROFILE_r04 showed those lane-crossing
relayouts — not the matmul passes — dominated the step (1.0 of 1.78 ms
at B=8192).  The fused kernel now keeps subbands in sublanes and runs

    IMDCT     : [72,18] @ xa_sb[sb][18, BN]  x32   (pdmp3.c:1649-1700)
    polyphase : NWIN[64,32] @ xt[i][32, BN]  x18   (pdmp3.c:1989-2014)
    expansions: E[576, 9*K] @ (layout-onehot ⊗ params)[9*K, BN]

on free outer-dim slices — identical MXU tile-op count, zero lane
relayouts (step 1.72 -> 1.39 ms).  Measured dead ends, for the record:
block_lanes 256 (slightly slower, 512 fails VMEM), M-stacking/K-folding
the merged-form bases (neutral — the relayouts were the cost), reduced
matmul precision (DEFAULT saves ~0.25 ms but bf16 rounding breaks the
±1 LSB fast contract), and quantize+interleave+pack inside the kernel
(+0.1 ms: the XLA pack overlaps the kernel across grid steps, in-kernel
pack extends the critical path and ch0's PCM live-range).

Fast mode runs the ENTIRE granule step as one pallas_call
(`_kernel_full`): requantize (Newton exp2/log2 pow-4/3, exponent-bitcast
gains), stereo (MS butterfly + intensity incl. the reference's
short-block bug emulation), antialias, hybrid synthesis (long +
folded-short IMDCT bases, window select, overlap-add), frequency
inversion, the polyphase filterbank (matrixing + 16-tap D-window FIR
over a 33-block sliding window), PCM quantization, and active-slot state
freezing.  Spectra never touch HBM; the short-block reorder is not a
device op at all (folded into the host wire pack, models/decoder.py).

Exact mode keeps the split form: the XLA front half (ops/dsp.py, which
owns the two f64 rounding points Mosaic lacks) feeds the back-half
kernel (`_kernel`), which replays the reference's sequential
accumulation order with VPU broadcast multiply-adds and returns raw f32
sums for the caller's float64 quantize (pdmp3.c:2028).

State lives in the transposed layout across steps (PallasState), so the
per-step layout cost is one i16 ix transpose in and one i16 PCM
relayout out.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables as T
from ..utils.jit import lazy_jit as _lazy_jit

# Bench-only fast-kernel stage ablations (tools/abl_fast.py): each value
# SKIPS one stage of the fused kernel so its cost can be attributed
# on-chip (KERNEL_PROFILE_r04.json).  Output is wrong under any ablation
# — never set in production.  Values: nopow (pow-4/3 Newton chain),
# nogain (requantize gain chains + expansions), nostereo (MS/intensity),
# noaa (antialias), noimdct (IMDCT matmuls), nopoly (polyphase
# matrixing), nofir (16-tap D-window FIR -> 1 tap), noquant
# (quantize/clip -> raw sums).
_ABLF = os.environ.get("PDMP3_ABL_FAST", "")

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
    cos36_t = np.ascontiguousarray(np.asarray(T.COS_N36).T)     # [36, 18]
    c3_t = np.ascontiguousarray(c3.T)                           # [36, 18]
    win_t = np.ascontiguousarray(np.asarray(T.IMDCT_WIN).T)     # [36, 4]
    # fast-mode hybrid-synthesis constants, packed into one [108, 22]
    # matrix: rows 0:72 = the long + folded-short IMDCT bases stacked
    # along M (one contraction instead of two; each output row is the
    # same dot product, bitwise identical), rows 72:108 / cols 18:22 =
    # the window-select table read per block type by _back_ch_sb's
    # one-hot broadcast FMAs (exact selection; the summed ±0 terms can
    # only flip the sign of all-zero lanes — invisible after quantize).
    hyb_left = np.zeros((108, 22), np.float32)
    hyb_left[0:36, 0:18] = cos36_t
    hyb_left[36:72, 0:18] = c3_t
    hyb_left[72:108, 18:22] = win_t
    return dict(
        cos36_t=cos36_t,
        c3_t=c3_t,
        win_t=win_t,
        hyb_left=hyb_left,                                      # [108, 22]
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


def _back_ch(exact: bool, ch: int, xa, store_ref, bt, act,
             cos36t_ref, c3t_ref, wint_ref, hybl_ref, win2_ref, v_ref,
             nwin_ref, d_ref, inv_ref,
             out_ref, store_out_ref, v_out_ref, prev_ref,
             quantize_exact: bool = False, out_idx=()):
    """Back half for one channel (shared by the back-half-only kernel and
    the fully-fused kernel), writing results through the output refs as
    soon as each is final, and reading the store/v carries from their
    REFS at first use — returning values or materializing ref slices at
    the call site extends live ranges across the body and overflows the
    16M scoped-VMEM stack at BN=128 (measured +0.8M).

    xa [18,32,BN] post-antialias spectra; bt [32,BN] effective block
    types; act [1,1,BN] bool.  out_ref gets quantized floats in fast
    mode, raw sums in exact."""
    BN = xa.shape[-1]
    win2 = win2_ref[:][:, :, None]               # [36,1,1]
    inv = inv_ref[:][:, :, None]                 # [18,32,1]
    x2 = xa.reshape(18, 32 * BN)
    # per-(sb, slot) window-select one-hot (bit-exact: one nonzero 1.0
    # per column; a lane->sublane vector reshape is the one form Mosaic
    # rejects, so no where-chains of win rows)
    iota4 = jax.lax.broadcasted_iota(jnp.int32, (4, 32, BN), 0)
    bt_oh = (bt.reshape(1, 32, BN) == iota4).astype(F32)
    if not exact and _ABLF == "noimdct":
        # ablation: IMDCT matmuls replaced by a broadcast (downstream
        # unchanged; output wrong by design)
        long_sums = jnp.broadcast_to(x2[0:1], (36, 32 * BN))
        s12 = long_sums
        wsel = jax.lax.dot_general(
            wint_ref[:], bt_oh.reshape(4, 32 * BN),
            (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=_HIGH)
    elif exact:
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
        wsel = jax.lax.dot_general(
            wint_ref[:], bt_oh.reshape(4, 32 * BN),
            (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=_HIGH)
    else:
        # the long + folded-short IMDCT bases stacked along M ([72,18],
        # rows 0:72 of hyb_left): one contraction instead of two, with
        # each output row an unchanged dot product — bitwise identical
        fused = jax.lax.dot_general(
            hybl_ref[0:72, 0:18], x2, (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=_HIGH)  # [72, 32*BN]
        long_sums = fused[0:36]
        s12 = fused[36:72]
        wsel = jax.lax.dot_general(
            wint_ref[:], bt_oh.reshape(4, 32 * BN),
            (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=_HIGH)

    long_sums = long_sums.reshape(36, 32, BN)
    s12 = s12.reshape(36, 32, BN)
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

    xt03 = x_time[0:3, 0, :] if ch == 0 else None
    if ch == 0 and prev_ref is not None:
        # band-12 OOB carry: granule-0 ch0 lines 0..2 = sb0 samples
        prev_ref[:] = xt03

    # polyphase: matrix 32 subband samples per output step through
    # NWIN (pdmp3.c:2006-2014); needs sb-major layout
    xt = x_time.swapaxes(0, 1)               # [32, 18, BN]
    x3 = xt.reshape(32, 18 * BN)
    if not exact and _ABLF == "nopoly":
        # ablation: polyphase matrixing replaced by a broadcast
        nb = jnp.broadcast_to(x3[0:1], (64, 18 * BN))
    elif exact:
        # reference j-order accumulation over subbands
        nb = nwin_ref[:, 0:1] * x3[0:1]
        for j in range(1, 32):
            nb = nb + nwin_ref[:, j:j + 1] * x3[j:j + 1]
    else:
        nb = jax.lax.dot_general(
            nwin_ref[:], x3, (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=_HIGH)  # [64,18*BN]
    nb = nb.reshape(64, 18, BN).swapaxes(0, 1)  # [18, 64, BN]

    # v is read HERE, not at the call site: materializing v_ref[ch] as
    # an argument extends the 983K carry's live range across the whole
    # body and overflows the 16M scoped-VMEM stack at BN=128
    blocks = jnp.concatenate([v_ref[ch], nb], axis=0)  # [33, 64, BN]
    acc = jnp.zeros((18, 32, BN), F32)
    if not exact and _ABLF == "nofir":
        # ablation: 16-tap D-window FIR reduced to one tap
        acc = d_ref[0:1][:, :, None] * blocks[15:33, 0:32, :]
    else:
        for j in range(16):
            half = 32 * (j & 1)
            blk = blocks[15 - j:33 - j, half:half + 32, :]
            acc = acc + d_ref[j:j + 1][:, :, None] * blk
    v_out_ref[ch] = jnp.where(act, blocks[18:], v_ref[ch])

    acc = jnp.where(act, acc, 0.0)
    if exact and quantize_exact:
        # fused exact: the f64 quantize point emulated in f32
        # (_k_qz_exact, proven over all 2^32 inputs); the pin rounds
        # the FIR accumulation before the two_prod split (dsp.py's
        # quantize_pack pins the same point)
        out_ref[(*out_idx, ch)] = _k_qz_exact(
            _k_pin(acc.reshape(576, BN)))
    elif exact or _ABLF == "noquant":
        out_ref[(*out_idx, ch)] = acc.reshape(576, BN)
    else:
        # quantize: x32767, trunc toward zero, clip, with the
        # reference's cvttsd2si NaN/overflow -> -32767 (dsp.py)
        scaled = acc.reshape(576, BN) * F32(32767.0)
        t = jnp.trunc(scaled)
        oob = jnp.isnan(scaled) | (t < -2147483648.0) | \
            (t > 2147483647.0)
        out_ref[(*out_idx, ch)] = jnp.where(
            oob, F32(-32767.0), jnp.clip(t, -32767.0, 32767.0))
    return xt03


def _back_ch_sb(ch: int, xa_sb, store_ref, bt, act,
                hybl_ref, win2_ref, v_ref, nwin_ref, d_ref, inv_ref,
                out_ref, store_out_ref, v_out_ref, out_idx=(),
                exact: bool = False):
    """Back half in the subband-outer layout (fused kernels; the
    back-half-only kernel keeps `_back_ch`).

    exact=True replaces each MXU contraction with the reference-order
    sequential broadcast-FMA chain over the SAME subband-outer slices —
    identical accumulation order per output element as `_back_ch`'s
    exact mode (hence bitwise equal), but with zero lane-crossing
    relayouts (the r04 restructure that bought fast mode +28%), and the
    f64 quantize point emulated in-kernel (_k_qz_exact).

    The batch-in-lanes kernels' original form merged the subband axis
    into lanes around every MXU contraction ([18,32,BN] -> [18,32*BN]
    for the IMDCT, [32,18*BN] for the polyphase, plus the inverse
    un-merges of each output).  Those lane-crossing relayouts — not the
    matmul passes — dominated the stage cost (KERNEL_PROFILE_r04:
    0.73 + 0.29 ms/step; a precision-DEFAULT probe moved only ~0.25 ms,
    and M-stacking the bases moved nothing).  Here the IMDCT runs as 32
    per-subband [72,18]@[18,BN] contractions on free outer-dim slices
    and the polyphase as 18 per-time-index [64,32]@[32,BN]
    contractions: identical MXU tile-op count, zero lane relayouts,
    and every output element remains the same dot product — bitwise
    equal to the merged form (window select becomes 4 one-hot
    broadcast FMAs, exact selection with the same ±0-only caveat as
    hyb_left).

    xa_sb [32,18,BN] post-antialias spectra, subband-outer; bt [32,BN]
    effective block types; act [1,1,BN] bool.  out_idx prefixes the
    out_ref write index (the frame-fused kernel's granule slot).
    Returns x_time[0:3] of subband 0 for ch 0 (the band-12 prev3 carry,
    written to its ref or chained in-register by the caller), else None.
    """
    BN = xa_sb.shape[-1]
    win2 = win2_ref[:]                           # [36,1]
    cos_lhs = hybl_ref[0:72, 0:18]               # long + folded-short
    st = store_ref[ch].swapaxes(0, 1)            # [32,18,BN] sb-outer
    z6 = jnp.zeros((6, BN), F32)
    x_time = []
    new_store = []
    xt03 = None
    for sb in range(32):
        if exact:
            # reference m-order accumulation (pdmp3.c:1673-1699) on the
            # free [72,BN] slice — bitwise equal to _back_ch's chains
            # (each output row sums the same products in the same order)
            xsb = xa_sb[sb]
            fused = cos_lhs[:, 0:1] * xsb[0:1]
            for m in range(1, 18):
                fused = fused + cos_lhs[:, m:m + 1] * xsb[m:m + 1]
        elif _ABLF == "noimdct":
            # ablation: IMDCT contractions replaced by a broadcast
            fused = jnp.broadcast_to(xa_sb[sb][0:1], (72, BN))
        else:
            fused = jax.lax.dot_general(
                cos_lhs, xa_sb[sb], (((1,), (0,)), ((), ())),
                preferred_element_type=F32, precision=_HIGH)  # [72,BN]
        bt_sb = bt[sb:sb + 1]                    # [1,BN]
        wsel = jnp.zeros((36, BN), F32)
        for w in range(4):
            wsel = wsel + (hybl_ref[72:108, 18 + w:19 + w]
                           * (bt_sb == w).astype(F32))
        long_out = fused[0:36] * wsel
        contrib = fused[36:72] * win2            # [36,BN]
        c0, c1, c2 = contrib[0:12], contrib[12:24], contrib[24:36]
        short_out = jnp.concatenate(
            [z6, c0[:6], c0[6:] + c1[:6], c1[6:] + c2[:6], c2[6:], z6],
            axis=0)
        out36 = jnp.where(bt_sb == 2, short_out, long_out)
        xt_sb = (out36[:18] + st[sb]) * inv_ref[:, sb:sb + 1]
        x_time.append(xt_sb)
        new_store.append(out36[18:])
        if ch == 0 and sb == 0:
            xt03 = xt_sb[0:3]
    ns = jnp.stack(new_store, axis=1)                 # [18,32,BN]
    store_out_ref[ch] = jnp.where(act, ns, store_ref[ch])

    # polyphase matrixing: 18 per-time-index [64,32]@[32,BN] dots on
    # free slices of the sb-sublane x_time (pdmp3.c:2006-2014)
    xt2 = jnp.stack(x_time, axis=1)              # [18,32,BN]
    if exact:
        # reference j-order accumulation (pdmp3.c:2006-2014) per time
        # index on free [64,BN] slices
        nw = nwin_ref[:]
        rows = []
        for i in range(18):
            xi = xt2[i]
            acc64 = nw[:, 0:1] * xi[0:1]
            for j in range(1, 32):
                acc64 = acc64 + nw[:, j:j + 1] * xi[j:j + 1]
            rows.append(acc64)
        nb = jnp.stack(rows, axis=0)             # [18,64,BN]
    elif _ABLF == "nopoly":
        nb = jnp.broadcast_to(xt2[0:1, 0:1], (18, 64, BN))
    else:
        nb = jnp.stack([
            jax.lax.dot_general(
                nwin_ref[:], xt2[i], (((1,), (0,)), ((), ())),
                preferred_element_type=F32, precision=_HIGH)
            for i in range(18)], axis=0)         # [18,64,BN]

    blocks = jnp.concatenate([v_ref[ch], nb], axis=0)  # [33,64,BN]
    acc = jnp.zeros((18, 32, BN), F32)
    if _ABLF == "nofir":
        acc = d_ref[0:1][:, :, None] * blocks[15:33, 0:32, :]
    else:
        for j in range(16):
            half = 32 * (j & 1)
            blk = blocks[15 - j:33 - j, half:half + 32, :]
            acc = acc + d_ref[j:j + 1][:, :, None] * blk
    v_out_ref[ch] = jnp.where(act, blocks[18:], v_ref[ch])

    acc = jnp.where(act, acc, 0.0)
    if exact:
        out_ref[(*out_idx, ch)] = _k_qz_exact(
            _k_pin(acc.reshape(576, BN)))
    elif _ABLF == "noquant":
        out_ref[(*out_idx, ch)] = acc.reshape(576, BN)
    else:
        scaled = acc.reshape(576, BN) * F32(32767.0)
        t = jnp.trunc(scaled)
        oob = jnp.isnan(scaled) | (t < -2147483648.0) | \
            (t > 2147483647.0)
        out_ref[(*out_idx, ch)] = jnp.where(
            oob, F32(-32767.0), jnp.clip(t, -32767.0, 32767.0))
    return xt03


def _kernel(exact: bool,
            xa_ref, store_ref, v_ref, bt_ref, act_ref,
            cos36t_ref, c3t_ref, wint_ref, hybl_ref, win2_ref, nwin_ref,
            d_ref, inv_ref,
            out_ref, store_out_ref, v_out_ref, prev_ref):
    BN = xa_ref.shape[-1]
    act = act_ref[0].reshape(1, 1, BN) != 0      # [1,1,BN]
    for ch in range(2):
        _back_ch(exact, ch, xa_ref[ch], store_ref, bt_ref[ch], act,
                 cos36t_ref, c3t_ref, wint_ref, hybl_ref, win2_ref,
                 v_ref, nwin_ref, d_ref, inv_ref,
                 out_ref, store_out_ref, v_out_ref, prev_ref)


# ---------------------------------------------------------------------------
# Fully-fused fast-mode kernel: requantize -> stereo -> antialias -> back
# half in one pallas_call.  The front half mirrors ops/dsp.py's fast
# formulations bit-for-bit except pow-4/3, where Mosaic's exp2/log2
# lowering may differ from XLA's by 1 ulp (inside the fast path's ±1 LSB
# budget; the exact path keeps the split XLA-front + exact kernel).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _front_consts(family: int = 0):
    """Front-half constants in feature-major matmul form: per-line
    expansions become [576, 9*K] matrices contracted with the per-slot
    (layout one-hot ⊗ parameter) tensor (ops/dsp.py:_expand transposed).

    family selects the sample-rate generation's band maps (LSF,
    tables.py): each family is its own compiled kernel with its own
    constants — the MPEG-1 hot path is untaxed."""
    from . import dsp as D

    def w(E):  # [9,576,K] -> [576, 9*K]
        E = np.asarray(E, np.float32)
        return np.ascontiguousarray(
            E.transpose(1, 0, 2).reshape(576, -1))

    def wm(m):  # [9,576] map -> [576,9] select matrix
        return np.ascontiguousarray(np.asarray(m, np.float32).T)

    smaps = T.stereo_maps(family)
    return dict(
        w_sfb=w(D._expansion_const("sfb", 22, True, family)),
        w_sfs=w(D._expansion_sfb_s(True, family)),
        # stereo reads short-block is_pos with the WINDOW-MAJOR line map
        # even post-reorder (reference bug-compat: pdmp3.c:2190-2220
        # walks window-major spans of the reordered array), hence the
        # plain (non-precomposed) variant
        w_sfs_plain=w(D._expansion_sfb_s(False, family)),
        w_win=w(D._expansion_const("win", 3, True, family)),
        w_pre=wm(D._pretab_line_map(family)),
        w_short=wm(T.layout_maps(family)["is_short"]),
        w_bs=wm(smaps["band_start"]),
        w_iok=wm(smaps["intensity_ok"]),
        ratio_l=np.asarray(D._RATIO_L, np.float32),
        ratio_r=np.asarray(D._RATIO_R, np.float32),
        cs=np.asarray(T.ANTIALIAS_CS, np.float32),
        ca=np.asarray(T.ANTIALIAS_CA, np.float32),
        inv_sqrt2=np.float32(T.INV_SQRT2),
        quarter_down=np.asarray(D._QUARTER_DOWN4, np.float32),
        quarter_up=np.asarray(D._QUARTER_UP4, np.float32),
        # exact-kernel band-12 selects (family 0 only): window index per
        # (line, layout) in the wire's line order, and the short band-12
        # line mask (dsp._win_line_map / _sfb12_short_map)
        w_winline=wm(D._win_line_map(True)),
        w_sfb12=wm(D._sfb12_short_map()),
    )


def _dot(a, b, prec=None):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=F32, precision=prec)


def _k_pow2i(n):
    """Exact 2^n via exponent-field bitcast (dsp._pow2_int in-kernel)."""
    ok = (n >= -126) & (n <= 127)
    bits = jnp.where(ok, (n + 127) << 23, 0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(bits, F32)


def _k_quarter(d, tab):
    t = [F32(np.float32(v)) for v in tab]
    return jnp.where(d == 0, t[0], jnp.where(d == 1, t[1],
                     jnp.where(d == 2, t[2], t[3])))


def _k_sel16(idx, tab):
    out = F32(np.float32(tab[15]))
    for k in range(14, -1, -1):
        out = jnp.where(idx == k, F32(np.float32(tab[k])), out)
    return out


# ---------------------------------------------------------------------------
# Exact-mode kernel arithmetic: f32-only emulations of the float64
# rounding points (TPU has no f64), each proven bit-identical to the
# f64 formula over EVERY f32 bit pattern by
# tools/prove_exact_emulations.py (EXACT_EMU_PROOF_r05.json), plus the
# correctly-rounded pow43 (dsp._pow43_ff_exact's construction with a
# kernel-safe seed, exhaustively re-proven over its 8207-entry domain).
# ---------------------------------------------------------------------------

def _k_pin(x):
    """Backend-conditional rewrite pin for the exact constructions.

    XLA's algebraic simplifier rewrites float identities ((x+C)-C,
    constant folding through scales) and mixes fusion clones, so any
    XLA evaluation of these chains needs optimization barriers.  Mosaic
    has no such pass (it lowers the jaxpr ops directly, no fast-math) —
    and does not implement optimization_barrier — so on the TPU kernel
    path the pin is an identity.  The on-chip 2^32 sweep
    (tools/prove_on_tpu.py) is the empirical check that Mosaic indeed
    preserves the constructions verbatim."""
    if jax.default_backend() == "tpu":
        return x
    from .dsp import _opaque
    return _opaque(x)


def _k_vsplit(a):
    # int32 bit math (Mosaic has no u32 path; the mask is sign-safe)
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-4096), F32)
    return hi, a - hi


def _k_two_prod(a, b):
    p = a * b
    ah, al = _k_vsplit(a)
    bh, bl = _k_vsplit(b)
    e = (((ah * bh - p) + ah * bl + al * bh) + al * bl)
    return p, e


def _split_const(v) -> tuple:
    """Host-side Veltkamp split of an f32 constant (Mosaic cannot
    bitcast scalars, so constant operands pre-split in Python)."""
    v = np.float32(v)
    hi = (v.view(np.uint32) & np.uint32(0xFFFFF000)).view(np.float32)
    return float(hi), float(np.float32(v - hi))


def _k_two_prod_const(a, c) -> tuple:
    """Dekker product of a vector by a PYTHON-FLOAT constant: the
    constant's split happens at trace time."""
    ch, cl = _split_const(c)
    p = a * F32(np.float32(c))
    ah, al = _k_vsplit(a)
    e = (((ah * F32(ch) - p) + ah * F32(cl) + al * F32(ch))
         + al * F32(cl))
    return p, e


def _k_two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _k_pow43_exact(mag):
    """Correctly-rounded x^(4/3) for integer magnitudes 0..8206 in
    kernel-safe ops (dsp._pow43_ff_exact with the uint division of the
    bit-hack seed replaced by an f32 multiply — any seed within ±8 ulp
    of the true cube root lands on the same result, and the kernel-form
    is exhaustively locked against the frozen table by
    test_pallas.test_kernel_pow43_exact_exhaustive)."""
    m = mag  # f32, integer-valued
    safe = jnp.maximum(m, F32(1.0))
    bits = jax.lax.bitcast_convert_type(safe, jnp.int32)
    third = (bits.astype(F32) * F32(1.0 / 3.0)).astype(jnp.int32)
    z = jax.lax.bitcast_convert_type(
        (jnp.int32(0x54A23000) - third), F32)
    for _ in range(4):
        z = z * (F32(4.0) - safe * z * z * z) * F32(1.0 / 3.0)
    c = safe * z * z
    p1, e1 = _k_two_prod(c, c)
    p2, e2 = _k_two_prod(p1, c)
    r = (p2 - safe) + (e2 + e1 * c)
    a3 = F32(3.0) * p1
    w = jax.lax.bitcast_convert_type(
        jnp.int32(0x7EF311C2)
        - jax.lax.bitcast_convert_type(a3, jnp.int32), F32)
    w = w * (F32(2.0) - a3 * w)
    w = w * (F32(2.0) - a3 * w)
    d = r * w
    yh, yl = _k_two_prod(safe, c)
    # the pins block FMA contraction / fusion-clone mixing of the final
    # rounding (identity in Mosaic; load-bearing in interpret mode and
    # for any XLA evaluation of this chain — see dsp._pow43_ff_exact)
    y = _k_pin(yh) + _k_pin(yl - safe * d)
    return jnp.where(m == 0, F32(0.0), y)


# exact f32 triple split of the f64 constant (plain numpy at module
# scope: jnp scalars here would initialize a backend at import)
_MS_C = float(T.INV_SQRT2)
_MS_C1 = np.float32(_MS_C)
_MS_C2 = np.float32(_MS_C - float(_MS_C1))
_MS_C3 = np.float32(_MS_C - float(_MS_C1) - float(_MS_C2))


def _k_ms_core(m):
    p1, e1 = _k_two_prod_const(m, _MS_C1)
    p2, e2 = _k_two_prod_const(m, _MS_C2)
    p3 = m * F32(_MS_C3)
    return p1 + ((e1 + p2) + (p3 + e2))


def _k_ms_exact(m):
    """fl32(f64(m) * C_INV_SQRT_2) in f32 ops (pdmp3.c:1923-1925).
    Three regimes: direct expansion; scaled expansion (two_prod error
    terms stay normal); integer-domain nearest-even for subnormal
    results.  Proven over all 2^32 inputs (EXACT_EMU_PROOF_r05)."""
    tiny = jnp.abs(m) < F32(2.0 ** -45)
    sub = jnp.abs(m) < F32(2.0 ** -125)
    mu = m * jnp.where(tiny, F32(2.0 ** 80), F32(1.0))
    y12 = _k_ms_core(mu) * jnp.where(tiny, F32(2.0 ** -80), F32(1.0))
    # subnormal results: k = m * 2^149 is an exact <=2^24 integer.
    # The two-step scale MUST NOT be folded into one constant (2^149
    # overflows f32 to inf) — barrier the intermediate.
    k = _k_pin(m * F32(2.0 ** 75)) * F32(2.0 ** 74)
    p1, e1 = _k_two_prod_const(k, _MS_C1)
    p2, e2 = _k_two_prod_const(k, _MS_C2)
    p3 = k * F32(_MS_C3)
    s, r = _k_two_sum(p1, p2 + (e1 + (p3 + e2)))
    sgn = jnp.where(s < 0, F32(-1.0), F32(1.0))
    sa = jnp.abs(s)
    big = sa >= F32(2.0 ** 23)
    # the magic adds MUST round (XLA's simplifier rewrites (x+C)-C to x
    # under real-number identities) — barrier each intermediate
    ia = jnp.where(big, sa,
                   _k_pin(sa + F32(2.0 ** 23)) - F32(2.0 ** 23))
    i = sgn * ia
    f = (s - i) + r
    half = F32(0.5)
    i = (i + jnp.where(f > half, F32(1.0), F32(0.0))
         - jnp.where(f < -half, F32(1.0), F32(0.0)))
    at_tie = jnp.abs(f) == half
    ih = jnp.abs(i) * F32(0.5)
    odd = (ih - (_k_pin(ih + F32(2.0 ** 23)) - F32(2.0 ** 23))) != 0
    i = (i + jnp.where(at_tie & odd & (f > 0), F32(1.0), F32(0.0))
         - jnp.where(at_tie & odd & (f < 0), F32(1.0), F32(0.0)))
    # 2^-149 is itself subnormal (constant canonicalization hazard):
    # scale down in two normal-constant steps, barriered against folding
    y3 = _k_pin(i * F32(2.0 ** -126)) * F32(2.0 ** -23)
    y3 = jnp.where((m < 0) & (y3 == 0), F32(-0.0), y3)
    y = jnp.where(sub, y3, y12)
    # +-0 (sign preserved), +-inf and NaN: the plain product matches the
    # f64 formula exactly; the expansion's error terms would be NaN
    special = (m == 0) | jnp.isnan(m) | jnp.isinf(m)
    return jnp.where(special, m * F32(_MS_C1), y)


def _k_uq_exact(t):
    """fl32(mod(trunc-input, 2^32)) for integer-valued f32 t
    (the short-intensity unsigned-assign quirk, pdmp3.c:2212-2213).
    Proven over all 2^32 inputs (EXACT_EMU_PROOF_r05; NaN/inf cannot
    reach this site — spectra are finite)."""
    k = jnp.floor(t * F32(2.0 ** -32))
    km, ke = _k_two_prod_const(k, 2.0 ** 32)
    r = (t - km) - ke
    return r + F32(0.0)


def _k_qz_exact(s):
    """trunc(f64(s)*32767) with cvttsd2si out-of-int32 semantics
    (pdmp3.c:2028-2031), as the final clipped float.  s*32767 is exact
    in f64, so this is exact truncation of the Dekker pair (p, e) plus
    boundary checks.  The truncation DECISION runs in int32 arithmetic
    on uniquely-rounded floats (p is the one rounding of s*32767; e is
    exact and FMA-immune by the 12-bit mask splits), so no float
    reassociation can change it — XLA's fuser was observed flipping a
    borrow in an earlier all-float formulation.  Proven against the
    f64 formula over every f32 bit pattern (EXACT_EMU_PROOF_r05)."""
    p, e = _k_two_prod_const(s, 32767.0)
    p, e = _k_pin(p), _k_pin(e)
    pa = jnp.abs(p)
    small_dom = pa < F32(2.0 ** 23)     # above: clips to 32767 anyway
    pc = jnp.clip(p, F32(-2.0 ** 23), F32(2.0 ** 23))
    ip = pc.astype(jnp.int32)           # trunc toward zero, exact
    exact_int = ip.astype(F32) == pc
    adj = (jnp.where(exact_int & (pc > 0) & (e < 0), jnp.int32(-1),
                     jnp.int32(0))
           + jnp.where(exact_int & (pc < 0) & (e > 0), jnp.int32(1),
                       jnp.int32(0)))
    ti = jnp.clip(ip + adj, -32767, 32767)
    # |product| >= 2^23: result clips to +-32767 unless out of int32
    # range (cvttsd2si -> INT32_MIN -> -32767 after the clip)
    neg = jax.lax.bitcast_convert_type(p, jnp.int32) < 0
    # boolean algebra, not where-of-bools (Mosaic cannot select i1)
    at_edge = pa == F32(2.0 ** 31)
    oob = ((pa > F32(2.0 ** 31))
           | (at_edge & ~neg & (e >= 0))
           | (at_edge & neg & (-e >= 1)))
    big = jnp.where(neg, jnp.int32(-32767), jnp.int32(32767))
    ti = jnp.where(small_dom, ti, big)
    bad = jnp.isnan(s) | (oob & ~small_dom)
    out = jnp.where(bad, jnp.int32(-32767), ti).astype(F32)
    # zero keeps the product's sign (f64 trunc(-0.99..) = -0.0; the
    # int32 path loses it; invisible after the int16 cast but kept for
    # bit-purity vs the f64 formula)
    return jnp.where((out == 0) & neg, F32(-0.0), out)


def _kernel_full(bug_compat: bool, family: int, slot_major_ix: bool,
                 exact: bool, *refs):
    # slot_major_ix: ix_ref arrives [BN, 2, 576] (the wire's native
    # layout) and is transposed to feature-major INSIDE the kernel —
    # the PDMP3_ABL=ixt experiment replacing the XLA transpose-in.
    # family != 0 (LSF) adds one input ref: ip_ref i32 [64, BN] — the
    # intensity sidecar (rows 0..21 long positions, 22..60 short flat,
    # illegal = 63); iscale rides meta row 12.  The MPEG-1 signature is
    # unchanged so its compiled kernel carries zero LSF overhead.
    # exact (family 0) adds: g12_ref f32 [3,BN] (band-12 TRUE gains),
    # gate_ref i32 [1,BN] (gr1 flags), wwl_ref/wsfb12_ref [576,9]
    # (window-line / band-12 select matrices).
    extra = {}
    if exact and family == 0:
        (g12_ref, gate_ref, wwl_ref, wsfb12_ref), refs = \
            refs[:4], refs[4:]
        extra = dict(g12=g12_ref, gate12=gate_ref,
                     wwl_ref=wwl_ref, wsfb12_ref=wsfb12_ref)
    if family:
        (ix_ref, scfl_ref, scfs_ref, lay_ref, meta_ref, sbg_ref,
         act_ref, bt_ref, store_ref, v_ref, ip_ref,
         wsfb_ref, wsfs_ref, wsfsp_ref, wwin_ref, wpre_ref,
         wshort_ref, wbs_ref, wiok_ref,
         cos36t_ref, c3t_ref, wint_ref, hybl_ref, win2_ref, nwin_ref,
         d_ref, inv_ref,
         out_ref, store_out_ref, v_out_ref, prev_ref) = refs
    else:
        (ix_ref, scfl_ref, scfs_ref, lay_ref, meta_ref, sbg_ref,
         act_ref, bt_ref, store_ref, v_ref,
         wsfb_ref, wsfs_ref, wsfsp_ref, wwin_ref, wpre_ref,
         wshort_ref, wbs_ref, wiok_ref,
         cos36t_ref, c3t_ref, wint_ref, hybl_ref, win2_ref, nwin_ref,
         d_ref, inv_ref,
         out_ref, store_out_ref, v_out_ref, prev_ref) = refs
        ip_ref = None
    BN = act_ref.shape[-1]
    act = act_ref[0].reshape(1, 1, BN) != 0
    xt03 = _fused_granule(
        bug_compat, family, slot_major_ix, act, None,
        ix_ref, scfl_ref, scfs_ref, lay_ref, meta_ref, sbg_ref, bt_ref,
        ip_ref, wsfb_ref, wsfs_ref, wsfsp_ref, wwin_ref, wpre_ref,
        wshort_ref, wbs_ref, wiok_ref,
        hybl_ref, win2_ref, nwin_ref, d_ref, inv_ref,
        store_ref, v_ref, out_ref, store_out_ref, v_out_ref,
        exact=exact, cos36t_ref=cos36t_ref, c3t_ref=c3t_ref,
        wint_ref=wint_ref, **extra)
    prev_ref[:] = xt03


def _fused_granule(bug_compat, family, slot_major_ix, act, scf12,
                   ix, scfl, scfs_in, lay, meta, sbg, bt, ip,
                   wsfb_ref, wsfs_ref, wsfsp_ref, wwin_ref, wpre_ref,
                   wshort_ref, wbs_ref, wiok_ref,
                   hybl_ref, win2_ref, nwin_ref, d_ref, inv_ref,
                   store_src, v_src, out_ref, store_out_ref, v_out_ref,
                   out_idx=(), exact=False, g12=None, gate12=None,
                   wwl_ref=None, wsfb12_ref=None,
                   cos36t_ref=None, c3t_ref=None, wint_ref=None):
    """One granule of the fully-fused fast step — the shared body of the
    per-granule `_kernel_full` and the frame-fused `_kernel_frame`.

    ix/scfl/... are refs or materialized [..., BN] granule slices (ref
    and value indexing coincide for every access below).  store_src /
    v_src are the state SOURCE — for in-frame chaining the previous
    granule's output refs.  scf12 is the in-kernel band-12 OOB
    substitution [3,BN] f32 for granule-1 steps (None = granule 0, or
    already applied in XLA by the per-granule path).  out_idx prefixes
    the PCM write index (the frame kernel's granule slot).  Returns
    x_time[0:3] of (ch0, sb0) — the prev3 carry."""
    BN = act.shape[-1]
    fc = _front_consts(family)

    if _ABLF == "noall":
        # empty-kernel probe: identical grid/blocks/IO, near-zero
        # compute — measures the dispatch + block-IO floor of the fused
        # step (round-5 fixed-overhead attribution, KERNEL_PROFILE_r05)
        z = ix[0].astype(F32) if not slot_major_ix \
            else ix[:, 0, :].astype(F32).T
        for ch in range(2):
            out_ref[(*out_idx, ch)] = z
        store_out_ref[...] = store_src[...]
        v_out_ref[...] = v_src[...]
        return jnp.zeros((3, BN), F32)

    # --- requantize both channels (pdmp3.c:1829-1905, 2117-2152) ---
    xs = []
    oh0 = short0 = scf_l0 = t_s0 = None
    for ch in range(2):
        if slot_major_ix:
            ixf = ix[:, ch, :].astype(jnp.int32).T    # [576,BN]
        else:
            ixf = ix[ch].astype(jnp.int32)            # [576,BN]
        sign = jnp.where(ixf < 0, F32(-1.0), F32(1.0))
        mag = jnp.clip(jnp.abs(ixf), 0, 8206).astype(F32)
        # x^(4/3) = x * cbrt(x), Newton-refined from an exp2/log2 seed
        # (dsp._pow43 fast path); exact = the correctly-rounded
        # float-float closed form (kernel-safe port of
        # dsp._pow43_ff_exact, locked over the full 8207-entry domain)
        if exact:
            tmp3 = sign * _k_pow43_exact(mag)
        elif _ABLF == "nopow":                    # ablation: skip cbrt
            tmp3 = sign * mag
        else:
            safe = jnp.maximum(mag, F32(1.0))
            cb = jnp.exp2(jnp.log2(safe) * F32(1.0 / 3.0))
            cb = (F32(2.0) * cb + safe / (cb * cb)) * F32(1.0 / 3.0)
            cb = (F32(2.0) * cb + safe / (cb * cb)) * F32(1.0 / 3.0)
            tmp3 = sign * jnp.where(mag == F32(0.0), F32(0.0), mag * cb)

        lay_ch = lay[ch].reshape(1, BN)
        oh9 = (jax.lax.broadcasted_iota(jnp.int32, (9, BN), 0)
               == lay_ch).astype(F32)
        short = _dot(wshort_ref[:], oh9)              # [576,BN] 0/1
        scfl_ch = scfl[ch].astype(F32)                # [22,BN]
        t_l = (oh9[:, None, :] * scfl_ch[None, :, :]).reshape(9 * 22, BN)
        scf_l_line = _dot(wsfb_ref[:], t_l)
        scfs = scfs_in[ch].astype(F32)                # [39,BN]
        if scf12 is not None and ch == 1:
            # frame-fused band-12 OOB substitution: ch1 rows 36:39 from
            # the in-frame prev3 bit patterns (same values the
            # per-granule path writes in XLA, decode_granules_pallas)
            scfs = jnp.concatenate([scfs[0:36], scf12], axis=0)
        t_s = (oh9[:, None, :] * scfs[None, :, :]).reshape(9 * 39, BN)
        scf_s_line = _dot(wsfs_ref[:], t_s)

        gg = meta[0 + ch].reshape(1, BN)
        sfs = meta[2 + ch].reshape(1, BN)
        preflag = meta[4 + ch].reshape(1, BN).astype(F32)
        qpu = 2 << sfs                                # [1,BN] i32
        pre_line = _dot(wpre_ref[:], oh9) * preflag
        q_long = qpu * (scf_l_line + pre_line).astype(jnp.int32)
        tmp1_long = (_k_quarter(q_long & 3, fc["quarter_down"])
                     * _k_pow2i(-(q_long >> 2)))
        eo_long = gg - 210
        tmp2_long = (_k_quarter(eo_long & 3, fc["quarter_up"])
                     * _k_pow2i(eo_long >> 2))
        q_short = qpu * scf_s_line.astype(jnp.int32)
        tmp1_short = (_k_quarter(q_short & 3, fc["quarter_down"])
                      * _k_pow2i(-(q_short >> 2)))
        if exact and family == 0:
            # host sentinel-63 scalefactors (q >= 100) decode as zero
            # gain (dsp._gain_quarter exact semantics)
            tmp1_long = jnp.where(q_long >= 100, F32(0.0), tmp1_long)
            tmp1_short = jnp.where(q_short >= 100, F32(0.0), tmp1_short)
            if ch == 1 and g12 is not None:
                # band-12 OOB bit-pattern scalefactors: the XLA caller
                # gathers the denormal-capable GAIN_QUARTER_TRUE values
                # [3,BN]; select per line by window and overwrite the
                # granule-1 ch1 short band-12 lines (dsp.requantize g12)
                wl = _dot(wwl_ref[:], oh9)            # [576,BN] win idx
                g12v = g12[:]
                g12_line = jnp.where(wl == F32(0.0), g12v[0:1],
                                     jnp.where(wl == F32(1.0),
                                               g12v[1:2], g12v[2:3]))
                m12 = ((_dot(wsfb12_ref[:], oh9) == F32(1.0))
                       & (gate12[:] != 0))
                tmp1_short = jnp.where(m12, g12_line, tmp1_short)
        sbg_ch = sbg[ch].astype(F32)                  # [3,BN]
        t_w = (oh9[:, None, :] * sbg_ch[None, :, :]).reshape(27, BN)
        sbg_line = _dot(wwin_ref[:], t_w)
        eo_short = gg - 210 - 8 * sbg_line.astype(jnp.int32)
        tmp2_short = (_k_quarter(eo_short & 3, fc["quarter_up"])
                      * _k_pow2i(eo_short >> 2))
        tmp1 = jnp.where(short == F32(1.0), tmp1_short, tmp1_long)
        tmp2 = jnp.where(short == F32(1.0), tmp2_short,
                         jnp.broadcast_to(tmp2_long, tmp2_short.shape))
        if _ABLF == "nogain":   # ablation: unit gains (DCE removes the
            xs.append(tmp3)     # gain chains and unused expansions)
        else:
            xs.append((tmp1 * tmp2) * tmp3)
        if ch == 0:
            oh0, short0, scf_l0, t_s0 = oh9, short, scf_l_line, t_s

    # --- stereo (pdmp3.c:1911-1972, 2154-2220) ---
    l, r = xs
    c0 = jnp.clip(meta[6].reshape(1, BN), 0, 576)
    c1r = jnp.clip(meta[7].reshape(1, BN), 0, 576)
    ms = meta[10].reshape(1, BN)
    isf = meta[11].reshape(1, BN)
    if _ABLF == "nostereo":   # ablation: constant-false masks fold the
        ms = jnp.zeros(ms.shape, ms.dtype)      # MS/intensity chains away
        isf = jnp.zeros(isf.shape, isf.dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (576, BN), 0)
    if family:
        # LSF: full-spectrum butterfly (production-decoder semantics,
        # dsp.stereo / DESIGN.md §6); intensity below pans the RAW
        # ch0 carrier, so keep it
        ms_mask = jnp.broadcast_to(ms != 0, (576, BN))
    else:
        ms_mask = (ms != 0) & (iota < jnp.minimum(c0, c1r))
    l_raw = l
    if exact:
        # the f64 rounding point (pdmp3.c:1923-1925) emulated in f32:
        # fl32(f64(fl32(l±r)) * C_INV_SQRT_2), proven over all 2^32
        # inputs (EXACT_EMU_PROOF_r05)
        l2 = jnp.where(ms_mask, _k_ms_exact(_k_pin(l + r)), l)
        r2 = jnp.where(ms_mask, _k_ms_exact(_k_pin(l - r)), r)
    else:
        cst = F32(fc["inv_sqrt2"])
        l2 = jnp.where(ms_mask, (l + r) * cst, l)
        r2 = jnp.where(ms_mask, (l - r) * cst, r)
    l, r = l2, r2

    band_start = _dot(wbs_ref[:], oh0, _HIGH).astype(jnp.int32)
    iok = _dot(wiok_ref[:], oh0)
    if family:
        # LSF intensity (13818-3 §2.4.3.2): positions from ch1's sidecar
        # expanded to lines with the same one-hot matmuls as the
        # scalefactors (values <= 63, bf16-exact); gains k0/k1 built by
        # the closed-form 2^(-q/4) construction, proven bit-identical to
        # tables.lsf_intensity_tables over every reachable (iscale, pos)
        # (test_lsf_pallas: closed-form lock)
        ipl = ip[0:22].astype(F32)                    # [22,BN]
        ips = ip[22:61].astype(F32)                   # [39,BN]
        t_pl = (oh0[:, None, :] * ipl[None, :, :]).reshape(9 * 22, BN)
        pos_l = _dot(wsfb_ref[:], t_pl)
        t_ps = (oh0[:, None, :] * ips[None, :, :]).reshape(9 * 39, BN)
        pos_s = _dot(wsfsp_ref[:], t_ps)
        pos = jnp.where(short0 == F32(1.0), pos_s, pos_l).astype(jnp.int32)
        imask = ((isf != 0) & (iok == F32(1.0)) & (band_start >= c1r)
                 & (pos != 63))
        isc1 = meta[12].reshape(1, BN) + 1            # iscale + 1
        p = jnp.clip(pos, 0, 63)
        odd = (p & 1) == 1
        q0 = jnp.where(odd, (p + 1) >> 1, 0) * isc1
        q1 = jnp.where(odd, 0, p >> 1) * isc1
        k0 = (_k_quarter(q0 & 3, fc["quarter_down"])
              * _k_pow2i(-(q0 >> 2)))
        k1 = (_k_quarter(q1 & 3, fc["quarter_down"])
              * _k_pow2i(-(q1 >> 2)))
        l2 = jnp.where(imask, k0 * l_raw, l)
        r = jnp.where(imask, k1 * l_raw, r)
        l = l2
        xs = [l, r]
    else:
        scf_s0_plain = _dot(wsfsp_ref[:], t_s0)
        is_pos = jnp.where(short0 == F32(1.0), scf_s0_plain,
                           scf_l0).astype(jnp.int32)
        imask = ((isf != 0) & (iok == F32(1.0)) & (band_start >= c1r)
                 & (is_pos != 7))
        # 16-wide ratios (is_pos 8..15 = reference OOB read emulation);
        # spec profile clamps short-block is_pos to the zero-ratio slot
        ip = jnp.clip(is_pos, 0, 15)
        if not bug_compat:
            ip = jnp.where(short0 == F32(1.0), jnp.minimum(ip, 7), ip)
        int_l = _k_sel16(ip, fc["ratio_l"]) * l
        int_r = _k_sel16(ip, fc["ratio_r"]) * l
        if bug_compat:
            # pdmp3.c:2212-2213 short-intensity unsigned-assign bug
            # (fast: f32 trunc/mod; exact: the f64 trunc+mod point
            # emulated in f32 — proven over all 2^32 inputs)
            if exact:
                u = _k_uq_exact(jnp.trunc(l))
            else:
                u = jnp.mod(jnp.trunc(l), F32(2.0 ** 32))
            int_l = jnp.where(short0 == F32(1.0), u, int_l)
            int_r = jnp.where(short0 == F32(1.0), u, int_r)
        l = jnp.where(imask, int_l, l)
        r = jnp.where(imask, int_r, r)
        xs = [l, r]

    # --- antialias (pdmp3.c:1706-1732) + back half per channel ---
    xt03 = None
    for ch in range(2):
        x2 = xs[ch].reshape(32, 18, BN)
        sblim = meta[8 + ch].reshape(1, BN)
        keep = (jax.lax.broadcasted_iota(jnp.int32, (31, BN), 0)
                + 1) < sblim
        # butterfly i couples rows (17-i, sb) x (i, sb+1); work on a
        # per-row list (Mosaic has no scatter; slices + one final stack
        # build xa directly in the back half's [18,32,BN] layout)
        rows = [x2[:, k] for k in range(18)]          # each [32,BN]
        if exact or _ABLF != "noaa":                  # ablation: skip AA
            for i in range(8):
                lo = rows[17 - i][:31]                # [31,BN]
                up = rows[i][1:]
                csi, cai = F32(fc["cs"][i]), F32(fc["ca"][i])
                lb = lo * csi - up * cai
                ub = up * csi + lo * cai
                rows[17 - i] = jnp.concatenate(
                    [jnp.where(keep, lb, lo), rows[17 - i][31:]], axis=0)
                rows[i] = jnp.concatenate(
                    [rows[i][:1], jnp.where(keep, ub, up)], axis=0)
        # subband-outer back half in both modes (exact = the same
        # per-element accumulation order as _back_ch's chains on
        # relayout-free slices, + the in-kernel f64 quantize emulation)
        xa_sb = jnp.stack(rows, axis=1)               # [32,18,BN]
        r03 = _back_ch_sb(ch, xa_sb, store_src, bt[ch], act,
                          hybl_ref, win2_ref, v_src, nwin_ref, d_ref,
                          inv_ref, out_ref, store_out_ref, v_out_ref,
                          out_idx, exact=exact)
        if ch == 0:
            xt03 = r03
    return xt03


def _kernel_frame(bug_compat: bool, family: int, ng: int,
                  parities: tuple, *refs):
    """Frame-fused fast kernel: ng granule steps in ONE pallas_call.

    The store/v state crosses granules in VMEM (one HBM round trip per
    STEP instead of per granule — at B=8192 the per-granule path moves
    ~200 MB of state per granule), and the band-12 OOB carry chains
    in-register: granule g with parities[g]==1 substitutes ch1's scf_s
    rows 36:39 from granule g-1's x_time[0:3] bit patterns in-kernel
    (bitwise the values decode_granules_pallas writes in XLA from
    prev_lines — test_frame_fused locks the equality).  It also removes
    the prev3 output->input edge between consecutive kernels, so the
    next step's XLA front half no longer serializes behind this step's
    kernel at all.

    parities: static granule-1 flags (the gr index within each frame);
    prev_in seeds the carry chain and prev_out leaves with the same
    parity/active gating as the per-granule path's new_prev."""
    if family:
        (ix_ref, scfl_ref, scfs_ref, lay_ref, meta_ref, sbg_ref,
         act_ref, bt_ref, pin_ref, store_ref, v_ref, ip_ref,
         wsfb_ref, wsfs_ref, wsfsp_ref, wwin_ref, wpre_ref,
         wshort_ref, wbs_ref, wiok_ref,
         cos36t_ref, c3t_ref, wint_ref, hybl_ref, win2_ref, nwin_ref,
         d_ref, inv_ref,
         out_ref, store_out_ref, v_out_ref, prev_ref,
         st_scr, v_scr) = refs
    else:
        (ix_ref, scfl_ref, scfs_ref, lay_ref, meta_ref, sbg_ref,
         act_ref, bt_ref, pin_ref, store_ref, v_ref,
         wsfb_ref, wsfs_ref, wsfsp_ref, wwin_ref, wpre_ref,
         wshort_ref, wbs_ref, wiok_ref,
         cos36t_ref, c3t_ref, wint_ref, hybl_ref, win2_ref, nwin_ref,
         d_ref, inv_ref,
         out_ref, store_out_ref, v_out_ref, prev_ref,
         st_scr, v_scr) = refs
        ip_ref = None
    BN = act_ref.shape[-1]
    pv = pin_ref[:]                                   # [3,BN]
    for g in range(ng):
        act = act_ref[g, 0].reshape(1, 1, BN) != 0
        scf12 = None
        if parities[g]:
            # uint32 compare via int32 + sign check (negative float bit
            # patterns exceed 1024 unsigned): bitwise the XLA form
            bi = jax.lax.bitcast_convert_type(pv, jnp.int32)
            scf12 = jnp.where((bi >= 0) & (bi < 1024), bi,
                              1024).astype(F32)
        # inter-granule state rides VMEM scratch so the output refs
        # stay write-only (reading an output block would pin it and
        # serialize the grid's revolving-buffer pipelining); only the
        # LAST granule writes the real outputs
        last = g == ng - 1
        xt03 = _fused_granule(
            bug_compat, family, False, act, scf12,
            ix_ref[g], scfl_ref[g], scfs_ref[g], lay_ref[g],
            meta_ref[g], sbg_ref[g], bt_ref[g],
            None if ip_ref is None else ip_ref[g],
            wsfb_ref, wsfs_ref, wsfsp_ref, wwin_ref, wpre_ref,
            wshort_ref, wbs_ref, wiok_ref,
            hybl_ref, win2_ref, nwin_ref, d_ref, inv_ref,
            store_ref if g == 0 else st_scr,
            v_ref if g == 0 else v_scr,
            out_ref,
            store_out_ref if last else st_scr,
            v_out_ref if last else v_scr, (g,))
        if not parities[g]:
            # prev_lines updates on granule 0 of each frame, active
            # slots only (decode_granules_pallas's new_prev gating)
            pv = jnp.where(act[0], xt03, pv)
    prev_ref[:] = pv


def frame_step_t(ix_t, scf_l_t, scf_s_t, lay_t, meta_t, sbg_t, active,
                 bt_t, prev_in, store_t, v_t, parities: tuple,
                 block_lanes: int = 128, bug_compat: bool = True,
                 family: int = 0, ip_t=None):
    """Frame-fused fast-mode step: ng granules in one pallas_call.

    Inputs are full_step_t's tensors stacked on a leading granule axis
    (ix_t i16 [ng,2,576,B], ..., active i32 [ng,B] per-frame masks, bt_t
    [ng,2,32,B]) plus prev_in f32 [3,B] — the band-12 carry entering the
    step, feature-major.  parities: static per-granule gr-1 flags.
    Returns (pcm_t [ng,2,576,B] quantized floats, new_store_t, new_v_t,
    prev_out [3,B])."""
    ng = len(parities)
    assert ix_t.shape[0] == ng
    B = active.shape[-1]
    BN = min(block_lanes, B)
    pad = (-B) % BN if B >= BN else 0
    if B < BN or (BN % 128 and jax.default_backend() == "tpu"):
        BN = 128 if jax.default_backend() == "tpu" else BN
        pad = (-B) % BN
    if pad:
        def padl(x):
            return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        (ix_t, scf_l_t, scf_s_t, lay_t, meta_t, sbg_t, active, bt_t,
         prev_in, store_t, v_t) = map(
            padl, (ix_t, scf_l_t, scf_s_t, lay_t, meta_t, sbg_t,
                   active, bt_t, prev_in, store_t, v_t))
        if ip_t is not None:
            ip_t = padl(ip_t)
    Bp = active.shape[-1]
    c = _consts()
    fc = _front_consts(family)
    act2 = active.reshape(ng, 1, Bp).astype(jnp.int32)

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

    fronts = (fc["w_sfb"], fc["w_sfs"], fc["w_sfs_plain"], fc["w_win"],
              fc["w_pre"], fc["w_short"], fc["w_bs"], fc["w_iok"])
    backs = (c["cos36_t"], c["c3_t"], c["win_t"], c["hyb_left"],
             c["win2"], c["nwin"], c["d"], c["inv_t"])
    meta_rows = 13 if family else 12
    extra_specs = [bspec((ng, 64, Bp))] if family else []
    in_specs = [
        bspec((ng, 2, 576, Bp)), bspec((ng, 2, 22, Bp)),
        bspec((ng, 2, 39, Bp)), bspec((ng, 2, Bp)),
        bspec((ng, meta_rows, Bp)), bspec((ng, 2, 3, Bp)),
        bspec((ng, 1, Bp)), bspec((ng, 2, 32, Bp)),
        bspec((3, Bp)),
        bspec((2, 18, 32, Bp)), bspec((2, 15, 64, Bp)), *extra_specs,
        *(cspec(a) for a in fronts), *(cspec(a) for a in backs),
    ]
    out_specs = (
        bspec((ng, 2, 576, Bp)), bspec((2, 18, 32, Bp)),
        bspec((2, 15, 64, Bp)), bspec((3, Bp)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((ng, 2, 576, Bp), F32),
        jax.ShapeDtypeStruct((2, 18, 32, Bp), F32),
        jax.ShapeDtypeStruct((2, 15, 64, Bp), F32),
        jax.ShapeDtypeStruct((3, Bp), F32),
    )
    extra_args = [ip_t] if family else []
    with jax.enable_x64(False):  # same Mosaic i64 caveat as back_half_t
        outs = pl.pallas_call(
            functools.partial(_kernel_frame, bug_compat, family, ng,
                              parities),
            grid=(Bp // BN,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((2, 18, 32, BN), F32),
                            pltpu.VMEM((2, 15, 64, BN), F32)],
            interpret=jax.default_backend() != "tpu",
        )(ix_t, scf_l_t, scf_s_t, lay_t, meta_t, sbg_t, act2, bt_t,
          prev_in, store_t, v_t, *extra_args,
          *(jnp.asarray(a) for a in fronts),
          *(jnp.asarray(a) for a in backs))
    if pad:
        outs = tuple(o[..., :B] for o in outs)
    return outs


@functools.partial(_lazy_jit,
                   static_argnames=("parities", "bug_compat",
                                    "block_lanes", "family"))
def decode_frames_pallas(batches, pstate: PallasState, parities: tuple,
                         bug_compat: bool = True, block_lanes: int = 128,
                         family: int = 0):
    """Fast-mode frame step: ALL granules of a serving step in one
    pallas_call (frame_step_t), so the store/v state round-trips HBM
    once per step instead of once per granule and the band-12 carry
    never leaves the kernel.

    batches: tuple of GranuleBatch, one per granule in decode order;
    parities: static tuple of gr-within-frame indices (MPEG-1 frames
    are (0, 1) pairs; LSF pools all 0).  Returns (pcm i16
    [B, ng*576, 2] — the per-granule outputs concatenated along time —
    and the new PallasState).  Bitwise identical to chaining
    decode_granules_pallas(exact=False) over the same granules
    (test_frame_fused)."""
    ng = len(parities)
    assert len(batches) == ng and ng >= 1
    B = batches[0].ix.shape[0]

    def prep(batch):
        # the per-granule fast front of decode_granules_pallas, minus
        # the XLA band-12 substitution (the kernel chains it in-VMEM)
        ix_t = batch.ix.astype(jnp.int16).transpose(1, 2, 0)
        scf_l_t = batch.scf_l.astype(jnp.int32).transpose(1, 2, 0)
        scf_s_t = (batch.scf_s.astype(jnp.int32).reshape(B, 2, 39)
                   .transpose(1, 2, 0))
        lay_t = batch.layout.astype(jnp.int32).T
        ws, btb, mx = batch.win_switch, batch.block_type, batch.mixed
        isp = (ws == 1) & (btb == 2) & (mx == 0)
        ism = (ws == 1) & (btb == 2) & (mx == 1)
        sblim = jnp.where(isp, 1, jnp.where(ism, 2, 32))  # [B,2]
        meta_rows = [
            batch.global_gain.astype(jnp.int32).T,
            batch.scalefac_scale.astype(jnp.int32).T,
            batch.preflag.astype(jnp.int32).T,
            batch.count1.astype(jnp.int32).T,
            sblim.astype(jnp.int32).T,
            batch.ms_flag.astype(jnp.int32)[None],
            batch.is_flag.astype(jnp.int32)[None],
        ]
        ip_t = None
        if family:
            meta_rows.append(batch.iscale.astype(jnp.int32)[None])
            ip_t = jnp.concatenate([
                batch.is_pos_l.astype(jnp.int32).T,
                batch.is_pos_s.astype(jnp.int32).reshape(B, 39).T,
                jnp.zeros((3, B), jnp.int32),
            ], axis=0)                                     # [64,B]
        meta_t = jnp.concatenate(meta_rows, axis=0)
        sbg_t = batch.subblock_gain.astype(jnp.int32).transpose(1, 2, 0)
        sb = jnp.arange(32, dtype=jnp.int32)
        bt_eff = jnp.where(((batch.win_switch == 1) & (batch.mixed == 1))
                           [..., None] & (sb < 2), 0,
                           batch.block_type[..., None])    # [B,2,32]
        return (ix_t, scf_l_t, scf_s_t, lay_t, meta_t, sbg_t,
                batch.active.astype(jnp.int32), bt_eff.transpose(1, 2, 0),
                ip_t)

    preps = [prep(b) for b in batches]
    stk = [jnp.stack([p[k] for p in preps]) for k in range(8)]
    ip_t = (jnp.stack([p[8] for p in preps]) if family else None)
    q, store_t, v_t, prev_out = frame_step_t(
        *stk[:8], pstate.prev_lines.T, pstate.store_t, pstate.v_t,
        parities, block_lanes=block_lanes, bug_compat=bug_compat,
        family=family, ip_t=ip_t)

    # pack + relayout (see decode_granules_pallas): uint32 L|R<<16 per
    # granule, one [B, ng*576] transpose, bitcast to [B, ng*576, 2] i16
    q16 = q.astype(jnp.int16)                             # [ng,2,576,B]
    left = q16[:, 0]
    nch = jnp.stack([b.nch for b in batches])             # [ng,B]
    right = jnp.where((nch == 1)[:, None, :], left, q16[:, 1])
    packed = (left.astype(jnp.uint16).astype(jnp.uint32)
              | (right.astype(jnp.uint16).astype(jnp.uint32) << 16))
    act = jnp.stack([b.active for b in batches])          # [ng,B]
    packed = jnp.where((act != 0)[:, None, :], packed, 0)
    # loud-failure guard: the kernel applies the band-12 OOB
    # substitution from the STATIC parities tuple, not per-slot gr1
    # (every in-repo caller is frame-synchronized).  A desynchronized
    # batch — an active slot whose gr1 disagrees with its granule's
    # static parity — would decode silently wrong PCM, so poison the
    # whole step to full-scale instead (one [ng,B] compare per step)
    gr1 = jnp.stack([b.gr1 for b in batches])             # [ng,B]
    par = jnp.asarray(parities, jnp.int32)[:, None]
    desync = jnp.any((gr1 != par) & (act != 0))
    packed = jnp.where(desync, jnp.uint32(0x80008000), packed)
    out = jax.lax.bitcast_convert_type(
        packed.transpose(2, 0, 1).reshape(B, ng * 576), jnp.int16)
    return out, PallasState(store_t=store_t, v_t=v_t,
                            prev_lines=prev_out.T)


@functools.partial(_lazy_jit, static_argnames=("block_lanes", "exact"))
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
        cspec(c["hyb_left"]), cspec(c["win2"]), cspec(c["nwin"]),
        cspec(c["d"]), cspec(c["inv_t"]),
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
          jnp.asarray(c["win_t"]), jnp.asarray(c["hyb_left"]),
          jnp.asarray(c["win2"]), jnp.asarray(c["nwin"]),
          jnp.asarray(c["d"]), jnp.asarray(c["inv_t"]))
    if pad:
        outs = tuple(o[..., :B] for o in outs)
    return outs


@functools.partial(_lazy_jit,
                   static_argnames=("block_lanes", "bug_compat",
                                    "family", "slot_major_ix", "exact"))
def full_step_t(ix_t, scf_l_t, scf_s_t, lay_t, meta_t, sbg_t, active,
                bt_t, store_t, v_t, block_lanes: int = 128,
                bug_compat: bool = True, family: int = 0,
                ip_t=None, slot_major_ix: bool = False,
                exact: bool = False, g12_t=None, gate_t=None):
    """Fully-fused fast-mode granule step: requantize -> stereo ->
    antialias -> hybrid synthesis -> polyphase -> quantize in ONE
    pallas_call; no [B,2,576] intermediate ever touches HBM.

    ix_t i16 [2,576,B] line-ordered spectra; scf_l_t i32 [2,22,B];
    scf_s_t i32 [2,39,B] (band-12 substitution already applied);
    lay_t i32 [2,B]; meta_t i32 [12,B] rows {gg0,gg1,sfs0,sfs1,pre0,
    pre1,c1_0,c1_1,sblim0,sblim1,ms,is}; sbg_t i32 [2,3,B]; active i32
    [B]; bt_t i32 [2,32,B] effective block types; state as back_half_t.

    family != 0 (LSF pools) appends meta row 12 = iscale (meta_t
    [13,B]) and requires ip_t i32 [64,B], the intensity sidecar in the
    LSF wire layout; the kernel compiles per family with that family's
    band-map constants.

    exact=True compiles the round-5 fused EXACT kernel: correctly-
    rounded pow43, sentinel gains, the f64 rounding points (MS
    butterfly, unsigned-intensity quirk, final quantize) emulated in
    proven f32 constructions, and the reference-order sequential back
    half — requantize-through-quantize bit-exact in ONE pallas_call.
    family-0 exact requires g12_t f32 [3,B] (band-12 GAIN_QUARTER_TRUE
    gathers) and gate_t i32 [1,B] (gr1 flags).  TPU-only in serving:
    XLA:CPU flushes f32 subnormals, so the CPU exact path keeps the
    split architecture (decode_granules_pallas routes).

    Returns (pcm_t [2,576,B] quantized floats, new_store_t, new_v_t,
    prev3 [3,B])."""
    B = active.shape[-1]
    BN = min(block_lanes, B)
    pad = (-B) % BN if B >= BN else 0
    if B < BN or (BN % 128 and jax.default_backend() == "tpu"):
        BN = 128 if jax.default_backend() == "tpu" else BN
        pad = (-B) % BN
    if pad:
        def padl(x):
            return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        if slot_major_ix:
            ix_t = jnp.pad(ix_t, [(0, pad), (0, 0), (0, 0)])
        else:
            ix_t = padl(ix_t)
        (scf_l_t, scf_s_t, lay_t, meta_t, sbg_t, bt_t, store_t,
         v_t) = map(padl, (scf_l_t, scf_s_t, lay_t, meta_t, sbg_t,
                           bt_t, store_t, v_t))
        active = jnp.pad(active, (0, pad))
        if ip_t is not None:
            ip_t = padl(ip_t)
        if g12_t is not None:
            g12_t = padl(g12_t)
        if gate_t is not None:
            gate_t = padl(gate_t)
    Bp = active.shape[-1]
    c = _consts()
    fc = _front_consts(family)
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

    fronts = (fc["w_sfb"], fc["w_sfs"], fc["w_sfs_plain"], fc["w_win"],
              fc["w_pre"], fc["w_short"], fc["w_bs"], fc["w_iok"])
    backs = (c["cos36_t"], c["c3_t"], c["win_t"], c["hyb_left"],
             c["win2"], c["nwin"], c["d"], c["inv_t"])
    meta_rows = 13 if family else 12
    extra_specs = [bspec((64, Bp))] if family else []
    exact_specs = []
    exact_args = []
    if exact and family == 0:
        assert g12_t is not None and gate_t is not None
        exact_specs = [bspec((3, Bp)), bspec((1, Bp)),
                       cspec(fc["w_winline"]), cspec(fc["w_sfb12"])]
        exact_args = [g12_t, gate_t.astype(jnp.int32),
                      jnp.asarray(fc["w_winline"]),
                      jnp.asarray(fc["w_sfb12"])]
    if slot_major_ix:
        # slot-major blocks: [BN, 2, 576] tiles of the [B, 2, 576] input
        ix_spec = pl.BlockSpec((BN, 2, 576), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        ix_spec = bspec((2, 576, Bp))
    in_specs = [
        *exact_specs,
        ix_spec, bspec((2, 22, Bp)), bspec((2, 39, Bp)),
        bspec((2, Bp)), bspec((meta_rows, Bp)), bspec((2, 3, Bp)),
        bspec((1, Bp)), bspec((2, 32, Bp)),
        bspec((2, 18, 32, Bp)), bspec((2, 15, 64, Bp)), *extra_specs,
        *(cspec(a) for a in fronts), *(cspec(a) for a in backs),
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
    extra_args = [ip_t] if family else []
    with jax.enable_x64(False):  # same Mosaic i64 caveat as back_half_t
        outs = pl.pallas_call(
            functools.partial(_kernel_full, bug_compat, family,
                              slot_major_ix, exact),
            grid=(Bp // BN,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=jax.default_backend() != "tpu",
        )(*exact_args,
          ix_t, scf_l_t, scf_s_t, lay_t, meta_t, sbg_t, act2, bt_t,
          store_t, v_t, *extra_args,
          *(jnp.asarray(a) for a in fronts),
          *(jnp.asarray(a) for a in backs))
    if pad:
        outs = tuple(o[..., :B] for o in outs)
    return outs


@functools.partial(_lazy_jit,
                   static_argnames=("block_lanes", "exact", "bug_compat",
                                    "family"))
def decode_granules_pallas(batch, pstate: PallasState,
                           exact: bool = False, bug_compat: bool = True,
                           block_lanes: int = 128, family: int = 0):
    """One batched granule step on the Pallas path.

    Front half (requantize/stereo/antialias; reorder is folded into the
    host wire packer) runs as XLA ops from ops/dsp.py; the back half is
    the fused feature-major kernel.  Same
    (pcm, state) contract as models.decoder.decode_granules, with state
    in PallasState layout.

    family 1/2 (LSF pools): each family compiles its own kernel with its
    band-map constants; the intensity sidecar (batch.is_pos_l/s, iscale)
    feeds the in-kernel LSF stereo.  In fast mode the LSF intensity
    gains use the closed-form 2^(-q/4) construction, bit-identical to
    tables.lsf_intensity_tables (test_lsf_pallas locks this), so the
    stereo stage matches the XLA path bitwise; pow-4/3 keeps the
    documented 1-ulp fast-path caveat.
    """
    from . import dsp

    B = batch.ix.shape[0]
    sb = jnp.arange(32, dtype=jnp.int32)
    bt_eff = jnp.where(((batch.win_switch == 1) & (batch.mixed == 1))
                       [..., None] & (sb < 2), 0,
                       batch.block_type[..., None])       # [B,2,32]
    bt_t = bt_eff.transpose(1, 2, 0)                      # [2,32,B]
    act = batch.active

    fuse_exact = exact and dsp._ABL not in ("split", "rqgather",
                                            "rqfast", "ms32", "q32",
                                            "rqint8", "exphigh") and (
        jax.default_backend() == "tpu" or dsp._ABL == "fexact")
    if fuse_exact:
        # round-5 fused EXACT kernel: requantize-through-quantize in one
        # pallas_call, the f64 rounding points emulated by the proven
        # f32 constructions (EXACT_EMU_PROOF_r05).  TPU-only by default:
        # XLA:CPU flushes f32 subnormal arithmetic, so CPU serving keeps
        # the split path below (PDMP3_ABL=fexact forces the fused route
        # for interpret-mode structure tests on subnormal-free fixtures).
        ix_t = batch.ix.astype(jnp.int16).transpose(1, 2, 0)
        scf_l_t = batch.scf_l.astype(jnp.int32).transpose(1, 2, 0)
        scf_s = batch.scf_s.astype(jnp.int32).reshape(B, 2, 39)
        g12_t = None
        gate_t = None
        if family == 0:
            # band-12 OOB substitution + denormal-capable TRUE gains
            # (dsp.requantize band12_bits semantics, computed here in
            # XLA: a [B,3] gather is noise next to the kernel)
            bits = jax.lax.bitcast_convert_type(pstate.prev_lines,
                                                jnp.uint32)
            scf12 = jnp.minimum(bits, jnp.uint32(1024)).astype(jnp.int32)
            cur = scf_s[:, 1, 36:39]
            scf_s = scf_s.at[:, 1, 36:39].set(
                jnp.where((batch.gr1 != 0)[:, None], scf12, cur))
            qpu1 = (2 << batch.scalefac_scale[:, 1])[:, None]
            g12 = dsp._gather2(np.asarray(T.GAIN_QUARTER_TRUE),
                               qpu1 * scf12, 5)          # [B,3]
            g12_t = g12.astype(jnp.float32).T             # [3,B]
            gate_t = batch.gr1.astype(jnp.int32)[None]    # [1,B]
        scf_s_t = scf_s.transpose(1, 2, 0)
        lay_t = batch.layout.astype(jnp.int32).T
        ws, btb, mx = batch.win_switch, batch.block_type, batch.mixed
        isp = (ws == 1) & (btb == 2) & (mx == 0)
        ism = (ws == 1) & (btb == 2) & (mx == 1)
        sblim = jnp.where(isp, 1, jnp.where(ism, 2, 32))
        meta_rows = [
            batch.global_gain.astype(jnp.int32).T,
            batch.scalefac_scale.astype(jnp.int32).T,
            batch.preflag.astype(jnp.int32).T,
            batch.count1.astype(jnp.int32).T,
            sblim.astype(jnp.int32).T,
            batch.ms_flag.astype(jnp.int32)[None],
            batch.is_flag.astype(jnp.int32)[None],
        ]
        ip_t = None
        if family:
            meta_rows.append(batch.iscale.astype(jnp.int32)[None])
            ip_t = jnp.concatenate([
                batch.is_pos_l.astype(jnp.int32).T,
                batch.is_pos_s.astype(jnp.int32).reshape(B, 39).T,
                jnp.zeros((3, B), jnp.int32),
            ], axis=0)
        meta_t = jnp.concatenate(meta_rows, axis=0)
        sbg_t = batch.subblock_gain.astype(jnp.int32).transpose(1, 2, 0)
        q, store_t, v_t, prev3 = full_step_t(
            ix_t, scf_l_t, scf_s_t, lay_t, meta_t, sbg_t, act, bt_t,
            pstate.store_t, pstate.v_t, block_lanes=block_lanes,
            bug_compat=bug_compat, family=family, ip_t=ip_t,
            exact=True, g12_t=g12_t, gate_t=gate_t)
    elif exact:
        x = dsp.requantize(batch.ix, batch.scf_l, batch.scf_s,
                           batch.layout, batch.global_gain,
                           batch.scalefac_scale, batch.preflag,
                           batch.subblock_gain,
                           exact=dsp._ABL != "rqfast",
                           gr1=batch.gr1, prev_lines=pstate.prev_lines,
                           pre_reordered=True, family=family)
        x = dsp.stereo(x, batch.layout, batch.scf_l, batch.scf_s,
                       batch.count1, batch.ms_flag, batch.is_flag,
                       exact=True,
                       bug_compat_short_intensity=bug_compat,
                       family=family, is_pos_l=batch.is_pos_l,
                       is_pos_s=batch.is_pos_s, iscale=batch.iscale)
        x = dsp.antialias(x, batch.layout, batch.win_switch,
                          batch.block_type, batch.mixed)
        xa_t = x.reshape(B, 2, 32, 18).transpose(1, 3, 2, 0)  # [2,18,32,B]
        pcm_t, store_t, v_t, _ = back_half_t(
            xa_t, pstate.store_t, pstate.v_t, bt_t, act,
            block_lanes=block_lanes, exact=True)
        # the carry comes from _prev3 (kernel inputs), NOT the kernel
        # output: reading it from the kernel serializes the next step's
        # XLA front half behind this step's kernel (see _prev3)
        prev3 = _prev3(xa_t, pstate.store_t, bt_t, True)
        # reference quantization rounds through float64 (pdmp3.c:2028)
        _w = jnp.float32 if dsp._ABL == "q32" else jnp.float64
        scaled = pcm_t.astype(_w) * 32767.0
        t = jnp.trunc(scaled)
        oob = jnp.isnan(scaled) | (t < -2147483648.0) | (t > 2147483647.0)
        q = jnp.where(oob, _w(-32767.0),
                      jnp.clip(t, -32767.0, 32767.0))
    else:
        # fast mode: the whole granule step is ONE fused kernel; the
        # front half's tensors are transposed to feature-major in XLA
        # (cheap on i16/i32) and the spectra never round-trip HBM.
        # PDMP3_ABL=ixt: ship ix slot-major and transpose in-kernel
        from . import dsp as _dsp
        _sm = _dsp._ABL == "ixt"
        ix_t = (batch.ix.astype(jnp.int16) if _sm
                else batch.ix.astype(jnp.int16).transpose(1, 2, 0))
        scf_l_t = batch.scf_l.astype(jnp.int32).transpose(1, 2, 0)
        scf_s = batch.scf_s.astype(jnp.int32).reshape(B, 2, 39)
        # band-12 OOB scalefactor substitution (dsp.requantize semantics)
        bits = jax.lax.bitcast_convert_type(pstate.prev_lines, jnp.uint32)
        scf12 = jnp.where(bits < 1024, bits,
                         jnp.uint32(1024)).astype(jnp.int32)
        cur = scf_s[:, 1, 36:39]
        scf_s = scf_s.at[:, 1, 36:39].set(
            jnp.where((batch.gr1 != 0)[:, None], scf12, cur))
        scf_s_t = scf_s.transpose(1, 2, 0)
        lay_t = batch.layout.astype(jnp.int32).T
        ws, btb, mx = batch.win_switch, batch.block_type, batch.mixed
        isp = (ws == 1) & (btb == 2) & (mx == 0)
        ism = (ws == 1) & (btb == 2) & (mx == 1)
        sblim = jnp.where(isp, 1, jnp.where(ism, 2, 32))  # [B,2]
        meta_rows = [
            batch.global_gain.astype(jnp.int32).T,
            batch.scalefac_scale.astype(jnp.int32).T,
            batch.preflag.astype(jnp.int32).T,
            batch.count1.astype(jnp.int32).T,
            sblim.astype(jnp.int32).T,
            batch.ms_flag.astype(jnp.int32)[None],
            batch.is_flag.astype(jnp.int32)[None],
        ]
        ip_t = None
        if family:
            meta_rows.append(batch.iscale.astype(jnp.int32)[None])
            ip_t = jnp.concatenate([
                batch.is_pos_l.astype(jnp.int32).T,          # [22,B]
                batch.is_pos_s.astype(jnp.int32)
                .reshape(B, 39).T,                           # [39,B]
                jnp.zeros((3, B), jnp.int32),
            ], axis=0)                                       # [64,B]
        meta_t = jnp.concatenate(meta_rows, axis=0)
        sbg_t = batch.subblock_gain.astype(jnp.int32).transpose(1, 2, 0)
        q, store_t, v_t, prev3 = full_step_t(
            ix_t, scf_l_t, scf_s_t, lay_t, meta_t, sbg_t, act, bt_t,
            pstate.store_t, pstate.v_t, block_lanes=block_lanes,
            bug_compat=bug_compat, family=family, ip_t=ip_t,
            slot_major_ix=_sm)
    # interleave in the kernel's feature-major layout BEFORE the
    # batch-minor -> batch-major relayout, packing the stereo pair into
    # one uint32 word (left low, right high): the transpose then moves
    # [576,B] int32 instead of [2,576,B] int16 — half the elements at a
    # natively-tiled width — and a bitcast unpacks to [B,576,2] int16
    # for free (little-endian: low half first = left)
    q16 = q.astype(jnp.int16)                             # [2,576,B]
    left = q16[0]
    right = jnp.where((batch.nch == 1)[None, :], left, q16[1])
    packed = (left.astype(jnp.uint16).astype(jnp.uint32)
              | (right.astype(jnp.uint16).astype(jnp.uint32) << 16))
    packed = jnp.where((act != 0)[None, :], packed, 0)    # [576,B]
    out = jax.lax.bitcast_convert_type(packed.T, jnp.int16)  # [B,576,2]

    new_prev = jnp.where(((batch.gr1 == 0) & (act != 0))[:, None],
                         prev3.T, pstate.prev_lines)
    return out, PallasState(store_t=store_t, v_t=v_t, prev_lines=new_prev)
