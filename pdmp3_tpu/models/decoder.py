"""The flagship model: a batched, stateful Layer III granule decoder.

One decode step consumes a :class:`GranuleBatch` — B granule slots from
independent streams, each slot one granule (both channels) — plus the
per-slot recurrent :class:`DecoderState` (overlap-add store and polyphase
FIFO, the two carries identified in SURVEY.md §2.6), and produces
``[B, 576, 2]`` int16 PCM.  The whole step is a feedforward jit-compiled
tensor program; streams advance one granule per step, so a frame is two
steps with state threaded through.

Precision modes (see ops/dsp.py): ``exact`` reproduces the reference C
decoder's PCM bit-for-bit; ``fast`` uses MXU contractions (±1 LSB).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import tables as T
from ..ops import dsp
from ..frontend import FrameData


from ..utils.jit import lazy_jit as _lazy_jit

# Frame-fused opt-in (a measured perf dead end kept reproducible, see
# docs/ROADMAP.md).  Read ONCE at import: decode_frame_soa is jitted, so
# a per-call env read would be baked into the first trace anyway and a
# later toggle would silently keep the old routing; the import-time read
# makes the process-wide behavior explicit.  Tests override the module
# attribute directly (monkeypatch.setattr), not the env var.
_FRAME_FUSED = os.environ.get("PDMP3_FRAME_FUSED") == "1"


class GranuleBatch(NamedTuple):
    """Host->device tensors for one decode step (B granule slots).

    ix carries *line-ordered* spectra: the host applies the short-block
    reorder permutation (pdmp3.c:1786-1823) while packing the wire — a
    table-driven copy instead of a memcpy — so the device never pays the
    [B,2,576] permutation (requantize reads precomposed constant maps,
    ops/dsp.py:_compose_reorder)."""
    ix: jax.Array             # i32 [B,2,576] Huffman lines, line-ordered
    scf_l: jax.Array          # i32 [B,2,22]
    scf_s: jax.Array          # i32 [B,2,13,3]
    layout: jax.Array         # i32 [B,2] sfreq*3 + {long,short,mixed}
    block_type: jax.Array     # i32 [B,2]
    win_switch: jax.Array     # i32 [B,2]
    mixed: jax.Array          # i32 [B,2]
    global_gain: jax.Array    # i32 [B,2]
    scalefac_scale: jax.Array  # i32 [B,2]
    preflag: jax.Array        # i32 [B,2]
    subblock_gain: jax.Array  # i32 [B,2,3]
    count1: jax.Array         # i32 [B,2]
    ms_flag: jax.Array        # i32 [B]
    is_flag: jax.Array        # i32 [B]
    nch: jax.Array            # i32 [B]
    active: jax.Array         # i32 [B]: 0 = idle slot (state frozen)
    gr1: jax.Array            # i32 [B]: 1 = this slot decodes granule 1
    # LSF only (family != 0): ch1's transmitted intensity positions with
    # the illegal value pre-mapped to tables.LSF_IS_ILLEGAL, and the
    # per-slot intensity_scale bit (13818-3 §2.4.3).  None for MPEG-1.
    is_pos_l: jax.Array | None = None   # i32 [B,22]
    is_pos_s: jax.Array | None = None   # i32 [B,13,3]
    iscale: jax.Array | None = None     # i32 [B]


class DecoderState(NamedTuple):
    """Per-slot recurrent DSP state (pdmp3.c:1755 store, :1983 v_vec —
    function-static in the reference, correctly per-stream here).

    prev_lines carries granule 0 channel 0's first 3 post-DSP lines into
    the granule-1 step: the reference's scalefac_s[1][1][12][w] OOB read
    aliases the float bits of is[0][0][w] (docs/DESIGN.md §6).  None is
    accepted for compatibility (sentinel-63 zero-gain approximation)."""
    store: jax.Array          # f32 [B,2,32,18]
    v_blocks: jax.Array       # f32 [B,2,15,64] polyphase FIFO (oldest first)
    prev_lines: jax.Array | None = None   # f32 [B,3]


def init_state(batch_size: int) -> DecoderState:
    return DecoderState(
        store=jnp.zeros((batch_size, 2, 32, 18), jnp.float32),
        v_blocks=jnp.zeros((batch_size, 2, 15, 64), jnp.float32),
        prev_lines=jnp.zeros((batch_size, 3), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("exact", "bug_compat",
                                             "float_pcm", "family"))
def decode_granules(batch: GranuleBatch, state: DecoderState,
                    exact: bool = True, bug_compat: bool = True,
                    float_pcm: bool = False, family: int = 0
                    ) -> tuple[jax.Array, DecoderState]:
    """One batched decode step: GranuleBatch + state -> (pcm, state').

    pcm: i16 [B, 576, 2] interleaved L/R (mono duplicated, as the
    reference packs it, pdmp3.c:2032-2041); float_pcm=True emits f32 in
    [-1, 1] instead (ops/dsp.float_pack — a serving option the
    reference's S16-only sink lacks).

    family selects the sample-rate generation (0 MPEG-1, 1 MPEG-2,
    2 MPEG-2.5 — tables.py LSF section): each family compiles its own
    program with its own [9,576] layout constants, so the MPEG-1 hot
    path is untaxed; streams route to per-family batch pools.
    """
    x = dsp.requantize(batch.ix, batch.scf_l, batch.scf_s, batch.layout,
                       batch.global_gain, batch.scalefac_scale,
                       batch.preflag, batch.subblock_gain, exact=exact,
                       gr1=batch.gr1, prev_lines=state.prev_lines,
                       pre_reordered=True, family=family)
    x = dsp.stereo(x, batch.layout, batch.scf_l, batch.scf_s, batch.count1,
                   batch.ms_flag, batch.is_flag, exact=exact,
                   bug_compat_short_intensity=bug_compat, family=family,
                   is_pos_l=batch.is_pos_l, is_pos_s=batch.is_pos_s,
                   iscale=batch.iscale)
    x = dsp.antialias(x, batch.layout, batch.win_switch, batch.block_type,
                      batch.mixed)
    x_time, store = dsp.hybrid_synthesis(
        x, state.store, batch.win_switch, batch.block_type, batch.mixed,
        exact=exact)
    x_time = dsp.freq_invert(x_time)
    sums, v_blocks = dsp.subband_synthesis(x_time, state.v_blocks,
                                           exact=exact)
    if float_pcm:
        pcm = dsp.float_pack(sums, batch.nch)
    else:
        pcm = dsp.quantize_pack(sums, batch.nch, exact=exact)
    # granule-0 steps latch ch0's first 3 post-DSP lines for the next
    # (granule-1) step's band-12 OOB scalefactor emulation
    prev_lines = state.prev_lines
    if prev_lines is not None:
        prev_lines = jnp.where((batch.gr1 == 0)[:, None],
                               x_time[:, 0, 0, :3], prev_lines)
    # idle slots (stream starved / finished) keep their recurrent state
    # frozen and emit silence — a malformed or stalled stream can never
    # poison its batch neighbours (SURVEY.md §5 failure isolation)
    act = batch.active
    store = jnp.where((act != 0)[:, None, None, None], store, state.store)
    v_blocks = jnp.where((act != 0)[:, None, None, None], v_blocks,
                         state.v_blocks)
    if prev_lines is not None:
        prev_lines = jnp.where((act != 0)[:, None], prev_lines,
                               state.prev_lines)
    pcm = jnp.where((act != 0)[:, None, None], pcm, 0)
    return pcm, DecoderState(store=store, v_blocks=v_blocks,
                             prev_lines=prev_lines)


# ---------------------------------------------------------------------------
# Host bridge: FrameData -> GranuleBatch (reference Python path; the C++
# frontend fills the same tensors directly)
# ---------------------------------------------------------------------------

def frame_to_batches(fds: list[FrameData],
                     pre_reorder: bool = True) -> list[GranuleBatch]:
    """Convert one parsed frame per slot into the per-granule batches
    (two for MPEG-1, one for LSF — Header.ngr).

    All slots must share one family: each family is its own compiled
    program with its own layout constants (decode_granules' family
    static), so the serving layer routes streams to per-family pools.

    pre_reorder applies the short-block permutation to ix (the
    GranuleBatch wire convention); False keeps bitstream order for
    stage-level unit tests that compare against the oracle's pre-reorder
    intermediates."""
    family = fds[0].header.family
    assert all(fd.header.family == family for fd in fds), \
        "mixed-family batch: route streams to per-family pools"
    perm = T.layout_maps(family)["reorder"]
    out = []
    B = len(fds)
    for gr in range(fds[0].header.ngr):
        ix = np.zeros((B, 2, 576), np.int32)
        scf_l = np.zeros((B, 2, 22), np.int32)
        scf_s = np.zeros((B, 2, 13, 3), np.int32)
        flat = {k: np.zeros((B, 2), np.int32) for k in
                ("layout", "block_type", "win_switch", "mixed",
                 "global_gain", "scalefac_scale", "preflag", "count1")}
        sbg = np.zeros((B, 2, 3), np.int32)
        ms = np.zeros(B, np.int32)
        isf = np.zeros(B, np.int32)
        nch = np.zeros(B, np.int32)
        if family:
            ipl = np.full((B, 22), T.LSF_IS_ILLEGAL, np.int32)
            ips = np.full((B, 13, 3), T.LSF_IS_ILLEGAL, np.int32)
            isc = np.zeros(B, np.int32)
        for b, fd in enumerate(fds):
            h, s = fd.header, fd.side
            nch[b] = h.nch
            ms[b] = 1 if (h.mode == 1 and (h.mode_extension & 2)) else 0
            isf[b] = 1 if (h.mode == 1 and (h.mode_extension & 1)) else 0
            if family and fd.is_eff_l is not None:
                ipl[b] = fd.is_eff_l
                ips[b] = fd.is_eff_s
                isc[b] = fd.intensity_scale
            for ch in range(h.nch):
                lay = T.layout_id(
                    h.sampling_frequency, int(s.win_switch_flag[gr][ch]),
                    int(s.block_type[gr][ch]),
                    int(s.mixed_block_flag[gr][ch]))
                ix[b, ch] = (fd.ix[gr][ch][perm[lay]] if pre_reorder
                             else fd.ix[gr][ch])
                scf_l[b, ch] = fd.scalefac_l[gr][ch]
                scf_s[b, ch] = fd.scalefac_s[gr][ch]
                flat["layout"][b, ch] = lay
                flat["block_type"][b, ch] = s.block_type[gr][ch]
                flat["win_switch"][b, ch] = s.win_switch_flag[gr][ch]
                flat["mixed"][b, ch] = s.mixed_block_flag[gr][ch]
                flat["global_gain"][b, ch] = s.global_gain[gr][ch]
                flat["scalefac_scale"][b, ch] = s.scalefac_scale[gr][ch]
                flat["preflag"][b, ch] = s.preflag[gr][ch]
                flat["count1"][b, ch] = s.count1[gr][ch]
                sbg[b, ch] = s.subblock_gain[gr][ch]
        out.append(GranuleBatch(
            ix=jnp.asarray(ix), scf_l=jnp.asarray(scf_l),
            scf_s=jnp.asarray(scf_s),
            layout=jnp.asarray(flat["layout"]),
            block_type=jnp.asarray(flat["block_type"]),
            win_switch=jnp.asarray(flat["win_switch"]),
            mixed=jnp.asarray(flat["mixed"]),
            global_gain=jnp.asarray(flat["global_gain"]),
            scalefac_scale=jnp.asarray(flat["scalefac_scale"]),
            preflag=jnp.asarray(flat["preflag"]),
            subblock_gain=jnp.asarray(sbg),
            count1=jnp.asarray(flat["count1"]),
            ms_flag=jnp.asarray(ms), is_flag=jnp.asarray(isf),
            nch=jnp.asarray(nch),
            active=jnp.ones(B, jnp.int32),
            gr1=jnp.full(B, gr, jnp.int32),
            is_pos_l=jnp.asarray(ipl) if family else None,
            is_pos_s=jnp.asarray(ips) if family else None,
            iscale=jnp.asarray(isc) if family else None))
    return out


# ---------------------------------------------------------------------------
# Raw-SoA entry point: the serving pipeline uploads the native frontend's
# step tensors (ix/scf_l/scf_s/meta, laid out per pdmp3.h PDMP3_META_*) as
# FOUR host->device transfers per frame and unpacks/slices on device —
# transfer count, not bytes, dominates on high-latency interconnects.
# ---------------------------------------------------------------------------

_META_WORDS = 32


def _batch_from_meta(ix, scf_l, scf_s, meta, active, gr: int):
    m = meta
    B = meta.shape[0]
    return GranuleBatch(
        ix=ix, scf_l=scf_l, scf_s=scf_s.reshape(scf_s.shape[0], 2, 13, 3),
        layout=m[:, 0:2], block_type=m[:, 2:4], win_switch=m[:, 4:6],
        mixed=m[:, 6:8], global_gain=m[:, 8:10], scalefac_scale=m[:, 10:12],
        preflag=m[:, 12:14], count1=m[:, 14:16],
        subblock_gain=m[:, 16:22].reshape(-1, 2, 3),
        ms_flag=m[:, 22], is_flag=m[:, 23],
        nch=jnp.maximum(m[:, 24], 1), active=active,
        gr1=jnp.full(B, gr, jnp.int32))


def _granule_step(kernel: str, float_pcm: bool = False):
    """Select the per-granule device program: the XLA pipeline
    (decode_granules, DecoderState) or the fused feature-major Pallas
    kernel (ops/pallas_step, PallasState) — same (pcm, state) contract,
    state layouts differ (convert with state_to/from_pallas)."""
    if kernel == "pallas":
        assert not float_pcm, \
            "float PCM output runs on the XLA kernel (the Pallas kernel " \
            "quantizes in-kernel in fast mode)"
        from ..ops.pallas_step import decode_granules_pallas

        def step(b, s, e, bc):
            return decode_granules_pallas.__wrapped__(b, s, e, bc, 128)
        return step
    assert kernel == "xla", kernel
    return lambda b, s, e, bc: decode_granules.__wrapped__(b, s, e, bc,
                                                           float_pcm)


@functools.partial(_lazy_jit, static_argnames=("exact", "bug_compat",
                                               "kernel", "float_pcm"))
def decode_frame_soa(ix2, scf_l2, scf_s2, meta2, active, state,
                     exact: bool = False, bug_compat: bool = True,
                     kernel: str = "xla", float_pcm: bool = False):
    """Decode a whole frame (two granule steps) from the native frontend's
    SoA tensors: ix2 i16 [2,B,2,576], scf_l2 u8/i16 [2,B,2,22], scf_s2
    u8/i16 [2,B,2,39], meta2 i32/i16 [2,B,32], active i32/i16 [B].
    Returns (pcm i16 [B,1152,2], new_state).

    meta/active are normalized to int32 here: the int16 wire views that
    the sharded/multi-host serving paths upload directly would otherwise
    overflow the fast path's exponent-bitcast gains ((n+127)<<23 in
    int16), silently decoding to silence."""
    meta2 = meta2.astype(jnp.int32)
    active = active.astype(jnp.int32)
    batches = [_batch_from_meta(ix2[gr], scf_l2[gr], scf_s2[gr],
                                meta2[gr], active, gr)
               for gr in range(2)]
    if kernel == "pallas" and not exact and _FRAME_FUSED:
        # MEASURED DEAD END, kept reproducible (docs/ROADMAP.md): both
        # granules in ONE pallas_call — bitwise identical to the
        # per-granule chain (test_frame_fused) and it does halve the
        # state HBM traffic, but the doubled per-grid-step working set
        # costs Mosaic's pipelining more than the round trip saves
        # (interleaved A/B at B=8192: 1.63 vs 1.52 ms/granule median)
        from ..ops.pallas_step import decode_frames_pallas
        assert not float_pcm
        return decode_frames_pallas.__wrapped__(
            tuple(batches), state, (0, 1), bug_compat, 128, 0)
    step = _granule_step(kernel, float_pcm)
    outs = []
    for batch in batches:
        pcm, state = step(batch, state, exact, bug_compat)
        outs.append(pcm)
    return jnp.concatenate(outs, axis=1), state


def soa_layout(B: int, F: int = 1) -> dict:
    """Element offsets (int16 units) of the packed single-buffer wire
    format covering F sequential frames per slot: ONE host->device
    transfer per device dispatch (transfer *count*, not bytes, dominates
    on high-latency interconnects).  Every section is int16 — including
    scalefactors and meta words — so the device consumes the buffer by
    pure slicing; byte recombination tiles catastrophically on TPU."""
    off = {}
    pos = 0

    def sec(name, nelems):
        nonlocal pos
        off[name] = (pos, nelems)
        pos += (nelems + 1) & ~1  # keep 4-byte alignment

    sec("ix", F * 2 * B * 2 * 576)
    sec("scf_l", F * 2 * B * 2 * 22)
    sec("scf_s", F * 2 * B * 2 * 39)
    sec("meta", F * 2 * B * _META_WORDS)
    sec("active", F * B)
    off["total"] = pos
    return off


@functools.partial(_lazy_jit,
                   static_argnames=("B", "F", "exact", "bug_compat",
                                    "kernel", "float_pcm"))
def decode_frame_packed(buf, state, B: int, F: int = 1,
                        exact: bool = False, bug_compat: bool = True,
                        kernel: str = "xla", float_pcm: bool = False):
    """decode_frame_soa over the packed single-buffer wire format, F
    frames per dispatch (buf: int16 [soa_layout(B, F)['total']]).
    Returns (pcm i16 [B, F*1152, 2], new_state)."""
    off = soa_layout(B, F)

    def sect(name, shape):
        o, n = off[name]
        return jax.lax.dynamic_slice_in_dim(buf, o, n).reshape(shape)

    ix = sect("ix", (F, 2, B, 2, 576))
    scf_l = sect("scf_l", (F, 2, B, 2, 22))
    scf_s = sect("scf_s", (F, 2, B, 2, 39))
    meta = sect("meta", (F, 2, B, _META_WORDS)).astype(jnp.int32)
    active = sect("active", (F, B)).astype(jnp.int32)
    pcms = []
    for f in range(F):
        pcm, state = decode_frame_soa.__wrapped__(
            ix[f], scf_l[f], scf_s[f], meta[f], active[f], state, exact,
            bug_compat, kernel, float_pcm)
        pcms.append(pcm)
    out = pcms[0] if F == 1 else jnp.concatenate(pcms, axis=1)
    return out, state


# ---------------------------------------------------------------------------
# LSF pool wire (MPEG-2/2.5, 13818-3): one granule per frame, so the wire
# drops the granule axis and adds the intensity-sidecar section.  Layout
# matches the native packer pdmp3_parse_step_wire16_lsf (host/api.cc);
# each family compiles its own device program (decode_granules' family
# static) — the serving layer routes streams to per-family pools.
# ---------------------------------------------------------------------------


def soa_layout_lsf(B: int, F: int = 1) -> dict:
    """Element offsets (int16 units) of the packed LSF wire: ONE granule
    per frame (Header.ngr), is_pos [F,B,64] sidecar ([0..21] long,
    [22..60] short flat, illegal = 63), iscale/family in meta."""
    off = {}
    pos = 0

    def sec(name, nelems):
        nonlocal pos
        off[name] = (pos, nelems)
        pos += (nelems + 1) & ~1  # keep 4-byte alignment

    sec("ix", F * B * 2 * 576)
    sec("scf_l", F * B * 2 * 22)
    sec("scf_s", F * B * 2 * 39)
    sec("meta", F * B * _META_WORDS)
    sec("is_pos", F * B * 64)
    sec("active", F * B)
    off["total"] = pos
    return off


@functools.partial(_lazy_jit, static_argnames=("family", "exact",
                                               "bug_compat", "float_pcm",
                                               "kernel"))
def decode_frame_lsf_soa(ix, scf_l, scf_s, meta, is_pos, active, state,
                         family: int = 1, exact: bool = False,
                         bug_compat: bool = True, float_pcm: bool = False,
                         kernel: str = "xla"):
    """Decode F one-granule LSF frames per slot from section tensors:
    ix i16 [F,B,2,576], scf_l [F,B,2,22], scf_s [F,B,2,39], meta
    [F,B,32], is_pos [F,B,64] (sidecar: [0..21] long, [22..60] short
    flat, illegal = 63), active [F,B].  Returns (pcm i16 [B, F*576, 2],
    new_state).  This is the shard_map body for LSF sharded serving —
    the slot axis (axis 1) partitions with zero collectives."""
    assert family in (1, 2)
    F, B = meta.shape[0], meta.shape[1]
    meta = meta.astype(jnp.int32)
    is_pos = is_pos.astype(jnp.int32)
    active = active.astype(jnp.int32)
    pcms = []
    for f in range(F):
        m = meta[f]
        batch = GranuleBatch(
            ix=ix[f], scf_l=scf_l[f],
            scf_s=scf_s[f].reshape(B, 2, 13, 3),
            layout=m[:, 0:2], block_type=m[:, 2:4],
            win_switch=m[:, 4:6], mixed=m[:, 6:8],
            global_gain=m[:, 8:10], scalefac_scale=m[:, 10:12],
            preflag=m[:, 12:14], count1=m[:, 14:16],
            subblock_gain=m[:, 16:22].reshape(-1, 2, 3),
            ms_flag=m[:, 22], is_flag=m[:, 23],
            nch=jnp.maximum(m[:, 24], 1), active=active[f],
            gr1=jnp.zeros(B, jnp.int32),  # every LSF granule is gr 0
            is_pos_l=is_pos[f, :, :22],
            is_pos_s=is_pos[f, :, 22:61].reshape(B, 13, 3),
            iscale=m[:, 27])
        if kernel == "pallas":
            from ..ops.pallas_step import decode_granules_pallas
            pcm, state = decode_granules_pallas.__wrapped__(
                batch, state, exact, bug_compat, 128, family)
        else:
            assert kernel == "xla", kernel
            pcm, state = decode_granules.__wrapped__(
                batch, state, exact, bug_compat, float_pcm, family)
        pcms.append(pcm)
    out = pcms[0] if F == 1 else jnp.concatenate(pcms, axis=1)
    return out, state


@functools.partial(_lazy_jit,
                   static_argnames=("B", "F", "family", "exact",
                                    "bug_compat", "float_pcm", "kernel"))
def decode_frame_packed_lsf(buf, state, B: int, F: int = 1,
                            family: int = 1, exact: bool = False,
                            bug_compat: bool = True,
                            float_pcm: bool = False,
                            kernel: str = "xla"):
    """decode_frame_lsf_soa over the packed LSF wire (buf: int16
    [soa_layout_lsf(B, F)['total']]).  kernel="xla" runs decode_granules
    with the family static; "pallas" the fused feature-major kernel
    (state in PallasState layout).  bug_compat is accepted for interface
    parity but LSF has no reference bugs to emulate."""
    off = soa_layout_lsf(B, F)

    def sect(name, shape):
        o, n = off[name]
        return jax.lax.dynamic_slice_in_dim(buf, o, n).reshape(shape)

    return decode_frame_lsf_soa.__wrapped__(
        sect("ix", (F, B, 2, 576)), sect("scf_l", (F, B, 2, 22)),
        sect("scf_s", (F, B, 2, 39)), sect("meta", (F, B, _META_WORDS)),
        sect("is_pos", (F, B, 64)), sect("active", (F, B)), state,
        family, exact, bug_compat, float_pcm, kernel)


def sparse_layout_lsf(B: int, F: int = 1,
                      cap_blocks: int | None = None) -> dict:
    """Sparse count1-bounded LSF wire: one granule per frame, blk table
    [F,B,2,4], intensity sidecar, flat spectra region last (cf.
    sparse_layout)."""
    if cap_blocks is None:
        cap_blocks = F * B * 2 * _MAX_BLOCKS_PER_CH
    off = {}
    pos = 0

    def sec(name, nelems):
        nonlocal pos
        off[name] = (pos, nelems)
        pos += (nelems + 1) & ~1  # keep 4-byte alignment

    sec("blk", F * B * 2 * _BLK_WORDS)
    sec("scf_l", F * B * 2 * 22)
    sec("scf_s", F * B * 2 * 39)
    sec("meta", F * B * _META_WORDS)
    sec("is_pos", F * B * 64)
    sec("active", F * B)
    off["fixed"] = pos
    sec("ix_flat", cap_blocks * SPARSE_BLOCK)
    off["total"] = pos
    off["cap_blocks"] = cap_blocks
    return off


@functools.partial(_lazy_jit,
                   static_argnames=("B", "F", "cap_blocks", "family",
                                    "exact", "bug_compat", "kernel"))
def decode_frame_lsf_sparse(buf, state, B: int, F: int = 1,
                            cap_blocks: int = 0, family: int = 1,
                            exact: bool = False, bug_compat: bool = True,
                            kernel: str = "xla"):
    """decode_frame_lsf_soa over the sparse LSF wire (buf: int16
    [sparse_layout_lsf(B, F, cap_blocks)['total']]).  Bit-identical to
    the dense LSF wire (re-densified rzero tail is exactly the zeros the
    dense wire carries)."""
    off = sparse_layout_lsf(B, F, cap_blocks)

    def sect(name, shape):
        o, n = off[name]
        return jax.lax.dynamic_slice_in_dim(buf, o, n).reshape(shape)

    blk = sect("blk", (F, B, 2, _BLK_WORDS)).astype(jnp.int32)
    flat = sect("ix_flat", (cap_blocks, SPARSE_BLOCK))
    start = (blk[..., 1] << 16) | (blk[..., 0] & 0xFFFF)   # [F,B,2]
    nb = blk[..., 2]
    iota = jnp.arange(_MAX_BLOCKS_PER_CH, dtype=jnp.int32)
    mask = iota < nb[..., None]                            # [F,B,2,5]
    bidx = jnp.clip(jnp.where(mask, start[..., None] + iota, 0),
                    0, cap_blocks - 1)
    vals = jnp.where(mask[..., None], jnp.take(flat, bidx, axis=0), 0)
    ix = vals.reshape(F, B, 2,
                      _MAX_BLOCKS_PER_CH * SPARSE_BLOCK)[..., :576]
    return decode_frame_lsf_soa.__wrapped__(
        ix, sect("scf_l", (F, B, 2, 22)), sect("scf_s", (F, B, 2, 39)),
        sect("meta", (F, B, _META_WORDS)), sect("is_pos", (F, B, 64)),
        sect("active", (F, B)), state, family, exact, bug_compat, False,
        kernel)


# ---------------------------------------------------------------------------
# Sparse count1-bounded wire: every granule's lines are zero from count1 up
# (rzero, pdmp3.c:2108-2111), so the host ships only ceil(count1/128)
# 128-line blocks per (gr,ch) plus a tiny block table, cutting wire bytes
# 2-4x.  The device re-densifies with one row-gather per step.  The flat
# block region sits LAST in the buffer so the upload is a contiguous
# prefix sized to the step's actual occupancy (bucketed to keep jit
# specializations few).
# ---------------------------------------------------------------------------

SPARSE_BLOCK = 128          # lines per block (one int16 lane row)
_BLK_WORDS = 4              # {start_lo, start_hi, n_blocks, pad}
_MAX_BLOCKS_PER_CH = 5      # ceil(576 / 128)


def sparse_worst_blocks(B: int, F: int = 1) -> int:
    return F * 2 * B * 2 * _MAX_BLOCKS_PER_CH


def sparse_layout(B: int, F: int = 1, cap_blocks: int | None = None) -> dict:
    """Element offsets (int16 units) of the sparse wire.  Fixed-size
    sections first; the variable flat spectra region last, so a transfer
    of buf[:fixed + cap_blocks*SPARSE_BLOCK] carries a whole step."""
    if cap_blocks is None:
        cap_blocks = sparse_worst_blocks(B, F)
    off = {}
    pos = 0

    def sec(name, nelems):
        nonlocal pos
        off[name] = (pos, nelems)
        pos += (nelems + 1) & ~1  # keep 4-byte alignment

    sec("blk", F * 2 * B * 2 * _BLK_WORDS)
    sec("scf_l", F * 2 * B * 2 * 22)
    sec("scf_s", F * 2 * B * 2 * 39)
    sec("meta", F * 2 * B * _META_WORDS)
    sec("active", F * B)
    off["fixed"] = pos
    sec("ix_flat", cap_blocks * SPARSE_BLOCK)
    off["total"] = pos
    off["cap_blocks"] = cap_blocks
    return off


@functools.partial(_lazy_jit, static_argnames=("B", "F", "cap_blocks",
                                               "exact", "bug_compat",
                                               "kernel", "float_pcm"))
def decode_frame_sparse(buf, state, B: int, F: int = 1,
                        cap_blocks: int = 0, exact: bool = False,
                        bug_compat: bool = True, kernel: str = "xla",
                        float_pcm: bool = False):
    """decode_frame_soa over the sparse count1-bounded wire (buf: int16
    [sparse_layout(B, F, cap_blocks)['total']]).  Bit-identical to the
    dense wire: lines beyond each channel's shipped blocks are exactly
    the rzero zeros the dense wire carries (frame.cc:375-377).
    Returns (pcm i16 [B, F*1152, 2], new_state)."""
    off = sparse_layout(B, F, cap_blocks)

    def sect(name, shape):
        o, n = off[name]
        return jax.lax.dynamic_slice_in_dim(buf, o, n).reshape(shape)

    blk = sect("blk", (F, 2, B, 2, _BLK_WORDS)).astype(jnp.int32)
    scf_l = sect("scf_l", (F, 2, B, 2, 22))
    scf_s = sect("scf_s", (F, 2, B, 2, 39))
    meta = sect("meta", (F, 2, B, _META_WORDS)).astype(jnp.int32)
    active = sect("active", (F, B)).astype(jnp.int32)
    flat = sect("ix_flat", (cap_blocks, SPARSE_BLOCK))

    # re-densify: per (f,gr,slot,ch) gather n_blocks 128-line rows from
    # the flat region; masked rows (and everything past block 4's line
    # 576) are zero, exactly matching the dense wire's rzero tail
    start = (blk[..., 1] << 16) | (blk[..., 0] & 0xFFFF)   # [F,2,B,2]
    nb = blk[..., 2]
    iota = jnp.arange(_MAX_BLOCKS_PER_CH, dtype=jnp.int32)
    mask = iota < nb[..., None]                            # [F,2,B,2,5]
    bidx = jnp.clip(jnp.where(mask, start[..., None] + iota, 0),
                    0, cap_blocks - 1)
    vals = jnp.take(flat, bidx, axis=0)                    # [...,5,128]
    vals = jnp.where(mask[..., None], vals, 0)
    ix = vals.reshape(F, 2, B, 2,
                      _MAX_BLOCKS_PER_CH * SPARSE_BLOCK)[..., :576]

    pcms = []
    for f in range(F):
        pcm, state = decode_frame_soa.__wrapped__(
            ix[f], scf_l[f], scf_s[f], meta[f], active[f], state, exact,
            bug_compat, kernel, float_pcm)
        pcms.append(pcm)
    out = pcms[0] if F == 1 else jnp.concatenate(pcms, axis=1)
    return out, state


class JaxDSP:
    """Single-stream DSP adapter with the OracleDSP interface, so the
    streaming API (api.PDMP3) can run its backend on TPU."""

    def __init__(self, exact: bool = True, bug_compat: bool = True):
        self.exact = exact
        self.bug_compat = bug_compat
        self.state = init_state(1)
        self._l12 = None  # lazy Layer I/II adapter (sb_samples frames)

    def reset(self) -> None:
        self.state = init_state(1)
        if self._l12 is not None:
            self._l12.reset()

    def decode_frame(self, fd: FrameData) -> np.ndarray:
        """Returns packed PCM words uint32 [2,576] like the reference's
        ``id->out`` (pdmp3.c:129).  LSF frames fill row 0 only (one
        granule per frame), matching OracleDSP."""
        if fd.sb_samples is not None:
            # Layer I/II frame (Frontend(layers12=True)): synthesis-only
            # device path, shares the polyphase v_blocks state semantics
            if self._l12 is None:
                from .l12 import JaxL12
                self._l12 = JaxL12(exact=self.exact)
            return self._l12.decode_frame(fd)
        out = np.zeros((2, 576), np.uint32)
        for gr, batch in enumerate(frame_to_batches([fd])):
            pcm, self.state = decode_granules(batch, self.state,
                                              exact=self.exact,
                                              bug_compat=self.bug_compat,
                                              family=fd.header.family)
            pcm = np.asarray(pcm[0]).astype(np.uint16)  # [576,2]
            out[gr] = (pcm[:, 0].astype(np.uint32) << 16) | pcm[:, 1]
        return out
