"""Multi-stream scheduler + granule packer for the TPU decode pipeline.

The serving shape (SURVEY.md §2.6, §7 steps 6-8): N concurrent streams are
pinned to granule *slots*; the native host frontend parses frames into SoA
step tensors (one `pdmp3_parse_frame_soa` call per stream per frame), and
the TPU backend decodes all slots in lockstep, one granule per slot per
step (a frame = 2 steps), with recurrent per-slot state living on device.
Streams that are starved (NEED_MORE), finished, or malformed simply leave
their slot inactive for a step — the active mask freezes their DSP state
and emits silence, so one bad stream can never perturb its batch
neighbours.

The double-buffering: while the device decodes step tensors t, the host
parses tensors t+1 (jax dispatch is async, so the single-threaded form
below already overlaps; a multi-core host fan-out drops in per-slot).
"""
from __future__ import annotations

import ctypes as C

import numpy as np
import jax.numpy as jnp

from .. import tables as T
from ..host import NativePDMP3, lib
from ..models import decoder as M

_META = 32  # PDMP3_META_WORDS
_M_LAYOUT, _M_BT, _M_WSF, _M_MIXED = 0, 2, 4, 6
_M_GG, _M_SFS, _M_PRE, _M_C1 = 8, 10, 12, 14
_M_SBG, _M_MS, _M_IS, _M_NCH, _M_SR = 16, 22, 23, 24, 25


class LoopFeeder:
    """Native bulk feeder: tops up every slot's input ring from a looping
    per-slot source stream in ONE pdmp3_feed_loop call per step.  The
    serving/bench feeder — a per-slot Python feed loop costs more than
    the native parse itself at 400k frames/s."""

    def __init__(self, dec: "StreamDecoder", streams: list[bytes]):
        self.dec = dec
        # keep the bytes objects alive: the pointer array borrows them
        self.streams = [streams[i % len(streams)] for i in range(dec.n)]
        self._fn = lib().pdmp3_feed_loop
        self._fn.argtypes = [C.c_void_p, C.c_size_t, C.c_void_p,
                             C.c_void_p, C.c_void_p]
        self._fn.restype = C.c_longlong
        self._srcs = (C.c_char_p * dec.n)(*self.streams)
        self._lens = (C.c_size_t * dec.n)(*[len(s) for s in self.streams])
        self._pos = (C.c_size_t * dec.n)()

    def step(self) -> int:
        """Fill every ring to capacity; returns total bytes fed."""
        return int(self._fn(self.dec._handle_arr, self.dec.n, self._srcs,
                            self._lens, self._pos))


class StreamDecoder:
    """N-slot batched decoder over the native frontend + TPU backend."""

    def __init__(self, n_slots: int, exact: bool = False,
                 bug_compat: bool = True, parse_threads: int = 1,
                 frames_per_step: int = 1, profile: int = 0,
                 kernel: str = "xla", float_pcm: bool = False,
                 family: int = 0, resample_to: int | None = None,
                 sample_rate: int | None = None):
        from ..host import PROFILE_LSF, PROFILE_SPEC_INTENSITY

        self.n = n_slots
        self.exact = exact
        # family 1/2 = an MPEG-2 / MPEG-2.5 LSF pool (13818-3): handles
        # get PDMP3_PROFILE_LSF, the wire drops the granule axis (one
        # granule per frame) and carries the intensity sidecar, and the
        # device runs the per-family compiled program.  The serving layer
        # routes streams to per-family pools (mixed-family batches would
        # need per-slot layout constants — docs/ROADMAP.md).
        self.family = family
        if family:
            assert family in (1, 2)
            assert not float_pcm, "LSF pools emit S16 PCM"
            profile |= PROFILE_LSF
        # float_pcm=True: decode_step returns f32 PCM in [-1, 1]
        # (ops/dsp.float_pack) instead of S16 — a serving option the
        # reference lacks; XLA kernel only
        self.float_pcm = float_pcm
        assert not (float_pcm and kernel != "xla"), \
            "float PCM output runs on the XLA kernel"
        # the native PROFILE_SPEC_INTENSITY flag maps to the device DSP's
        # bug_compat switch; either spelling selects spec mode end-to-end
        self.bug_compat = bug_compat and not (profile
                                              & PROFILE_SPEC_INTENSITY)
        self.parse_threads = parse_threads
        self.F = frames_per_step
        self.profile = profile
        # kernel="pallas" decodes with the fused feature-major Pallas
        # kernel (ops/pallas_step) — the fastest path on TPU hardware
        # (BENCH artifact); "xla" is the reference pipeline.  Both shard:
        # xla partitions under pjit, pallas runs under jax.shard_map in
        # the sharded/multihost subclasses
        self.kernel = kernel
        # resample_to: serving option (beyond the reference) — decode_step
        # PCM is resampled on device to this rate (ops/resample
        # polyphase; rate-homogeneous pool, caller provides the input
        # sample_rate since the resampler state must exist before the
        # first frame)
        self._resampler = None
        if resample_to is not None:
            from ..ops.resample import StreamResampler
            assert sample_rate, "resample_to requires sample_rate"
            assert not float_pcm
            self._resampler = StreamResampler(sample_rate, resample_to,
                                              n_slots, 2)
        self.handles = [NativePDMP3() for _ in range(n_slots)]
        for h in self.handles:
            if profile:
                h.set_profile(profile)
            h.open_feed()
        if kernel == "pallas":
            from ..ops.pallas_step import init_pallas_state
            self.state = init_pallas_state(n_slots)
        else:
            self.state = M.init_state(n_slots)
        # frame step tensors live as views into ONE packed wire buffer:
        # the native parse writes in place and the device upload is a
        # single transfer (models.decoder.soa_layout / sparse_layout)
        lay = self._make_layout()
        # double-buffered wire: the device upload of step t is async, so
        # the host parses step t+1 into the other buffer (overlap without
        # racing the in-flight transfer)
        self._wires = [np.zeros(lay["total"], np.int16) for _ in range(2)]
        self._cur = 0
        self._lay = lay
        self._bind_views()
        self._finish_init()

    def _make_layout(self) -> dict:
        if self.family:
            return M.soa_layout_lsf(self.n, self.F)
        return M.soa_layout(self.n, self.F)

    def _bind_views(self):
        lay = self._lay
        self.wire = self._wires[self._cur]

        def view(name, shape):
            o, n = lay[name]
            return self.wire[o:o + n].reshape(shape)

        F = self.F
        ngr = 1 if self.family else 2  # LSF frames carry ONE granule
        self.ix = view("ix", (F * ngr, self.n, 2, 576))
        self.scf_l = view("scf_l", (F * ngr, self.n, 2, 22))
        self.scf_s = view("scf_s", (F * ngr, self.n, 2, 39))
        self.meta = view("meta", (F * ngr, self.n, _META))
        if self.family:
            self.is_pos = view("is_pos", (F, self.n, 64))
        # [B] for the classic one-frame step, [F,B] for multi-frame
        self.active = view("active",
                           (self.n,) if F == 1 else (F, self.n))

    def _finish_init(self):
        if self.family:
            self._fn = lib().pdmp3_parse_step_wire16_lsf
            self._fn.argtypes = [C.c_void_p, C.c_size_t, C.c_int,
                                 C.c_size_t, C.c_void_p, C.c_void_p,
                                 C.c_void_p, C.c_void_p, C.c_void_p,
                                 C.c_void_p]
        else:
            self._fn = lib().pdmp3_parse_step_wire16
            self._fn.argtypes = [C.c_void_p, C.c_size_t, C.c_int,
                                 C.c_size_t, C.c_void_p, C.c_void_p,
                                 C.c_void_p, C.c_void_p, C.c_void_p]
        self._handle_arr = (C.c_void_p * self.n)(
            *[h._h for h in self.handles])

    # ---- host side ----

    def feed(self, slot: int, data: bytes) -> int:
        return self.handles[slot].feed(data)

    def inbuf_free(self, slot: int) -> int:
        return self.handles[slot].inbuf_free()

    def parse_step(self) -> int:
        """Parse one frame per slot into the step tensors (one native call
        for the whole batch).  Returns the number of active slots."""
        if self.family:
            return self._fn(self._handle_arr, self.n, self.parse_threads,
                            self.F,
                            self.ix.ctypes.data_as(C.c_void_p),
                            self.scf_l.ctypes.data_as(C.c_void_p),
                            self.scf_s.ctypes.data_as(C.c_void_p),
                            self.meta.ctypes.data_as(C.c_void_p),
                            self.is_pos.ctypes.data_as(C.c_void_p),
                            self.active.ctypes.data_as(C.c_void_p))
        return self._fn(self._handle_arr, self.n, self.parse_threads,
                        self.F,
                        self.ix.ctypes.data_as(C.c_void_p),
                        self.scf_l.ctypes.data_as(C.c_void_p),
                        self.scf_s.ctypes.data_as(C.c_void_p),
                        self.meta.ctypes.data_as(C.c_void_p),
                        self.active.ctypes.data_as(C.c_void_p))

    # ---- device side ----

    def decode_step(self, fetch: bool = True):
        """Decode the parsed frame (2 granule steps; 1 for LSF pools).
        Returns interleaved PCM int16 [B, frames_per_step*1152, 2]
        ([B, frames_per_step*576, 2] for LSF pools — one granule per
        frame) with zeros for inactive slots/frames, or None if no
        slot was active.  fetch=False keeps the PCM on device (jax array) —
        the serving configuration, where a downstream consumer pulls PCM
        asynchronously."""
        if not self.active.any():
            return None
        import jax
        if self.family:
            # LSF pool: one granule per frame -> [B, F*576, 2] PCM
            pcm, self.state = M.decode_frame_packed_lsf(
                jax.device_put(self.wire), self.state, B=self.n, F=self.F,
                family=self.family, exact=self.exact,
                bug_compat=self.bug_compat, kernel=self.kernel)
        else:
            pcm, self.state = M.decode_frame_packed(
                jax.device_put(self.wire), self.state, B=self.n, F=self.F,
                exact=self.exact, bug_compat=self.bug_compat,
                kernel=self.kernel, float_pcm=self.float_pcm)
        # swap to the other wire buffer for the next parse (the upload of
        # this one may still be in flight); carry the just-decoded step's
        # active/meta over so post-decode queries keep working
        act, meta = self.active.copy(), self.meta.copy()
        self._cur ^= 1
        self._bind_views()
        self.active[:] = act
        self.meta[:] = meta
        if self._resampler is not None:
            pcm = self._resampler(pcm)
        return np.asarray(pcm) if fetch else pcm

    def decode_step_pipelined(self):
        """decode_step with an asynchronous D2H PCM drain (ROADMAP /
        round-2 VERDICT item 5): decodes this step, starts the device→
        host copy of its PCM without blocking, and returns the PREVIOUS
        step's PCM as numpy (None on the first call or idle steps).  The
        returned array corresponds to the active mask of the previous
        step — callers consuming per-slot PCM one step late must
        snapshot active/meta alongside.  In steady state the host parse,
        H2D wire upload, device step, and D2H drain of step k-1 all
        overlap (tools/drain_trace.py captures the profile)."""
        pcm = self.decode_step(fetch=False)
        if pcm is not None:
            pcm.copy_to_host_async()
        prev, self._pending_pcm = getattr(self, "_pending_pcm", None), pcm
        return np.asarray(prev) if prev is not None else None

    def drain_pending(self):
        """Fetch the last pipelined step's PCM (flush at end of stream)."""
        prev, self._pending_pcm = getattr(self, "_pending_pcm", None), None
        return np.asarray(prev) if prev is not None else None

    def nch(self, slot: int) -> int:
        return max(int(self.meta[0, slot, _M_NCH]), 1)

    # ---- mid-stream join (seek inside the serving pool) ----

    def join(self, slot: int, data: bytes, start_s: float,
             duration_s: float | None = None, *, index=None):
        """Point ``slot`` at time ``start_s`` of a NEW stream.

        Serving-side seek: the slot's handle is reset and a
        :class:`SlotJoin` cursor is returned whose payload (silent
        primer frames + reservoir-covering preroll slice, see
        metadata.plan_seek) the caller pumps into the slot's ring as
        space allows.  The slot's first ``drop_samples`` per-channel
        PCM samples are warm-up and must be discarded; what follows is
        bit-exact vs the same window of a full decode of the stream.
        No device-state reset is needed even when the slot previously
        served another stream: the decoder's recurrent carries (overlap
        store, synthesis ring, band-12 prev_lines) are fully
        re-written within one granule, inside the dropped warm-up
        (tests/test_metadata.py::test_pool_join_reused_slot).

        Returns None when the window is empty.
        """
        from ..metadata import build_frame_index, plan_seek
        if index is None:
            index = build_frame_index(data)
        plan = plan_seek(data, start_s, duration_s, index=index)
        if plan is None:
            return None
        assert plan.info.layer == 3, "pools decode Layer III"
        assert plan.info.family == self.family, \
            f"stream family {plan.info.family} != pool family {self.family}"
        self.handles[slot].open_feed()
        return SlotJoin(self, slot, plan)

    # ---- checkpoint/resume (SURVEY.md §5): host state blobs + device
    # recurrent state; a restored decoder continues bit-identically ----

    def save_checkpoint(self) -> dict:
        """Checkpoint blobs are always in the canonical DecoderState
        layout, so a decoder restored with a different kernel continues
        bit-identically."""
        state = self.state
        if self.kernel == "pallas":
            from ..ops.pallas_step import state_from_pallas
            state = state_from_pallas(state)
        return {
            "handles": [h.save_state() for h in self.handles],
            "store": np.asarray(state.store),
            "v_blocks": np.asarray(state.v_blocks),
            "prev_lines": np.asarray(state.prev_lines),
        }

    def restore_checkpoint(self, ckpt: dict) -> None:
        assert len(ckpt["handles"]) == self.n
        for h, blob in zip(self.handles, ckpt["handles"]):
            h.restore_state(blob)
        prev = ckpt.get("prev_lines")
        state = M.DecoderState(
            store=jnp.asarray(ckpt["store"]),
            v_blocks=jnp.asarray(ckpt["v_blocks"]),
            prev_lines=(jnp.zeros((self.n, 3), jnp.float32)
                        if prev is None else jnp.asarray(prev)))
        if self.kernel == "pallas":
            from ..ops.pallas_step import state_to_pallas
            state = state_to_pallas(state)
        self.state = state


class SlotJoin:
    """Feed cursor for a slot serving a mid-stream join (see
    :meth:`StreamDecoder.join`).  ``pump()`` each scheduling round;
    consume the slot's PCM front-anchored: every step where the slot is
    active emits samples_per_frame samples — drop the first
    ``drop_samples``, keep up to ``take_samples``."""

    def __init__(self, dec: StreamDecoder, slot: int, plan):
        self.dec, self.slot, self.plan = dec, slot, plan
        self.pos = 0
        self.drop_samples = plan.drop_samples
        self.take_samples = plan.take_samples

    @property
    def exhausted(self) -> bool:
        return self.pos >= len(self.plan.payload)

    def pump(self) -> int:
        """Feed as much remaining payload as the slot ring fits;
        returns bytes fed (0 once exhausted)."""
        free = self.dec.inbuf_free(self.slot)
        chunk = self.plan.payload[self.pos:self.pos + free]
        if not chunk:
            return 0
        rc = self.dec.feed(self.slot, chunk)
        assert rc == T.OK, rc
        self.pos += len(chunk)
        return len(chunk)


class SparseStreamDecoder(StreamDecoder):
    """StreamDecoder over the count1-bounded sparse wire: spectra ship as
    128-line blocks covering only each channel's nonzero prefix (rzero is
    zero from count1 up, pdmp3.c:2108-2111), typically 2-4x fewer wire
    bytes per step than the dense wire — the binding constraint for
    transfer-inclusive throughput on any interconnect.  PCM is
    bit-identical to the dense path."""

    def _make_layout(self) -> dict:
        if self.family:
            self._cap_full = self.F * self.n * 2 * 5
            return M.sparse_layout_lsf(self.n, self.F, self._cap_full)
        self._cap_full = M.sparse_worst_blocks(self.n, self.F)
        return M.sparse_layout(self.n, self.F, self._cap_full)

    def _bind_views(self):
        lay = self._lay
        self.wire = self._wires[self._cur]

        def view(name, shape):
            o, n = lay[name]
            return self.wire[o:o + n].reshape(shape)

        F = self.F
        ngr = 1 if self.family else 2
        self.blk = view("blk", (F * ngr, self.n, 2, 4))
        self.scf_l = view("scf_l", (F * ngr, self.n, 2, 22))
        self.scf_s = view("scf_s", (F * ngr, self.n, 2, 39))
        self.meta = view("meta", (F * ngr, self.n, _META))
        if self.family:
            self.is_pos = view("is_pos", (F, self.n, 64))
        self.active = view("active",
                           (self.n,) if F == 1 else (F, self.n))
        self.ix_flat = view("ix_flat", (self._cap_full, M.SPARSE_BLOCK))

    def _finish_init(self):
        if self.family:
            self._fn = lib().pdmp3_parse_step_wire16_lsf_sparse
            self._fn.argtypes = [C.c_void_p, C.c_size_t, C.c_int,
                                 C.c_size_t, C.c_void_p, C.c_size_t,
                                 C.c_void_p, C.c_void_p, C.c_void_p,
                                 C.c_void_p, C.c_void_p, C.c_void_p,
                                 C.POINTER(C.c_longlong)]
        else:
            self._fn = lib().pdmp3_parse_step_wire16_sparse
            self._fn.argtypes = [C.c_void_p, C.c_size_t, C.c_int,
                                 C.c_size_t, C.c_void_p, C.c_size_t,
                                 C.c_void_p, C.c_void_p, C.c_void_p,
                                 C.c_void_p, C.c_void_p,
                                 C.POINTER(C.c_longlong)]
        self._handle_arr = (C.c_void_p * self.n)(
            *[h._h for h in self.handles])
        self._used = C.c_longlong(0)

    def parse_step(self) -> int:
        if self.family:
            return self._fn(self._handle_arr, self.n, self.parse_threads,
                            self.F,
                            self.ix_flat.ctypes.data_as(C.c_void_p),
                            self._cap_full,
                            self.blk.ctypes.data_as(C.c_void_p),
                            self.scf_l.ctypes.data_as(C.c_void_p),
                            self.scf_s.ctypes.data_as(C.c_void_p),
                            self.meta.ctypes.data_as(C.c_void_p),
                            self.is_pos.ctypes.data_as(C.c_void_p),
                            self.active.ctypes.data_as(C.c_void_p),
                            C.byref(self._used))
        return self._fn(self._handle_arr, self.n, self.parse_threads,
                        self.F,
                        self.ix_flat.ctypes.data_as(C.c_void_p),
                        self._cap_full,
                        self.blk.ctypes.data_as(C.c_void_p),
                        self.scf_l.ctypes.data_as(C.c_void_p),
                        self.scf_s.ctypes.data_as(C.c_void_p),
                        self.meta.ctypes.data_as(C.c_void_p),
                        self.active.ctypes.data_as(C.c_void_p),
                        C.byref(self._used))

    def _bucket_blocks(self) -> int:
        """Step occupancy rounded up to 1/8ths of worst case, and sticky
        upward: occupancy dips never shrink the bucket, so the decoder
        compiles at most 8 specializations total and a fluctuating
        active-slot count can't trigger mid-serving recompiles (a
        recompile costs ~10^4 steps of decode time)."""
        used = max(int(self._used.value), 1)
        gran = max(64, -(-self._cap_full // 8))
        b = min(-(-used // gran) * gran, self._cap_full)
        self._bucket_sticky = max(b, getattr(self, "_bucket_sticky", 0))
        return self._bucket_sticky

    def wire_bytes(self) -> int:
        """Bytes the next decode_step will actually upload."""
        return 2 * (self._lay["fixed"]
                    + self._bucket_blocks() * M.SPARSE_BLOCK)

    def decode_step(self, fetch: bool = True):
        if not self.active.any():
            return None
        import jax
        cap = self._bucket_blocks()
        upload = self.wire[:self._lay["fixed"] + cap * M.SPARSE_BLOCK]
        if self.family:
            pcm, self.state = M.decode_frame_lsf_sparse(
                jax.device_put(upload), self.state, B=self.n, F=self.F,
                cap_blocks=cap, family=self.family, exact=self.exact,
                bug_compat=self.bug_compat, kernel=self.kernel)
        else:
            pcm, self.state = M.decode_frame_sparse(
                jax.device_put(upload), self.state, B=self.n, F=self.F,
                cap_blocks=cap, exact=self.exact, bug_compat=self.bug_compat,
                kernel=self.kernel, float_pcm=self.float_pcm)
        act, meta = self.active.copy(), self.meta.copy()
        self._cur ^= 1
        self._bind_views()
        self.active[:] = act
        self.meta[:] = meta
        if self._resampler is not None:
            pcm = self._resampler(pcm)
        return np.asarray(pcm) if fetch else pcm


class L12StreamDecoder:
    """N-slot batched Layer I/II decoder (beyond-reference: the
    reference rejects layer != 3, pdmp3.c:1240/1312).

    One layer per pool, like the LSF family pools: handles get
    PDMP3_PROFILE_L12, the native frontend bit-parses AND requantizes
    (the whole Layer I/II bitstream stage is control flow — there is no
    Huffman/reservoir), and the wire ships float subband samples
    [F][B][2][S][32] (S = 12 Layer I / 36 Layer II) straight into the
    batched polyphase synthesis step (models.l12.decode_l12_frames).
    The API surface mirrors StreamDecoder (feed / parse_step /
    decode_step / pipelined drain / checkpoints); the per-slot device
    state is the synthesis v_blocks FIFO alone.

    The wire is two buffers per step (f32 spectra + tiny int16
    meta/active) instead of StreamDecoder's single packed int16 buffer —
    the sb section is already device-ready f32, so there is nothing to
    recombine on device."""

    def __init__(self, n_slots: int, layer: int = 2, exact: bool = False,
                 parse_threads: int = 1, frames_per_step: int = 1,
                 profile: int = 0, float_pcm: bool = False):
        from ..host import PROFILE_L12
        from ..models.l12 import init_l12_state

        assert layer in (1, 2)
        self.n = n_slots
        self.layer = layer
        self.S = 12 if layer == 1 else 36
        self.exact = exact
        self.float_pcm = float_pcm
        self.parse_threads = parse_threads
        self.F = frames_per_step
        self.profile = profile | PROFILE_L12
        self.handles = [NativePDMP3() for _ in range(n_slots)]
        for h in self.handles:
            h.set_profile(self.profile)
            h.open_feed()
        self.state = init_l12_state(n_slots)
        F, B, S = self.F, self.n, self.S
        # double-buffered wire (cf. StreamDecoder): host parses step t+1
        # while step t's upload may be in flight
        self._sb_wires = [np.zeros((F, B, 2, S, 32), np.float32)
                          for _ in range(2)]
        self._mt_wires = [np.zeros((F, B, 4), np.int16) for _ in range(2)]
        self._act_wires = [np.zeros((F, B) if F > 1 else (B,), np.int16)
                           for _ in range(2)]
        self._cur = 0
        self._bind_views()
        self._fn = lib().pdmp3_parse_step_wire_l12
        self._fn.argtypes = [C.c_void_p, C.c_size_t, C.c_int, C.c_size_t,
                             C.c_int, C.c_void_p, C.c_void_p, C.c_void_p]
        self._handle_arr = (C.c_void_p * self.n)(
            *[h._h for h in self.handles])

    def _bind_views(self):
        self.sb = self._sb_wires[self._cur]
        self.meta = self._mt_wires[self._cur]
        self.active = self._act_wires[self._cur]

    # ---- host side ----

    def feed(self, slot: int, data: bytes) -> int:
        return self.handles[slot].feed(data)

    def inbuf_free(self, slot: int) -> int:
        return self.handles[slot].inbuf_free()

    def parse_step(self) -> int:
        return self._fn(self._handle_arr, self.n, self.parse_threads,
                        self.F, self.layer,
                        self.sb.ctypes.data_as(C.c_void_p),
                        self.meta.ctypes.data_as(C.c_void_p),
                        self.active.ctypes.data_as(C.c_void_p))

    def nch(self, slot: int) -> int:
        m = self.meta if self.F == 1 else self.meta[0]
        return max(int(m.reshape(self.F, self.n, 4)[0, slot, 0]), 1)

    # ---- device side ----

    def decode_step(self, fetch: bool = True):
        """Decode the parsed frame(s).  Returns PCM int16
        [B, frames_per_step*S*32, 2] (f32 with float_pcm), zeros for
        inactive slot-frames, or None if no slot was active."""
        if not self.active.any():
            return None
        import jax
        from ..models.l12 import decode_l12_frames
        sb = jax.device_put(self.sb)
        meta = jax.device_put(self.meta)
        act = jax.device_put(self.active.reshape(self.F, self.n))
        outs = []
        for f in range(self.F):
            pcm, self.state = decode_l12_frames(
                sb[f], meta[f, :, 0].astype(jnp.int32), act[f],
                self.state, exact=self.exact, float_pcm=self.float_pcm)
            outs.append(pcm)
        pcm = outs[0] if self.F == 1 else jnp.concatenate(outs, axis=1)
        act_h = self.active.copy()
        meta_h = self.meta.copy()
        self._cur ^= 1
        self._bind_views()
        self.active[:] = act_h
        self.meta[:] = meta_h
        return np.asarray(pcm) if fetch else pcm

    def decode_step_pipelined(self):
        """Asynchronous D2H PCM drain (cf. StreamDecoder): returns the
        PREVIOUS step's PCM."""
        pcm = self.decode_step(fetch=False)
        if pcm is not None:
            pcm.copy_to_host_async()
        prev, self._pending_pcm = getattr(self, "_pending_pcm", None), pcm
        return np.asarray(prev) if prev is not None else None

    def drain_pending(self):
        prev, self._pending_pcm = getattr(self, "_pending_pcm", None), None
        return np.asarray(prev) if prev is not None else None

    # ---- checkpoint/resume ----

    def save_checkpoint(self) -> dict:
        return {
            "handles": [h.save_state() for h in self.handles],
            "v_blocks": np.asarray(self.state.v_blocks),
        }

    def restore_checkpoint(self, ckpt: dict) -> None:
        from ..models.l12 import L12State
        assert len(ckpt["handles"]) == self.n
        for h, blob in zip(self.handles, ckpt["handles"]):
            h.restore_state(blob)
        self.state = L12State(v_blocks=jnp.asarray(ckpt["v_blocks"]))


def decode_files_batched(files: list[bytes], n_slots: int | None = None,
                         exact: bool = False, chunk: int = 4096,
                         family: int = 0, layer: int = 3,
                         gapless: bool = False,
                         window: tuple | None = None) -> list[bytes]:
    """Offline batched decode (BASELINE.json configs[3]): round-robin the
    files over slots, stepping all streams in lockstep on the TPU.
    family 1/2 decodes an MPEG-2 / MPEG-2.5 (LSF) corpus through the
    per-family pool; layer 1/2 decodes a Layer I/II corpus through the
    per-layer pool (beyond-reference).

    gapless=True applies each file's LAME delay/padding trim (exact
    track length, metadata.decode_file_gapless semantics); window=
    (start_s, duration_s) decodes only that window of every file,
    bit-exact vs the same window of its full decode (metadata.plan_seek
    preroll per file).  Both are Layer III options.
    """
    trims = None
    if gapless or window is not None:
        assert layer == 3, "gapless/window are Layer III options"
        assert not (gapless and window), "pick one of gapless / window"
        from ..metadata import (_primer_frames, build_frame_index,
                                gapless_bounds, parse_header, plan_seek)
        trims, payloads = [], []
        for data in files:
            idx = build_frame_index(bytes(data))
            info = idx.info
            if window is not None:
                plan = plan_seek(bytes(data), window[0],
                                 None if len(window) < 2 else window[1],
                                 index=idx)
                if plan is None:
                    payloads.append(b"")
                    trims.append((0, 0, 2 * info.channels))
                    continue
                payloads.append(plan.payload)
                trims.append((plan.drop_samples, plan.take_samples,
                              2 * info.channels))
            else:
                skip, keep = gapless_bounds(info)
                tail = b""
                if keep is not None:
                    h0 = parse_header(bytes(data), info.first_audio_offset)
                    if h0 is not None:
                        tail = _primer_frames(h0)[0]
                        while len(tail) < 2 * 1152:
                            tail += tail
                payloads.append(bytes(data[info.first_audio_offset:])
                                + tail)
                trims.append((skip, keep, 2 * info.channels))
        files = payloads
    n = n_slots or len(files)
    out: list[list[bytes]] = [[] for _ in files]
    for base in range(0, len(files), n):
        group = files[base:base + n]
        if layer in (1, 2):
            assert family == 0, "Layer I/II pools select by layer"
            dec = L12StreamDecoder(len(group), layer=layer, exact=exact)
        else:
            dec = StreamDecoder(len(group), exact=exact, family=family)
        pos = [0] * len(group)
        while True:
            # keep input rings topped up
            for s, data in enumerate(group):
                while pos[s] < len(data):
                    free = dec.inbuf_free(s)
                    if free < chunk:
                        break
                    n_feed = min(chunk, len(data) - pos[s])
                    dec.feed(s, data[pos[s]:pos[s] + n_feed])
                    pos[s] += n_feed
            if dec.parse_step() == 0:
                break
            pcm = dec.decode_step()
            for s in range(len(group)):
                if dec.active[s]:
                    nch = dec.nch(s)
                    p = pcm[s]  # [1152, 2] (LSF: [576, 2])
                    if nch == 1:
                        out[base + s].append(p[:, 0].tobytes())
                    else:
                        out[base + s].append(p.tobytes())
    pcms = [b"".join(chunks) for chunks in out]
    if trims is not None:
        for i, (drop, take, fb) in enumerate(trims):
            pcm = pcms[i][drop * fb:]
            if take is not None:
                pcm = pcm[:take * fb]
            pcms[i] = pcm
    return pcms
