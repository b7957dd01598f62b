"""Offline batched decode as a single device program.

For offline workloads (BASELINE.json configs[3]: decode 1k files), the
streaming step-per-frame loop wastes a host->device round trip per frame.
Here the native frontend parses *all* frames of all files up front into
time-major tensors [T, 2, B, ...], everything uploads in one transfer, and
a `lax.scan` over the frame axis threads the recurrent DSP state on device
— one dispatch decodes the whole corpus: PCM [T, B, 1152, 2].

Streams shorter than T pad with inactive steps (state frozen, silence).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import decoder as M
from ..host import NativePDMP3, lib


def parse_corpus(files: list[bytes], chunk: int = 8192):
    """Parse every frame of every file with the native frontend.

    Returns time-major numpy step tensors:
      ix [T,2,B,2,576] i16, scf_l [T,2,B,2,22] u8, scf_s [T,2,B,2,39] u8,
      meta [T,2,B,32] i32, active [T,B] i32, nch [B]
    """
    import ctypes as C
    del chunk  # feeding handled natively
    B = len(files)
    fn = lib().pdmp3_parse_stream
    fn.restype = C.c_long
    fn.argtypes = [C.c_void_p, C.c_char_p, C.c_size_t, C.c_size_t,
                   C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p]
    per_file = []
    nch = np.ones(B, np.int32)
    for b, data in enumerate(files):
        # fresh handle per file: open_feed keeps the persistent
        # scalefactor arrays (reference parity, pdmp3.c:2369-2384 never
        # clears g_main_data), so a reused handle would leak file b-1's
        # stale scalefactors into file b's silent granules and
        # sfb21-overread slots — each file must decode exactly as the
        # reference binary decodes it alone (caught by real libshine/
        # LAME corpora, tests/test_real_encoder.py)
        h = NativePDMP3()
        # one native call parses the entire stream (pdmp3_parse_stream).
        # Tight frame bound: the smallest MPEG-1 Layer III frame is
        # 144*32000/48000 = 96 bytes (bitrate index 1 @ 48 kHz, no padding),
        # so len/96 is a hard upper bound on the frame count.
        tmax = len(data) // 96 + 4
        fi = np.empty((2, tmax, 2, 576), np.int16)
        fl = np.empty((2, tmax, 2, 22), np.uint8)
        fs = np.empty((2, tmax, 2, 39), np.uint8)
        fm = np.empty((2, tmax, M._META_WORDS), np.int32)
        t = fn(h._h, data, len(data), tmax,
               fi.ctypes.data_as(C.c_void_p), fl.ctypes.data_as(C.c_void_p),
               fs.ctypes.data_as(C.c_void_p), fm.ctypes.data_as(C.c_void_p))
        per_file.append((int(t), fi, fl, fs, fm))
        if t > 0:
            nch[b] = max(int(fm[0, 0, 24]), 1)
    T = max((t for t, *_ in per_file), default=0)
    ix = np.zeros((T, 2, B, 2, 576), np.int16)
    scf_l = np.zeros((T, 2, B, 2, 22), np.uint8)
    scf_s = np.zeros((T, 2, B, 2, 39), np.uint8)
    meta = np.zeros((T, 2, B, M._META_WORDS), np.int32)
    active = np.zeros((T, B), np.int32)
    for b, (t, fi, fl, fs, fm) in enumerate(per_file):
        ix[:t, :, b] = fi[:, :t].transpose(1, 0, 2, 3)
        scf_l[:t, :, b] = fl[:, :t].transpose(1, 0, 2, 3)
        scf_s[:t, :, b] = fs[:, :t].transpose(1, 0, 2, 3)
        meta[:t, :, b] = fm[:, :t].transpose(1, 0, 2)
        active[:t, b] = 1
    return ix, scf_l, scf_s, meta, active, nch


@functools.partial(jax.jit, static_argnames=("exact", "bug_compat"))
def _scan_decode(ix, scf_l, scf_s, meta, active, state,
                 exact: bool = False, bug_compat: bool = True):
    def step(state, xs):
        ix2, scf_l2, scf_s2, meta2, act = xs
        pcm, state = M.decode_frame_soa.__wrapped__(
            ix2, scf_l2, scf_s2, meta2, act, state, exact, bug_compat)
        return state, pcm

    state, pcm = jax.lax.scan(step, state,
                              (ix, scf_l, scf_s, meta, active))
    return pcm, state


def decode_files_scan(files: list[bytes], exact: bool = False,
                      bug_compat: bool = True) -> list[bytes]:
    """Whole-corpus offline decode in one device dispatch.

    exact=True reproduces the reference decoder's PCM bit-for-bit (see
    ops/dsp.py precision modes); exact=False is the MXU fast path (±1 LSB).
    """
    ix, scf_l, scf_s, meta, active, nch = parse_corpus(files)
    B = len(files)
    if ix.shape[0] == 0:
        return [b"" for _ in files]
    state = M.init_state(B)
    pcm, _ = _scan_decode(jnp.asarray(ix), jnp.asarray(scf_l),
                          jnp.asarray(scf_s), jnp.asarray(meta),
                          jnp.asarray(active), state,
                          exact=exact, bug_compat=bug_compat)
    pcm = np.asarray(pcm)  # [T, B, 1152, 2]
    out = []
    for b in range(B):
        n_frames = int(active[:, b].sum())
        p = pcm[:n_frames, b]
        out.append(p[:, :, 0].tobytes() if nch[b] == 1 else p.tobytes())
    return out
