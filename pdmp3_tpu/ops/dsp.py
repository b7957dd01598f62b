"""Batched Layer III DSP stages as JAX ops.

Every stage processes a *granule batch*: tensors with leading axes
``[B, 2(ch), ...]`` where B granule slots from independent streams decode in
one fused tensor program.  Per-granule coding variance (block types, mixed
flags, stereo modes, count1 extents) is handled with masks and constant-map
gathers instead of control flow, so a single compiled program covers the
whole format matrix (SURVEY.md §2.3, §7).

Each stage has two precision paths:

- ``exact=True``: reproduces the reference decoder's float32 operation
  ordering (sequential accumulations, double-precision rounding points), so
  final PCM is bit-exact vs the reference binary.  Accumulations become
  unrolled broadcast multiply-adds on the VPU.
- ``exact=False``: MXU-friendly einsums/matmuls in float32 (same math,
  tree-reduced) for maximum throughput; output may differ by ±1 LSB on a
  small fraction of samples (quantization-boundary ulps).

Reference provenance is cited per stage.  No reference code is used; the
formulations are redesigned for batched tensor execution (see docstrings).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import tables as T

# Bench-only ablation hooks (tools/abl_exact.py): selectively degrade the
# exact path's precision points to attribute its cost (ABL_EXACT_r03.json).
# Read once at import so every trace of a process is consistent.  Never set
# in production.
_ABL = os.environ.get("PDMP3_ABL", "")

F32 = jnp.float32
_MAPS = T.layout_maps()
_SMAPS = T.stereo_maps()
_RATIO_L, _RATIO_R = T.intensity_ratio_tables()
_PRETAB22 = np.concatenate([T.PRETAB, [0]]).astype(np.int32)
_INV_SIGN = T.freq_inversion_sign()


# ---------------------------------------------------------------------------
# Gather elimination.
#
# TPU lowers arbitrary dynamic gathers to a slow serial path (~15 ms for a
# [B,2,576] index tensor at B=1024 — measured), so the hot path expresses
# table lookups as one-hot contractions on the MXU instead.  These are
# *bit-exact*: each output sums exactly one nonzero product v*1.0, and the
# bf16x3 HIGHEST-precision decomposition reconstructs the f32 operand
# exactly (non-overlapping mantissa segments), so matmul-gather == gather.
# The biggest former gather — the 8207-entry pow-4/3 table — is gone
# entirely as of round 4: _pow43_ff_exact computes the correctly-rounded
# value as a ~40-op VPU closed form (exhaustively proven), ~1 ms faster
# per step at B=8192 than the one-hot contraction it replaced.
# ---------------------------------------------------------------------------

_HIGH = jax.lax.Precision.HIGHEST
# Single-pass bf16 matmul: EXACT whenever both operands are
# bf16-representable (0/1 one-hots and integer tables <= 256), and 6x
# cheaper than the HIGHEST bf16x3x2 decomposition on the MXU.
_FAST = jax.lax.Precision.DEFAULT


def _onehot(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    return (idx[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(F32)


def _map_select(table: np.ndarray, layout: jnp.ndarray,
                out_int: bool = True) -> jnp.ndarray:
    """table[R, 576] selected by layout [...] -> [..., 576] via one-hot
    matmul (values < 2^24 so the f32 round-trip is exact)."""
    t = np.asarray(table, np.float32)
    # integer values <= 256 survive a single-pass bf16 matmul exactly;
    # real-valued tables (e.g. IMDCT windows) must stay HIGHEST
    prec = (_FAST if t.size and np.abs(t).max() <= 256
            and np.array_equal(t, np.round(t)) else _HIGH)
    oh = _onehot(layout, t.shape[0])
    out = jnp.einsum("...l,li->...i", oh, jnp.asarray(t), precision=prec,
                     preferred_element_type=F32)
    return out.astype(jnp.int32) if out_int else out


def _compose_reorder(src: np.ndarray, family: int = 0) -> np.ndarray:
    """Precompose a per-(layout, line) map with the short-block reorder
    permutation: out[l, i] = src[l, perm_l[i]].  Wire-reordered spectra
    (line i holds bitstream line perm_l[i]) then read the right per-line
    constant with no device-side permutation.  sfb-keyed maps (sfb,
    is_short, pretab, band_start) are invariant under this — the reorder
    permutes strictly within each scalefactor band (pdmp3.c:1786-1823) —
    so only window-keyed maps actually change."""
    return np.take_along_axis(np.asarray(src),
                              T.layout_maps(family)["reorder"], axis=1)


@functools.lru_cache(maxsize=None)
def _expansion_const(map_name: str, width: int,
                     pre_reordered: bool = False,
                     family: int = 0) -> np.ndarray:
    """E[l, i, k] = 1 where layout l's line i reads slot k of a per-
    granule-channel parameter vector (k = sfb / win / flat short index).
    family selects the sample-rate generation's band-edge maps (LSF,
    tables.py) — each family compiles its own [9,576,k] constants."""
    lm = T.layout_maps(family)
    m = lm if map_name in lm else T.stereo_maps(family)
    src = m[map_name]
    if pre_reordered:
        src = _compose_reorder(src, family)
    E = np.zeros((T.N_LAYOUTS, 576, width), np.float32)
    rows = np.arange(576)
    for lay in range(T.N_LAYOUTS):
        E[lay, rows, np.clip(src[lay], 0, width - 1)] = 1.0
    return E


@functools.lru_cache(maxsize=None)
def _expansion_sfb_s(pre_reordered: bool = False,
                     family: int = 0) -> np.ndarray:
    """E[l, i, k] for the flattened short scalefac slot k = min(sfb,12)*3
    + win, 39 wide."""
    m = T.layout_maps(family)
    k_map = np.minimum(m["sfb"], 12) * 3 + m["win"]
    if pre_reordered:
        k_map = _compose_reorder(k_map, family)
    E = np.zeros((T.N_LAYOUTS, 576, 39), np.float32)
    rows = np.arange(576)
    for lay in range(T.N_LAYOUTS):
        E[lay, rows, k_map[lay]] = 1.0
    return E


def _expand(values: jnp.ndarray, E: np.ndarray, layout_oh: jnp.ndarray,
            precision=_HIGH) -> jnp.ndarray:
    """Per-line lookup keyed by (layout, line) into a per-slot parameter
    vector: out[..., i] = values[..., k(layout, i)].

    Contracted as t[...,l,k] = onehot_l * values_k (tiny), then
    out = t @ E[l,i,k] — one [9*width, 576] constant matmul on the MXU.
    precision=_FAST (single-pass bf16) is exact for values <= 256 and
    within the fast path's ±1 LSB budget otherwise (the only larger
    values are band-12 bit patterns whose gains underflow to ~0).
    """
    t = jnp.einsum("...l,...k->...lk", layout_oh, values.astype(F32),
                   precision=_HIGH, preferred_element_type=F32)
    return jnp.einsum("...lk,lik->...i", t, jnp.asarray(E),
                      precision=precision, preferred_element_type=F32)


def _gather2(table: np.ndarray, idx: jnp.ndarray, lo_bits: int
             ) -> jnp.ndarray:
    """Bit-exact table gather as a two-level one-hot contraction:
    out[x] = table[idx[x]] with idx split into hi/lo halves, so the
    contraction is einsum('...h,...l,hl->...') on the MXU."""
    n = table.shape[0]
    lo_n = 1 << lo_bits
    hi_n = (n + lo_n - 1) // lo_n
    t2 = np.zeros((hi_n, lo_n), np.float32)
    t2.reshape(-1)[:n] = table
    hi = _onehot(idx >> lo_bits, hi_n)
    lo = _onehot(idx & (lo_n - 1), lo_n)
    return jnp.einsum("...h,...l,hl->...", hi, lo, jnp.asarray(t2),
                      precision=_HIGH, preferred_element_type=F32)


def split_bf16x3(table: np.ndarray) -> tuple[np.ndarray, ...] | None:
    """Split an f32 table into three bf16 planes whose f32 sum
    reconstructs every entry bit-exactly (non-overlapping 8-bit mantissa
    segments), or None if any entry fails to reconstruct (then callers
    must keep the HIGHEST-precision path).  pow43's 8207 entries all
    reconstruct — asserted by test_dsp_stages.test_bf16x3_split_exact."""
    t = np.asarray(table, np.float32)
    import ml_dtypes
    planes = []
    resid = t
    for _ in range(3):
        p = resid.astype(ml_dtypes.bfloat16)
        planes.append(p)
        resid = np.float32(resid - p.astype(np.float32))
    rec = planes[0].astype(np.float32)
    for p in planes[1:]:
        rec = rec + p.astype(np.float32)
    if rec.tobytes() != t.tobytes():
        return None
    return tuple(np.asarray(p, np.float32) for p in planes)


@functools.lru_cache(maxsize=None)
def _gather2_planes(key: str, lo_bits: int):
    """Padded [hi, lo] bf16x3 planes for a named table (or None)."""
    table = {"pow43": T.POW43}[key]
    planes = split_bf16x3(np.asarray(table))
    if planes is None:
        return None
    n = np.asarray(table).shape[0]
    lo_n = 1 << lo_bits
    hi_n = (n + lo_n - 1) // lo_n
    out = []
    for p in planes:
        t2 = np.zeros((hi_n, lo_n), np.float32)
        t2.reshape(-1)[:n] = p
        out.append(t2)
    return tuple(out)


def _gather2_fast_exact(key: str, idx: jnp.ndarray, lo_bits: int
                        ) -> jnp.ndarray:
    """_gather2, but as THREE single-pass bf16 contractions against the
    bf16x3-split table planes instead of one HIGHEST contraction (~2x
    cheaper on the MXU: the one-hot operands are exactly bf16, so only
    the table side needs decomposition, and HIGHEST decomposes both).
    Bit-exact: each plane contraction selects one bf16 value exactly,
    and the f32 plane sum reconstructs the f32 entry (split_bf16x3)."""
    planes = _gather2_planes(key, lo_bits)
    if planes is None:  # pragma: no cover - pow43 reconstructs
        return _gather2(np.asarray({"pow43": T.POW43}[key]), idx, lo_bits)
    lo_n = 1 << lo_bits
    hi = _onehot(idx >> lo_bits, planes[0].shape[0])
    lo = _onehot(idx & (lo_n - 1), lo_n)
    parts = [jnp.einsum("...h,...l,hl->...", hi, lo, jnp.asarray(p),
                        precision=_FAST, preferred_element_type=F32)
             for p in planes]
    return (parts[0] + parts[1]) + parts[2]


@functools.lru_cache(maxsize=None)
def _bitplane_table(key: str, lo_bits: int) -> np.ndarray:
    """[lo_n, hi_n*4] int8: column (h*4 + b) holds byte b of the f32 BIT
    PATTERN of table entry (h, l) — the int8-MXU formulation of the
    two-level gather (ROADMAP: int8 matmuls run at 2x bf16 throughput,
    and integer bytes are exact by construction, no reconstruction
    property needed)."""
    table = np.asarray({"pow43": T.POW43}[key], np.float32)
    bits = table.view(np.uint32)
    lo_n = 1 << lo_bits
    hi_n = (bits.shape[0] + lo_n - 1) // lo_n
    t = np.zeros(hi_n * lo_n, np.uint32)
    t[:bits.shape[0]] = bits
    t = t.reshape(hi_n, lo_n)
    out = np.zeros((lo_n, hi_n, 4), np.uint8)
    for b in range(4):
        out[:, :, b] = ((t >> (8 * b)) & 0xFF).astype(np.uint8).T
    return np.ascontiguousarray(out.reshape(lo_n, hi_n * 4)).view(np.int8)


def _gather2_bitplanes(key: str, idx: jnp.ndarray, lo_bits: int
                       ) -> jnp.ndarray:
    """Bit-pattern table gather via ONE int8 MXU contraction: the lo
    one-hot (int8) contracts against the 4-byte-plane table, bytes
    recombine into the uint32 bit pattern, and the hi one-hot selects
    with a VPU multiply-reduce.  Exact by construction (pure integer
    arithmetic end to end)."""
    t4 = jnp.asarray(_bitplane_table(key, lo_bits))   # [lo_n, hi_n*4] i8
    lo_n = 1 << lo_bits
    hi_n = t4.shape[1] // 4
    shp = idx.shape
    flat = idx.reshape(-1)
    lo8 = (flat[:, None] & (lo_n - 1) ==
           jnp.arange(lo_n, dtype=jnp.int32)[None, :]).astype(jnp.int8)
    planes = jax.lax.dot_general(
        lo8, t4, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # [N, hi_n*4]
    by = planes.reshape(-1, hi_n, 4) & 0xFF           # undo int8 sign
    w = (by[..., 0] | (by[..., 1] << 8) | (by[..., 2] << 16)
         | (by[..., 3] << 24))                        # [N, hi_n] i32 bits
    hi = (flat[:, None] >> lo_bits ==
          jnp.arange(hi_n, dtype=jnp.int32)[None, :]).astype(jnp.int32)
    bits = jnp.sum(w * hi, axis=-1).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(bits, F32).reshape(shp)


def _opaque(x: jnp.ndarray) -> jnp.ndarray:
    """Hide a value from XLA's algebraic simplifier.

    Whole-program fusion can change how a floating subgraph is
    EVALUATED even when every op is IEEE: XLA clones chains into
    multiple fusions, may pick different implementations per clone
    (transcendentals, divides), can contract mul+add to FMA, and may
    widen through conversions.  A barrier pins the value so the
    rounding the exhaustive proofs assume actually happens (root-caused
    via test_jax_exact_band12_float_bits: an exp2-seeded pow43 draft
    mixed two clones' cube roots, drifting 2 ulp)."""
    return jax.lax.optimization_barrier(x)


def _vsplit(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Veltkamp split by mantissa masking: a == hi + lo with hi
    carrying the sign/exponent and top 11 mantissa bits, lo the
    remaining 12 (both exact — lo = a - hi cancels the masked bits
    without rounding).  The classic multiplicative split
    (hi = 4097a - (4097a - a)) is built from expressions XLA's
    algebraic simplifier may rewrite under real-number identities when
    the surrounding program changes (observed: whole-program fusion
    broke it while stage-by-stage execution was exact); integer masking
    is rewrite-proof."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFFF000), F32)
    return hi, a - hi


def _two_prod(a: jnp.ndarray, b: jnp.ndarray
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dekker product without FMA: a*b == p + e exactly in IEEE f32."""
    p = a * b
    ah, al = _vsplit(a)
    bh, bl = _vsplit(b)
    e = (_opaque(ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _pow43_ff_exact(mag: jnp.ndarray) -> jnp.ndarray:
    """Correctly-rounded x^(4/3) for integer magnitudes 0..8206 as a
    ~40-op VPU closed form — no table, no gather (round-3 VERDICT #3;
    replaces the bf16x3 one-hot gather, the single largest exact-mode
    cost at ~8320 MXU MACs per line).

    Every operation is DETERMINISTIC across compilers and fusion
    decisions: integer bit-hack seeds + multiply-only Newton (no
    exp2/log2, no division — XLA legally clones a chain into several
    fusions and evaluates transcendentals/divides differently per
    clone; an early exp2-seeded draft produced a `d` correction from
    one clone's cube root applied to another clone's product, a 2-ulp
    drift caught by test_jax_exact_band12_float_bits).  Shape:

      z  ~ x^(-1/3)  (bit-hack seed, 4 mul-only Newton steps)
      c  = x*z*z     ~ cbrt(x) to within a few ulp
      r  = c^3 - x   exactly (Dekker two-products, mask splits,
                      Sterbenz subtract — the cancellation point)
      d  = r * rcp(3c^2)   (bit-hack + 2 Newton reciprocal, mul-only)
      y  = yh + (yl - x*d) with (yh,yl) = two_prod(x,c):
           the one f32 rounding of x*(c - d)

    The yh/correction pins block FMA contraction of the final add
    (fma(x,c,q) would skip yh's rounding and double-count yl).  All
    two_prod partial products are exact by the 12-bit mask split, so
    the construction is otherwise FMA-invariant, and the ff correction
    absorbs any seed within ±8 ulp of the true cube root.
    EXHAUSTIVELY PROVEN bit-identical to the reference's frozen
    8207-entry table: tests/test_ops_unit.py test_pow43_ff_exhaustive
    (every input, ±ulp seed sweeps, FMA-variant replay) and the on-TPU
    attestation.  True values sit no closer than ~1e-4 ulp to an f32
    rounding tie over the domain, vs ~2^-20 ulp construction error.
    """
    m = mag.astype(F32)
    safe = jnp.maximum(m, F32(1.0))
    bits = jax.lax.bitcast_convert_type(safe, jnp.uint32)
    z = jax.lax.bitcast_convert_type(
        jnp.uint32(0x54A23000) - bits // jnp.uint32(3), F32)
    for _ in range(4):                # z' = z(4 - x z^3)/3, mul-only
        z = z * (F32(4.0) - safe * z * z * z) * F32(1.0 / 3.0)
    c = safe * z * z                  # ~ cbrt(x), few-ulp accurate
    p1, e1 = _two_prod(c, c)
    p2, e2 = _two_prod(p1, c)
    r = (p2 - safe) + (e2 + e1 * c)   # p2-safe exact (Sterbenz)
    a3 = F32(3.0) * p1
    w = jax.lax.bitcast_convert_type(
        jnp.uint32(0x7EF311C2)
        - jax.lax.bitcast_convert_type(a3, jnp.uint32), F32)
    w = w * (F32(2.0) - a3 * w)       # Newton reciprocal, mul-only
    w = w * (F32(2.0) - a3 * w)
    d = r * w                         # cbrt(x) ~ c - d
    yh, yl = _two_prod(safe, c)
    y = _opaque(yh) + _opaque(yl - safe * d)
    return jnp.where(mag == 0, F32(0.0), y)


def _pow43(mag: jnp.ndarray, exact: bool) -> jnp.ndarray:
    """x^(4/3) for integer magnitudes 0..8206 (pdmp3.c:971-1018).

    exact: correctly-rounded float-float closed form (_pow43_ff_exact),
    bit-identical to the reference's frozen table over the full domain;
    the superseded bf16x3 one-hot gather stays behind PDMP3_ABL=rqgather
    (and the measured-dead-end int8 bitplane gather behind rqint8) so
    the ABL_EXACT numbers remain reproducible.
    fast: x * cbrt(x) with a Newton-refined cube root — TPU's raw
    exp2(log2(x)*4/3) is only ~1e-4 accurate (measured up to 11 LSB of
    PCM error); one Newton step from that seed lands within ~1 ulp of
    the table, restoring the ±1 LSB budget at ~6 extra VPU ops.
    """
    if exact:
        if _ABL == "rqint8":
            return _gather2_bitplanes("pow43", mag, 7)
        if _ABL == "rqgather":
            return _gather2_fast_exact("pow43", mag, 7)
        return _pow43_ff_exact(mag)
    m = mag.astype(F32)
    safe = jnp.maximum(m, F32(1.0))
    c = jnp.exp2(jnp.log2(safe) * F32(1.0 / 3.0))
    c = (F32(2.0) * c + safe / (c * c)) * F32(1.0 / 3.0)   # Newton
    c = (F32(2.0) * c + safe / (c * c)) * F32(1.0 / 3.0)
    return jnp.where(mag == 0, F32(0.0), m * c)


def _pow2_int(n: jnp.ndarray) -> jnp.ndarray:
    """Exact 2^n for integer n via exponent-field construction (no
    transcendental): +0.0 outside the normal range [-126, 127]."""
    ok = (n >= -126) & (n <= 127)
    bits = jnp.where(ok, (n + 127) << 23, 0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(bits, F32)


_QUARTER_DOWN4 = np.array([2.0 ** 0, 2.0 ** -0.25, 2.0 ** -0.5,
                           2.0 ** -0.75], np.float32)
_QUARTER_UP4 = np.array([2.0 ** 0, 2.0 ** 0.25, 2.0 ** 0.5,
                         2.0 ** 0.75], np.float32)


def _quarter_frac(d: jnp.ndarray, tab: np.ndarray) -> jnp.ndarray:
    t = [F32(np.float32(v)) for v in tab]
    return jnp.where(d == 0, t[0], jnp.where(d == 1, t[1],
                     jnp.where(d == 2, t[2], t[3])))


def _gain_quarter(q: jnp.ndarray, exact: bool,
                  true_table: bool = False) -> jnp.ndarray:
    """2^(-q/4) (requantize scalefactor gain, pdmp3.c:2127/2144).

    true_table selects GAIN_QUARTER_TRUE (real values through the f32
    underflow point, +0.0 for q >= 640 via the out-of-range one-hot) for
    the band-12 OOB path; the default table carries the sentinel-63 zero
    region instead.

    The closed form 2^(-q/4) = f32(2^(-(q&3)/4)) * 2^(-(q>>2)) is
    BIT-IDENTICAL to the frozen table wherever the result is a normal
    f32 (power-of-two scaling only shifts the exponent; asserted against
    both tables entry-for-entry by test_dsp_stages.test_gain_closed_forms),
    so the exact path uses it too and keeps only the table's sentinel
    semantics: GAIN_QUARTER_DOWN is zero for q >= 100 (the host's
    sentinel-63 scalefactor, q = 126/252, must decode as zero gain).
    Exact callers with q reaching the denormal/underflow region (the
    band-12 bit-pattern scalefactors) must instead gather
    GAIN_QUARTER_TRUE directly — see requantize's g12 path.
    """
    del true_table
    g = _quarter_frac(q & 3, _QUARTER_DOWN4) * _pow2_int(-(q >> 2))
    if exact:
        g = jnp.where(q >= 100, F32(0.0), g)
    return g


def _gain_global(e: jnp.ndarray, exact: bool) -> jnp.ndarray:
    """2^((e-266)/4) (global gain, pdmp3.c:2128/2145).  Closed form in
    both modes: every reachable index (0..311) yields a normal f32, where
    the exponent-shift construction equals the frozen table bit-for-bit
    (test_dsp_stages.test_gain_closed_forms)."""
    del exact
    eo = e - T.GAIN_GLOBAL_OFF
    # arithmetic >> floors negative e, keeping d = e & 3 in [0, 3]
    return _quarter_frac(eo & 3, _QUARTER_UP4) * _pow2_int(eo >> 2)


def _gather_map(table: np.ndarray, layout: jnp.ndarray) -> jnp.ndarray:
    """Compatibility alias for map row selection (int maps)."""
    return _map_select(table, layout, out_int=True)


@functools.lru_cache(maxsize=None)
def _win_line_map(pre_reordered: bool = False) -> np.ndarray:
    """Short-window index per (layout, line), optionally composed with the
    wire reorder (for the band-12 gain override; MPEG-1 only)."""
    src = _MAPS["win"]
    return _compose_reorder(src) if pre_reordered else np.asarray(src)


@functools.lru_cache(maxsize=1)
def _sfb12_short_map() -> np.ndarray:
    """1 where (layout, line) is a short-block band-12 line (reorder-
    invariant: the permutation moves lines only within a band)."""
    return ((_MAPS["is_short"] == 1)
            & (_MAPS["sfb"] == 12)).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _pretab_line_map(family: int = 0) -> np.ndarray:
    """pretab value per (layout, line) for long regions (pdmp3.c:2123;
    13818-3 keeps the same pretab for LSF, preflag derived from
    scalefac_compress >= 500)."""
    m = T.layout_maps(family)
    out = np.zeros((T.N_LAYOUTS, 576), np.float32)
    for lay in range(T.N_LAYOUTS):
        sfb = m["sfb"][lay]
        long_mask = m["is_short"][lay] == 0
        out[lay][long_mask] = _PRETAB22[np.minimum(sfb[long_mask], 21)]
    return out


def requantize(ix, scf_l, scf_s, layout, global_gain, scalefac_scale,
               preflag, subblock_gain, exact: bool = True,
               gr1=None, prev_lines=None, pre_reordered: bool = False,
               family: int = 0):
    """Dequantize Huffman integers to spectral floats.

    Reference: pdmp3.c:1829-1905 (drivers), 2117-2152 (per-sample):
      long:  2^(-sf_mult*(scf+preflag*pretab)) * 2^(0.25*(gg-210)) * sgn|x|^4/3
      short: 2^(-sf_mult*scf_s) * 2^(0.25*(gg-210-8*sbgain)) * sgn|x|^4/3
    All three factors are table gathers here (the reference's double pow()
    results, frozen at float32 — tables.py); the products keep the
    reference's (tmp1*tmp2)*tmp3 association so this stage is exact in both
    precision modes.  Processing all 576 lines is bit-identical to the
    reference's count1-bounded loops because lines above count1 are zero.

    gr1 [B] i32 (1 = this slot decodes granule 1) + prev_lines [B,3] f32
    (granule 0 channel 0's first 3 post-DSP lines) enable the exact
    band-12 OOB emulation: the reference's scalefac_s[1][1][12][w] read
    aliases the float BITS of is[0][0][w] (docs/DESIGN.md §6).  Without
    them, the host's sentinel-63 scalefactor stands in (gain +0.0 — exact
    unless the aliased sample is a tiny denormal or zero).

    pre_reordered=True consumes ix already carrying line-ordered (post-
    reorder) spectra — the packed-wire convention, where the host applies
    the short-block permutation while writing ix (pdmp3.c:1786-1823 moved
    into the packer) — by precomposing the window-keyed constant maps with
    the permutation.  Bitwise identical to requantize-then-reorder, since
    reorder only moves values (each output = 1.0 * input).

    family selects the sample-rate generation's layout tables (LSF); the
    LSF profile keeps true 2^(-q/4) gains through q >= 100 (5-bit
    intensity-channel scalefactors reach q = 124; there is no sentinel-63
    host scalefactor and no band-12 quirk to emulate — the reference
    rejects id==0).

    Args: ix [B,2,576] i32; scf_l [B,2,22]; scf_s [B,2,13,3];
      layout/global_gain/scalefac_scale/preflag [B,2]; subblock_gain [B,2,3].
    Returns xr f32 [B,2,576].
    """
    band12_bits = gr1 is not None and prev_lines is not None and family == 0
    sentinel = exact and family == 0

    lay_oh = _onehot(layout, T.N_LAYOUTS)            # [B,2,9]
    short = _map_select(T.layout_maps(family)["is_short"], layout)

    sign = jnp.where(ix < 0, F32(-1.0), F32(1.0))
    mag = jnp.clip(jnp.abs(ix), 0, 8206)
    tmp3 = sign * _pow43(mag, exact)

    # single-pass bf16 expansions are bit-exact in BOTH modes: every
    # expanded operand is an integer scalefactor value <= 63 (host
    # band-12 sentinel included) — bf16-representable — and each output
    # line sums exactly one nonzero product (see _expand's note).
    # Measured a wash vs HIGHEST at B=8192 (XLA hides the 6-pass cost
    # behind the step's other work; interleaved A/B r4), kept for the
    # lower MXU occupancy; PDMP3_ABL=exphigh restores the r3 form.
    prec = _HIGH if (exact and _ABL == "exphigh") else _FAST
    qpu = (2 << scalefac_scale)[..., None]           # quarters per sf unit
    scf_l_line = _expand(scf_l, _expansion_const("sfb", 22, pre_reordered,
                                                 family), lay_oh, prec)
    pre_line = (_map_select(_pretab_line_map(family), layout, out_int=False)
                * preflag[..., None])
    q_long = qpu * (scf_l_line + pre_line).astype(jnp.int32)
    tmp1_long = _gain_quarter(q_long, sentinel)
    e_long = global_gain - 210 + T.GAIN_GLOBAL_OFF   # [B,2]
    tmp2_long = _gain_global(e_long, exact)[..., None]

    scf_s_flat = scf_s.reshape(*scf_s.shape[:-2], 39)
    scf_s_line = _expand(scf_s_flat, _expansion_sfb_s(pre_reordered, family),
                         lay_oh, prec)
    q_short = qpu * scf_s_line.astype(jnp.int32)
    tmp1_short = _gain_quarter(q_short, sentinel)
    if band12_bits:
        # The reference's scalefac_s[1][1][12][w] OOB read aliases the
        # float BITS of is[0][0][w]: gather the denormal-capable true
        # 2^(-q/4) table for just those 3 values per slot and overwrite
        # the granule-1 ch1 band-12 short lines (win-selected) — the
        # in-spec lines everywhere else stay on the closed form, which
        # the tables match bit-for-bit (see _gain_quarter).
        bits = jax.lax.bitcast_convert_type(prev_lines, jnp.uint32)  # [B,3]
        scf12 = jnp.minimum(bits, jnp.uint32(1024)).astype(jnp.int32)
        qpu1 = (2 << scalefac_scale[:, 1])[:, None]          # [B,1]
        # indices past the 640-entry table one-hot to all-zero rows -> +0.0
        g12 = _gather2(np.asarray(T.GAIN_QUARTER_TRUE),
                       qpu1 * scf12, 5)                      # [B,3]
        win_line1 = _map_select(_win_line_map(pre_reordered),
                                layout[:, 1])                # [B,576]
        g12_line = jnp.where(win_line1 == 0, g12[:, 0:1],
                             jnp.where(win_line1 == 1, g12[:, 1:2],
                                       g12[:, 2:3]))
        mask12 = ((_map_select(_sfb12_short_map(), layout[:, 1]) == 1)
                  & (gr1 != 0)[:, None])
        tmp1_short = tmp1_short.at[:, 1, :].set(
            jnp.where(mask12, g12_line, tmp1_short[:, 1, :]))
    sbg_line = _expand(subblock_gain,
                       _expansion_const("win", 3, pre_reordered, family),
                       lay_oh, prec)
    e_short = (global_gain[..., None] - 210 - 8 * sbg_line.astype(jnp.int32)
               + T.GAIN_GLOBAL_OFF)
    tmp2_short = _gain_global(e_short, exact)

    tmp1 = jnp.where(short == 1, tmp1_short, tmp1_long)
    tmp2 = jnp.where(short == 1, tmp2_short,
                     jnp.broadcast_to(tmp2_long, tmp2_short.shape))
    if exact:
        # the reference multiplies (tmp1*tmp2)*tmp3 in that association
        # (pdmp3.c:2133); the pin forecloses any reassociation of the
        # triple under whole-program fusion (defensive, cheap)
        return _opaque(tmp1 * tmp2) * tmp3
    return (tmp1 * tmp2) * tmp3


def reorder(xr, layout, family: int = 0):
    """Short-block reorder (pdmp3.c:1786-1823) as constant-index
    permutations + one-hot select: long layouts (0,3,6) are identity; the
    six short/mixed layouts each apply a static permutation (XLA lowers
    literal-index gathers to cheap shuffles, unlike dynamic gathers).
    Bit-exact: every output is one input times 1.0."""
    oh = _onehot(layout, T.N_LAYOUTS)
    ident_w = oh[..., 0:1] + oh[..., 3:4] + oh[..., 6:7]
    out = ident_w * xr
    perms = T.layout_maps(family)["reorder"]
    for lay in (1, 2, 4, 5, 7, 8):
        out = out + oh[..., lay:lay + 1] * xr[:, :, perms[lay]]
    return out


def stereo(x, layout, scf_l, scf_s, count1, ms_flag, is_flag,
           exact: bool = True, bug_compat_short_intensity: bool = True,
           family: int = 0, is_pos_l=None, is_pos_s=None, iscale=None):
    """Mid/side + intensity stereo (pdmp3.c:1911-1972, 2154-2220).

    MS butterflies lines < min(count1[0], count1[1]) (the reference's
    ``count1[gr][!!(c0>c1)]`` picks the smaller); intensity pans ch0 into
    both channels for eligible bands starting at/above ch1's count1 with
    is_pos = ch0's scalefactor (a reference quirk: the spec transmits
    intensity positions in the right channel's scalefacs).

    family 1/2 (LSF) replaces the intensity gains with the 13818-3
    §2.4.3.2 pairs: positions come from ch1's transmitted scalefactors
    (is_pos_l [B,22] / is_pos_s [B,13,3] i32, illegal values pre-mapped
    to tables.LSF_IS_ILLEGAL by the frontend), gains
    io = 2^(-(iscale+1)/4), odd p -> (io^((p+1)/2), 1), even p ->
    (1, io^(p/2)); illegal-position bands pass through untouched.  The
    MS path is unchanged.  Spec-derived — the reference rejects LSF.

    x [B,2,576] f32; layout [B,2]; scf_* ch0-indexed; count1 [B,2];
    ms_flag/is_flag [B].
    """
    idx = jnp.arange(576, dtype=jnp.int32)
    c0 = jnp.clip(count1[:, 0], 0, 576)
    c1r = jnp.clip(count1[:, 1], 0, 576)

    # defensive pin: this stage widens the spectra to f64 (MS
    # butterfly, intensity truncation); pinning them as rounded f32
    # VALUES forecloses any excess-precision evaluation of the producer
    # chain by the whole-program fuser (cheap — one barrier)
    if exact:
        x = _opaque(x)
    l, r = x[:, 0], x[:, 1]

    # --- mid/side ---
    # MPEG-1: butterfly below min(count1) (pdmp3.c:1920 bug parity).
    # LSF: full spectrum — the min-count1 extent is an extrapolated
    # quirk with no reference target (the reference rejects id=0);
    # production decoders (libavcodec/libmpg123) butterfly everything
    # (round-5 real-encoder LSF conformance, DESIGN.md §6).
    l_raw = l
    if family:
        ms_mask = jnp.broadcast_to((ms_flag[:, None] != 0), (l.shape[0], 576))
    else:
        mp = jnp.minimum(c0, c1r)
        ms_mask = (ms_flag[:, None] != 0) & (idx[None, :] < mp[:, None])
    # the f32 sums must round BEFORE the f64 widening (C evaluates
    # float+float in float, then promotes for /sqrt(2.0) —
    # pdmp3.c:1925); the pin forecloses excess-precision evaluation of
    # the add under whole-program fusion (defensive, cheap)
    mid = _opaque(l + r)
    sid = _opaque(l - r)
    if exact and _ABL != "ms32":
        ms_l = (mid.astype(jnp.float64) * T.INV_SQRT2).astype(F32)
        ms_r = (sid.astype(jnp.float64) * T.INV_SQRT2).astype(F32)
    else:
        c = F32(np.float32(T.INV_SQRT2))
        ms_l, ms_r = mid * c, sid * c
    l = jnp.where(ms_mask, ms_l, l)
    r = jnp.where(ms_mask, ms_r, r)

    # --- intensity ---
    # Band iteration follows ch0's block layout; the window-keyed maps
    # are deliberately NOT reorder-composed: the reference's post-reorder
    # intensity pass addresses window w of band sfb as the contiguous
    # lines [3*s[sfb] + w*wl, ...) (pdmp3.c:2186-2207), which is exactly
    # the raw-domain window map — the LSF path keeps the same convention.
    smaps = T.stereo_maps(family)
    lay0 = layout[:, 0]
    lay0_oh = _onehot(lay0, T.N_LAYOUTS)
    band_start = _map_select(smaps["band_start"], lay0)   # [B,576]
    iok = _map_select(smaps["intensity_ok"], lay0)
    short = _map_select(T.layout_maps(family)["is_short"], lay0)

    if family:
        # LSF (13818-3 §2.4.3.2): positions from ch1's sidecar, per-slot
        # intensity_scale selects the io = 2^(-(iscale+1)/4) gain row;
        # illegal-position bands (sentinel 63) pass through untouched
        pos_l = _expand(is_pos_l, _expansion_const("sfb", 22, False,
                                                   family), lay0_oh, _FAST)
        pos_s = _expand(is_pos_s.reshape(is_pos_s.shape[0], 39),
                        _expansion_sfb_s(False, family), lay0_oh, _FAST)
        pos = jnp.where(short == 1, pos_s, pos_l).astype(jnp.int32)
        imask = ((is_flag[:, None] != 0) & (iok == 1)
                 & (band_start >= c1r[:, None])
                 & (pos != T.LSF_IS_ILLEGAL))
        k0t, k1t = T.lsf_intensity_tables()                # [2,64] f32
        krow = (iscale != 0)[:, None]                      # [B,1]
        k0_tab = jnp.where(krow, jnp.asarray(k0t[1]), jnp.asarray(k0t[0]))
        k1_tab = jnp.where(krow, jnp.asarray(k1t[1]), jnp.asarray(k1t[0]))
        poh = _onehot(jnp.clip(pos, 0, 63), 64)            # [B,576,64]
        # one-hot row gathers must stay HIGHEST: the k tables are real-
        # valued f32 (io powers), not bf16-representable integers
        k0 = jnp.einsum("bik,bk->bi", poh, k0_tab, precision=_HIGH,
                        preferred_element_type=F32)
        k1 = jnp.einsum("bik,bk->bi", poh, k1_tab, precision=_HIGH,
                        preferred_element_type=F32)
        # intensity pans the RAW ch0 (mid) carrier: with full-spectrum
        # MS above, post-MS l is mid/sqrt(2) on intensity bands
        # (libavcodec runs intensity before MS; same result)
        l_out = jnp.where(imask, k0 * l_raw, l)
        r_out = jnp.where(imask, k1 * l_raw, r)
        return jnp.stack([l_out, r_out], axis=1)

    # scalefactor values are <= 15 here (intensity positions), so the
    # single-pass bf16 expansion is exact in both precision modes
    scf_l0 = _expand(scf_l[:, 0], _expansion_const("sfb", 22), lay0_oh,
                     _FAST)
    scf_s0 = _expand(scf_s[:, 0].reshape(-1, 39), _expansion_sfb_s(),
                     lay0_oh, _FAST)
    is_pos = jnp.where(short == 1, scf_s0, scf_l0).astype(jnp.int32)

    imask = ((is_flag[:, None] != 0) & (iok == 1)
             & (band_start >= c1r[:, None]) & (is_pos != 7))
    # 16-wide ratios: is_pos 8..15 replays the reference's OOB
    # is_ratios read on long blocks (tables.IS_RATIO_OOB_BITS); the
    # spec profile keeps treating short-block is_pos > 7 as no-op
    # (index 7 = zero ratios), matching the oracle's spec branch
    ip = jnp.clip(is_pos, 0, 15)
    if not bug_compat_short_intensity:
        ip = jnp.where(short == 1, jnp.minimum(ip, 7), ip)
    rpos_oh = _onehot(ip, 16)
    rl = jnp.einsum("...k,k->...", rpos_oh, jnp.asarray(_RATIO_L),
                    precision=_HIGH, preferred_element_type=F32)
    rr = jnp.einsum("...k,k->...", rpos_oh, jnp.asarray(_RATIO_R),
                    precision=_HIGH, preferred_element_type=F32)
    int_l = rl * l
    int_r = rr * l
    if bug_compat_short_intensity:
        # pdmp3.c:2212-2213: short-block intensity assigns through unsigned
        # temporaries; both channels become (float)(uint32)(int64)trunc(l).
        wide = jnp.float64 if (exact and _ABL != "ms32") else F32
        t = jnp.trunc(l.astype(wide))
        u = jnp.mod(t, wide(2.0 ** 32)).astype(F32)
        int_l = jnp.where(short == 1, u, int_l)
        int_r = jnp.where(short == 1, u, int_r)
    l_out = jnp.where(imask, int_l, l)
    r_out = jnp.where(imask, int_r, r)
    return jnp.stack([l_out, r_out], axis=1)


def antialias(x, layout, win_switch, block_type, mixed):
    """Alias-reduction butterflies over subband boundaries
    (pdmp3.c:1706-1732): 8 cs/ca pairs per boundary, skipped for pure short
    blocks, first boundary only for mixed.  Disjoint element sets per
    boundary make the batched form order-independent.
    """
    B = x.shape[0]
    X = x.reshape(B, 2, 32, 18)
    cs = jnp.asarray(T.ANTIALIAS_CS)
    ca = jnp.asarray(T.ANTIALIAS_CA)
    lower = jnp.flip(X[:, :, :31, 10:18], axis=-1)   # [B,2,31,8], i=0..7
    upper = X[:, :, 1:, 0:8]
    lb = lower * cs - upper * ca
    ub = upper * cs + lower * ca
    is_short_pure = (win_switch == 1) & (block_type == 2) & (mixed == 0)
    is_mixed_short = (win_switch == 1) & (block_type == 2) & (mixed == 1)
    sblim = jnp.where(is_short_pure, 1, jnp.where(is_mixed_short, 2, 32))
    bidx = jnp.arange(1, 32, dtype=jnp.int32)
    keep = (bidx[None, None, :] < sblim[..., None])[..., None]  # [B,2,31,1]
    new_lower = jnp.where(keep, lb, lower)
    new_upper = jnp.where(keep, ub, upper)
    X = X.at[:, :, :31, 10:18].set(jnp.flip(new_lower, axis=-1))
    X = X.at[:, :, 1:, 0:8].set(new_upper)
    return X.reshape(B, 2, 576)


def _imdct_long(xw, exact: bool):
    """[...,18] x COS_N36[18,36] -> [...,36]; sequential-m when exact."""
    cos36 = jnp.asarray(T.COS_N36)
    if exact:
        acc = xw[..., 0:1] * cos36[0]
        for m in range(1, 18):
            acc = acc + xw[..., m:m + 1] * cos36[m]
        return acc
    return jnp.einsum("...m,mp->...p", xw, cos36,
                      preferred_element_type=F32,
                      precision=jax.lax.Precision.HIGHEST)


def _imdct_short(xw, exact: bool):
    """3 interleaved 12-point IMDCTs, windowed, overlapped into [...,36]
    (pdmp3.c:1673-1686): out[6i+6+p] += (sum_m tin[i+3m] cos12[m,p])*win2[p].
    """
    cos12 = jnp.asarray(T.COS_N12)
    win2 = jnp.asarray(T.IMDCT_WIN[2][:12])
    t = xw.reshape(*xw.shape[:-1], 6, 3)  # [..., m, i3]
    if exact:
        acc = t[..., 0, :, None] * cos12[0]
        for m in range(1, 6):
            acc = acc + t[..., m, :, None] * cos12[m]
    else:
        acc = jnp.einsum("...mi,mp->...ip", t, cos12,
                         preferred_element_type=F32,
                         precision=jax.lax.Precision.HIGHEST)
    contrib = acc * win2                   # [..., i3, 12]
    out = jnp.zeros((*xw.shape[:-1], 36), F32)
    for i3 in range(3):
        sl = out[..., 6 * i3 + 6:6 * i3 + 18]
        out = out.at[..., 6 * i3 + 6:6 * i3 + 18].set(sl + contrib[..., i3, :])
    return out


def hybrid_synthesis(x, store, win_switch, block_type, mixed,
                     exact: bool = True):
    """IMDCT + windowing + overlap-add (pdmp3.c:1649-1700, 1752-1780).

    The 36-pt IMDCT is an 18x36 contraction against the reference's frozen
    cosine table; windows select per (slot, ch, subband) effective block
    type (mixed forces long windows for sb<2).  Carries `store` [B,2,32,18].
    Returns (x_time [B,2,32,18], new_store).
    """
    B = x.shape[0]
    xw = x.reshape(B, 2, 32, 18)
    sb = jnp.arange(32, dtype=jnp.int32)
    bt_eff = jnp.where(((win_switch == 1) & (mixed == 1))[..., None]
                       & (sb < 2), 0, block_type[..., None])  # [B,2,32]

    long_out = _imdct_long(xw, exact) * _map_select(T.IMDCT_WIN, bt_eff,
                                                    out_int=False)
    short_out = _imdct_short(xw, exact)
    is_short_sb = (bt_eff == 2)
    out36 = jnp.where(is_short_sb[..., None], short_out, long_out)

    x_time = out36[..., :18] + store
    new_store = out36[..., 18:]
    return x_time, new_store


def freq_invert(x_time):
    """Negate odd samples of odd subbands (pdmp3.c:1738-1746); multiply by
    a ±1 mask is bit-identical to negation."""
    return x_time * jnp.asarray(_INV_SIGN)


def subband_synthesis(x_time, v_blocks, exact: bool = True):
    """Polyphase synthesis filterbank (pdmp3.c:1978-2045), reformulated.

    The reference shifts a per-channel 1024-tap FIFO by 64 and matrixes 32
    subband samples through the 64x32 cosine matrix, 18 times per granule.
    Here all 18 matrixings are one batched contraction, and the FIFO
    becomes a sliding window over 33 v-blocks (15 carried + 18 new): output
    sample (ss, i) sums j=0..15 of D[32j+i] * vblock[ss-j][i + 32*(j&1)],
    which is exactly the reference's u_vec build (pdmp3.c:2015-2022) with
    the block ages written out.  The j-loop accumulation order matches the
    reference's FIR loop, so the exact path is bit-exact.

    x_time: [B,2,32,S]; v_blocks: [B,2,15,64] carried state (oldest
    first).  Returns (sums [B,2,S,32] f32, new_v_blocks).  S is 18 for
    Layer III granules; the Layer I/II synthesis-only path reuses this
    with S=12 / S=36 (the sliding-window formulation is step-count
    agnostic).
    """
    B, S = x_time.shape[0], x_time.shape[3]
    s_all = x_time.transpose(0, 1, 3, 2)              # [B,2,S,32] (ss, sb)
    nwin = jnp.asarray(T.SYNTH_NWIN)                  # [64,32]
    if exact:
        acc = nwin[:, 0] * s_all[..., 0:1]
        for j in range(1, 32):
            acc = acc + nwin[:, j] * s_all[..., j:j + 1]
        new_blocks = acc                              # [B,2,S,64]
    else:
        new_blocks = jnp.einsum("bcsj,ij->bcsi", s_all, nwin,
                                preferred_element_type=F32,
                                precision=jax.lax.Precision.HIGHEST)
    blocks = jnp.concatenate([v_blocks, new_blocks], axis=2)  # [B,2,15+S,64]

    d = jnp.asarray(T.SYNTH_D).reshape(16, 32)
    acc32 = jnp.zeros((B, 2, S, 32), F32)
    for j in range(16):
        blk = jax.lax.dynamic_slice_in_dim(blocks, 15 - j, S, axis=2)
        half = blk[..., 32 * (j & 1):32 * (j & 1) + 32]
        acc32 = acc32 + d[j] * half
    new_v = blocks[:, :, S:, :]
    return acc32, new_v


def quantize_pack(sums, nch, exact: bool = True):
    """Scale x32767, truncate toward zero, clip to ±32767, interleave
    (pdmp3.c:2028-2041).  Mono streams duplicate ch0.  Returns i16
    [B,N,2] with N = S*32 (576 for Layer III granules)."""
    B = sums.shape[0]
    N = sums.shape[2] * 32
    if exact:
        # defensive pin: round the f32 sums before the f64 widening so
        # the fuser cannot evaluate the synthesis FIR accumulation at
        # excess precision (see the same note in stereo())
        scaled = _opaque(sums).astype(jnp.float64) * 32767.0
    else:
        scaled = sums * F32(32767.0)
    # (int32_t)(sum*32767.0) (pdmp3.c:2028) has cvttsd2si semantics: NaN or
    # out-of-int32-range -> INT32_MIN, which the clip maps to -32767.
    t = jnp.trunc(scaled)
    oob = jnp.isnan(scaled) | (t < -2147483648.0) | (t > 2147483647.0)
    samp = jnp.where(oob, scaled.dtype.type(-32767.0),
                     jnp.clip(t, -32767.0, 32767.0)).astype(jnp.int32)
    pcm = samp.reshape(B, 2, N).transpose(0, 2, 1)     # [B,N,ch]
    left = pcm[..., 0]
    right = jnp.where((nch == 1)[:, None], left, pcm[..., 1])
    return jnp.stack([left, right], axis=-1).astype(jnp.int16)


def float_pack(sums, nch):
    """Float-PCM output option (exceeds the reference, which emits S16
    only, pdmp3.c:2028-2041): the synthesis sums interleaved as f32 in
    [-1, 1] (clipped where the S16 path clips, NaN mapped to -1).
    Returns f32 [B,576,2]; trunc(pcm*32767) reproduces the S16 path
    bit-for-bit everywhere except the reference's cvttsd2si wrap quirk
    (|sum*32767| escaping int32, where S16 wraps to -32767 but float
    saturates — deliberate: saturation is what a float consumer wants)."""
    B = sums.shape[0]
    N = sums.shape[2] * 32
    x = jnp.where(jnp.isnan(sums), F32(-1.0), jnp.clip(sums, -1.0, 1.0))
    # keep the S16 truncation-equivalence at the rails: S16 clips the
    # *scaled* value to ±32767, i.e. float ±32767/32767 == ±1.0 exactly
    pcm = x.reshape(B, 2, N).transpose(0, 2, 1)
    left = pcm[..., 0]
    right = jnp.where((nch == 1)[:, None], left, pcm[..., 1])
    return jnp.stack([left, right], axis=-1).astype(F32)
