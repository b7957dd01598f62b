"""Op-level unit tests: every batched DSP stage against its oracle stage,
over randomized parsed granules (exact mode => bitwise equality)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pdmp3_tpu import oracle as O
from pdmp3_tpu import tables as T
from pdmp3_tpu.frontend import Frontend
from pdmp3_tpu.models import decoder as M
from pdmp3_tpu.ops import dsp
from pdmp3_tpu.testing import mp3gen


@pytest.fixture(scope="module")
def parsed():
    """A diverse batch of parsed granules + their FrameData."""
    fds = []
    for i, kw in enumerate([
        dict(blocks="long"),
        dict(blocks="short", sfreq=1),
        dict(blocks="mixed", sfreq=2),
        dict(blocks="varied", mode=1, mode_extension=2),
        dict(blocks="long", mode=1, mode_extension=3,
             stereo_extent_ch1=0.3, intensity_pos=True),
        dict(blocks="long", mode=3),
        dict(blocks="short", stuffing=4),
        dict(blocks="varied", use_reservoir=True, scfsi=True),
    ]):
        s = mp3gen.make_stream(n_frames=3, seed=700 + i, **kw)
        fe = Frontend()
        fe.feed(s)
        res, fd = fe.read_frame()
        assert res == 0
        fds.append(fd)
    # bitstream-ordered ix: these tests compare individual stages against
    # the oracle's pre-reorder intermediates (the wire convention is
    # line-ordered; that path is covered by the end-to-end tests)
    return fds, M.frame_to_batches(fds, pre_reorder=False)[0]


def test_requantize_unit(parsed):
    fds, b = parsed
    got = np.asarray(dsp.requantize(b.ix, b.scf_l, b.scf_s, b.layout,
                                    b.global_gain, b.scalefac_scale,
                                    b.preflag, b.subblock_gain, exact=True))
    for i, fd in enumerate(fds):
        for ch in range(fd.header.nch):
            want = O._requantize(fd, 0, ch)
            np.testing.assert_array_equal(got[i, ch], want,
                                          err_msg=f"slot {i} ch {ch}")


def test_reorder_unit(parsed):
    fds, b = parsed
    rng = np.random.RandomState(0)
    x = rng.randn(len(fds), 2, 576).astype(np.float32)
    got = np.asarray(dsp.reorder(jnp.asarray(x), b.layout))
    for i, fd in enumerate(fds):
        for ch in range(2):
            want = O._reorder(fd, 0, ch, x[i, ch])
            np.testing.assert_array_equal(got[i, ch], want)


def test_stereo_unit(parsed):
    fds, b = parsed
    rng = np.random.RandomState(1)
    x = (rng.randn(len(fds), 2, 576) * 0.1).astype(np.float32)
    got = np.asarray(dsp.stereo(jnp.asarray(x), b.layout, b.scf_l, b.scf_s,
                                b.count1, b.ms_flag, b.is_flag, exact=True,
                                bug_compat_short_intensity=True))
    for i, fd in enumerate(fds):
        want = x[i].copy()
        O._stereo(fd, 0, want, bug_compat_short_intensity=True)
        np.testing.assert_array_equal(got[i], want, err_msg=f"slot {i}")


def test_antialias_unit(parsed):
    fds, b = parsed
    rng = np.random.RandomState(2)
    x = rng.randn(len(fds), 2, 576).astype(np.float32)
    got = np.asarray(dsp.antialias(jnp.asarray(x), b.layout, b.win_switch,
                                   b.block_type, b.mixed))
    for i, fd in enumerate(fds):
        want = x[i].copy()
        for ch in range(2):
            O._antialias(fd, 0, ch, want[ch])
        np.testing.assert_array_equal(got[i], want, err_msg=f"slot {i}")


def test_hybrid_and_synthesis_unit(parsed):
    fds, b = parsed
    B = len(fds)
    rng = np.random.RandomState(3)
    x = (rng.randn(B, 2, 576) * 0.1).astype(np.float32)
    store0 = (rng.randn(B, 2, 32, 18) * 0.05).astype(np.float32)
    xt, store = dsp.hybrid_synthesis(jnp.asarray(x), jnp.asarray(store0),
                                     b.win_switch, b.block_type, b.mixed,
                                     exact=True)
    xt = np.asarray(xt)
    store = np.asarray(store)
    for i, fd in enumerate(fds):
        o = O.OracleDSP()
        o.store[:] = store0[i]
        want = x[i].copy()
        for ch in range(2):
            o._hybrid_synthesis(fd, 0, ch, want[ch])
        np.testing.assert_array_equal(xt[i].reshape(2, 576), want,
                                      err_msg=f"slot {i} x_time")
        np.testing.assert_array_equal(store[i], o.store,
                                      err_msg=f"slot {i} store")

    # freq inversion + polyphase + quantize against the oracle synthesis
    fi = dsp.freq_invert(jnp.asarray(xt))
    v0 = (rng.randn(B, 2, 15, 64) * 0.05).astype(np.float32)
    sums, v = dsp.subband_synthesis(fi, jnp.asarray(v0), exact=True)
    pcm = np.asarray(dsp.quantize_pack(sums, b.nch, exact=True))
    for i, fd in enumerate(fds):
        o = O.OracleDSP()
        # oracle v_vec layout: v[64k:64k+64] holds the block of step
        # -(k+1) pre-granule; our carry is oldest-first, so step -(k+1)
        # is v0[..., 14-k] (the 16th-oldest slot is never read)
        for k in range(15):
            o.v_vec[:, 64 * k:64 * (k + 1)] = v0[i, :, 14 - k]
        xo = xt[i].reshape(2, 576).copy()
        out = np.zeros((2, 576), np.uint32)
        for ch in range(2):
            o._freq_inversion(xo[ch])
        for ch in range(fd.header.nch):
            o._subband_synthesis(fd, 0, ch, xo[ch], out[0])
        want_l = ((out[0] >> 16) & 0xFFFF).astype(np.uint16)
        want_r = (out[0] & 0xFFFF).astype(np.uint16)
        if fd.header.nch == 1:
            want_r = want_l
        np.testing.assert_array_equal(
            pcm[i, :, 0].astype(np.uint16), want_l, err_msg=f"slot {i} L")
        np.testing.assert_array_equal(
            pcm[i, :, 1].astype(np.uint16), want_r, err_msg=f"slot {i} R")


def test_wire_reorder_preconditions():
    """The line-ordered wire rests on two table facts: (a) the reorder
    permutation moves lines only within their scalefactor band, so every
    sfb-keyed map is invariant under precomposition (dsp._compose_reorder)
    and only window-keyed maps change; (b) kPermBound-style prefix bounds
    cover the permuted image of any count1 prefix."""
    maps = T.layout_maps()
    perm = maps["reorder"]
    for lay in range(T.N_LAYOUTS):
        p = perm[lay]
        assert sorted(p.tolist()) == list(range(576))  # a permutation
        for name in ("sfb", "is_short"):
            np.testing.assert_array_equal(maps[name][lay][p],
                                          maps[name][lay], err_msg=name)
        # (b): bound(c) = 1 + max{i: p[i] < c} covers {i: p[i] < c}
        for c in (0, 1, 36, 100, 289, 576):
            cover = np.where(p < c)[0]
            bound = int(cover.max()) + 1 if len(cover) else 0
            assert np.all(cover < bound)
            # and the bound stays within the sfb containing line c-1
            if c and maps["is_short"][lay][c - 1]:
                sfb_c = maps["sfb"][lay][c - 1]
                end = int(np.where(maps["sfb"][lay] == sfb_c)[0].max()) + 1
                assert bound <= end


def test_requantize_pre_reordered_equals_reorder():
    """requantize(pre_reordered=True) on permuted ix == reorder(requantize)
    on bitstream ix, bitwise (each reorder output = 1.0 * input)."""
    fds = []
    for i, kw in enumerate([dict(blocks="short"), dict(blocks="mixed"),
                            dict(blocks="varied", sfreq=1),
                            dict(blocks="short", sfreq=2)]):
        s = mp3gen.make_stream(n_frames=3, seed=760 + i, **kw)
        fe = Frontend()
        fe.feed(s)
        res, fd = fe.read_frame()
        assert res == 0
        fds.append(fd)
    b_bit = M.frame_to_batches(fds, pre_reorder=False)[0]
    b_wire = M.frame_to_batches(fds, pre_reorder=True)[0]
    for exact in (True, False):
        want = np.asarray(dsp.reorder(dsp.requantize(
            b_bit.ix, b_bit.scf_l, b_bit.scf_s, b_bit.layout,
            b_bit.global_gain, b_bit.scalefac_scale, b_bit.preflag,
            b_bit.subblock_gain, exact=exact), b_bit.layout))
        got = np.asarray(dsp.requantize(
            b_wire.ix, b_wire.scf_l, b_wire.scf_s, b_wire.layout,
            b_wire.global_gain, b_wire.scalefac_scale, b_wire.preflag,
            b_wire.subblock_gain, exact=exact, pre_reordered=True))
        np.testing.assert_array_equal(got, want, err_msg=f"exact={exact}")


def test_gain_closed_forms_match_frozen_tables():
    """The exact path's closed-form gains (exponent-shift construction)
    must equal the reference's frozen tables bit-for-bit over every
    reachable index — the invariant that lets requantize skip the
    one-hot table gathers (ops/dsp.py:_gain_quarter/_gain_global)."""
    # 2^((e-266)/4): all 312 indices are normal f32
    e = np.arange(312, dtype=np.int32)
    got = np.asarray(dsp._gain_global(jnp.asarray(e), exact=True))
    assert got.tobytes() == np.asarray(T.GAIN_GLOBAL).tobytes()
    # 2^(-q/4): table is sentinel-zero from 100 up; closed form matches
    # the real region bit-for-bit and reproduces the sentinel via the
    # q >= 100 mask
    q = np.arange(256, dtype=np.int32)
    got = np.asarray(dsp._gain_quarter(jnp.asarray(q), exact=True))
    assert got.tobytes() == np.asarray(T.GAIN_QUARTER_DOWN).tobytes()
    # the denormal-capable true table agrees with the closed form over
    # its normal range (the band-12 path gathers it directly beyond)
    qt = np.arange(504, dtype=np.int32)
    got = np.asarray(dsp._gain_quarter(jnp.asarray(qt), exact=False))
    assert got.tobytes() == np.asarray(T.GAIN_QUARTER_TRUE[:504]).tobytes()


def test_bf16x3_split_exact():
    """pow43's 8207 f32 entries reconstruct exactly from three bf16
    planes — the invariant behind the single-pass exact gather
    (ops/dsp.py:_gather2_fast_exact)."""
    planes = dsp.split_bf16x3(np.asarray(T.POW43))
    assert planes is not None
    rec = planes[0] + planes[1] + planes[2]
    assert rec.tobytes() == np.asarray(T.POW43).tobytes()
    # and the jitted gather agrees with a plain numpy gather
    idx = np.concatenate([np.arange(64), [100, 1000, 8206, 4095]])
    got = np.asarray(dsp._gather2_fast_exact(
        "pow43", jnp.asarray(idx, jnp.int32), 7))
    assert got.tobytes() == np.asarray(T.POW43)[idx].tobytes()


def test_bitplane_gather_bit_exact():
    """The PDMP3_ABL=rqint8 ablation path (int8 bit-pattern gather —
    measured dead end, docs/ROADMAP.md) must stay bit-exact over the
    full pow43 domain so its recorded measurement stays reproducible."""
    import jax.numpy as jnp

    from pdmp3_tpu.ops import dsp as D

    idx = jnp.asarray(np.arange(8207, dtype=np.int32))
    got = np.asarray(D._gather2_bitplanes("pow43", idx, 7))
    assert got.tobytes() == np.asarray(T.POW43, np.float32).tobytes()


def test_pow43_ff_exhaustive():
    """The deterministic closed-form exact pow43 (ops/dsp._pow43_ff_exact,
    round-3 VERDICT #3) is bit-identical to the reference's frozen
    8207-entry table over the ENTIRE domain:

    1. the real jnp composition, exhaustively (CPU IEEE f32; the
       on-TPU attestation covers the chip);
    2. a numpy IEEE-f32 replay of the pipeline with the cube root
       perturbed ±8 ulp going into the float-float correction — the
       correction must absorb any rounding flavor of the mul-only
       Newton (e.g. FMA-contracted iterations);
    3. an FMA-variant replay: every contractible multiply-add in the
       correction evaluated with fused (exact-product) semantics via
       math.fma — the construction must be invariant (its two_prod
       partial products are exact by the 12-bit mask split; only the
       final add is rounding-critical, and that one is pinned against
       contraction in the jnp code).
    """
    import jax.numpy as jnp

    from pdmp3_tpu.ops import dsp as D

    tab = np.asarray(T.POW43, np.float32)
    mag = jnp.asarray(np.arange(8207, dtype=np.int32))
    got = np.asarray(D._pow43_ff_exact(mag))
    assert got.tobytes() == tab.tobytes()

    f32 = np.float32

    def split(a):
        hi = (a.view(np.uint32) & np.uint32(0xFFFFF000)).view(np.float32)
        return hi, a - hi

    def two_prod(a, b):
        p = a * b
        ah, al = split(a)
        bh, bl = split(b)
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        return p, e

    def ff_stage(x, c):
        p1, e1 = two_prod(c, c)
        p2, e2 = two_prod(p1, c)
        r = (p2 - x) + (e2 + e1 * c)
        a3 = f32(3.0) * p1
        w = (np.uint32(0x7EF311C2) - a3.view(np.uint32)).view(np.float32)
        w = w * (f32(2.0) - a3 * w)
        w = w * (f32(2.0) - a3 * w)
        d = r * w
        yh, yl = two_prod(x, c)
        return yh + (yl - x * d)

    x64 = np.arange(1, 8207, dtype=np.float64)
    x = x64.astype(np.float32)
    c0 = (x64 ** (1.0 / 3.0)).astype(np.float32)
    want = tab[1:]
    # (2) the correction absorbs any c within +-8 ulp of the cube root
    for k in range(-8, 9, 2):
        c = c0.copy()
        to = np.float32(np.inf) if k > 0 else np.float32(-np.inf)
        for _ in range(abs(k)):
            c = np.nextafter(c, to)
        assert (ff_stage(x, c) == want).all(), f"k={k}"

    # (3) FMA-variant replay (scalar; fused product-accumulate at every
    # contractible site inside the correction).  math.fma is 3.13+;
    # float128 emulation is exact for these 24x24-bit products and its
    # 2^-64 addition error is orders below every tolerance in play.
    def fma(a, b, c):
        return np.float32(np.float128(a) * np.float128(b)
                          + np.float128(c))

    def ff_stage_fma(x, c):
        def tp(a, b):
            p = f32(a * b)
            ah, al = split(np.float32(a).reshape(1))
            bh, bl = split(np.float32(b).reshape(1))
            ah, al, bh, bl = ah[0], al[0], bh[0], bl[0]
            e = f32(f32(f32(fma(ah, bh, -p)) + f32(fma(ah, bl,
                    f32(al * bh)))) + f32(al * bl))
            return p, e
        p1, e1 = tp(c, c)
        p2, e2 = tp(p1, c)
        r = f32(f32(p2 - x) + f32(fma(e1, c, e2)))
        a3 = f32(3.0 * p1)
        w = (np.uint32(0x7EF311C2)
             - np.float32(a3).reshape(1).view(np.uint32))[0:1] \
            .view(np.float32)[0]
        w = f32(w * f32(fma(-a3, w, 2.0)))
        w = f32(w * f32(fma(-a3, w, 2.0)))
        d = f32(r * w)
        yh, yl = tp(x, c)
        # the final add is pinned un-contracted in the jnp code
        return f32(yh + f32(fma(-x, d, yl)))

    rng = np.random.default_rng(3)
    sample = np.concatenate([np.arange(1, 300),
                             rng.integers(300, 8207, 400)])
    for i in sample:
        y = ff_stage_fma(f32(float(i)), c0[i - 1])
        assert y == want[i - 1], f"fma replay x={i}"
