#!/usr/bin/env python3
"""Generate the C++ host library's constant tables (gen_tables.inc).

Emits every table the native frontend/DSP needs from the canonical data in
pdmp3_tpu/_data/tables.npz (see tools/extract_tables.py for provenance):
float tables as C hex-float literals (bit-exact round trip), integer spec
tables, and two-level Huffman LUTs recoded from the canonical codebooks
(9-bit primary, escape to per-prefix secondary tables).
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np

from pdmp3_tpu import tables as T

PRIMARY_BITS = 9


def fmt_floats(name: str, arr: np.ndarray, per_line: int = 4) -> str:
    flat = np.asarray(arr, np.float32).reshape(-1)
    dims = "".join(f"[{d}]" for d in arr.shape)
    body = []
    for i in range(0, len(flat), per_line):
        chunk = ",".join(float(v).hex() + "f" for v in flat[i:i + per_line])
        body.append("  " + chunk + ",")
    return f"extern const float {name}{dims} = {{\n" + "\n".join(body) + "\n};\n"


def fmt_ints(name: str, arr: np.ndarray, ctype: str = "int",
             per_line: int = 12) -> str:
    flat = np.asarray(arr).reshape(-1)
    dims = "".join(f"[{d}]" for d in arr.shape)
    body = []
    for i in range(0, len(flat), per_line):
        body.append("  " + ",".join(str(int(v)) for v in flat[i:i + per_line]) + ",")
    return f"extern const {ctype} {name}{dims} = {{\n" + "\n".join(body) + "\n};\n"


def fmt_doubles(name: str, arr: np.ndarray, per_line: int = 3) -> str:
    flat = np.asarray(arr, np.float64).reshape(-1)
    dims = "".join(f"[{d}]" for d in arr.shape)
    body = []
    for i in range(0, len(flat), per_line):
        chunk = ",".join(float(v).hex() for v in flat[i:i + per_line])
        body.append("  " + chunk + ",")
    return (f"extern const double {name}{dims} = {{\n"
            + "\n".join(body) + "\n};\n")


def build_l12_tables() -> list:
    """Layer I/II constants (beyond-reference; ISO 11172-3 tables B.2a-d
    / B.4 and 13818-3 table B.1 via pdmp3_tpu.tables).  The allocation
    tables ship as class-index grids over one deduplicated class list so
    the native parser shares the Python frontend's dequant constants
    exactly (C/D as bit-identical doubles)."""
    steps_order = sorted(T.L2_CLASSES)            # 17 classes
    cls_idx = {s: i for i, s in enumerate(steps_order)}
    bits = np.array([T.L2_CLASSES[s][0] for s in steps_order], np.int32)
    grouped = np.array([s if T.L2_CLASSES[s][1] else 0
                        for s in steps_order], np.int32)
    nb = np.array([{3: 2, 5: 3, 9: 4}[s] if T.L2_CLASSES[s][1]
                   else T.L2_CLASSES[s][0] for s in steps_order], np.int32)
    cc = np.array([T.L2_CLASSES[s][2] for s in steps_order], np.float64)
    dd = np.array([T.L2_CLASSES[s][3] for s in steps_order], np.float64)
    tabs = [T.L2_ALLOC_A, T.L2_ALLOC_B, T.L2_ALLOC_C, T.L2_ALLOC_D,
            T.L2_ALLOC_LSF]
    sblimit = np.array([len(t) for t in tabs], np.int32)
    nbal = np.zeros((5, 32), np.int32)
    cls = np.full((5, 32, 15), -1, np.int32)
    for t, tab in enumerate(tabs):
        for sb, (nb_sb, steps) in enumerate(tab):
            nbal[t, sb] = nb_sb
            for k, s in enumerate(steps):
                cls[t, sb, k] = cls_idx[s]
    return [
        fmt_floats("kScfL12", np.asarray(T.SCF_L12)),
        fmt_ints("kBitratesL1", T.BITRATES[0], ctype="long"),
        fmt_ints("kBitratesL2", T.BITRATES[1], ctype="long"),
        fmt_ints("kBitratesLsfL1", T.BITRATES_LSF_L1, ctype="long"),
        fmt_ints("kL2Sblimit", sblimit),
        fmt_ints("kL2Nbal", nbal),
        fmt_ints("kL2Cls", cls),
        fmt_ints("kL2ClsBits", bits),
        fmt_ints("kL2ClsGroupSteps", grouped),
        fmt_ints("kL2ClsNb", nb),
        fmt_doubles("kL2ClsC", cc),
        fmt_doubles("kL2ClsD", dd),
    ]


def build_huff_luts():
    """Two-level LUTs: primary[34][512] uint16 + escape descriptors + one
    shared secondary blob (shared trees deduplicated).

    Primary entry: 0x8000|esc_idx -> escape; read EscExt[esc_idx] more bits
                   b2 and use Secondary[EscOff[esc_idx] + b2]
                   else (len<<8)|(x<<4)|y, len in 1..9 (0 only for
                   empty/broken tables, handled in code)
    Secondary entry: (len<<8)|(x<<4)|y with len = total code length.
    """
    tabs = T.huffman_tables()
    primary = np.zeros((34, 1 << PRIMARY_BITS), np.uint16)
    secondary: list[int] = []
    esc_off: list[int] = []
    esc_ext: list[int] = []
    maxlens = np.zeros(34, np.int32)
    linbits = np.zeros(34, np.int32)
    tree_cache: dict[bytes, np.ndarray] = {}
    for t, tab in enumerate(tabs):
        linbits[t] = tab.linbits
        if tab.maxlen == 0 or tab.ref_broken:
            maxlens[t] = 0
            continue
        maxlens[t] = tab.maxlen
        key = tab.entries.tobytes()
        if key in tree_cache:
            primary[t] = tree_cache[key]
            continue
        long_by_prefix: dict[int, list] = {}
        for code, length, x, y in tab.entries:
            if length <= PRIMARY_BITS:
                shift = PRIMARY_BITS - length
                lo = code << shift
                primary[t, lo:lo + (1 << shift)] = \
                    (length << 8) | (x << 4) | y
            else:
                prefix = code >> (length - PRIMARY_BITS)
                long_by_prefix.setdefault(prefix, []).append(
                    (code, length, x, y))
        for prefix, entries in long_by_prefix.items():
            ext = max(e[1] for e in entries) - PRIMARY_BITS
            esc_idx = len(esc_off)
            assert esc_idx < 0x8000
            esc_off.append(len(secondary))
            esc_ext.append(ext)
            sub = [0] * (1 << ext)
            for code, length, x, y in entries:
                rem = code & ((1 << (length - PRIMARY_BITS)) - 1)
                shift = PRIMARY_BITS + ext - length
                lo = rem << shift
                for k in range(lo, lo + (1 << shift)):
                    sub[k] = (length << 8) | (x << 4) | y
            assert all(v != 0 for v in sub), f"incomplete subtable t={t}"
            secondary.extend(sub)
            primary[t, prefix] = 0x8000 | esc_idx
        tree_cache[key] = primary[t].copy()
    return (primary, np.array(secondary, np.uint16),
            np.array(esc_off, np.int32), np.array(esc_ext, np.int32),
            maxlens, linbits)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "pdmp3_tpu/host/src/gen_tables.inc"
    rl, rr = T.intensity_ratio_tables()
    pretab22 = np.concatenate([T.PRETAB, [0]]).astype(np.int32)
    # wire reorder tables: the packer writes ix line-ordered (reorder
    # folded into the copy); kReorderSrc[l][i] = bitstream line wire
    # position i reads; kPermBound[l][c] = smallest prefix length whose
    # wire positions cover bitstream lines [0, c) — the sparse wire's
    # count1 bound (reorder permutes within sfb spans, so the bound only
    # rounds c up to the containing band's end)
    reorder_src = T.layout_maps()["reorder"].astype(np.int16)
    perm_bound = np.zeros((T.N_LAYOUTS, 577), np.int16)
    for lay in range(T.N_LAYOUTS):
        p = reorder_src[lay]
        for c in range(1, 577):
            perm_bound[lay, c] = int(np.max(np.where(p < c)[0])) + 1
    parts = [
        "// GENERATED by tools/gen_host_tables.py — do not edit.\n",
        "// Data: ISO/IEC 11172-3 constants via pdmp3_tpu/_data/tables.npz\n",
        f"#define PDMP3_HUFF_PRIMARY_BITS {PRIMARY_BITS}\n",
        fmt_floats("kPow43", np.asarray(T.POW43)),
        fmt_floats("kGainQuarter", np.asarray(T.GAIN_QUARTER_DOWN)),
        fmt_floats("kGainGlobal", np.asarray(T.GAIN_GLOBAL)),
        f"extern const int kGainGlobalOff = {T.GAIN_GLOBAL_OFF};\n",
        fmt_floats("kCs", np.asarray(T.ANTIALIAS_CS)),
        fmt_floats("kCa", np.asarray(T.ANTIALIAS_CA)),
        fmt_floats("kIsRatioL", rl),
        fmt_floats("kIsRatioR", rr),
        fmt_floats("kImdctWin", np.asarray(T.IMDCT_WIN)),
        fmt_floats("kCosN12", np.asarray(T.COS_N12)),
        fmt_floats("kCosN36", np.asarray(T.COS_N36)),
        fmt_floats("kSynthD", np.asarray(T.SYNTH_D)),
        fmt_floats("kSynthNwin", np.asarray(T.SYNTH_NWIN)),
        fmt_ints("kSfbLong", T.SFB_LONG),
        fmt_ints("kSfbShort", T.SFB_SHORT),
        fmt_ints("kReorderSrc", reorder_src, ctype="short"),
        fmt_ints("kPermBound", perm_bound, ctype="short"),
        fmt_ints("kPretab", pretab22),
        fmt_ints("kScalefacSizes", T.SCALEFAC_SIZES),
        fmt_ints("kBitratesL3", T.BITRATES[2], ctype="long"),
        fmt_ints("kSampleRates", T.SAMPLE_RATES, ctype="long"),
        # --- MPEG-2/2.5 LSF extension (13818-3; tables.py LSF section) ---
        fmt_ints("kSfbLongFam", T.SFB_LONG_FAM),
        fmt_ints("kSfbShortFam", T.SFB_SHORT_FAM),
        fmt_ints("kBitratesLsf", T.BITRATES_LSF, ctype="long"),
        fmt_ints("kSampleRatesFam", T.SAMPLE_RATES_FAM, ctype="long"),
        fmt_ints("kNrOfSfb", T.NR_OF_SFB),
        fmt_ints("kSwitchSfbL", np.asarray(T.SWITCH_SFB_L, np.int32)),
        fmt_floats("kLsfK0", T.lsf_intensity_tables()[0]),
        fmt_floats("kLsfK1", T.lsf_intensity_tables()[1]),
        # --- Layer I/II (beyond-reference; 11172-3 B.2a-d/B.4, 13818-3 B.1)
        *build_l12_tables(),
    ]
    primary, secondary, esc_off, esc_ext, maxlens, linbits = build_huff_luts()
    parts += [
        fmt_ints("kHuffPrimary", primary, ctype="unsigned short"),
        fmt_ints("kHuffSecondary", secondary, ctype="unsigned short"),
        fmt_ints("kHuffEscOff", esc_off),
        fmt_ints("kHuffEscExt", esc_ext),
        fmt_ints("kHuffMaxlen", maxlens),
        fmt_ints("kHuffLinbits", linbits),
        f"enum {{ kHuffSecondaryLen = {len(secondary)}, "
        f"kHuffEscCount = {len(esc_off)} }};\n",
    ]
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {out} ({sum(len(p) for p in parts)//1024} KiB)")


if __name__ == "__main__":
    main()
