#!/usr/bin/env python3
"""Extract MPEG-1 Layer III constant data for pdmp3_tpu.

The decoder needs several blocks of *specification constant data* (ISO/IEC
11172-3): the Layer III Huffman code trees (Table B.7), the polyphase
synthesis window D (Table B.3), the hybrid (IMDCT) window shapes, and the
IMDCT cosine bases.  The upstream reference (technosaurus/PDMP3,
/root/reference/pdmp3.c) carries this data as C initializer lists that were
generated decades ago by printing float-precision computations with 6/9
decimals; bit-exact PCM parity requires using the *identical* float values,
so we extract the numeric data from the reference source, re-shape it into
our own representations, and store it as a binary .npz consumed by
`pdmp3_tpu.tables`.

This tool extracts DATA ONLY (numeric literals mandated by the ISO spec /
the reference's frozen rounding of it); all code that consumes the data is
original.  The Huffman trees are additionally *re-coded* from the
reference's walk-a-tree format (pdmp3.c:235-515) into canonical
(codeword, length) -> (x, y) tables, from which pdmp3_tpu builds multi-bit
LUT decoders -- a different, faster representation.

Outputs: pdmp3_tpu/_data/tables.npz
"""
from __future__ import annotations

import math
import re
import sys

import numpy as np

REF = "/root/reference/pdmp3.c"


def _read_ref() -> str:
    with open(REF, "r", errors="replace") as f:
        return f.read()


def _floats_between(src: str, start_marker: str, end_marker: str) -> list[float]:
    """All C float literals between two markers (order preserved)."""
    i = src.index(start_marker)
    j = src.index(end_marker, i)
    body = src[i + len(start_marker):j]
    # strip comments
    body = re.sub(r"/\*.*?\*/", " ", body, flags=re.S)
    body = re.sub(r"//[^\n]*", " ", body)
    toks = re.findall(r"-?\d+\.\d+(?:[eE][-+]?\d+)?", body)
    return [float(t) for t in toks]


def _hex_shorts_between(src: str, start_marker: str, end_marker: str) -> list[int]:
    i = src.index(start_marker)
    j = src.index(end_marker, i)
    body = src[i + len(start_marker):j]
    toks = re.findall(r"0x([0-9a-fA-F]{1,4})", body)
    return [int(t, 16) for t in toks]


# ---------------------------------------------------------------------------
# Huffman: decode the reference's flattened tree blob into canonical
# (code, length, x, y) lists, then sanity-check prefix-freeness/completeness.
# ---------------------------------------------------------------------------

# Directory of the 34 Layer III Huffman tables: (blob offset, treelen, linbits)
# (ISO 11172-3 Table B.7; offsets per the reference blob layout,
#  pdmp3.c:535-570).  Tables 0/4/14 are empty; 16-23 and 24-31 share trees.
#
# NOTE: the reference directory points table 33 at offset 2261 (pdmp3.c:569)
# which lands on a *leaf inside table 24's tree* — the actual count1 table B
# tree lives at 2773 (the "g_huffman_table_33" block).  We extract the REAL
# tree here; the decoder emulates the reference's broken pointer separately
# (0-bit leaf with payload (x=2,y=3)) for bit parity.
HUFF_DIR = [
    (None, 0, 0), (0, 7, 0), (7, 17, 0), (24, 17, 0), (None, 0, 0),
    (41, 31, 0), (72, 31, 0), (103, 71, 0), (174, 71, 0), (245, 71, 0),
    (316, 127, 0), (443, 127, 0), (570, 127, 0), (697, 511, 0), (None, 0, 0),
    (1208, 511, 0),
    (1719, 511, 1), (1719, 511, 2), (1719, 511, 3), (1719, 511, 4),
    (1719, 511, 6), (1719, 511, 8), (1719, 511, 10), (1719, 511, 13),
    (2230, 512, 4), (2230, 512, 5), (2230, 512, 6), (2230, 512, 7),
    (2230, 512, 8), (2230, 512, 9), (2230, 512, 11), (2230, 512, 13),
    (2742, 31, 0), (2773, 31, 0),
]


def _walk_tree(blob: list[int], base: int, treelen: int):
    """Enumerate (code, length, payload) by walking the packed tree.

    Node format: hi byte = left child offset, lo byte = right child offset;
    offsets >= 250 chain additively.  Leaf: hi byte == 0, payload in lo bits
    (x<<4 | y).
    """
    out = []

    def step(point: int, bit: int) -> int:
        w = blob[base + point]
        off = (w & 0xFF) if bit else (w >> 8)
        while off >= 250:
            point += off
            w = blob[base + point]
            off = (w & 0xFF) if bit else (w >> 8)
        return point + off

    def rec(point: int, code: int, length: int):
        w = blob[base + point]
        if (w & 0xFF00) == 0:  # leaf
            out.append((code, length, (w >> 4) & 0xF, w & 0xF))
            return
        assert length < 24, "runaway tree walk"
        rec(step(point, 0), code << 1, length + 1)
        rec(step(point, 1), (code << 1) | 1, length + 1)

    rec(0, 0, 0)
    return out


def extract_huffman(src: str):
    blob = _hex_shorts_between(src, "g_huffman_table[] = {", "};")
    assert len(blob) >= 2773, f"huffman blob too short: {len(blob)}"
    tables = {}
    for tnum, (base, treelen, linbits) in enumerate(HUFF_DIR):
        if base is None:
            tables[tnum] = ([], linbits)
            continue
        entries = _walk_tree(blob, base, treelen)
        # completeness check: Kraft sum == 1 (every bit pattern decodes)
        kraft = sum(2.0 ** -l for _, l, _, _ in entries)
        assert abs(kraft - 1.0) < 1e-12, f"table {tnum} incomplete: {kraft}"
        codes = set()
        for c, l, _, _ in entries:
            for cc, ll in codes:
                assert not (c >> (l - ll) == cc if l >= ll else cc >> (ll - l) == c), \
                    f"table {tnum} not prefix-free"
            codes.add((c, l))
        tables[tnum] = (entries, linbits)
    return tables


def pack_huffman(tables) -> dict:
    """Pack canonical codebooks into flat arrays for npz storage."""
    all_rows = []  # (table, code, length, x, y)
    offsets = np.zeros(35, np.int32)
    linbits = np.zeros(34, np.int32)
    n = 0
    for t in range(34):
        entries, lb = tables[t]
        linbits[t] = lb
        offsets[t] = n
        for code, length, x, y in sorted(entries, key=lambda e: (e[1], e[0])):
            all_rows.append((t, code, length, x, y))
            n += 1
    offsets[34] = n
    rows = np.array(all_rows, np.int32)
    return {
        "huff_rows": rows,          # [N,5] (table, code, len, x, y)
        "huff_offsets": offsets,    # [35]
        "huff_linbits": linbits,    # [34]
    }


# ---------------------------------------------------------------------------
# Float tables
# ---------------------------------------------------------------------------

def extract_floats(src: str) -> dict:
    out = {}
    cs_ca = _floats_between(src, "cs[8]={", "is_ratios[6]")
    assert len(cs_ca) == 16
    out["antialias_cs"] = np.array(cs_ca[:8], np.float32)
    out["antialias_ca"] = np.array(cs_ca[8:], np.float32)

    isr = _floats_between(src, "is_ratios[6] = {", "}")
    assert len(isr) == 6
    out["is_ratios"] = np.array(isr, np.float32)

    win = _floats_between(src, "g_imdct_win[4][36] = {", "#endif")
    assert len(win) == 4 * 36, len(win)
    out["imdct_win"] = np.array(win, np.float32).reshape(4, 36)

    c12 = _floats_between(src, "cos_N12[6][12] = {", "cos_N36[18][36]")
    assert len(c12) == 72, len(c12)
    out["cos_n12"] = np.array(c12, np.float32).reshape(6, 12)

    c36 = _floats_between(src, "cos_N36[18][36] = {", "#endif")
    assert len(c36) == 18 * 36, len(c36)
    out["cos_n36"] = np.array(c36, np.float32).reshape(18, 36)

    dt = _floats_between(src, "g_synth_dtbl[512] = {", "};")
    assert len(dt) == 512, len(dt)
    out["synth_d"] = np.array(dt, np.float32)
    return out


def computed_tables() -> dict:
    """Tables the reference computes at runtime with libm (same libm here)."""
    # x^(4/3) requantization table (pdmp3.c:972-981): double pow -> float.
    pow43 = np.array([math.pow(float(i), 4.0 / 3.0) for i in range(8207)],
                     np.float32)
    # Polyphase matrixing window (pdmp3.c:1989-1993): cos in double -> float.
    nwin = np.array(
        [[math.cos(float((16 + i) * (2 * j + 1)) * (math.pi / 64.0))
          for j in range(32)] for i in range(64)], np.float32)
    # Requantize gain tables, double pow -> float, as the reference computes
    # per-sample (pdmp3.c:2127-2128, 2144-2146):
    #   2^(-0.5*k) for k = sf_mult*(scalefac+pf*pretab) in half-steps:
    #   exponent arg = -(sf_mult*(...)) with sf_mult in {0.5, 1.0}
    # We tabulate pow(2, -0.25*q) for q = 0..4*63 quarter steps and
    # pow(2, 0.25*(g-210-8*sbg)) for g-210-8*sbg in [-266, 45].
    quarter_down = np.array([math.pow(2.0, -0.25 * q) for q in range(256)],
                            np.float32)
    # Valid streams never exceed q = 4*(15+3) = 72; entries past 100 are
    # repurposed as exact +0.0 so the frontends can mark the reference's
    # "scalefactor read from float bits" OOB case (a huge unsigned whose
    # pow(2,-huge) underflows to +0.0) with a sentinel scalefactor of 63.
    quarter_down[100:] = 0.0
    gg_exp = np.arange(-266, 46)
    gain_global = np.array([math.pow(2.0, 0.25 * float(e)) for e in gg_exp],
                           np.float32)
    return {
        "pow43": pow43,
        "synth_nwin": nwin,
        "gain_quarter_down": quarter_down,   # idx q -> 2^(-q/4)
        "gain_global": gain_global,          # idx e+266 -> 2^(e/4)
        "gain_global_off": np.int32(266),
    }


def main() -> None:
    src = _read_ref()
    data = {}
    data.update(pack_huffman(extract_huffman(src)))
    data.update(extract_floats(src))
    data.update(computed_tables())
    out = sys.argv[1] if len(sys.argv) > 1 else "pdmp3_tpu/_data/tables.npz"
    np.savez_compressed(out, **data)
    print(f"wrote {out}:")
    for k, v in sorted(data.items()):
        v = np.asarray(v)
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
