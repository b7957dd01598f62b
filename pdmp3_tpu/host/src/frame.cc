// Streaming MPEG-1 Layer III frame parser (native).
//
// State machine and quirk set mirror the reference decoder exactly (cited
// per method); the Huffman stage uses two-level LUT decoding (multi-bit
// table steps) instead of the reference's bit-serial tree walk — identical
// consumption because the code trees are complete and prefix-free.
#include "internal.h"

namespace pdmp3host {

int InRing::feed(const uint8_t *data, size_t size) {
  // all-or-nothing admission (pdmp3.c:2391-2423)
  if (!data || !size) return PDMP3_ERR;
  if (size > free_space()) return PDMP3_NO_SPACE;
  if (iend < istart) {
    std::memcpy(buf + iend, data, size);
    iend += (unsigned)size;
  } else {
    size_t first = kInbufSize - iend;
    if (first > size) first = size;
    std::memcpy(buf + iend, data, first);
    iend += (unsigned)first;
    size_t rest = size - first;
    if (rest) {
      std::memcpy(buf, data + first, rest);
      iend = (unsigned)rest;
    }
  }
  return PDMP3_OK;
}

void FrameParser::reset() {
  // pdmp3_open_feed (pdmp3.c:2369-2384)
  in.istart = in.iend = 0;
  in.processed = 0;
  new_header = 0;
  res.top = 0;
}

int FrameParser::read_header() {
  // byte-aligned sync scan + header field validation (pdmp3.c:1252-1320)
  uint32_t b1 = in.get_byte(), b2 = in.get_byte(), b3 = in.get_byte(),
           b4 = in.get_byte();
  if (b1 == kEof || b2 == kEof || b3 == kEof || b4 == kEof)
    return PDMP3_ERR;
  uint32_t h = (b1 << 24) | (b2 << 16) | (b3 << 8) | b4;
  while ((h & 0xFFF00000u) != 0xFFF00000u) {
    uint32_t nb = in.get_byte();
    if (nb == kEof) return PDMP3_ERR;
    h = ((h << 8) & 0xFFFFFF00u) | nb;
  }
  hdr.id = (h >> 19) & 1;
  hdr.layer = (h >> 17) & 3;
  hdr.protection_bit = (h >> 16) & 1;
  hdr.bitrate_index = (h >> 12) & 0xF;
  hdr.sampling_frequency = (h >> 10) & 3;
  hdr.padding_bit = (h >> 9) & 1;
  hdr.private_bit = (h >> 8) & 1;
  hdr.mode = (h >> 6) & 3;
  hdr.mode_extension = (h >> 4) & 3;
  hdr.copyright = (h >> 3) & 1;
  hdr.original = (h >> 2) & 1;
  hdr.emphasis = h & 3;
  if (hdr.id != 1 || hdr.bitrate_index == 0 || hdr.bitrate_index == 15 ||
      hdr.sampling_frequency == 3 || hdr.layer == 0)
    return PDMP3_ERR;
  hdr.layer = 4 - hdr.layer;
  if (!new_header) new_header = 1;
  return PDMP3_OK;
}

int FrameParser::search_header() {
  // resync one byte at a time with rollback, bounded retry
  // (pdmp3.c:1322-1340)
  size_t pos = in.processed;
  unsigned mark = in.istart;
  int r = PDMP3_NEED_MORE;
  int cnt = 0;
  while (in.filled() > 4) {
    r = read_header();
    if (hdr.layer == 3 && r == PDMP3_OK) break;
    if (++mark == kInbufSize) mark = 0;
    in.istart = mark;
    in.processed = pos;
    if (++cnt > 2 * 576) return PDMP3_ERR;
  }
  return r;
}

int FrameParser::read_side_info() {
  // (pdmp3.c:1129-1200); on input underrun keeps the stale bit cursor and
  // parses on, matching Get_Sideinfo's early return (pdmp3.c:1576-1586)
  int nch = hdr.nch();
  long framesize = hdr.frame_size();
  if (framesize > 2000) return PDMP3_ERR;
  int size = nch == 1 ? 17 : 32;
  bool eof = false;
  for (int i = 0; i < size; i++) {
    uint32_t v = in.get_byte();
    if (v == kEof) {
      eof = true;
      break;
    }
    side.bytes[i] = (uint8_t)v;
  }
  if (!eof) {
    side.byte_pos = 0;
    side.bit_idx = 0;
  }
  si.main_data_begin = side.get_bits(9);
  side.get_bits(nch == 1 ? 5 : 3);  // private bits, discarded
  for (int ch = 0; ch < nch; ch++)
    for (int b = 0; b < 4; b++) si.scfsi[ch][b] = side.get_bits(1);
  for (int gr = 0; gr < 2; gr++) {
    for (int ch = 0; ch < nch; ch++) {
      si.part2_3_length[gr][ch] = side.get_bits(12);
      si.big_values[gr][ch] = side.get_bits(9);
      si.global_gain[gr][ch] = side.get_bits(8);
      si.scalefac_compress[gr][ch] = side.get_bits(4);
      si.win_switch[gr][ch] = side.get_bits(1);
      if (si.win_switch[gr][ch]) {
        si.block_type[gr][ch] = side.get_bits(2);
        si.mixed[gr][ch] = side.get_bits(1);
        for (int r = 0; r < 2; r++)
          si.table_select[gr][ch][r] = side.get_bits(5);
        for (int w = 0; w < 3; w++)
          si.subblock_gain[gr][ch][w] = side.get_bits(3);
        // implicit region counts (pdmp3.c:1181-1185)
        si.region0_count[gr][ch] =
            (si.block_type[gr][ch] == 2 && !si.mixed[gr][ch]) ? 8 : 7;
        si.region1_count[gr][ch] = 20 - si.region0_count[gr][ch];
      } else {
        for (int r = 0; r < 3; r++)
          si.table_select[gr][ch][r] = side.get_bits(5);
        si.region0_count[gr][ch] = side.get_bits(4);
        si.region1_count[gr][ch] = side.get_bits(3);
        si.block_type[gr][ch] = 0;
        si.mixed[gr][ch] = 0;
      }
      si.preflag[gr][ch] = side.get_bits(1);
      si.scalefac_scale[gr][ch] = side.get_bits(1);
      si.count1table_select[gr][ch] = side.get_bits(1);
    }
  }
  return PDMP3_OK;
}

int FrameParser::get_main_data(unsigned size, unsigned begin) {
  // bit-reservoir assembly with underflow skip (pdmp3.c:1096-1122);
  // Get_Bytes parity: stop storing at EOF, leaving stale tail bytes
  auto fill = [&](unsigned off, unsigned n) {
    // bulk ring copy; short reads leave the stale tail (Get_Bytes parity)
    in.get_bytes(res.bytes + off, n);
  };
  if (begin > res.top) {
    fill(res.top, size);
    res.set_pos(0);
    res.top += size;
    return PDMP3_NEED_MORE;
  }
  std::memmove(res.bytes, res.bytes + res.top - begin, begin);
  fill(begin, size);
  res.set_pos(0);
  res.top = begin + size;
  return PDMP3_OK;
}

void FrameParser::read_scalefactors(int gr, int ch, pdmp3_granules *g) {
  (void)g;
  // incl. scfsi long-block sharing (pdmp3.c:1376-1435)
  int slen1 = kScalefacSizes[si.scalefac_compress[gr][ch]][0];
  int slen2 = kScalefacSizes[si.scalefac_compress[gr][ch]][1];
  if (si.win_switch[gr][ch] && si.block_type[gr][ch] == 2) {
    if (si.mixed[gr][ch]) {
      for (int b = 0; b < 8; b++)
        scf_l_state[gr][ch][b] = (uint8_t)res.get_bits(slen1);
      for (int b = 3; b < 12; b++) {
        int nb = b < 6 ? slen1 : slen2;
        for (int w = 0; w < 3; w++)
          scf_s_state[gr][ch][b][w] = (uint8_t)res.get_bits(nb);
      }
    } else {
      for (int b = 0; b < 12; b++) {
        int nb = b < 6 ? slen1 : slen2;
        for (int w = 0; w < 3; w++)
          scf_s_state[gr][ch][b][w] = (uint8_t)res.get_bits(nb);
      }
    }
  } else {
    static const int grp[4][3] = {
        {0, 6, 0}, {6, 11, 0}, {11, 16, 1}, {16, 21, 1}};
    for (int gi = 0; gi < 4; gi++) {
      int lo = grp[gi][0], hi = grp[gi][1];
      int sl = grp[gi][2] ? slen2 : slen1;
      if (si.scfsi[ch][gi] == 0 || gr == 0) {
        for (int b = lo; b < hi; b++)
          scf_l_state[gr][ch][b] = (uint8_t)res.get_bits(sl);
      } else if (si.scfsi[ch][gi] == 1 && gr == 1) {
        for (int b = lo; b < hi; b++)
          scf_l_state[1][ch][b] = scf_l_state[0][ch][b];
      }
    }
  }
}

// LUT Huffman decode of one (x,y) pair; consumes exactly the code length.
static inline void huff_pair(Reservoir &res, int tnum, int32_t *x,
                             int32_t *y) {
  int maxlen = kHuffMaxlen[tnum];
  if (maxlen == 0) {  // empty tables 0/4/14 (pdmp3.c:1599-1602)
    *x = *y = 0;
    return;
  }
  uint32_t peek = res.peek_bits((unsigned)maxlen);
  int take = maxlen - PDMP3_HUFF_PRIMARY_BITS;
  uint32_t p9 = take > 0 ? (peek >> take)
                         : (peek << (PDMP3_HUFF_PRIMARY_BITS - maxlen));
  uint16_t e = kHuffPrimary[tnum][p9];
  unsigned len, payload;
  if (e & 0x8000u) {
    int d = e & 0x7FFF;
    int ext = kHuffEscExt[d];
    uint32_t b2 = (peek >> (take - ext)) & ((1u << ext) - 1u);
    uint16_t e2 = kHuffSecondary[kHuffEscOff[d] + (int)b2];
    len = e2 >> 8;
    payload = e2 & 0xFF;
  } else {
    len = e >> 8;
    payload = e & 0xFF;
  }
  res.advance(len);
  *x = (payload >> 4) & 0xF;
  *y = payload & 0xF;
}

void FrameParser::read_huffman(unsigned part_2_start, int gr, int ch,
                               pdmp3_granules *g) {
  // (pdmp3.c:2051-2115) incl. overrun rollback + stuffing-bit skip
  int16_t *line = g->ix[gr][ch];
  if (si.part2_3_length[gr][ch] == 0) {
    std::memset(line, 0, 576 * sizeof(int16_t));
    si.count1[gr][ch] = 0;
    return;
  }
  unsigned bit_pos_end = part_2_start + si.part2_3_length[gr][ch] - 1;
  int region_1_start, region_2_start;
  if (si.win_switch[gr][ch] && si.block_type[gr][ch] == 2) {
    region_1_start = 36;
    region_2_start = 576;
  } else {
    int sf = hdr.sampling_frequency;
    region_1_start = kSfbLong[sf][si.region0_count[gr][ch] + 1];
    // hostile side info can push this index past l[22] (region counts
    // are raw 4+3 bit fields: 15+7+2 = 24); the reference's struct
    // layout aliases .l[23+k] onto .s[k] (pdmp3.c:108-112, 2074-2076).
    // Emulate the alias instead of overflowing our separate tables
    // (found by tools/fuzz.py, ASan global-buffer-overflow).
    int r2i =
        (int)(si.region0_count[gr][ch] + si.region1_count[gr][ch] + 2);
    region_2_start =
        r2i <= 22 ? kSfbLong[sf][r2i] : kSfbShort[sf][r2i - 23];
  }
  int big = (int)si.big_values[gr][ch] * 2;
  // The table only changes at the two region boundaries: decode each
  // region as one run with the table pointers hoisted out of the loop
  // (read_huffman dominates parse time; this removes two compares and
  // three table derefs per pair).
  int ends[3], tnums[3];
  {
    int e0 = region_1_start < 0 ? 0 : region_1_start;
    if (e0 > big) e0 = big;
    int e1 = region_2_start < e0 ? e0 : region_2_start;
    if (e1 > big) e1 = big;
    ends[0] = e0; ends[1] = e1; ends[2] = big;
    for (int r = 0; r < 3; r++) tnums[r] = (int)si.table_select[gr][ch][r];
  }
  bool guarded = big > 576;  // only corrupt streams; keep stores checked
  int is_pos = 0;
  for (int r = 0; r < 3; r++) {
    int end = ends[r], tnum = tnums[r];
    int lb = kHuffLinbits[tnum];
    int maxlen = kHuffMaxlen[tnum];
    if (lb == 0 && maxlen != 0 && !guarded) {
      // fast path (no linbits): one 64-bit window covers the codeword
      // (<=19 bits) and both sign bits — single load, single advance
      const uint16_t *prim = kHuffPrimary[tnum];
      for (; is_pos < end; is_pos += 2) {
        uint64_t win = (res.window() << res.bit_idx);
        uint32_t p9 = (uint32_t)(win >> (64 - PDMP3_HUFF_PRIMARY_BITS));
        uint16_t e = prim[p9];
        unsigned len, payload;
        if (e & 0x8000u) {
          int d2 = e & 0x7FFF;
          int ext = kHuffEscExt[d2];
          uint32_t b2 = (uint32_t)(
              (win << PDMP3_HUFF_PRIMARY_BITS) >> (64 - ext));
          uint16_t e2 = kHuffSecondary[kHuffEscOff[d2] + (int)b2];
          len = e2 >> 8;
          payload = e2 & 0xFF;
        } else {
          len = e >> 8;
          payload = e & 0xFF;
        }
        int32_t x = (payload >> 4) & 0xF;
        int32_t y = payload & 0xF;
        unsigned adv = len;
        if (x > 0) {
          if ((win >> (63 - adv)) & 1) x = -x;
          adv++;
        }
        if (y > 0) {
          if ((win >> (63 - adv)) & 1) y = -y;
          adv++;
        }
        res.advance(adv);
        line[is_pos] = (int16_t)x;
        line[is_pos + 1] = (int16_t)y;
      }
    } else {
      for (; is_pos < end; is_pos += 2) {
        int32_t x, y;
        huff_pair(res, tnum, &x, &y);
        if (lb && x == 15) x += (int32_t)res.get_bits(lb);
        if (x > 0 && res.get_bit()) x = -x;
        if (lb && y == 15) y += (int32_t)res.get_bits(lb);
        if (y > 0 && res.get_bit()) y = -y;
        if (is_pos < 576) line[is_pos] = (int16_t)x;
        if (is_pos + 1 < 576) line[is_pos + 1] = (int16_t)y;
      }
    }
  }
  bool table_b = si.count1table_select[gr][ch] != 0;
  is_pos = big;
  while (is_pos <= 572 && res.pos() <= bit_pos_end) {
    int32_t v, w, x, y;
    if (table_b && (profile & PDMP3_PROFILE_COUNT1B_SPEC)) {
      // spec profile: the REAL ISO count1 table B — every code is 4 bits,
      // quad value = one's complement of the code — plus sign bits
      uint32_t q = 15u - res.get_bits(4);
      v = (q >> 3) & 1;
      w = (q >> 2) & 1;
      x = (q >> 1) & 1;
      y = q & 1;
      if (v && res.get_bit()) v = -v;
      if (w && res.get_bit()) w = -w;
      if (x && res.get_bit()) x = -x;
      if (y && res.get_bit()) y = -y;
    } else if (table_b) {
      // reference's stale table-33 pointer hits a 0-bit leaf (x=2,y=3):
      // every quad is (0,0,±1,±1), two sign bits (pdmp3.c:569, 1627-1635)
      v = 0;
      w = 0;
      x = res.get_bit() ? -1 : 1;
      y = res.get_bit() ? -1 : 1;
    } else {
      // table A quads: codeword (<=6 bits) + up to 4 sign bits in one
      // 64-bit window
      uint64_t win = (res.window() << res.bit_idx);
      uint32_t p9 = (uint32_t)(win >> (64 - PDMP3_HUFF_PRIMARY_BITS));
      uint16_t e = kHuffPrimary[32][p9];
      unsigned len = e >> 8, q = e & 0xF;
      v = (q >> 3) & 1;
      w = (q >> 2) & 1;
      x = (q >> 1) & 1;
      y = q & 1;
      unsigned adv = len;
      if (v) { if ((win >> (63 - adv)) & 1) v = -v; adv++; }
      if (w) { if ((win >> (63 - adv)) & 1) w = -w; adv++; }
      if (x) { if ((win >> (63 - adv)) & 1) x = -x; adv++; }
      if (y) { if ((win >> (63 - adv)) & 1) y = -y; adv++; }
      res.advance(adv);
    }
    line[is_pos++] = (int16_t)v;
    if (is_pos >= 576) break;
    line[is_pos++] = (int16_t)w;
    if (is_pos >= 576) break;
    line[is_pos++] = (int16_t)x;
    if (is_pos >= 576) break;
    line[is_pos++] = (int16_t)y;
  }
  if (res.pos() > bit_pos_end + 1) is_pos -= 4;
  si.count1[gr][ch] = is_pos;
  for (int i = is_pos < 0 ? 0 : is_pos; i < 576; i++) line[i] = 0;
  res.set_pos(bit_pos_end + 1);
}

int FrameParser::read_main(pdmp3_granules *g) {
  // (pdmp3.c:1346-1442)
  int nch = hdr.nch();
  long framesize = hdr.frame_size();
  if (framesize > 2000) return PDMP3_ERR;
  long main_data_size = framesize - (nch == 1 ? 17 : 32) - 4;
  if (hdr.protection_bit == 0) main_data_size -= 2;
  int r = get_main_data((unsigned)main_data_size, si.main_data_begin);
  if (r != PDMP3_OK) return r;
  for (int gr = 0; gr < 2; gr++) {
    for (int ch = 0; ch < nch; ch++) {
      unsigned part_2_start = res.pos();
      read_scalefactors(gr, ch, g);
      read_huffman(part_2_start, gr, ch, g);
    }
  }
  // sfb21 alias slots (pdmp3.c:1896-1902 OOB read emulation): by struct
  // layout scalefac_l[gr][ch][21] aliases the next granule-channel's
  // scalefac 0; the last aliases scalefac_s[0][0][0][0]; pretab[21] is
  // 0.0 in the reference binary's rodata
  scf_l_state[0][0][21] = scf_l_state[0][1][0];
  scf_l_state[0][1][21] = scf_l_state[1][0][0];
  scf_l_state[1][0][21] = scf_l_state[1][1][0];
  scf_l_state[1][1][21] = scf_s_state[0][0][0][0];
  for (int w = 0; w < 3; w++) {  // short band-12 slot, same aliasing
    scf_s_state[0][0][12][w] = scf_s_state[0][1][0][w];
    scf_s_state[0][1][12][w] = scf_s_state[1][0][0][w];
    scf_s_state[1][0][12][w] = scf_s_state[1][1][0][w];
    // last granule-channel aliases float bits of is[0][0]: gain
    // underflows to +0.0 — sentinel 63 hits the zeroed gain-table region
    scf_s_state[1][1][12][w] = 63;
  }
  std::memcpy(g->scf_l, scf_l_state, sizeof scf_l_state);
  std::memcpy(g->scf_s, scf_s_state, sizeof scf_s_state);
  return PDMP3_OK;
}

int FrameParser::parse_frame(pdmp3_granules *g) {
  // Read_Frame (pdmp3.c:1217-1244); caller rolls back on non-OK
  int r = search_header();
  if (r != PDMP3_OK) return r == PDMP3_ERR ? PDMP3_ERR : r;
  if (hdr.protection_bit == 0) {
    // CRC read and discarded; EOF silently ignored (Read_CRC returns
    // FALSE==PDMP3_OK on EOF, pdmp3.c:1206-1210)
    in.get_byte();
    in.get_byte();
  }
  if (hdr.layer != 3) return PDMP3_ERR;
  std::memset(g, 0, sizeof(*g));
  r = read_side_info();
  if (r != PDMP3_OK) return PDMP3_ERR;
  r = read_main(g);
  if (r != PDMP3_OK) return r;
  // fill granule tensor metadata
  g->nch = hdr.nch();
  g->sample_rate = (int32_t)kSampleRates[hdr.sampling_frequency];
  g->ms_flag = (hdr.mode == 1 && (hdr.mode_extension & 2)) ? 1 : 0;
  g->is_flag = (hdr.mode == 1 && (hdr.mode_extension & 1)) ? 1 : 0;
  for (int gr = 0; gr < 2; gr++)
    for (int ch = 0; ch < hdr.nch(); ch++) {
      g->layout[gr][ch] =
          layout_id(hdr.sampling_frequency, (int)si.win_switch[gr][ch],
                    (int)si.block_type[gr][ch], (int)si.mixed[gr][ch]);
      g->block_type[gr][ch] = (int32_t)si.block_type[gr][ch];
      g->win_switch[gr][ch] = (int32_t)si.win_switch[gr][ch];
      g->mixed[gr][ch] = (int32_t)si.mixed[gr][ch];
      g->global_gain[gr][ch] = (int32_t)si.global_gain[gr][ch];
      g->scalefac_scale[gr][ch] = (int32_t)si.scalefac_scale[gr][ch];
      g->preflag[gr][ch] = (int32_t)si.preflag[gr][ch];
      for (int w = 0; w < 3; w++)
        g->subblock_gain[gr][ch][w] = (int32_t)si.subblock_gain[gr][ch][w];
      g->count1[gr][ch] = si.count1[gr][ch];
    }
  return PDMP3_OK;
}

}  // namespace pdmp3host
