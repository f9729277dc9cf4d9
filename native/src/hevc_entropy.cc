// HEVC row-slice entropy stage: CABAC engine + slice-data syntax from
// flat per-CTB arrays, one independent slice per CTB row.
//
// This is the production implementation of the entropy half of the
// TPU HEVC encoder: the device computes modes / MVs / quantized
// levels / recon (ceracoder_tpu/ops/h265.py), this stage derives all
// syntax-level decisions (MPM, cbf, skip/merge/AMVP) and arithmetic-
// codes each row. The executable spec is
// ceracoder_tpu/codec/h265/rowslice.py:entropy_rows — byte equality
// with it is enforced by tests/test_h265_rows.py. Rows are data-
// independent and coded in parallel worker threads.
//
// Replaces the entropy stage of the reference's external HEVC encoder
// elements (reference: pipeline/ *h265*; SURVEY.md §2.2, §7.1 step 4,
// §7.3 hard part #1).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#include "hevc_tables.inc"

namespace {

// ---------------------------------------------------------------------------
// Bit buffer (MSB-first)
// ---------------------------------------------------------------------------

struct BitBuf {
  std::vector<uint8_t> buf;
  uint32_t acc = 0;  // pending bits, LSB-aligned
  int nacc = 0;

  void put(uint32_t v, int n) {
    while (n > 0) {
      int take = std::min(n, 8 - nacc);
      acc = (acc << take) | ((v >> (n - take)) & ((1u << take) - 1));
      nacc += take;
      n -= take;
      if (nacc == 8) {
        buf.push_back(static_cast<uint8_t>(acc));
        acc = 0;
        nacc = 0;
      }
    }
  }

  size_t bit_length() const { return buf.size() * 8 + nacc; }
};

// ---------------------------------------------------------------------------
// CABAC arithmetic encoder (spec 9.3.4.3, HM low/bits-left carry form;
// exact port of ceracoder_tpu/codec/h265/cabac.py:CabacEncoder)
// ---------------------------------------------------------------------------

struct Cabac {
  BitBuf bb;
  uint32_t low = 0;
  uint32_t range = 510;
  int bits_left = 23;
  int num_buffered = 0;
  uint32_t buffered_byte = 0xFF;

  void write_out() {
    uint32_t lead = low >> (24 - bits_left);
    low &= (1u << (24 - bits_left)) - 1;
    bits_left += 8;
    if (lead < 0xFF) {
      if (num_buffered > 0) {
        bb.put(buffered_byte, 8);
        for (int i = 0; i < num_buffered - 1; i++) bb.put(0xFF, 8);
      }
      buffered_byte = lead;
      num_buffered = 1;
    } else if (lead > 0xFF) {
      bb.put(buffered_byte + 1, 8);
      for (int i = 0; i < num_buffered - 1; i++) bb.put(0x00, 8);
      buffered_byte = lead & 0xFF;
      num_buffered = 1;
    } else {
      num_buffered++;  // 0xFF: defer, may still carry
    }
  }

  void renorm() {
    while (range < 256) {
      range <<= 1;
      low <<= 1;
      if (--bits_left < 12) write_out();
    }
  }

  void encode_bin(uint8_t* ctx, int idx, int binval) {
    uint8_t state = ctx[idx];
    uint32_t lps = kLpsTable[state >> 1][(range >> 6) & 3];
    range -= lps;
    if (binval != (state & 1)) {
      low += range;
      range = lps;
    }
    ctx[idx] = kNextState[state][binval];
    renorm();
  }

  void encode_bypass(int binval) {
    low <<= 1;
    if (binval) low += range;
    if (--bits_left < 12) write_out();
  }

  void encode_bypass_bits(uint32_t value, int n) {
    for (int i = n - 1; i >= 0; i--) encode_bypass((value >> i) & 1);
  }

  void encode_terminate(int binval) {
    range -= 2;
    if (binval) {
      low += range;
      range = 2;
    }
    renorm();
  }

  void finish() {
    if (low >> (32 - bits_left)) {
      bb.put(buffered_byte + 1, 8);
      for (int i = 0; i < num_buffered - 1; i++) bb.put(0x00, 8);
      low -= 1u << (32 - bits_left);
    } else if (num_buffered > 0) {
      bb.put(buffered_byte, 8);
      for (int i = 0; i < num_buffered - 1; i++) bb.put(0xFF, 8);
    }
    num_buffered = 0;
    int pend = 24 - bits_left;
    if (pend) bb.put((low >> 8) & ((1u << pend) - 1), pend);
  }

  void align_one() {
    bb.put(1, 1);
    int pad = (8 - static_cast<int>(bb.bit_length() % 8)) % 8;
    if (pad) bb.put(0, pad);
  }
};

// ---------------------------------------------------------------------------
// Context layout: offsets passed from Python in this fixed order
// (must match ceracoder_tpu/codec/h265/ctx_tables._LAYOUT)
// ---------------------------------------------------------------------------

enum CtxOff {
  OFF_PART_MODE = 0,
  OFF_PREV_INTRA,
  OFF_CHROMA_PRED,
  OFF_CBF_LUMA,
  OFF_CBF_CHROMA,
  OFF_LAST_X,
  OFF_LAST_Y,
  OFF_CSBF,
  OFF_SIG,
  OFF_GR1,
  OFF_GR2,
  OFF_SPLIT_CU,
  OFF_SKIP,
  OFF_PRED_MODE,
  OFF_MERGE_FLAG,
  OFF_MERGE_IDX,
  OFF_MVP_FLAG,
  OFF_MVD_GR,
  OFF_RQT_ROOT_CBF,
  OFF_INTER_PRED_IDC,
  OFF_SAO_MERGE,
  OFF_SAO_TYPE,
  OFF_SPLIT_TU,
  OFF_COUNT
};

// ---------------------------------------------------------------------------
// Scan tables (spec 6.5.3 up-right diagonal), sizes 2 (8x8 TU
// sub-blocks), 4 (16x16 TU sub-blocks and within-sub-block)
// ---------------------------------------------------------------------------

struct Scan {
  int x[64], y[64];
};

Scan make_diag_scan(int n) {
  Scan s{};
  int k = 0;
  for (int d = 0; d < 2 * n - 1; d++)
    for (int x = std::max(0, d - n + 1); x <= std::min(d, n - 1); x++) {
      int yy = d - x;
      if (yy < n) {
        s.x[k] = x;
        s.y[k] = yy;
        k++;
      }
    }
  return s;
}

const Scan kScan4 = make_diag_scan(4);
const Scan kScan2 = make_diag_scan(2);

const uint8_t kGroupIdx[32] = {0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6,
                               7, 7, 7, 7, 8, 8, 8, 8, 8, 8, 8, 8,
                               9, 9, 9, 9, 9, 9, 9, 9};
const uint8_t kMinInGroup[10] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24};
const uint8_t kSigCtx4x4[16] = {0, 1, 4, 5, 2, 3, 4, 5,
                                6, 6, 8, 8, 7, 7, 8, 8};

// sig_coeff_flag ctxInc (spec 9.3.4.2.5), diagonal scan
int sig_ctx_inc(int xc, int yc, int log2n, int c_idx, int right,
                int below) {
  int sig;
  if (log2n == 2) {
    sig = kSigCtx4x4[(yc << 2) + xc];
  } else if (xc + yc == 0) {
    sig = 0;
  } else {
    int prev = right + 2 * below;
    int xp = xc & 3, yp = yc & 3;
    if (prev == 0) {
      int s = xp + yp;
      sig = s == 0 ? 2 : (s < 3 ? 1 : 0);
    } else if (prev == 1) {
      sig = yp == 0 ? 2 : (yp == 1 ? 1 : 0);
    } else if (prev == 2) {
      sig = xp == 0 ? 2 : (xp == 1 ? 1 : 0);
    } else {
      sig = 2;
    }
    if (c_idx == 0) {
      if ((xc >> 2) + (yc >> 2) > 0) sig += 3;
      sig += log2n == 3 ? 9 : 21;
    } else {
      sig += log2n == 3 ? 9 : 12;
    }
  }
  return sig;
}

// coeff_abs_level_remaining (spec 9.3.3.10)
void write_remaining(Cabac& c, int sym, int rice) {
  if (sym < (3 << rice)) {
    int q = sym >> rice;
    c.encode_bypass_bits((1u << (q + 1)) - 2, q + 1);
    if (rice) c.encode_bypass_bits(sym & ((1 << rice) - 1), rice);
  } else {
    int length = rice;
    sym -= 3 << rice;
    while (sym >= (1 << length)) {
      sym -= 1 << length;
      length++;
    }
    int n_ones = 3 + length + 1 - rice;
    c.encode_bypass_bits((1u << n_ones) - 2, n_ones);
    if (length) c.encode_bypass_bits(sym, length);
  }
}

// residual_coding for one square TU (spec 7.3.8.11; port of
// codec/h265/residual.py:encode_residual)
void encode_residual(Cabac& c, uint8_t* ctx, const int32_t* off,
                     const int16_t* coeffs, int n, int c_idx) {
  int log2n = n == 16 ? 4 : (n == 8 ? 3 : 2);
  int nsb = n / 4;
  const Scan& sub_scan = nsb == 4 ? kScan4 : kScan2;
  int n_subs = nsb * nsb;

  int last_pos = -1, last_x = 0, last_y = 0;
  for (int si = 0; si < n_subs; si++) {
    int sx = sub_scan.x[si], sy = sub_scan.y[si];
    for (int pi = 0; pi < 16; pi++) {
      int x = sx * 4 + kScan4.x[pi];
      int y = sy * 4 + kScan4.y[pi];
      if (coeffs[y * n + x]) {
        last_pos = si * 16 + pi;
        last_x = x;
        last_y = y;
      }
    }
  }

  int ctx_offset, ctx_shift;
  if (c_idx == 0) {
    ctx_offset = 3 * (log2n - 2) + ((log2n - 1) >> 2);
    ctx_shift = (log2n + 1) >> 2;
  } else {
    ctx_offset = 15;
    ctx_shift = log2n - 2;
  }
  int gx = kGroupIdx[last_x], gy = kGroupIdx[last_y];
  int cmax = (log2n << 1) - 1;
  for (int b = 0; b < gx; b++)
    c.encode_bin(ctx, off[OFF_LAST_X] + (b >> ctx_shift) + ctx_offset, 1);
  if (gx < cmax)
    c.encode_bin(ctx, off[OFF_LAST_X] + (gx >> ctx_shift) + ctx_offset, 0);
  for (int b = 0; b < gy; b++)
    c.encode_bin(ctx, off[OFF_LAST_Y] + (b >> ctx_shift) + ctx_offset, 1);
  if (gy < cmax)
    c.encode_bin(ctx, off[OFF_LAST_Y] + (gy >> ctx_shift) + ctx_offset, 0);
  if (gx > 3)
    c.encode_bypass_bits(last_x - kMinInGroup[gx], (gx >> 1) - 1);
  if (gy > 3)
    c.encode_bypass_bits(last_y - kMinInGroup[gy], (gy >> 1) - 1);

  int last_sb = last_pos >> 4;
  int last_in_sb = last_pos & 15;

  uint8_t csbf[8][8] = {};
  for (int si = 0; si <= last_sb; si++) {
    int sx = sub_scan.x[si], sy = sub_scan.y[si];
    int any = 0;
    for (int yy = 0; yy < 4 && !any; yy++)
      for (int xx = 0; xx < 4; xx++)
        if (coeffs[(sy * 4 + yy) * n + sx * 4 + xx]) {
          any = 1;
          break;
        }
    csbf[sy][sx] = static_cast<uint8_t>(any);
  }
  csbf[sub_scan.y[0]][sub_scan.x[0]] = 1;
  csbf[sub_scan.y[last_sb]][sub_scan.x[last_sb]] = 1;

  int gr1_ctx_set_carry = 0;

  for (int si = last_sb; si >= 0; si--) {
    int sx = sub_scan.x[si], sy = sub_scan.y[si];
    int right = sx + 1 < nsb ? csbf[sy][sx + 1] : 0;
    int below = sy + 1 < nsb ? csbf[sy + 1][sx] : 0;

    bool signaled = 0 < si && si < last_sb;
    if (signaled) {
      int inc = ((right || below) ? 1 : 0) + (c_idx ? 2 : 0);
      c.encode_bin(ctx, off[OFF_CSBF] + inc, csbf[sy][sx]);
    }
    if (!csbf[sy][sx]) continue;
    bool infer_dc = signaled;

    int start = si == last_sb ? last_in_sb - 1 : 15;
    int sig_list[16];
    int n_sig = 0;
    if (si == last_sb) sig_list[n_sig++] = last_in_sb;
    for (int pi = start; pi >= 0; pi--) {
      int x = sx * 4 + kScan4.x[pi];
      int y = sy * 4 + kScan4.y[pi];
      int sig = coeffs[y * n + x] != 0;
      if (pi == 0 && infer_dc) {
        bool any_above = false;
        for (int pj = start; pj >= 1; pj--) {
          int xa = sx * 4 + kScan4.x[pj];
          int ya = sy * 4 + kScan4.y[pj];
          if (coeffs[ya * n + xa]) {
            any_above = true;
            break;
          }
        }
        if (!any_above) {
          sig_list[n_sig++] = 0;  // DC inferred significant
          break;
        }
      }
      int base = off[OFF_SIG] + (c_idx == 0 ? 0 : 27);
      int inc = sig_ctx_inc(x, y, log2n, c_idx, right, below);
      c.encode_bin(ctx, base + inc, sig);
      if (sig) sig_list[n_sig++] = pi;
    }

    int levels[16];
    for (int k = 0; k < n_sig; k++) {
      int pi = sig_list[k];
      int x = sx * 4 + kScan4.x[pi];
      int y = sy * 4 + kScan4.y[pi];
      levels[k] = coeffs[y * n + x];
    }

    int ctx_set = ((si == 0 || c_idx > 0) ? 0 : 2) + gr1_ctx_set_carry;
    int gr1_base = off[OFF_GR1] + (c_idx ? 16 : 0) + ctx_set * 4;
    int gr1_ctx = 1;
    int first_gr1_pos = -1;
    for (int k = 0; k < std::min(n_sig, 8); k++) {
      int flag = std::abs(levels[k]) > 1;
      c.encode_bin(ctx, gr1_base + std::min(3, gr1_ctx), flag);
      if (flag) {
        gr1_ctx = 0;
        if (first_gr1_pos < 0) first_gr1_pos = k;
      } else if (gr1_ctx > 0) {
        gr1_ctx++;
      }
    }
    gr1_ctx_set_carry = gr1_ctx == 0 ? 1 : 0;

    int gr2_flag = 0;
    if (first_gr1_pos >= 0) {
      gr2_flag = std::abs(levels[first_gr1_pos]) > 2;
      c.encode_bin(ctx, off[OFF_GR2] + (c_idx ? 4 : 0) + ctx_set,
                   gr2_flag);
    }

    for (int k = 0; k < n_sig; k++)
      c.encode_bypass(levels[k] < 0 ? 1 : 0);

    int rice = 0;
    for (int k = 0; k < n_sig; k++) {
      int a = std::abs(levels[k]);
      bool present;
      int base_level;
      if (k >= 8) {
        present = true;
        base_level = 1;
      } else if (a > 1) {
        if (k == first_gr1_pos) {
          present = gr2_flag == 1;
          base_level = 3;
        } else {
          present = true;
          base_level = 2;
        }
      } else {
        present = false;
        base_level = 1;
      }
      if (present) {
        write_remaining(c, a - base_level, rice);
        if (a > (3 << rice)) rice = std::min(rice + 1, 4);
      }
    }
  }
}

// sao() syntax for one CTB (spec 7.3.8.3; port of
// codec/h265/rowslice.py:_code_sao)
void code_sao(Cabac& c, uint8_t* ctx, const int32_t* off,
              const int32_t* sao, int cx) {
  const int32_t* cur = sao + cx * 18;
  if (cx > 0) {
    const int32_t* left = sao + (cx - 1) * 18;
    bool merge = std::memcmp(cur, left, 18 * sizeof(int32_t)) == 0;
    c.encode_bin(ctx, off[OFF_SAO_MERGE], merge ? 1 : 0);
    if (merge) return;
  }
  for (int ci = 0; ci < 3; ci++) {
    int t = cur[ci * 6 + 0];
    int cls = cur[ci * 6 + 1];
    const int32_t* offs = cur + ci * 6 + 2;
    if (ci < 2) {
      c.encode_bin(ctx, off[OFF_SAO_TYPE], t == 0 ? 0 : 1);
      if (t) c.encode_bypass(t == 2 ? 1 : 0);
    }
    if (t == 0) continue;
    for (int i = 0; i < 4; i++) {
      int a = std::abs(offs[i]);
      for (int k = 0; k < a; k++) c.encode_bypass(1);
      if (a < 7) c.encode_bypass(0);
    }
    if (t == 1) {
      for (int i = 0; i < 4; i++)
        if (offs[i]) c.encode_bypass(offs[i] < 0 ? 1 : 0);
      c.encode_bypass_bits(cls, 5);
    } else if (ci < 2) {
      c.encode_bypass_bits(cls, 2);
    }
  }
}

// transform_tree for a non-skip inter CU with rqt_root_cbf == 1
// (spec 7.3.8.8; port of rowslice._code_inter_transform_tree)
void code_inter_transform_tree(Cabac& c, uint8_t* cs,
                               const int32_t* off, int tu_enabled,
                               int split, const int16_t* ll,
                               const int16_t* lb, const int16_t* lr) {
  if (tu_enabled) {
    // split_transform_flag, ctx 5 - log2TrafoSize(4) = 1
    c.encode_bin(cs, off[OFF_SPLIT_TU] + 1, split ? 1 : 0);
  }
  auto any16 = [](const int16_t* a, int n, int stride, int by,
                  int bx) {
    for (int y = 0; y < n; y++)
      for (int x = 0; x < n; x++)
        if (a[(by + y) * stride + bx + x]) return 1;
    return 0;
  };
  if (!split) {
    int cbf_l = any16(ll, 16, 16, 0, 0);
    int cbf_b = any16(lb, 8, 8, 0, 0);
    int cbf_r = any16(lr, 8, 8, 0, 0);
    c.encode_bin(cs, off[OFF_CBF_CHROMA], cbf_b);
    c.encode_bin(cs, off[OFF_CBF_CHROMA], cbf_r);
    if (cbf_b || cbf_r) c.encode_bin(cs, off[OFF_CBF_LUMA] + 1, cbf_l);
    if (cbf_l) encode_residual(c, cs, off, ll, 16, 0);
    if (cbf_b) encode_residual(c, cs, off, lb, 8, 1);
    if (cbf_r) encode_residual(c, cs, off, lr, 8, 2);
    return;
  }
  int cbf_b0 = any16(lb, 8, 8, 0, 0);
  int cbf_r0 = any16(lr, 8, 8, 0, 0);
  c.encode_bin(cs, off[OFF_CBF_CHROMA], cbf_b0);
  c.encode_bin(cs, off[OFF_CBF_CHROMA], cbf_r0);
  // z-order children: TL, TR, BL, BR
  static const int boff[4][2] = {{0, 0}, {0, 1}, {1, 0}, {1, 1}};
  for (int k = 0; k < 4; k++) {
    int by = boff[k][0], bx = boff[k][1];
    int cbf_b1 = any16(lb, 4, 8, by * 4, bx * 4);
    int cbf_r1 = any16(lr, 4, 8, by * 4, bx * 4);
    if (cbf_b0) c.encode_bin(cs, off[OFF_CBF_CHROMA] + 1, cbf_b1);
    if (cbf_r0) c.encode_bin(cs, off[OFF_CBF_CHROMA] + 1, cbf_r1);
    int cbf_l1 = any16(ll, 8, 16, by * 8, bx * 8);
    c.encode_bin(cs, off[OFF_CBF_LUMA], cbf_l1);  // leaf depth 1
    // gather the sub-blocks into contiguous buffers for the coder
    if (cbf_l1) {
      int16_t sub[64];
      for (int y = 0; y < 8; y++)
        for (int x = 0; x < 8; x++)
          sub[y * 8 + x] = ll[(by * 8 + y) * 16 + bx * 8 + x];
      encode_residual(c, cs, off, sub, 8, 0);
    }
    if (cbf_b0 && cbf_b1) {
      int16_t sub[16];
      for (int y = 0; y < 4; y++)
        for (int x = 0; x < 4; x++)
          sub[y * 4 + x] = lb[(by * 4 + y) * 8 + bx * 4 + x];
      encode_residual(c, cs, off, sub, 4, 1);
    }
    if (cbf_r0 && cbf_r1) {
      int16_t sub[16];
      for (int y = 0; y < 4; y++)
        for (int x = 0; x < 4; x++)
          sub[y * 4 + x] = lr[(by * 4 + y) * 8 + bx * 4 + x];
      encode_residual(c, cs, off, sub, 4, 2);
    }
  }
}

// MPM list (spec 8.4.2; port of codec/h265/encoder.py:_mpm_list)
void mpm_list(int a, int b, int mpm[3]) {
  if (a == b) {
    if (a < 2) {
      mpm[0] = 0;
      mpm[1] = 1;
      mpm[2] = 26;
    } else {
      mpm[0] = a;
      mpm[1] = 2 + ((a + 29) % 32);
      mpm[2] = 2 + ((a - 2 + 1) % 32);
    }
    return;
  }
  mpm[0] = a;
  mpm[1] = b;
  for (int m : {0, 1, 26}) {
    if (m != a && m != b) {
      mpm[2] = m;
      return;
    }
  }
}

// mvd_coding (spec 7.3.8.9; port of codec/h265/inter.py:encode_mvd)
void encode_eg1(Cabac& c, int value) {
  int k = 1;
  while (value >= (1 << k)) {
    c.encode_bypass(1);
    value -= 1 << k;
    k++;
  }
  c.encode_bypass(0);
  for (int b = k - 1; b >= 0; b--) c.encode_bypass((value >> b) & 1);
}

void encode_mvd(Cabac& c, uint8_t* ctx, const int32_t* off, int mvd_x,
                int mvd_y) {
  int comps[2] = {mvd_x, mvd_y};
  int gr0[2] = {mvd_x != 0, mvd_y != 0};
  int gr1[2] = {std::abs(mvd_x) > 1, std::abs(mvd_y) > 1};
  c.encode_bin(ctx, off[OFF_MVD_GR] + 0, gr0[0]);
  c.encode_bin(ctx, off[OFF_MVD_GR] + 0, gr0[1]);
  if (gr0[0]) c.encode_bin(ctx, off[OFF_MVD_GR] + 1, gr1[0]);
  if (gr0[1]) c.encode_bin(ctx, off[OFF_MVD_GR] + 1, gr1[1]);
  for (int i = 0; i < 2; i++) {
    if (!gr0[i]) continue;
    if (gr1[i]) encode_eg1(c, std::abs(comps[i]) - 2);
    c.encode_bypass(comps[i] < 0 ? 1 : 0);
  }
}

struct RowArgs {
  int ncw, idr, is_b;
  int tile_mode, last_row;  // tile substream vs standalone slice
  int tu_split_enabled;     // SPS max_transform_hierarchy_depth_inter
  const uint8_t* tu_split;  // (ncw,) per-CTB split flag, or null
  const int32_t* sao;       // (ncw, 3, 6) per-CTB params, or null
  const uint8_t* hdr_bytes;  // this row's packed header bits
  int hdr_bits;
  const uint8_t* ctx_init;  // initialized context states (n_ctx)
  int n_ctx;
  const int32_t* off;  // OFF_COUNT offsets
  const uint8_t* is_intra;
  const int32_t* mode;
  const int32_t* mv;        // (ncw, 2) qpel dy,dx (list 0)
  const int32_t* mv1;       // (ncw, 2) list 1 (B slices; else null)
  const int16_t* luma_lv;   // (ncw, 256)
  const int16_t* cb_lv;     // (ncw, 64)
  const int16_t* cr_lv;     // (ncw, 64)
};

// Encode one CTB-row slice; returns the RBSP bytes.
std::vector<uint8_t> encode_row(const RowArgs& a) {
  Cabac c;
  // raw slice header bits (byte-aligned by construction)
  for (int i = 0; i < a.hdr_bits; i += 8) {
    int nb = std::min(8, a.hdr_bits - i);
    c.bb.put(a.hdr_bytes[i / 8] >> (8 - nb), nb);
  }
  std::vector<uint8_t> ctx(a.ctx_init, a.ctx_init + a.n_ctx);
  uint8_t* cs = ctx.data();
  const int32_t* off = a.off;

  int left_mode = 1;  // DC
  bool left_is_intra = false, left_is_inter = false, left_skip = false;
  int left_mv[2][2] = {{0, 0}, {0, 0}};  // per list

  for (int cx = 0; cx < a.ncw; cx++) {
    if (a.sao) code_sao(c, cs, off, a.sao, cx);
    bool intra_cu = a.is_intra[cx] != 0;
    const int16_t* ll = a.luma_lv + cx * 256;
    const int16_t* lb = a.cb_lv + cx * 64;
    const int16_t* lr = a.cr_lv + cx * 64;
    int cbf_l = 0, cbf_b = 0, cbf_r = 0;
    for (int i = 0; i < 256 && !cbf_l; i++) cbf_l = ll[i] != 0;
    for (int i = 0; i < 64 && !cbf_b; i++) cbf_b = lb[i] != 0;
    for (int i = 0; i < 64 && !cbf_r; i++) cbf_r = lr[i] != 0;
    int any_cbf = cbf_l || cbf_b || cbf_r;

    // merge candidates: A1 (left, same slice; full bi motion in B
    // slices) else zero fill
    int merge[2][2][2] = {{{0, 0}, {0, 0}}, {{0, 0}, {0, 0}}};
    if (left_is_inter) {
      for (int l2 = 0; l2 < 2; l2++) {
        merge[0][l2][0] = left_mv[l2][0];
        merge[0][l2][1] = left_mv[l2][1];
      }
    }

    if (intra_cu) {
      if (!a.idr) {
        c.encode_bin(cs, off[OFF_SKIP] + (left_skip ? 1 : 0), 0);
        c.encode_bin(cs, off[OFF_PRED_MODE], 1);
      }
      int m = a.mode[cx];
      c.encode_bin(cs, off[OFF_PART_MODE], 1);
      int cand_a = left_is_intra ? left_mode : 1;
      int mpm[3] = {0, 1, 26};
      mpm_list(cand_a, 1, mpm);
      int idx = m == mpm[0] ? 0 : (m == mpm[1] ? 1 : (m == mpm[2] ? 2 : -1));
      if (idx >= 0) {
        c.encode_bin(cs, off[OFF_PREV_INTRA], 1);
        c.encode_bypass(idx == 0 ? 0 : 1);
        if (idx) c.encode_bypass(idx - 1);
      } else {
        c.encode_bin(cs, off[OFF_PREV_INTRA], 0);
        int rem = m;
        int sorted_mpm[3] = {mpm[0], mpm[1], mpm[2]};
        std::sort(sorted_mpm, sorted_mpm + 3);
        for (int s : sorted_mpm)
          if (s < m) rem--;
        c.encode_bypass_bits(rem, 5);
      }
      c.encode_bin(cs, off[OFF_CHROMA_PRED], 0);
      c.encode_bin(cs, off[OFF_CBF_CHROMA], cbf_b);
      c.encode_bin(cs, off[OFF_CBF_CHROMA], cbf_r);
      c.encode_bin(cs, off[OFF_CBF_LUMA] + 1, cbf_l);
      if (cbf_l) encode_residual(c, cs, off, ll, 16, 0);
      if (cbf_b) encode_residual(c, cs, off, lb, 8, 1);
      if (cbf_r) encode_residual(c, cs, off, lr, 8, 2);
      left_mode = m;
      left_is_intra = true;
      left_is_inter = false;
      left_skip = false;
    } else {
      int mvq[2][2] = {{a.mv[cx * 2], a.mv[cx * 2 + 1]}, {0, 0}};
      if (a.is_b) {
        mvq[1][0] = a.mv1[cx * 2];
        mvq[1][1] = a.mv1[cx * 2 + 1];
      }
      int merge_idx = -1;
      for (int k = 0; k < 2; k++)
        if (merge[k][0][0] == mvq[0][0] && merge[k][0][1] == mvq[0][1] &&
            merge[k][1][0] == mvq[1][0] && merge[k][1][1] == mvq[1][1]) {
          merge_idx = k;
          break;
        }
      int skip_ctx = off[OFF_SKIP] + (left_skip ? 1 : 0);
      if (merge_idx >= 0 && !any_cbf) {
        c.encode_bin(cs, skip_ctx, 1);
        c.encode_bin(cs, off[OFF_MERGE_IDX], merge_idx);
        left_skip = true;
      } else {
        c.encode_bin(cs, skip_ctx, 0);
        c.encode_bin(cs, off[OFF_PRED_MODE], 0);
        c.encode_bin(cs, off[OFF_PART_MODE], 1);
        if (merge_idx >= 0) {
          c.encode_bin(cs, off[OFF_MERGE_FLAG], 1);
          c.encode_bin(cs, off[OFF_MERGE_IDX], merge_idx);
        } else {
          c.encode_bin(cs, off[OFF_MERGE_FLAG], 0);
          if (a.is_b) {
            // inter_pred_idc = PRED_BI: one bin, ctx by ct depth (0)
            c.encode_bin(cs, off[OFF_INTER_PRED_IDC], 1);
          }
          int n_lists = a.is_b ? 2 : 1;
          for (int lx = 0; lx < n_lists; lx++) {
            int amvp[2][2] = {{0, 0}, {0, 0}};
            if (left_is_inter) {
              amvp[0][0] = left_mv[lx][0];
              amvp[0][1] = left_mv[lx][1];
            }
            int cost0 = std::abs(mvq[lx][0] - amvp[0][0]) +
                        std::abs(mvq[lx][1] - amvp[0][1]);
            int cost1 = std::abs(mvq[lx][0]) + std::abs(mvq[lx][1]);
            int mvp_idx = cost0 <= cost1 ? 0 : 1;
            encode_mvd(c, cs, off, mvq[lx][1] - amvp[mvp_idx][1],
                       mvq[lx][0] - amvp[mvp_idx][0]);
            c.encode_bin(cs, off[OFF_MVP_FLAG], mvp_idx);
          }
          c.encode_bin(cs, off[OFF_RQT_ROOT_CBF], any_cbf ? 1 : 0);
        }
        if (any_cbf) {
          int split = a.tu_split ? a.tu_split[cx] : 0;
          code_inter_transform_tree(c, cs, off, a.tu_split_enabled,
                                    split, ll, lb, lr);
        }
        left_skip = false;
      }
      left_is_intra = false;
      left_is_inter = true;
      for (int l2 = 0; l2 < 2; l2++) {
        left_mv[l2][0] = mvq[l2][0];
        left_mv[l2][1] = mvq[l2][1];
      }
    }
    if (cx < a.ncw - 1) {
      c.encode_terminate(0);   // end_of_slice_segment_flag
    } else if (!a.tile_mode || a.last_row) {
      c.encode_terminate(1);   // true slice end
    } else {
      // tile end: end_of_slice_segment_flag = 0, then
      // end_of_subset_one_bit = 1 + byte alignment
      c.encode_terminate(0);
      c.encode_terminate(1);
    }
  }
  c.finish();
  c.align_one();
  return std::move(c.bb.buf);
}

}  // namespace

extern "C" {

// Encode nch independent CTB-row slices. hdr_bytes is (nch,
// hdr_stride) packed header bitstrings with per-row bit counts
// hdr_bits. Outputs all row RBSPs concatenated into `out` with sizes
// in row_sizes. Returns total bytes, or -1 on insufficient capacity.
int64_t hevc_entropy_rows(int nch, int ncw, int idr, int is_b,
                          int tile_mode, int tu_split_enabled,
                          const uint8_t* tu_split,
                          const int32_t* sao,
                          const uint8_t* hdr_bytes,
                          const int32_t* hdr_bits, int hdr_stride,
                          const uint8_t* ctx_init, int n_ctx,
                          const int32_t* off, const uint8_t* is_intra,
                          const int32_t* mode, const int32_t* mv,
                          const int32_t* mv1,
                          const int16_t* luma_lv, const int16_t* cb_lv,
                          const int16_t* cr_lv, uint8_t* out,
                          int64_t out_cap, int32_t* row_sizes,
                          int n_threads) {
  std::vector<std::vector<uint8_t>> rows(nch);
  auto work = [&](int t, int nt) {
    for (int cy = t; cy < nch; cy += nt) {
      RowArgs a;
      a.ncw = ncw;
      a.idr = idr;
      a.is_b = is_b;
      a.tile_mode = tile_mode;
      a.last_row = cy == nch - 1;
      a.tu_split_enabled = tu_split_enabled;
      a.tu_split = tu_split
          ? tu_split + static_cast<int64_t>(cy) * ncw : nullptr;
      a.sao = sao ? sao + static_cast<int64_t>(cy) * ncw * 18 : nullptr;
      a.hdr_bytes = hdr_bytes + static_cast<int64_t>(cy) * hdr_stride;
      a.hdr_bits = hdr_bits[cy];
      a.ctx_init = ctx_init;
      a.n_ctx = n_ctx;
      a.off = off;
      a.is_intra = is_intra + static_cast<int64_t>(cy) * ncw;
      a.mode = mode + static_cast<int64_t>(cy) * ncw;
      a.mv = mv + static_cast<int64_t>(cy) * ncw * 2;
      a.mv1 = is_b ? mv1 + static_cast<int64_t>(cy) * ncw * 2 : nullptr;
      a.luma_lv = luma_lv + static_cast<int64_t>(cy) * ncw * 256;
      a.cb_lv = cb_lv + static_cast<int64_t>(cy) * ncw * 64;
      a.cr_lv = cr_lv + static_cast<int64_t>(cy) * ncw * 64;
      rows[cy] = encode_row(a);
    }
  };
  int nt = std::max(1, std::min(n_threads, nch));
  if (nt == 1) {
    work(0, 1);
  } else {
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; t++) ts.emplace_back(work, t, nt);
    for (auto& th : ts) th.join();
  }
  int64_t total = 0;
  for (int cy = 0; cy < nch; cy++) total += rows[cy].size();
  if (total > out_cap) return -1;
  int64_t pos = 0;
  for (int cy = 0; cy < nch; cy++) {
    std::memcpy(out + pos, rows[cy].data(), rows[cy].size());
    row_sizes[cy] = static_cast<int32_t>(rows[cy].size());
    pos += rows[cy].size();
  }
  return total;
}

}  // extern "C"
