// H.264 CABAC entropy stage: arithmetic engine + MB-layer syntax from
// flat per-frame arrays, one independent slice per MB row.
//
// Production twin of the executable spec in
// ceracoder_tpu/codec/h264/cabac.py (H264RowCabac) +
// cabac_assemble.py; byte equality with it is enforced by
// tests/test_h264_cabac_native.py. Rows are data-independent and are
// coded in parallel worker threads, same pattern as hevc_entropy.cc.
//
// Replaces the entropy stage of the reference's x264enc default CABAC
// mode (reference: bindings/typescript/src/pipeline/
// generic-builder.ts:49-55).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#include "hevc_tables.inc"   // kLpsTable / kNextState (shared M-coder)
#include "h264_tables.inc"   // kH264InitI / kH264InitPB / kLumaSnake

namespace {

// ---------------------------------------------------------------------------
// Arithmetic engine (spec 9.3.4.3-9.3.4.6; exact port of
// cabac.py:H264ArithEncoder — 10-bit codILow, PutBit carry chain,
// H.264 EncodeFlush with the rbsp stop bit folded in)
// ---------------------------------------------------------------------------

struct Engine {
  std::vector<uint8_t>* out;
  uint32_t acc = 0;
  int nacc = 0;
  uint32_t low = 0;
  uint32_t range = 510;
  bool first = true;
  int outstanding = 0;

  void bit(int b) {
    acc = (acc << 1) | static_cast<uint32_t>(b);
    if (++nacc == 8) {
      out->push_back(static_cast<uint8_t>(acc));
      acc = 0;
      nacc = 0;
    }
  }
  void put(int b) {
    if (first) {
      first = false;
    } else {
      bit(b);
    }
    while (outstanding) {
      bit(1 - b);
      --outstanding;
    }
  }
  void renorm() {
    while (range < 256) {
      if (low >= 512) {
        put(1);
        low -= 512;
      } else if (low < 256) {
        put(0);
      } else {
        ++outstanding;
        low -= 256;
      }
      range <<= 1;
      low <<= 1;
    }
  }
  void encode(uint8_t* ctx, int idx, int binval) {
    int state = ctx[idx];
    int ps = state >> 1;
    int mps = state & 1;
    uint32_t lps = kLpsTable[ps][(range >> 6) & 3];
    range -= lps;
    if (binval != mps) {
      low += range;
      range = lps;
    }
    ctx[idx] = kNextState[state][binval];
    renorm();
  }
  void bypass(int binval) {
    low <<= 1;
    if (binval) low += range;
    if (low >= 1024) {
      put(1);
      low -= 1024;
    } else if (low < 512) {
      put(0);
    } else {
      ++outstanding;
      low -= 512;
    }
  }
  void terminate0() {
    range -= 2;
    renorm();
  }
  void flush() {
    // final end_of_slice_flag = 1 folded into EncodeFlush: stop bit at
    // the window LSB, whole 10-bit window emitted, zero-pad to byte
    range -= 2;
    low += range;
    low |= 1;
    for (int k = 9; k >= 0; --k) put((low >> k) & 1);
    if (nacc) {
      out->push_back(static_cast<uint8_t>(acc << (8 - nacc)));
      acc = 0;
      nacc = 0;
    }
  }
};

// residual ctx bases per ctxBlockCat (Tables 9-40)
static const int kCbfBase[5] = {85, 89, 93, 97, 101};
static const int kSigBase[5] = {105, 120, 134, 149, 152};
static const int kLastBase[5] = {166, 181, 195, 210, 213};
static const int kAbsBase[5] = {227, 237, 247, 257, 266};

// left-neighbor state for the row slice (above row is outside the
// slice and unavailable by 6.4.9 — matches cabac.py's model)
struct Left {
  bool avail = false;
  bool skip = false;
  bool intra = false;
  bool intra16 = false;
  bool mbt_not_inxn = false;
  int dc_cbf = 0;
  int luma_cbf[4][4] = {};
  int mvd_y = 0, mvd_x = 0;
  int cbp_luma = 0;
  int cbp_chroma = 0;
  int cdc_cbf[2] = {};
  int cac_cbf[2][2][2] = {};
  bool chroma_nz = false;
};

struct RowCoder {
  Engine e;
  uint8_t ctx[1024];
  bool intra_slice;
  Left lt;
  int prev_qp_delta = 0;
  // scratch for the MB being coded
  int cur_luma_cbf[4][4];
  int cur_cdc_cbf[2];
  int cur_cac_cbf[2][2][2];

  void init(int slice_qp, bool intra, int init_idc,
            std::vector<uint8_t>* out) {
    intra_slice = intra;
    e.out = out;
    const int8_t(*tab)[2] =
        intra ? kH264InitI : kH264InitPB[init_idc];
    int qp = std::min(std::max(slice_qp, 0), 51);
    for (int i = 0; i < 1024; ++i) {
      int pre = ((tab[i][0] * qp) >> 4) + tab[i][1];
      pre = std::min(std::max(pre, 1), 126);
      ctx[i] = pre <= 63 ? static_cast<uint8_t>((63 - pre) << 1)
                         : static_cast<uint8_t>(((pre - 64) << 1) | 1);
    }
  }

  void b(int idx, int val) { e.encode(ctx, idx, val); }

  void qp_delta(int dqp) {
    int mapped = 2 * (dqp < 0 ? -dqp : dqp) - (dqp > 0 ? 1 : 0);
    int idx0 = 60 + (prev_qp_delta != 0 ? 1 : 0);
    if (mapped == 0) {
      b(idx0, 0);
    } else {
      b(idx0, 1);
      for (int k = 1; k < mapped; ++k) b(k == 1 ? 62 : 63, 1);
      b(mapped == 1 ? 62 : 63, 0);
    }
    prev_qp_delta = dqp;
  }

  // coeffs in scan order, length n; returns cbf
  int residual(int cat, const int16_t* coeffs, int n, int cbf_inc) {
    int last = -1;
    for (int i = 0; i < n; ++i)
      if (coeffs[i]) last = i;
    if (cbf_inc >= 0) {
      b(kCbfBase[cat] + cbf_inc, last >= 0 ? 1 : 0);
      if (last < 0) return 0;
    }
    int sig_base = kSigBase[cat];
    int last_base = kLastBase[cat];
    int lim = std::min(last + 1, n - 1);
    for (int i = 0; i < lim; ++i) {
      int sig = coeffs[i] ? 1 : 0;
      int inc = cat != 3 ? i : std::min(i, 3);
      b(sig_base + inc, sig);
      if (sig) b(last_base + inc, i == last ? 1 : 0);
    }
    int gt1 = 0, eq1 = 0;
    int abs_base = kAbsBase[cat];
    for (int i = last; i >= 0; --i) {
      if (!coeffs[i]) continue;
      int lvl = coeffs[i];
      int v = (lvl < 0 ? -lvl : lvl) - 1;
      int idx0 = abs_base + (gt1 ? 0 : std::min(4, 1 + eq1));
      int rest = abs_base + 5 + std::min(cat == 3 ? 3 : 4, gt1);
      if (v == 0) {
        b(idx0, 0);
        ++eq1;
      } else {
        b(idx0, 1);
        if (v < 14) {
          for (int k = 0; k < v - 1; ++k) b(rest, 1);
          b(rest, 0);
        } else {
          for (int k = 0; k < 13; ++k) b(rest, 1);
          // UEG0 suffix in bypass
          uint32_t vv = static_cast<uint32_t>(v - 14) + 1;
          int nbits = 0;
          while (vv >> nbits) ++nbits;
          for (int k = 0; k < nbits - 1; ++k) e.bypass(1);
          e.bypass(0);
          for (int k = nbits - 2; k >= 0; --k)
            e.bypass((vv >> k) & 1);
        }
        ++gt1;
      }
      e.bypass(lvl < 0 ? 1 : 0);
    }
    return 1;
  }

  void chroma_pred_mode(int mode_c) {
    int inc = (lt.avail && lt.intra && lt.chroma_nz) ? 1 : 0;
    if (mode_c == 0) {
      b(64 + inc, 0);
    } else {
      b(64 + inc, 1);
      if (mode_c == 1) {
        b(67, 0);
      } else {
        b(67, 1);
        b(67, mode_c == 3 ? 1 : 0);
      }
    }
  }

  void mvd(int v, int base, int left_abs) {
    int inc = left_abs < 3 ? 0 : (left_abs > 32 ? 2 : 1);
    int a = v < 0 ? -v : v;
    int prefix = std::min(a, 9);
    if (prefix == 0) {
      b(base + inc, 0);
      return;
    }
    b(base + inc, 1);
    for (int k = 1; k < prefix; ++k) b(base + 2 + std::min(k, 4), 1);
    if (prefix < 9) {
      b(base + 2 + std::min(prefix, 4), 0);
    } else {
      uint32_t vv = static_cast<uint32_t>(a - 9);
      int k = 3;
      while (vv >= (1u << k)) {
        e.bypass(1);
        vv -= 1u << k;
        ++k;
      }
      e.bypass(0);
      for (int i = k - 1; i >= 0; --i) e.bypass((vv >> i) & 1);
    }
    e.bypass(v < 0 ? 1 : 0);
  }

  void cbp(int cbp_luma, int cbp_chroma) {
    for (int bb = 0; bb < 4; ++bb) {
      int ca, cb;
      if (bb & 1) {
        ca = 1 - ((cbp_luma >> (bb - 1)) & 1);
      } else if (lt.avail) {
        ca = 1 - ((lt.cbp_luma >> (bb + 1)) & 1);
      } else {
        ca = 0;
      }
      if (bb >= 2) {
        cb = 1 - ((cbp_luma >> (bb - 2)) & 1);
      } else {
        cb = 0;
      }
      b(73 + ca + 2 * cb, (cbp_luma >> bb) & 1);
    }
    int ca = (lt.avail && lt.cbp_chroma != 0) ? 1 : 0;
    b(77 + ca, cbp_chroma ? 1 : 0);
    if (cbp_chroma) {
      ca = (lt.avail && lt.cbp_chroma == 2) ? 1 : 0;
      b(81 + ca, cbp_chroma == 2 ? 1 : 0);
    }
  }

  // blocks: (16, ncoef) in snake order; cat 1 (15 AC) or 2 (16 full)
  void luma_blocks(int cat, const int16_t* blocks, int stride,
                   bool intra, int cbp_luma) {
    for (int bi = 0; bi < 16; ++bi) {
      int r = kLumaSnake[bi][0], c = kLumaSnake[bi][1];
      int q = (r / 2) * 2 + (c / 2);
      if (!((cbp_luma >> q) & 1)) continue;
      int ca, cb;
      if (c > 0) {
        ca = cur_luma_cbf[r][c - 1];
      } else if (lt.avail) {
        ca = lt.luma_cbf[r][3];
      } else {
        ca = intra ? 1 : 0;
      }
      if (r > 0) {
        cb = cur_luma_cbf[r - 1][c];
      } else {
        cb = intra ? 1 : 0;
      }
      cur_luma_cbf[r][c] =
          residual(cat, blocks + bi * stride,
                   cat == 1 ? 15 : 16, ca + 2 * cb);
    }
  }

  // cdc: (2,4); cacs: (2,4,15) raster per component
  void chroma_residual(int cbp_chroma, const int16_t* cdc,
                       const int16_t* cacs, bool intra) {
    cur_cdc_cbf[0] = cur_cdc_cbf[1] = 0;
    std::memset(cur_cac_cbf, 0, sizeof(cur_cac_cbf));
    if (cbp_chroma == 0) return;
    for (int comp = 0; comp < 2; ++comp) {
      int ca = lt.avail ? lt.cdc_cbf[comp] : (intra ? 1 : 0);
      int cb = intra ? 1 : 0;
      cur_cdc_cbf[comp] =
          residual(3, cdc + comp * 4, 4, ca + 2 * cb);
    }
    if (cbp_chroma == 2) {
      for (int comp = 0; comp < 2; ++comp) {
        for (int bi = 0; bi < 4; ++bi) {
          int r = bi / 2, c = bi % 2;
          int ca, cb;
          if (c > 0) {
            ca = cur_cac_cbf[comp][r][c - 1];
          } else if (lt.avail) {
            ca = lt.cac_cbf[comp][r][1];
          } else {
            ca = intra ? 1 : 0;
          }
          if (r > 0) {
            cb = cur_cac_cbf[comp][r - 1][c];
          } else {
            cb = intra ? 1 : 0;
          }
          cur_cac_cbf[comp][r][c] = residual(
              4, cacs + (comp * 4 + bi) * 15, 15, ca + 2 * cb);
        }
      }
    }
  }

  void save_left(bool skip, bool intra, bool intra16,
                 bool mbt_not_inxn, int dc_cbf, int mvd_y, int mvd_x,
                 int cbp_luma, int cbp_chroma, bool chroma_nz) {
    lt.avail = true;
    lt.skip = skip;
    lt.intra = intra;
    lt.intra16 = intra16;
    lt.mbt_not_inxn = mbt_not_inxn;
    lt.dc_cbf = dc_cbf;
    std::memcpy(lt.luma_cbf, cur_luma_cbf, sizeof(cur_luma_cbf));
    lt.mvd_y = mvd_y;
    lt.mvd_x = mvd_x;
    lt.cbp_luma = cbp_luma;
    lt.cbp_chroma = cbp_chroma;
    lt.cdc_cbf[0] = cur_cdc_cbf[0];
    lt.cdc_cbf[1] = cur_cdc_cbf[1];
    std::memcpy(lt.cac_cbf, cur_cac_cbf, sizeof(cur_cac_cbf));
    lt.chroma_nz = chroma_nz;
  }

  void mb_i16(int mode_l, int mode_c, int dqp, int cbp_luma,
              int cbp_chroma, const int16_t* dc, const int16_t* acs,
              const int16_t* cdc, const int16_t* cacs) {
    if (!intra_slice) {
      int inc = (lt.avail && !lt.skip) ? 1 : 0;
      b(11 + inc, 0);
    }
    std::memset(cur_luma_cbf, 0, sizeof(cur_luma_cbf));
    if (intra_slice) {
      int inc = (lt.avail && lt.mbt_not_inxn) ? 1 : 0;
      b(3 + inc, 1);
      e.terminate0();
      b(6, cbp_luma ? 1 : 0);
      if (cbp_chroma == 0) {
        b(7, 0);
      } else {
        b(7, 1);
        b(8, cbp_chroma == 2 ? 1 : 0);
      }
      b(9, (mode_l >> 1) & 1);
      b(10, mode_l & 1);
    } else {
      b(14, 1);
      b(17, 1);
      e.terminate0();
      b(18, cbp_luma ? 1 : 0);
      if (cbp_chroma == 0) {
        b(19, 0);
      } else {
        b(19, 1);
        b(19, cbp_chroma == 2 ? 1 : 0);
      }
      b(20, (mode_l >> 1) & 1);
      b(20, mode_l & 1);
    }
    chroma_pred_mode(mode_c);
    qp_delta(dqp);
    int ca;
    if (!lt.avail) {
      ca = 1;
    } else if (lt.intra16) {
      ca = lt.dc_cbf;
    } else {
      ca = 0;
    }
    int dc_cbf = residual(0, dc, 16, ca + 2 * 1);
    if (cbp_luma) luma_blocks(1, acs, 15, true, 15);
    chroma_residual(cbp_chroma, cdc, cacs, true);
    save_left(false, true, true, true, dc_cbf, 0, 0, cbp_luma,
              cbp_chroma, mode_c != 0);
  }

  void mb_p16(int mvd_y, int mvd_x, int dqp, int cbp_luma,
              int cbp_chroma, const int16_t* blocks,
              const int16_t* cdc, const int16_t* cacs) {
    int inc = (lt.avail && !lt.skip) ? 1 : 0;
    b(11 + inc, 0);
    b(14, 0);
    b(15, 0);
    b(16, 0);
    mvd(mvd_x, 40, lt.avail ? std::abs(lt.mvd_x) : 0);
    mvd(mvd_y, 47, lt.avail ? std::abs(lt.mvd_y) : 0);
    cbp(cbp_luma, cbp_chroma);
    if (cbp_luma || cbp_chroma) {
      qp_delta(dqp);
    } else {
      prev_qp_delta = 0;
    }
    std::memset(cur_luma_cbf, 0, sizeof(cur_luma_cbf));
    if (cbp_luma) luma_blocks(2, blocks, 16, false, cbp_luma);
    chroma_residual(cbp_chroma, cdc, cacs, false);
    save_left(false, false, false, true, 0, mvd_y, mvd_x, cbp_luma,
              cbp_chroma, false);
  }

  void mb_skip() {
    int inc = (lt.avail && !lt.skip) ? 1 : 0;
    b(11 + inc, 1);
    std::memset(cur_luma_cbf, 0, sizeof(cur_luma_cbf));
    cur_cdc_cbf[0] = cur_cdc_cbf[1] = 0;
    std::memset(cur_cac_cbf, 0, sizeof(cur_cac_cbf));
    save_left(true, false, false, true, 0, 0, 0, 0, 0, false);
    prev_qp_delta = 0;
  }
};

}  // namespace

extern "C" {

// Encode mbh independent MB-row CABAC slices. hdr_bytes is (mbh,
// hdr_stride) whole-byte slice headers (cabac alignment included).
// When intra != 0: mode_l/mode_c (mbh*mbw), dc_luma (..,16) scan
// order, ac_luma (..,16,15) snake, dc_chroma (..,2,4), ac_chroma
// (..,2,4,15). When intra == 0: skip (mbh*mbw u8) is the per-MB KIND
// (0 = coded inter, 1 = P_Skip, 2 = Intra_16x16 fallback), mvd (..,2
// int32 dy,dx), luma_lv (..,16,16) snake, dc_chroma/ac_chroma as
// above; kind-2 MBs additionally read mode_l/mode_c/dc_luma/ac_luma
// (non-NULL only when the frame has intra MBs).
// Outputs all row slices (header + payload) concatenated into `out`
// with per-row byte sizes in row_sizes. Returns total bytes, or -1 on
// insufficient capacity.
int64_t h264_cabac_rows(int mbh, int mbw, int intra, int init_idc,
                        int slice_qp, const uint8_t* hdr_bytes,
                        const int32_t* hdr_sizes, int hdr_stride,
                        const int32_t* mode_l, const int32_t* mode_c,
                        const int16_t* dc_luma, const int16_t* ac_luma,
                        const uint8_t* skip, const int32_t* mvd,
                        const int16_t* luma_lv,
                        const int16_t* dc_chroma,
                        const int16_t* ac_chroma, uint8_t* out,
                        int64_t out_cap, int32_t* row_sizes,
                        int n_threads) {
  std::vector<std::vector<uint8_t>> rows(mbh);
  auto work = [&](int t, int nt) {
    for (int row = t; row < mbh; row += nt) {
      std::vector<uint8_t>& o = rows[row];
      o.assign(hdr_bytes + static_cast<int64_t>(row) * hdr_stride,
               hdr_bytes + static_cast<int64_t>(row) * hdr_stride +
                   hdr_sizes[row]);
      RowCoder rc;
      rc.init(slice_qp, intra != 0, init_idc, &o);
      for (int col = 0; col < mbw; ++col) {
        int64_t mb = static_cast<int64_t>(row) * mbw + col;
        if (intra) {
          const int16_t* acs = ac_luma + mb * 16 * 15;
          int cbp_luma = 0;
          for (int k = 0; k < 16 * 15 && !cbp_luma; ++k)
            if (acs[k]) cbp_luma = 15;
          const int16_t* cdc = dc_chroma + mb * 2 * 4;
          const int16_t* cacs = ac_chroma + mb * 2 * 4 * 15;
          int any_cac = 0, any_cdc = 0;
          for (int k = 0; k < 2 * 4 * 15 && !any_cac; ++k)
            if (cacs[k]) any_cac = 1;
          for (int k = 0; k < 8 && !any_cdc; ++k)
            if (cdc[k]) any_cdc = 1;
          int cbp_chroma = any_cac ? 2 : (any_cdc ? 1 : 0);
          rc.mb_i16(mode_l[mb], mode_c[mb], 0, cbp_luma, cbp_chroma,
                    dc_luma + mb * 16, acs, cdc, cacs);
        } else if (skip[mb] == 2) {
          // Intra_16x16 fallback MB in a P slice
          const int16_t* dcp = dc_luma + mb * 16;
          const int16_t* acs = ac_luma + mb * 16 * 15;
          int cbp_luma = 0;
          for (int k = 0; k < 16 * 15 && !cbp_luma; ++k)
            if (acs[k]) cbp_luma = 15;
          const int16_t* cdc = dc_chroma + mb * 2 * 4;
          const int16_t* cacs = ac_chroma + mb * 2 * 4 * 15;
          int any_cac = 0, any_cdc = 0;
          for (int k = 0; k < 2 * 4 * 15 && !any_cac; ++k)
            if (cacs[k]) any_cac = 1;
          for (int k = 0; k < 8 && !any_cdc; ++k)
            if (cdc[k]) any_cdc = 1;
          int cbp_chroma = any_cac ? 2 : (any_cdc ? 1 : 0);
          rc.mb_i16(mode_l[mb], mode_c[mb], 0, cbp_luma, cbp_chroma,
                    dcp, acs, cdc, cacs);
        } else if (skip[mb]) {
          rc.mb_skip();
        } else {
          const int16_t* blocks = luma_lv + mb * 16 * 16;
          int cbp_luma = 0;
          for (int bi = 0; bi < 16; ++bi) {
            int nz = 0;
            for (int k = 0; k < 16; ++k)
              if (blocks[bi * 16 + k]) nz = 1;
            if (nz) {
              int r = kLumaSnake[bi][0], c = kLumaSnake[bi][1];
              cbp_luma |= 1 << ((r / 2) * 2 + (c / 2));
            }
          }
          const int16_t* cdc = dc_chroma + mb * 2 * 4;
          const int16_t* cacs = ac_chroma + mb * 2 * 4 * 15;
          int any_cac = 0, any_cdc = 0;
          for (int k = 0; k < 2 * 4 * 15 && !any_cac; ++k)
            if (cacs[k]) any_cac = 1;
          for (int k = 0; k < 8 && !any_cdc; ++k)
            if (cdc[k]) any_cdc = 1;
          int cbp_chroma = any_cac ? 2 : (any_cdc ? 1 : 0);
          rc.mb_p16(mvd[mb * 2], mvd[mb * 2 + 1], 0, cbp_luma,
                    cbp_chroma, blocks, cdc, cacs);
        }
        if (col < mbw - 1) rc.e.terminate0();  // end_of_slice_flag 0
      }
      rc.e.flush();
    }
  };
  int nt = std::max(1, std::min(n_threads, mbh));
  if (nt == 1) {
    work(0, 1);
  } else {
    std::vector<std::thread> th;
    th.reserve(nt);
    for (int t = 0; t < nt; ++t) th.emplace_back(work, t, nt);
    for (auto& x : th) x.join();
  }
  int64_t total = 0;
  for (int row = 0; row < mbh; ++row) {
    int64_t sz = static_cast<int64_t>(rows[row].size());
    if (total + sz > out_cap) return -1;
    std::memcpy(out + total, rows[row].data(), sz);
    row_sizes[row] = static_cast<int32_t>(sz);
    total += sz;
  }
  return total;
}

}  // extern "C"
