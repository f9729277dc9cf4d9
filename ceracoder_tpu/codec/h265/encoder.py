"""HEVC encoder — stage 0: all-PCM intra frames.

The PCM path exercises every structural layer (NAL framing, parameter
sets, slice header, CABAC engine incl. terminate bins, engine re-init
after PCM, alignment) with only ONE context-coded syntax element
(part_mode), and the output decodes losslessly — the independent
libavcodec decoder must return the input samples exactly. This is the
HEVC analog of the H.264 I_PCM stage (codec/h264/ipcm.py) and the
validation anchor that the residual-coding stages build on
(SURVEY.md §7.3 hard part #1).

Mirrors the capability of the reference's external HEVC encoder
elements at their lossless operating point (reference: pipeline/
*h265* pipelines; SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

from ceracoder_tpu.codec.h265.cabac import CabacEncoder, init_context
from ceracoder_tpu.codec.h265.syntax import (
    NAL_IDR_W_RADL,
    HevcParams,
    nal_unit,
    slice_header_bits,
    write_pps,
    write_sps,
    write_vps,
)

# part_mode ctxIdx 0 initValue for I slices (spec Table 9-12 initType 0)
INIT_PART_MODE_I = 184


class H265PcmEncoder:
    """All-PCM IDR encoder: lossless, one slice per frame, 16x16 CTBs."""

    def __init__(self, width: int, height: int):
        self.width, self.height = width, height
        self.params = HevcParams(width=width, height=height)
        ctb = self.params.ctb
        self.pw = -(-width // ctb) * ctb
        self.ph = -(-height // ctb) * ctb

    def headers(self) -> bytes:
        p = self.params
        return write_vps(p) + write_sps(p) + write_pps(p)

    def encode_frame(self, y: np.ndarray, u: np.ndarray,
                     v: np.ndarray) -> bytes:
        """Encode one IDR frame; planes are edge-padded to CTB size."""
        p = self.params
        ctb = p.ctb
        y = _pad(y, self.ph, self.pw)
        u = _pad(u, self.ph // 2, self.pw // 2)
        v = _pad(v, self.ph // 2, self.pw // 2)

        hdr = slice_header_bits(p, idr=True)
        enc = CabacEncoder()
        hv, hl = hdr.arrays()
        for val, n in zip(hv.tolist(), hl.tolist()):
            enc.write_raw(int(val), int(n))

        ctx = np.array([init_context(INIT_PART_MODE_I, p.qp)], np.uint8)
        n_ctb_w = self.pw // ctb
        n_ctb_h = self.ph // ctb
        n_ctbs = n_ctb_w * n_ctb_h
        for i in range(n_ctbs):
            cy, cx = divmod(i, n_ctb_w)
            # coding_unit at CTB==minCB: part_mode (2Nx2N) then pcm_flag
            enc.encode_bin(ctx, 0, 1)          # part_mode: 2Nx2N
            enc.encode_terminate(1)            # pcm_flag = 1
            enc.finish()
            enc.align_one()                    # pcm_alignment (stop+zeros)
            yb = y[cy * ctb:(cy + 1) * ctb, cx * ctb:(cx + 1) * ctb]
            ub = u[cy * ctb // 2:(cy + 1) * ctb // 2,
                   cx * ctb // 2:(cx + 1) * ctb // 2]
            vb = v[cy * ctb // 2:(cy + 1) * ctb // 2,
                   cx * ctb // 2:(cx + 1) * ctb // 2]
            for blk in (yb, ub, vb):
                for byte in blk.reshape(-1).tolist():
                    enc.write_raw(int(byte), 8)
            enc.reset_engine()                 # spec 9.3.1: re-init after PCM
            # end_of_slice_segment_flag
            last = i == n_ctbs - 1
            enc.encode_terminate(1 if last else 0)
        enc.finish()
        enc.align_one()                        # rbsp_slice_segment_trailing
        return nal_unit(NAL_IDR_W_RADL, enc.to_bytes())


def _pad(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = h - plane.shape[0], w - plane.shape[1]
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


class H265IntraEncoder:
    """All-intra HEVC encoder: planar/DC/H/V mode decision, 16x16 luma
    TUs + 8x8 chroma TUs, full CABAC residual coding, bit-exact
    reconstruction (deblocking and SAO disabled in the parameter sets,
    so recon must equal the decoder's output sample for sample).

    Replaces the reference's external HEVC encoder elements
    (reference: pipeline/ *h265* pipelines, e.g. rk3588/h265_hdmi_1080p30;
    SURVEY.md §2.2) — first lossy HEVC stage on the path to the
    BASELINE.md 4K60 target.
    """

    def __init__(self, width: int, height: int, qp: int = 32):
        from ceracoder_tpu.codec.h265.intra import chroma_qp

        self.width, self.height = width, height
        self.params = HevcParams(width=width, height=height, qp=qp,
                                 pcm_enabled=False)
        self.qp = qp
        self.qp_c = chroma_qp(qp)
        ctb = self.params.ctb
        self.pw = -(-width // ctb) * ctb
        self.ph = -(-height // ctb) * ctb
        self.recon = None

    def headers(self) -> bytes:
        p = self.params
        return write_vps(p) + write_sps(p) + write_pps(p)

    def encode_frame(self, y: np.ndarray, u: np.ndarray,
                     v: np.ndarray, qp: int | None = None) -> bytes:
        from ceracoder_tpu.codec.h265 import intra as I
        from ceracoder_tpu.codec.h265.ctx_tables import (
            build_i_slice_contexts)
        from ceracoder_tpu.codec.h265.residual import encode_residual

        p = self.params
        ctb = p.ctb
        if qp is not None:
            self.qp, self.qp_c = qp, I.chroma_qp(qp)
        qp, qp_c = self.qp, self.qp_c
        y = _pad(np.asarray(y), self.ph, self.pw).astype(np.int32)
        u = _pad(np.asarray(u), self.ph // 2, self.pw // 2).astype(np.int32)
        v = _pad(np.asarray(v), self.ph // 2, self.pw // 2).astype(np.int32)

        rec_y = np.zeros_like(y)
        rec_u = np.zeros_like(u)
        rec_v = np.zeros_like(v)

        hdr = slice_header_bits(p, idr=True, qp=qp)
        enc = CabacEncoder()
        hv, hl = hdr.arrays()
        for val, n in zip(hv.tolist(), hl.tolist()):
            enc.write_raw(int(val), int(n))

        ctx, off = build_i_slice_contexts(qp)
        ncw, nch = self.pw // ctb, self.ph // ctb
        left_modes = np.full(nch, I.DC, np.int32)  # per-row left mode

        for ci in range(ncw * nch):
            cy, cx = divmod(ci, ncw)
            x0, y0 = cx * ctb, cy * ctb

            # --- luma mode decision (SAD over candidate modes)
            lref = I.ref_samples(rec_y, x0, y0, ctb, avail_tr=True)
            src = y[y0:y0 + ctb, x0:x0 + ctb]
            best_mode, best_pred, best_sad = None, None, 1 << 30
            for m in I.CAND_MODES:
                pr = I.predict(m, *lref, ctb, 0)
                sad = int(np.abs(src - pr).sum())
                if sad < best_sad:
                    best_mode, best_pred, best_sad = m, pr, sad
            mode = best_mode

            # --- syntax: part_mode, luma mode (MPM), chroma mode (DM)
            enc.encode_bin(ctx, off["part_mode"], 1)    # 2Nx2N
            cand_a = int(left_modes[cy]) if cx > 0 else I.DC
            cand_b = I.DC   # above CU is always in another CTB row
            mpm = _mpm_list(cand_a, cand_b)
            if mode in mpm:
                enc.encode_bin(ctx, off["prev_intra"], 1)
                idx = mpm.index(mode)
                enc.encode_bypass(0 if idx == 0 else 1)
                if idx:
                    enc.encode_bypass(idx - 1)
            else:
                enc.encode_bin(ctx, off["prev_intra"], 0)
                rem = mode - sum(1 for m in sorted(mpm) if m < mode)
                enc.encode_bypass_bits(rem, 5)
            left_modes[cy] = mode
            enc.encode_bin(ctx, off["chroma_pred"], 0)  # DM mode

            # --- luma residual
            res = src - best_pred
            coef = I.quantize(I.fwd_transform(res), qp)
            cbf_l = 1 if coef.any() else 0
            if cbf_l:
                deq = I.dequantize(coef, qp)
                rconst = I.inv_transform(deq)
                rec = np.clip(best_pred + rconst, 0, 255)
            else:
                rec = np.clip(best_pred, 0, 255)
            rec_y[y0:y0 + ctb, x0:x0 + ctb] = rec

            # --- chroma prediction + residual (DM = luma mode)
            nc = ctb // 2
            cx0, cy0 = x0 // 2, y0 // 2
            ch_out = []
            for plane, recp in ((u, rec_u), (v, rec_v)):
                cref = I.ref_samples(recp, cx0, cy0, nc, avail_tr=True)
                pr = I.predict(mode, *cref, nc, 1)
                srcc = plane[cy0:cy0 + nc, cx0:cx0 + nc]
                coefc = I.quantize(I.fwd_transform(srcc - pr), qp_c)
                cbf = 1 if coefc.any() else 0
                if cbf:
                    recc = np.clip(
                        pr + I.inv_transform(I.dequantize(coefc, qp_c)),
                        0, 255)
                else:
                    recc = np.clip(pr, 0, 255)
                recp[cy0:cy0 + nc, cx0:cx0 + nc] = recc
                ch_out.append((cbf, coefc))

            # --- transform tree: cbf_cb, cbf_cr, then TU
            enc.encode_bin(ctx, off["cbf_chroma"], ch_out[0][0])
            enc.encode_bin(ctx, off["cbf_chroma"], ch_out[1][0])
            # cbf_luma ctx 1 (trafoDepth == 0)
            enc.encode_bin(ctx, off["cbf_luma"] + 1, cbf_l)
            if cbf_l:
                encode_residual(enc, ctx, off, coef, 0)
            if ch_out[0][0]:
                encode_residual(enc, ctx, off, ch_out[0][1], 1)
            if ch_out[1][0]:
                encode_residual(enc, ctx, off, ch_out[1][1], 2)

            # end_of_slice_segment_flag
            last = ci == ncw * nch - 1
            enc.encode_terminate(1 if last else 0)

        enc.finish()
        enc.align_one()
        self.recon = (rec_y[:self.height, :self.width].astype(np.uint8),
                      rec_u[:self.height // 2, :self.width // 2]
                      .astype(np.uint8),
                      rec_v[:self.height // 2, :self.width // 2]
                      .astype(np.uint8))
        return nal_unit(NAL_IDR_W_RADL, enc.to_bytes())


class H265AppEncoder:
    """Adapter matching the H264Encoder surface the app loop drives
    (encode_frame -> EncodedFrame-like with .data/.keyframe/.qp);
    all-intra HEVC for now, so every frame is an IDR."""

    def __init__(self, width: int, height: int, qp: int = 32,
                 fps_num: int = 0, fps_den: int = 1, gop: int = 1,
                 **_ignored):
        self._enc = H265IntraEncoder(width, height, qp=qp)
        self.qp = qp

    def headers(self) -> bytes:
        return self._enc.headers()

    def encode_frame(self, y, u, v, qp: int | None = None,
                     force_idr: bool = False):
        qp = self.qp if qp is None else qp
        data = self._enc.encode_frame(y, u, v, qp=qp)

        class _F:
            pass

        f = _F()
        f.data = data
        f.keyframe = True
        f.qp = qp
        f.recon = self._enc.recon
        return f


def _mpm_list(cand_a: int, cand_b: int) -> list[int]:
    """Most-probable-mode list (spec 8.4.2)."""
    if cand_a == cand_b:
        if cand_a < 2:
            return [0, 1, 26]
        return [cand_a, 2 + ((cand_a + 29) % 32), 2 + ((cand_a - 2 + 1) % 32)]
    mpm = [cand_a, cand_b]
    for m in (0, 1, 26):
        if m not in mpm:
            mpm.append(m)
            break
    return mpm
