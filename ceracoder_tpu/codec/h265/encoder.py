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
