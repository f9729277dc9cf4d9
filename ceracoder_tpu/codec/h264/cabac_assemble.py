"""H.264 CABAC slice assembly: turns the encoder's per-frame arrays
(the same `outs` dicts the CAVLC assembly consumes) into CABAC slice
NALs, one slice per MB row.

Replaces the entropy stage of the reference's `x264enc` default CABAC
mode (reference: bindings/typescript/src/pipeline/generic-builder.ts:
49-55); the compute path (ops/intra.py, ops/inter.py) is unchanged —
only the entropy coding differs from the CAVLC path, so recon and the
oracle conformance carry over.
"""

from __future__ import annotations

import numpy as np

from ceracoder_tpu.codec.bitwriter import nal_unit
from ceracoder_tpu.codec.h264.cabac import H264RowCabac
from ceracoder_tpu.codec.h264.syntax import (
    NAL_IDR,
    NAL_SLICE,
    SLICE_I_ALL,
    SLICE_P_ALL,
    SliceConfig,
    write_slice_header,
)


def _slice_nal(cfg: SliceConfig, cab: H264RowCabac, idr: bool,
               first: bool) -> bytes:
    w = write_slice_header(cfg)
    # cabac_alignment_one_bit (7.3.4): '1's to the byte boundary
    pad = (-w.bit_length) % 8
    if pad:
        w.u((1 << pad) - 1, pad)
    payload = w.to_bytes() + cab.finish()
    return nal_unit(3 if idr else 2, NAL_IDR if idr else NAL_SLICE,
                    payload, long_start_code=first)


def assemble_i_cabac(outs: dict, qp: int, idr_pic_id: int, mbh: int,
                     mbw: int, pic_init_qp: int, deblock: bool,
                     snake: np.ndarray) -> bytes:
    ac_luma = np.asarray(outs["ac_luma"]).reshape(mbh, mbw, 4, 4, 15)
    dc_luma = np.asarray(outs["dc_luma"]).reshape(mbh, mbw, 16)
    dc_chroma = np.asarray(outs["dc_chroma"])      # (mbh, mbw, 2, 4)
    ac_chroma = np.asarray(outs["ac_chroma"])      # (mbh,mbw,2,2,2,15)
    mode_l = np.asarray(outs["mode_luma"]).reshape(mbh, mbw)
    mode_c = np.asarray(outs["mode_chroma"]).reshape(mbh, mbw)
    sr, sc = snake[:, 0], snake[:, 1]

    nals = []
    for row in range(mbh):
        cab = H264RowCabac(qp, intra_slice=True)
        for col in range(mbw):
            acs = ac_luma[row, col][sr, sc]        # (16, 15) snake
            cbp_luma = 15 if (acs != 0).any() else 0
            cacs = ac_chroma[row, col].reshape(2, 4, 15)
            cdc = dc_chroma[row, col]
            cbp_chroma = (2 if (cacs != 0).any()
                          else (1 if (cdc != 0).any() else 0))
            cab.mb_i16(int(mode_l[row, col]), int(mode_c[row, col]),
                       0, cbp_luma, cbp_chroma,
                       dc_luma[row, col], acs, cdc, cacs)
            cab.end_of_slice(col == mbw - 1)
        cfg = SliceConfig(
            first_mb=row * mbw, slice_type=SLICE_I_ALL, frame_num=0,
            idr=True, idr_pic_id=idr_pic_id, qp=qp,
            pic_init_qp=pic_init_qp,
            deblock_idc=2 if deblock else 1, cabac=True)
        nals.append(_slice_nal(cfg, cab, idr=True, first=(row == 0)))
    return b"".join(nals)


def assemble_p_cabac(outs: dict, qp: int, frame_num: int, mbh: int,
                     mbw: int, pic_init_qp: int, deblock: bool,
                     snake: np.ndarray) -> bytes:
    mvg = np.asarray(outs["mv"]).astype(np.int64)  # (mbh, mbw, 2)
    ll = np.asarray(outs["luma_levels"]).reshape(mbh, mbw, 4, 4, 16)
    dc_chroma = np.asarray(outs["dc_chroma"])
    ac_chroma = np.asarray(outs["ac_chroma"])
    sr, sc = snake[:, 0], snake[:, 1]

    nz44 = (ll != 0).any(-1)                       # (mbh, mbw, 4, 4)
    qbits = np.zeros((mbh, mbw, 4), np.int64)
    for q in range(4):
        r0, c0 = 2 * (q // 2), 2 * (q % 2)
        qbits[..., q] = nz44[:, :, r0:r0 + 2, c0:c0 + 2].any((-1, -2))
    cbp_luma = (qbits << np.arange(4)).sum(-1)
    any_cac = (ac_chroma != 0).reshape(mbh, mbw, -1).any(-1)
    any_cdc = (dc_chroma != 0).reshape(mbh, mbw, -1).any(-1)
    cbp_chroma = np.where(any_cac, 2, np.where(any_cdc, 1, 0))
    cbp = cbp_luma | (cbp_chroma << 4)

    # MV prediction under the slice-row schedule (left only); P_Skip
    # iff mv == (0, 0) (the skip predictor) and no residual
    pmv = np.zeros_like(mvg)
    pmv[:, 1:] = mvg[:, :-1]
    mvd = mvg - pmv
    skip = (mvg[..., 0] == 0) & (mvg[..., 1] == 0) & (cbp == 0)

    nals = []
    for row in range(mbh):
        cab = H264RowCabac(qp, intra_slice=False)
        for col in range(mbw):
            if skip[row, col]:
                cab.mb_skip()
            else:
                blocks = ll[row, col][sr, sc]      # (16, 16) snake
                cab.mb_p16(
                    (int(mvd[row, col, 0]), int(mvd[row, col, 1])),
                    0, int(cbp_luma[row, col]),
                    int(cbp_chroma[row, col]), blocks,
                    dc_chroma[row, col],
                    ac_chroma[row, col].reshape(2, 4, 15))
            cab.end_of_slice(col == mbw - 1)
        cfg = SliceConfig(
            first_mb=row * mbw, slice_type=SLICE_P_ALL,
            frame_num=frame_num, idr=False, qp=qp,
            pic_init_qp=pic_init_qp,
            deblock_idc=2 if deblock else 1, cabac=True)
        nals.append(_slice_nal(cfg, cab, idr=False, first=(row == 0)))
    return b"".join(nals)
