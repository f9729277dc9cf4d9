"""H.264 CABAC slice assembly: turns the encoder's per-frame arrays
(the same `outs` dicts the CAVLC assembly consumes) into CABAC slice
NALs, one slice per MB row.

Replaces the entropy stage of the reference's `x264enc` default CABAC
mode (reference: bindings/typescript/src/pipeline/generic-builder.ts:
49-55); the compute path (ops/intra.py, ops/inter.py) is unchanged —
only the entropy coding differs from the CAVLC path, so recon and the
oracle conformance carry over.

Two implementations of the row coder: the Python executable spec
(cabac.H264RowCabac) and the threaded C++ production path
(native/src/h264_cabac.cc, byte-identical by test). The native path is
used when the library is available.
"""

from __future__ import annotations

import ctypes
import functools
import os

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


def _row_cfg(row: int, mbw: int, qp: int, pic_init_qp: int,
             deblock: bool, intra: bool, frame_num: int,
             idr_pic_id: int) -> SliceConfig:
    return SliceConfig(
        first_mb=row * mbw,
        slice_type=SLICE_I_ALL if intra else SLICE_P_ALL,
        frame_num=0 if intra else frame_num,
        idr=intra, idr_pic_id=idr_pic_id, qp=qp,
        pic_init_qp=pic_init_qp,
        deblock_idc=2 if deblock else 1, cabac=True)


def _hdr_bytes(cfg: SliceConfig) -> bytes:
    w = write_slice_header(cfg)
    # cabac_alignment_one_bit (7.3.4): '1's to the byte boundary
    pad = (-w.bit_length) % 8
    if pad:
        w.u((1 << pad) - 1, pad)
    return w.to_bytes()


@functools.lru_cache(maxsize=1 << 16)
def _row_hdr(row: int, mbw: int, qp: int, pic_init_qp: int,
             deblock: bool, intra: bool, frame_num: int,
             idr_pic_id: int) -> bytes:
    """Memoized per-row slice-header bytes: a frame re-uses one header
    per MB row and the scalar inputs cycle over a small set (qp ladder
    x frame_num mod 16), so building them through the Python bitwriter
    every frame is pure overhead on the streaming path."""
    return _hdr_bytes(_row_cfg(row, mbw, qp, pic_init_qp, deblock,
                               intra, frame_num, idr_pic_id))


def _slice_nal(hdr: bytes, payload: bytes, idr: bool,
               first: bool) -> bytes:
    return nal_unit(3 if idr else 2, NAL_IDR if idr else NAL_SLICE,
                    hdr + payload, long_start_code=first)


def _native_rows(intra: bool, qp: int, mbh: int, mbw: int,
                 hdrs: list[bytes], arrays: dict) -> list[bytes] | None:
    from ceracoder_tpu import native
    lib = native.load()
    if lib is None or not hasattr(lib, "h264_cabac_rows"):
        return None
    stride = max(len(h) for h in hdrs)
    hb = np.zeros((mbh, stride), np.uint8)
    hs = np.zeros(mbh, np.int32)
    for r, h in enumerate(hdrs):
        hb[r, :len(h)] = np.frombuffer(h, np.uint8)
        hs[r] = len(h)

    def c16(a):
        return np.ascontiguousarray(a, np.int16)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None \
            else None

    cap = max(1 << 16, mbh * mbw * 2048)
    # empty, not zeros: the native coder overwrites what it uses and
    # the caller slices by row size; zeroing 16 MB/frame costs real ms
    out = np.empty(cap, np.uint8)
    sizes = np.zeros(mbh, np.int32)
    nthreads = min(mbh, os.cpu_count() or 1)
    if intra:
        mode_l = np.ascontiguousarray(arrays["mode_l"], np.int32)
        mode_c = np.ascontiguousarray(arrays["mode_c"], np.int32)
        dc_luma = c16(arrays["dc_luma"])
        ac_luma = c16(arrays["ac_luma"])
        dc_chroma = c16(arrays["dc_chroma"])
        ac_chroma = c16(arrays["ac_chroma"])
        n = lib.h264_cabac_rows(
            mbh, mbw, 1, 0, qp, p(hb), p(hs), stride,
            p(mode_l), p(mode_c), p(dc_luma), p(ac_luma),
            None, None, None, p(dc_chroma), p(ac_chroma),
            p(out), cap, p(sizes), nthreads)
    else:
        skip = np.ascontiguousarray(arrays["skip"], np.uint8)
        mvd = np.ascontiguousarray(arrays["mvd"], np.int32)
        luma_lv = c16(arrays["luma_lv"])
        dc_chroma = c16(arrays["dc_chroma"])
        ac_chroma = c16(arrays["ac_chroma"])
        # intra-in-P (kind 2 in `skip`): per-MB modes + [dc|ac] views
        mode_l = mode_c = dc_luma = ac_luma = None
        if arrays.get("mode_l") is not None:
            mode_l = np.ascontiguousarray(arrays["mode_l"], np.int32)
            mode_c = np.ascontiguousarray(arrays["mode_c"], np.int32)
            dc_luma = c16(arrays["dc_luma"])
            ac_luma = c16(arrays["ac_luma"])
        n = lib.h264_cabac_rows(
            mbh, mbw, 0, 0, qp, p(hb), p(hs), stride,
            p(mode_l), p(mode_c), p(dc_luma), p(ac_luma),
            p(skip), p(mvd), p(luma_lv),
            p(dc_chroma), p(ac_chroma), p(out), cap, p(sizes),
            nthreads)
    if n < 0:
        return None
    rows = []
    off = 0
    for r in range(mbh):
        rows.append(out[off:off + int(sizes[r])].tobytes())
        off += int(sizes[r])
    return rows


def assemble_i_cabac(outs: dict, qp: int, idr_pic_id: int, mbh: int,
                     mbw: int, pic_init_qp: int, deblock: bool,
                     snake: np.ndarray) -> bytes:
    ac_luma = np.asarray(outs["ac_luma"]).reshape(mbh, mbw, 4, 4, 15)
    sr, sc = snake[:, 0], snake[:, 1]
    arrays = {
        "mode_l": np.asarray(outs["mode_luma"]).reshape(mbh, mbw),
        "mode_c": np.asarray(outs["mode_chroma"]).reshape(mbh, mbw),
        "dc_luma": np.asarray(outs["dc_luma"]).reshape(mbh, mbw, 16),
        "ac_luma": ac_luma[:, :, sr, sc],          # (mbh, mbw, 16, 15)
        "dc_chroma": np.asarray(outs["dc_chroma"]),
        "ac_chroma": np.asarray(outs["ac_chroma"])
        .reshape(mbh, mbw, 2, 4, 15),
    }
    return assemble_i_snake(arrays, qp, idr_pic_id, mbh, mbw,
                            pic_init_qp, deblock)


def assemble_i_snake(arrays: dict, qp: int, idr_pic_id: int, mbh: int,
                     mbw: int, pic_init_qp: int,
                     deblock: bool) -> bytes:
    """I-slice CABAC assembly from coding-order arrays: mode_l/mode_c
    (mbh, mbw), dc_luma (mbh, mbw, 16), ac_luma snake (mbh, mbw, 16,
    15), dc_chroma (mbh, mbw, 2, 4), ac_chroma (mbh, mbw, 2, 4, 15) —
    the layout the fused-run transfer produces (cabac_run.py)."""
    mode_l = arrays["mode_l"]
    mode_c = arrays["mode_c"]
    dc_luma = arrays["dc_luma"]
    acs_all = arrays["ac_luma"]
    dc_chroma = arrays["dc_chroma"]
    ac_chroma = arrays["ac_chroma"]
    hdrs = [_row_hdr(r, mbw, qp, pic_init_qp, deblock, True, 0,
                     idr_pic_id) for r in range(mbh)]
    rows = _native_rows(True, qp, mbh, mbw, hdrs, {
        "mode_l": mode_l, "mode_c": mode_c, "dc_luma": dc_luma,
        "ac_luma": acs_all,
        "dc_chroma": dc_chroma,
        "ac_chroma": ac_chroma})
    if rows is None:
        rows = []
        for row in range(mbh):
            cab = H264RowCabac(qp, intra_slice=True)
            for col in range(mbw):
                acs = acs_all[row, col]
                cbp_luma = 15 if (acs != 0).any() else 0
                cacs = ac_chroma[row, col].reshape(2, 4, 15)
                cdc = dc_chroma[row, col]
                cbp_chroma = (2 if (cacs != 0).any()
                              else (1 if (cdc != 0).any() else 0))
                cab.mb_i16(int(mode_l[row, col]),
                           int(mode_c[row, col]),
                           0, cbp_luma, cbp_chroma,
                           dc_luma[row, col], acs, cdc, cacs)
                cab.end_of_slice(col == mbw - 1)
            rows.append(hdrs[row] + cab.finish())
    return b"".join(
        _slice_nal(b"", rows[r], idr=True, first=(r == 0))
        for r in range(mbh))


def assemble_p_cabac(outs: dict, qp: int, frame_num: int, mbh: int,
                     mbw: int, pic_init_qp: int, deblock: bool,
                     snake: np.ndarray) -> bytes:
    ll = np.asarray(outs["luma_levels"]).reshape(mbh, mbw, 4, 4, 16)
    sr, sc = snake[:, 0], snake[:, 1]
    luma_lv = ll[:, :, sr, sc]                     # (mbh, mbw, 16, 16)
    arrays = {
        "mv": np.asarray(outs["mv"]).astype(np.int64),
        "luma_lv": luma_lv,
        "dc_chroma": np.asarray(outs["dc_chroma"]),
        "ac_chroma": np.asarray(outs["ac_chroma"])
        .reshape(mbh, mbw, 2, 4, 15),
    }
    if "is_intra" in outs:
        m = np.asarray(outs["is_intra"]).astype(bool)
        if m.any():
            # intra MBs carry [dc 16 | ac snake 240] in the luma slots
            ac = np.asarray(outs["ac_luma"]).reshape(mbh, mbw, 4, 4,
                                                     15)
            intra256 = np.concatenate(
                [np.asarray(outs["dc_luma"]).reshape(mbh, mbw, 16),
                 ac[:, :, sr, sc].reshape(mbh, mbw, 240)], axis=-1)
            luma256 = np.ascontiguousarray(luma_lv) \
                .reshape(mbh, mbw, 256).copy()
            luma256[m] = intra256[m]
            arrays["luma_lv"] = luma256.reshape(mbh, mbw, 16, 16)
        arrays["is_intra"] = m
        arrays["mode_l"] = np.asarray(outs["mode_luma"]) \
            .astype(np.int32)
        arrays["mode_c"] = np.asarray(outs["mode_chroma"]) \
            .astype(np.int32)
    return assemble_p_snake(arrays, qp, frame_num, mbh, mbw,
                            pic_init_qp, deblock)


def assemble_p_snake(arrays: dict, qp: int, frame_num: int, mbh: int,
                     mbw: int, pic_init_qp: int,
                     deblock: bool) -> bytes:
    """P-slice CABAC assembly from coding-order arrays: mv (mbh, mbw,
    2) quarter-pel, luma_lv snake (mbh, mbw, 16, 16), dc_chroma (mbh,
    mbw, 2, 4), ac_chroma (mbh, mbw, 2, 4, 15) — the layout the
    fused-run transfer produces (cabac_run.py)."""
    mvg = np.asarray(arrays["mv"]).astype(np.int64)
    blocks_all = arrays["luma_lv"]                 # snake order
    dc_chroma = arrays["dc_chroma"]
    ac_chroma = arrays["ac_chroma"]
    is_intra = arrays.get("is_intra")
    if is_intra is None:
        is_intra = np.zeros((mbh, mbw), bool)
    has_intra = bool(is_intra.any())

    # cbp == 0 iff the MB carries no nonzero level at all, so the
    # per-MB nonzero count (already on the fused-run transfer) decides
    # P_Skip without scanning the dense arrays; the native coder
    # derives the actual cbp itself (h264_cabac.cc), so the full cbp
    # is only computed for the Python fallback below.
    if "nnz_mb" in arrays:
        no_resid = arrays["nnz_mb"].reshape(mbh, mbw) == 0
    else:
        no_resid = ~np.logical_or.reduce([
            (blocks_all != 0).reshape(mbh, mbw, -1).any(-1),
            (dc_chroma != 0).reshape(mbh, mbw, -1).any(-1),
            (ac_chroma != 0).reshape(mbh, mbw, -1).any(-1)])

    # MV prediction under the slice-row schedule (left only; an intra
    # left MB is unavailable for prediction, spec 8.4.1.3); P_Skip iff
    # inter, mv == (0, 0) (the skip predictor) and no residual
    pmv = np.zeros_like(mvg)
    pmv[:, 1:] = mvg[:, :-1]
    if has_intra:
        pmv[:, 1:] *= ~is_intra[:, :-1, None]
    mvd = mvg - pmv
    skip = ((mvg[..., 0] == 0) & (mvg[..., 1] == 0) & no_resid
            & ~is_intra)

    native_arrays = {
        "skip": skip.astype(np.uint8) + 2 * is_intra,   # 0/1/2 kinds
        "mvd": mvd, "luma_lv": blocks_all,
        "dc_chroma": dc_chroma,
        "ac_chroma": ac_chroma}
    if has_intra:
        # intra MBs store [dc 16 | ac snake 240] in the 256 luma slots
        luma256 = np.ascontiguousarray(blocks_all) \
            .reshape(mbh, mbw, 256)
        native_arrays.update(
            mode_l=arrays["mode_l"], mode_c=arrays["mode_c"],
            dc_luma=luma256[:, :, :16],
            ac_luma=luma256[:, :, 16:].reshape(mbh, mbw, 16, 15))

    hdrs = [_row_hdr(r, mbw, qp, pic_init_qp, deblock, False,
                     frame_num, 0) for r in range(mbh)]
    rows = _native_rows(False, qp, mbh, mbw, hdrs, native_arrays)
    if rows is None:
        # snake blocks 4q..4q+3 are the 4 blocks of 8x8 quadrant q
        nzb = (blocks_all != 0).any(-1)            # (mbh, mbw, 16)
        qbits = nzb.reshape(mbh, mbw, 4, 4).any(-1).astype(np.int64)
        cbp_luma = (qbits << np.arange(4)).sum(-1)
        any_cac = (ac_chroma != 0).reshape(mbh, mbw, -1).any(-1)
        any_cdc = (dc_chroma != 0).reshape(mbh, mbw, -1).any(-1)
        cbp_chroma = np.where(any_cac, 2, np.where(any_cdc, 1, 0))
        luma256f = np.ascontiguousarray(blocks_all) \
            .reshape(mbh, mbw, 256)
        rows = []
        for row in range(mbh):
            cab = H264RowCabac(qp, intra_slice=False)
            for col in range(mbw):
                if is_intra[row, col]:
                    dc = luma256f[row, col, :16]
                    acs = luma256f[row, col, 16:].reshape(16, 15)
                    cdc = dc_chroma[row, col]
                    cacs = ac_chroma[row, col].reshape(2, 4, 15)
                    cbp_l = 15 if (acs != 0).any() else 0
                    cbp_c = (2 if (cacs != 0).any()
                             else (1 if (cdc != 0).any() else 0))
                    cab.mb_i16(int(arrays["mode_l"][row, col]),
                               int(arrays["mode_c"][row, col]),
                               0, cbp_l, cbp_c, dc, acs, cdc, cacs)
                elif skip[row, col]:
                    cab.mb_skip()
                else:
                    cab.mb_p16(
                        (int(mvd[row, col, 0]),
                         int(mvd[row, col, 1])),
                        0, int(cbp_luma[row, col]),
                        int(cbp_chroma[row, col]),
                        blocks_all[row, col],
                        dc_chroma[row, col],
                        ac_chroma[row, col].reshape(2, 4, 15))
                cab.end_of_slice(col == mbw - 1)
            rows.append(hdrs[row] + cab.finish())
    return b"".join(
        _slice_nal(b"", rows[r], idr=False, first=(r == 0))
        for r in range(mbh))
