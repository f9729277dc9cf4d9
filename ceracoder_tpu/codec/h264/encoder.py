"""H.264 all-intra frame encoder: device compute + host entropy/assembly.

Pipeline per frame (SURVEY.md §7.2 minimum slice, widened to Intra_16x16
+ CAVLC):

  device (JAX):  prediction / transform / quant / recon  (ops/intra.py)
  host (numpy):  nC neighbor derivation -> vectorized CAVLC symbol
                 generation (codec/h264/cavlc.py) -> prefix-sum bit
                 packing (codec/bitwriter.py) -> NAL framing

Slice-per-MB-row schedule: each MB row is one slice, so intra prediction
never crosses rows and rows encode independently (cf. reference
SURVEY.md §2.7 tile-row parallelism).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ceracoder_tpu.codec.bitwriter import nal_unit, pack_bits
from ceracoder_tpu.codec.h264 import cavlc
from ceracoder_tpu.codec.h264.syntax import (
    NAL_IDR,
    NAL_SLICE,
    SLICE_I_ALL,
    PpsConfig,
    SliceConfig,
    SpsConfig,
    write_pps,
    write_sps,
    write_slice_header,
)
from ceracoder_tpu.ops.intra import encode_frame_i16_rows
from ceracoder_tpu.ops.transform import chroma_qp

# raster index of each luma 4x4 block in coding (snake) order, as
# (row, col) in 4x4-block units within the MB (spec 6.4.3 inverse scan)
LUMA_SNAKE = np.array([(0, 0), (0, 1), (1, 0), (1, 1),
                       (0, 2), (0, 3), (1, 2), (1, 3),
                       (2, 0), (2, 1), (3, 0), (3, 1),
                       (2, 2), (2, 3), (3, 2), (3, 3)], dtype=np.int32)

S = cavlc.BLOCK_SLOTS
# symbol layout per MB: 3 header syms + DC + 16 luma AC + 2 chroma DC
# + 8 chroma AC residual blocks
MB_SLOTS = 3 + S * (1 + 16 + 2 + 8)


def _ue_arr(v):
    v = np.asarray(v, np.int64)
    code = v + 1
    nbits = 2 * (np.floor(np.log2(code)).astype(np.int64)) + 1
    return code.astype(np.uint32), nbits.astype(np.int32)


def _neighbor_nc(nnz: np.ndarray, rows_per_mb: int,
                 same_row_only: bool) -> np.ndarray:
    """nC for every 4x4 block from neighbor TotalCoeffs (spec 9.2.1).

    nnz: (BH, BW) per-4x4-block TotalCoeff over the whole frame grid.
    rows_per_mb: block rows per MB row (4 luma / 2 chroma 4:2:0).
    same_row_only: True for slice-per-MB-row — a top neighbor in a
    different MB row is in another slice and thus unavailable.
    """
    bh, bw = nnz.shape
    left = np.zeros_like(nnz)
    left[:, 1:] = nnz[:, :-1]
    left_avail = np.zeros((bh, bw), bool)
    left_avail[:, 1:] = True

    top = np.zeros_like(nnz)
    top[1:, :] = nnz[:-1, :]
    top_avail = np.zeros((bh, bw), bool)
    top_avail[1:, :] = True
    if same_row_only:
        # blocks whose top neighbor is in the previous MB row
        edge = (np.arange(bh) % rows_per_mb) == 0
        top_avail[edge, :] = False

    both = left_avail & top_avail
    nc = np.where(both, (left + top + 1) >> 1,
                  np.where(left_avail, left, np.where(top_avail, top, 0)))
    return nc


@dataclass
class EncodedFrame:
    data: bytes
    recon: tuple[np.ndarray, np.ndarray, np.ndarray]
    keyframe: bool
    qp: int


class H264Encoder:
    """All-intra H.264 baseline encoder (CAVLC, Intra_16x16).

    Replaces the x264/NVENC GStreamer elements of the reference
    (SURVEY.md §2.2); the `bitrate` knob the reference's balancer drives
    maps to per-frame QP here (rate control wiring lives in
    ceracoder_tpu.control).
    """

    def __init__(self, width: int, height: int, qp: int = 28,
                 fps_num: int = 0, fps_den: int = 1,
                 chroma_qp_offset: int = 0):
        if width % 16 or height % 16:
            raise ValueError("dimensions must be multiples of 16 "
                             "(use padding + SPS cropping upstream)")
        self.width, self.height = width, height
        self.mbw, self.mbh = width // 16, height // 16
        self.qp = qp
        self.chroma_qp_offset = chroma_qp_offset
        self.sps = SpsConfig(width=width, height=height,
                             fps_num=fps_num, fps_den=fps_den)
        self.pps = PpsConfig(pic_init_qp=26,
                             chroma_qp_index_offset=chroma_qp_offset)
        self.frame_idx = 0
        self.idr_pic_id = 0

    def headers(self) -> bytes:
        return write_sps(self.sps) + write_pps(self.pps)

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     qp: int | None = None) -> EncodedFrame:
        qp = self.qp if qp is None else qp
        qp_c = chroma_qp(qp, self.chroma_qp_offset)
        import jax.numpy as jnp
        outs = encode_frame_i16_rows(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), qp, qp_c)
        outs = {k: np.asarray(o) if not isinstance(o, tuple) else
                tuple(np.asarray(x) for x in o) for k, o in outs.items()}
        data = self._assemble(outs, qp)
        frame = EncodedFrame(data=data, recon=outs["recon"], keyframe=True,
                             qp=qp)
        self.frame_idx += 1
        self.idr_pic_id = (self.idr_pic_id + 1) % 16
        return frame

    # ------------------------------------------------------------------
    def _assemble(self, outs: dict, qp: int) -> bytes:
        mbh, mbw = self.mbh, self.mbw
        n = mbh * mbw

        ac_luma = outs["ac_luma"].reshape(mbh, mbw, 4, 4, 15)
        dc_luma = outs["dc_luma"].reshape(n, 16)
        dc_chroma = outs["dc_chroma"]          # (mbh, mbw, 2, 4)
        ac_chroma = outs["ac_chroma"]          # (mbh, mbw, 2, 2, 2, 15)

        # --- coded block patterns
        cbp_luma = (ac_luma.reshape(n, -1) != 0).any(axis=1).astype(np.int64) * 15
        any_cac = (ac_chroma.reshape(n, -1) != 0).any(axis=1)
        any_cdc = (dc_chroma.reshape(n, -1) != 0).any(axis=1)
        cbp_chroma = np.where(any_cac, 2, np.where(any_cdc, 1, 0))

        # --- nC derivation from per-4x4 TotalCoeff grids
        # luma: (mbh*4, mbw*4) grid of AC-token TotalCoeffs
        luma_nnz = (ac_luma != 0).sum(axis=-1)             # (mbh,mbw,4,4)
        luma_nnz = luma_nnz.swapaxes(1, 2).reshape(mbh * 4, mbw * 4)
        nc_luma = _neighbor_nc(luma_nnz, 4, same_row_only=True)
        # luma DC block uses the nC of block (0,0) of the MB
        nc_dc = nc_luma[::4, ::4].reshape(n)

        chroma_nnz = (ac_chroma != 0).sum(axis=-1)         # (mbh,mbw,2,2,2)
        nc_chroma = np.empty((2, mbh * 2, mbw * 2), np.int64)
        for comp in range(2):
            g = chroma_nnz[:, :, comp].swapaxes(1, 2).reshape(mbh * 2, mbw * 2)
            nc_chroma[comp] = _neighbor_nc(g, 2, same_row_only=True)

        # --- CAVLC symbol generation (all blocks of the frame at once)
        v_dc, l_dc, _ = cavlc.encode_blocks(dc_luma, nc_dc, 16)

        # luma AC in snake order with matching nC
        snake_r, snake_c = LUMA_SNAKE[:, 0], LUMA_SNAKE[:, 1]
        ac_snake = ac_luma[:, :, snake_r, snake_c].reshape(n * 16, 15)
        nc_grid = nc_luma.reshape(mbh, 4, mbw, 4).swapaxes(1, 2)
        nc_ac = nc_grid[:, :, snake_r, snake_c].reshape(n * 16)
        v_ac, l_ac, _ = cavlc.encode_blocks(ac_snake, nc_ac, 15)
        # mask out AC blocks when cbp_luma == 0
        l_ac = l_ac.reshape(n, 16, S) * (cbp_luma > 0)[:, None, None]

        cdc = dc_chroma.reshape(n * 2, 4)
        v_cdc, l_cdc, _ = cavlc.encode_blocks(cdc, np.full(n * 2, -1), 4)
        l_cdc = l_cdc.reshape(n, 2, S) * (cbp_chroma > 0)[:, None, None]

        # chroma AC: per comp, raster order within the 8x8
        cac = ac_chroma.reshape(n, 2, 4, 15).reshape(n * 8, 15)
        nc_cac = np.empty((2, mbh, mbw, 2, 2), np.int64)
        for comp in range(2):
            nc_cac[comp] = (nc_chroma[comp]
                            .reshape(mbh, 2, mbw, 2).swapaxes(1, 2))
        # order: MB-major, then comp, then 4 blocks raster
        nc_cac = nc_cac.transpose(1, 2, 0, 3, 4).reshape(n * 8)
        v_cac, l_cac, _ = cavlc.encode_blocks(cac, nc_cac, 15)
        l_cac = l_cac.reshape(n, 8, S) * (cbp_chroma == 2)[:, None, None]

        # --- MB header symbols
        mode_l = outs["mode_luma"].reshape(n).astype(np.int64)
        mode_c = outs["mode_chroma"].reshape(n).astype(np.int64)
        mb_type = 1 + mode_l + 4 * cbp_chroma + 12 * (cbp_luma == 15)
        v_mt, l_mt = _ue_arr(mb_type)
        v_cm, l_cm = _ue_arr(mode_c)
        # mb_qp_delta == 0 for constant-QP slices: se(0) -> ue(0)
        v_qpd = np.ones(n, np.uint32)
        l_qpd = np.ones(n, np.int32)

        # --- assemble fixed-slot symbol matrix per MB
        vals = np.zeros((n, MB_SLOTS), np.uint32)
        lens = np.zeros((n, MB_SLOTS), np.int32)
        vals[:, 0], lens[:, 0] = v_mt, l_mt
        vals[:, 1], lens[:, 1] = v_cm, l_cm
        vals[:, 2], lens[:, 2] = v_qpd, l_qpd
        o = 3
        vals[:, o:o + S], lens[:, o:o + S] = v_dc, l_dc
        o += S
        vals[:, o:o + 16 * S] = v_ac.reshape(n, 16 * S)
        lens[:, o:o + 16 * S] = l_ac.reshape(n, 16 * S)
        o += 16 * S
        vals[:, o:o + 2 * S] = v_cdc.reshape(n, 2 * S)
        lens[:, o:o + 2 * S] = l_cdc.reshape(n, 2 * S)
        o += 2 * S
        vals[:, o:o + 8 * S] = v_cac.reshape(n, 8 * S)
        lens[:, o:o + 8 * S] = l_cac.reshape(n, 8 * S)

        vals = vals.reshape(mbh, mbw * MB_SLOTS)
        lens = lens.reshape(mbh, mbw * MB_SLOTS)

        # --- one slice per MB row
        nals = []
        for row in range(mbh):
            hdr = write_slice_header(SliceConfig(
                first_mb=row * mbw, slice_type=SLICE_I_ALL, frame_num=0,
                idr=True, idr_pic_id=self.idr_pic_id, qp=qp,
                pic_init_qp=self.pps.pic_init_qp))
            hv, hl = hdr.arrays()
            rv = np.concatenate([hv.astype(np.uint32), vals[row]])
            rl = np.concatenate([hl, lens[row]])
            # rbsp stop bit + alignment
            total = int(rl.sum())
            pad = (-(total + 1)) % 8
            stop_v = np.array([1 << pad], np.uint32)
            stop_l = np.array([1 + pad], np.int32)
            payload = pack_bits(np.concatenate([rv, stop_v]),
                                np.concatenate([rl, stop_l]))
            nals.append(nal_unit(3, NAL_IDR, payload,
                                 long_start_code=(row == 0)))
        return b"".join(nals)
