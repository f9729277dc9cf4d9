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
    SLICE_P_ALL,
    PpsConfig,
    SliceConfig,
    SpsConfig,
    write_pps,
    write_sps,
    write_slice_header,
)
from ceracoder_tpu.codec.h264.cavlc_tables import CBP_INTER_TO_CODE
from ceracoder_tpu.ops.intra import encode_frame_i16_rows
from ceracoder_tpu.ops.inter import encode_frame_p
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
# P-MB layout: skip_run, mb_type, mvd_x, mvd_y, cbp, qp_delta + 26 blocks
P_MB_SLOTS = 6 + S * (16 + 2 + 8)


def _ue_arr(v):
    v = np.asarray(v, np.int64)
    code = v + 1
    nbits = 2 * (np.floor(np.log2(code)).astype(np.int64)) + 1
    return code.astype(np.uint32), nbits.astype(np.int32)


def _se_arr(v):
    v = np.asarray(v, np.int64)
    return _ue_arr(np.where(v > 0, 2 * v - 1, -2 * v))


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
    keyframe: bool
    qp: int
    _recon_dev: tuple = field(default=None, repr=False)
    _recon_np: tuple | None = field(default=None, repr=False)

    @property
    def recon(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Reconstructed planes; materialized from device on first
        access (the transfer costs ~100 ms over the axon tunnel, so the
        streaming path never touches it)."""
        if self._recon_np is None:
            self._recon_np = tuple(np.asarray(p) for p in self._recon_dev)
        return self._recon_np


class PendingFrame:
    """A frame in flight: device dispatch done, host bytes not yet
    materialized. Lets callers keep several frames in the pipeline so
    the per-transfer tunnel latency overlaps with device compute."""

    def __init__(self, finish, keyframe: bool, qp: int):
        self._finish = finish
        self._frame: EncodedFrame | None = None
        self.keyframe = keyframe
        self.qp = qp

    def result(self) -> EncodedFrame:
        if self._frame is None:
            self._frame = self._finish()
            self._finish = None
        return self._frame


class H264Encoder:
    """H.264 encoder: I (Intra_16x16/IPCM) + P (P_L0_16x16/P_Skip)
    slices; CABAC (Main profile) by default — the mode `x264enc`
    actually runs in the reference's software pipelines (reference:
    bindings/typescript/src/pipeline/generic-builder.ts:49-55) —
    with CAVLC (`cabac=False`) keeping the device bit-packer path.

    Replaces the x264/NVENC GStreamer elements of the reference
    (SURVEY.md §2.2); the `bitrate` knob the reference's balancer drives
    maps to per-frame QP here (rate control wiring lives in
    ceracoder_tpu.control).
    """

    def __init__(self, width: int, height: int, qp: int = 28,
                 fps_num: int = 0, fps_den: int = 1,
                 chroma_qp_offset: int = 0, gop: int = 1,
                 deblock: bool = True, device_entropy: bool = True,
                 row_capacity_bytes: int | None = None,
                 frame_capacity_bytes: int | None = None,
                 cabac: bool = True,
                 intra_in_p: bool | None = None):
        if width % 16 or height % 16:
            raise ValueError("dimensions must be multiples of 16 "
                             "(use padding + SPS cropping upstream)")
        self.width, self.height = width, height
        self.mbw, self.mbh = width // 16, height // 16
        self.qp = qp
        self.gop = max(1, gop)          # 1 = all-intra
        self.deblock = deblock
        # CABAC entropy (Main profile) runs on the host; the device
        # bit-packer speaks CAVLC only. With device dispatch enabled
        # (the default) CABAC mode uses the fused-run path: device
        # compute in one lax.scan per run, sparse-compacted syntax
        # transfer, threaded native row coder (cabac_run.py).
        # device_entropy=False + cabac=True selects the dense
        # per-frame host path (the executable spec, kept for tests).
        self.cabac = cabac
        self.cabac_fused = cabac and device_entropy
        self.device_entropy = device_entropy and not cabac
        # Intra_16x16 fallback MBs in P slices (uncovered content /
        # partial scene change; reference: x264 always considers intra
        # in P). Default on for the CABAC entropy paths; the CAVLC
        # device bit-packer stays all-inter.
        if intra_in_p and not cabac:
            raise ValueError("intra_in_p requires cabac=True (the "
                             "CAVLC device bit-packer codes all-inter "
                             "P slices)")
        self.intra_in_p = cabac if intra_in_p is None else intra_in_p
        # per-row packed capacity in 32-bit words; overflow falls back to
        # the host entropy path for that frame (detected exactly)
        cap = row_capacity_bytes or max(2048, self.mbw * 192)
        self._capw = (cap + 3) // 4
        totcap = frame_capacity_bytes or max(1 << 16, width * height // 6)
        from ceracoder_tpu.codec.h264.device_entropy import CHUNK_WORDS
        chunk_bytes = CHUNK_WORDS * 4
        self._totcap = -(-totcap // chunk_bytes) * chunk_bytes
        # adaptive transfer prefetch: chunks used by the last frame of
        # each kind (I / P), +1 margin, started at dispatch time
        self._prev_chunks = {True: 4, False: 1}
        # fused-CABAC sparse-level capacities (entries, multiples of
        # cabac_run.CHUNK): P frames stream in CHUNK-sized pieces; the
        # IDR chunk is sized so a typical all-intra frame transfers in
        # one piece (the device link charges fixed latency per fetch)
        from ceracoder_tpu.codec.h264.cabac_run import CHUNK
        n_mb = self.mbw * self.mbh
        self._cabac_cap = -(-max(2 * CHUNK, n_mb * 48) // CHUNK) * CHUNK
        self._cabac_idr_chunk = -(-(n_mb * 96) // CHUNK) * CHUNK
        self._prev_cabac_extra = 0
        self.chroma_qp_offset = chroma_qp_offset
        self.sps = SpsConfig(width=width, height=height,
                             fps_num=fps_num, fps_den=fps_den,
                             profile_idc=77 if cabac else 66)
        self.pps = PpsConfig(pic_init_qp=26,
                             chroma_qp_index_offset=chroma_qp_offset,
                             cabac=cabac)
        self.frame_idx = 0
        self.idr_pic_id = 0
        self.frame_num = 0              # reference-frame counter
        self._gop_pos = 0
        self._ref = None                # previous recon, device arrays

    def headers(self) -> bytes:
        return write_sps(self.sps) + write_pps(self.pps)

    def resume(self) -> None:
        """Drop all transient state (reference chain, GOP position):
        the next frame codes as a fresh IDR. The explicit form of the
        reference's crash-and-restart recovery model (SURVEY.md §5:
        "resume = restart at next IDR")."""
        self._ref = None
        self._gop_pos = 0

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     qp: int | None = None,
                     force_idr: bool = False) -> EncodedFrame:
        return self.encode_frame_async(y, u, v, qp, force_idr).result()

    def _hdr_arrays(self, idr: bool, qp: int, frame_num: int,
                    idr_pic_id: int) -> tuple[np.ndarray, np.ndarray]:
        """Per-row slice-header symbols as fixed (mbh, HDR_SLOTS) arrays
        for the device packer."""
        from ceracoder_tpu.codec.h264.device_entropy import HDR_SLOTS
        hv = np.zeros((self.mbh, HDR_SLOTS), np.uint32)
        hl = np.zeros((self.mbh, HDR_SLOTS), np.int32)
        for row in range(self.mbh):
            hdr = write_slice_header(SliceConfig(
                first_mb=row * self.mbw,
                slice_type=SLICE_I_ALL if idr else SLICE_P_ALL,
                frame_num=frame_num, idr=idr, idr_pic_id=idr_pic_id,
                qp=qp, pic_init_qp=self.pps.pic_init_qp,
                deblock_idc=2 if self.deblock else 1))
            v, ln = hdr.arrays()
            if v.size > HDR_SLOTS:
                raise AssertionError("HDR_SLOTS too small")
            hv[row, :v.size] = v
            hl[row, :ln.size] = ln
        return hv, hl

    def encode_frame_async(self, y: np.ndarray, u: np.ndarray,
                           v: np.ndarray, qp: int | None = None,
                           force_idr: bool = False) -> PendingFrame:
        """Dispatch the frame to the device and return immediately.

        The returned PendingFrame materializes the bitstream on
        .result(); keeping several in flight overlaps the ~100 ms
        device->host tunnel latency with compute (the difference between
        ~2 fps and real-time at 1080p — see device_entropy docstring).
        """
        if self.cabac_fused:
            return self._encode_run_cabac(
                frames=[(y, u, v)], qp=qp, qps=None, source=None,
                indices=None, force_idr=force_idr)[0]
        qp = self.qp if qp is None else qp
        qp_c = chroma_qp(qp, self.chroma_qp_offset)
        import jax.numpy as jnp
        idr = force_idr or self._ref is None or self._gop_pos >= self.gop
        frame_num = 0 if idr else self.frame_num
        idr_pic_id = self.idr_pic_id
        prev_ref = self._ref

        yj, uj, vj = jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)

        if not self.device_entropy:
            data, recon = self._encode_host_path(
                yj, uj, vj, qp, qp_c, idr, frame_num, idr_pic_id, prev_ref)
            self._ref = recon
            self._advance_state(idr)
            frame = EncodedFrame(data=data, keyframe=idr, qp=qp,
                                 _recon_dev=recon)
            self.frame_idx += 1
            return PendingFrame(lambda: frame, idr, qp)

        from ceracoder_tpu.codec.h264.device_entropy import (
            encode_i_frame_packed, encode_p_frame_packed)
        hv, hl = self._hdr_arrays(idr, qp, frame_num, idr_pic_id)
        if idr:
            (hdr, chunks), recon = encode_i_frame_packed(
                yj, uj, vj, qp, qp_c, hv, hl,
                capw=self._capw, totcap=self._totcap,
                deblock=self.deblock)
        else:
            (hdr, chunks), recon = encode_p_frame_packed(
                yj, uj, vj, *prev_ref, qp, qp_c, hv, hl,
                capw=self._capw, totcap=self._totcap,
                deblock=self.deblock)
        self._ref = recon
        self._advance_state(idr)
        self.frame_idx += 1
        # start device->host copies now so they overlap with later
        # frames' compute: the row-byte header plus the number of
        # stream chunks the previous frame of this kind needed (+1
        # margin). Blocking transfers have a ~35 ms latency floor over
        # the axon tunnel; prefetched ones land in the background.
        try:
            hdr.copy_to_host_async()
            for c in chunks[:self._prev_chunks[idr] + 1]:
                c.copy_to_host_async()
        except AttributeError:
            pass

        def finish() -> EncodedFrame:
            data = self._frame_bytes_from_buf(
                hdr, chunks, idr, qp, qp_c, yj, uj, vj, frame_num,
                idr_pic_id, prev_ref)
            return EncodedFrame(data=data, keyframe=idr, qp=qp,
                                _recon_dev=recon)

        return PendingFrame(finish, idr, qp)

    def encode_run_async(self, frames=None, qp: int | None = None,
                         qps=None, source=None, indices=None,
                         force_idr: bool = False) -> list[PendingFrame]:
        """Encode a run of consecutive frames in ONE device dispatch.

        Either `frames` (list of (y, u, v) plane tuples) or `source` +
        `indices` (a device-side source whose jitted `gen(i)` produces
        planes on device — no host->device pixel transfer at all).

        A lax.scan inside the dispatch carries the reconstruction, so
        the per-launch round trip is paid once per run instead of once
        per frame; GOP scheduling (IDR placement) follows the same
        state machine as encode_frame_async. Returns one PendingFrame
        per input frame; device->host traffic is one row-byte header
        plus ceil(max coded size / 32 KB) shared chunk arrays per run.
        """
        import jax.numpy as jnp
        from ceracoder_tpu.codec.h264.device_entropy import (
            HDR_SLOTS, encode_run_packed)

        if self.cabac_fused:
            return self._encode_run_cabac(frames, qp, qps, source,
                                          indices, force_idr)
        if not self.device_entropy:
            # dense host-entropy mode (the executable spec): one
            # synchronous per-frame dispatch through the host path.
            if frames is None:
                frames = [source.frame(i) for i in indices]
            return [
                self.encode_frame_async(
                    y, u, v,
                    qp=(qps[f] if qps is not None else qp),
                    force_idr=force_idr and f == 0)
                for f, (y, u, v) in enumerate(frames)]
        if frames is not None:
            nf = len(frames)
        else:
            nf = len(indices)
        if nf == 0:
            return []

        idr_flags = np.zeros(nf, bool)
        qp_arr = np.zeros(nf, np.int32)
        qpc_arr = np.zeros(nf, np.int32)
        hvs = np.zeros((nf, self.mbh, HDR_SLOTS), np.uint32)
        hls = np.zeros((nf, self.mbh, HDR_SLOTS), np.int32)
        frame_nums = np.zeros(nf, np.int32)
        idr_ids = np.zeros(nf, np.int32)
        have_ref = self._ref is not None
        for f in range(nf):
            qp_f = (qps[f] if qps is not None
                    else (self.qp if qp is None else qp))
            idr = ((force_idr and f == 0) or not have_ref
                   or self._gop_pos >= self.gop)
            frame_num = 0 if idr else self.frame_num
            idr_flags[f] = idr
            qp_arr[f] = qp_f
            qpc_arr[f] = chroma_qp(qp_f, self.chroma_qp_offset)
            frame_nums[f] = frame_num
            idr_ids[f] = self.idr_pic_id
            hvs[f], hls[f] = self._hdr_arrays(idr, qp_f, frame_num,
                                              self.idr_pic_id)
            self._advance_state(idr)
            self.frame_idx += 1
            have_ref = True

        prev_ref = self._ref
        if prev_ref is None:
            prev_ref = (jnp.zeros((self.height, self.width), jnp.uint8),
                        jnp.zeros((self.height // 2, self.width // 2),
                                  jnp.uint8),
                        jnp.zeros((self.height // 2, self.width // 2),
                                  jnp.uint8))
        any_idr = bool(idr_flags.any())

        if frames is not None:
            ys = jnp.stack([jnp.asarray(t[0]) for t in frames])
            us = jnp.stack([jnp.asarray(t[1]) for t in frames])
            vs = jnp.stack([jnp.asarray(t[2]) for t in frames])
            source_fn = None
            fidx = np.zeros(nf, np.int32)
        else:
            dummy = jnp.zeros((nf, 1, 1), jnp.uint8)
            ys = us = vs = dummy
            source_fn = source.gen_fn
            fidx = np.asarray(indices, np.int32)

        (hdrs, chunks), recons = encode_run_packed(
            ys, us, vs, jnp.asarray(idr_flags), jnp.asarray(qp_arr),
            jnp.asarray(qpc_arr), jnp.asarray(hvs), jnp.asarray(hls),
            *prev_ref, capw=self._capw, totcap=self._totcap,
            deblock=self.deblock, any_idr=any_idr,
            source_fn=source_fn, frame_idx=jnp.asarray(fidx))
        self._ref = tuple(r[-1] for r in recons)

        npre = max(self._prev_chunks[True] if any_idr else 0,
                   self._prev_chunks[False]) + 1
        try:
            hdrs.copy_to_host_async()
            for c in chunks[:npre]:
                c.copy_to_host_async()
        except AttributeError:
            pass

        cache: dict = {"hdrs": None, "chunks": {}}

        def get_hdrs():
            if cache["hdrs"] is None:
                cache["hdrs"] = np.asarray(hdrs).astype(np.int64)
            return cache["hdrs"]

        def get_chunk(c):
            if c not in cache["chunks"]:
                cache["chunks"][c] = np.asarray(chunks[c])
            return cache["chunks"][c]

        pend = []
        for f in range(nf):
            pend.append(self._make_run_pending(
                f, bool(idr_flags[f]), int(qp_arr[f]), int(qpc_arr[f]),
                int(frame_nums[f]), int(idr_ids[f]), get_hdrs, get_chunk,
                len(chunks), recons, prev_ref, frames, source, fidx))
        return pend

    def _make_run_pending(self, f, idr, qp, qp_c, frame_num, idr_pic_id,
                          get_hdrs, get_chunk, nchunks, recons, run_ref,
                          frames, source, fidx) -> PendingFrame:
        from ceracoder_tpu.codec.h264.device_entropy import CHUNK_WORDS

        def finish() -> EncodedFrame:
            import jax.numpy as jnp
            row_bytes = get_hdrs()[f]
            row_words = (row_bytes + 3) >> 2
            used = int(row_words.sum())
            recon_f = tuple(r[f] for r in recons)
            if (used > self._totcap // 4
                    or int(row_bytes.max()) > self._capw * 4
                    or used > nchunks * CHUNK_WORDS):
                # capacity overflow: redo this frame on the exact host
                # entropy path, referencing the in-run reconstruction
                if frames is not None:
                    yj, uj, vj = (jnp.asarray(p) for p in frames[f])
                else:
                    yj, uj, vj = source.gen_fn(int(fidx[f]))
                ref = run_ref if f == 0 else tuple(r[f - 1] for r in recons)
                data, _ = self._encode_host_path(
                    yj, uj, vj, qp, qp_c, idr, frame_num, idr_pic_id, ref)
                return EncodedFrame(data=data, keyframe=idr, qp=qp,
                                    _recon_dev=recon_f)
            nch = max(1, -(-used // CHUNK_WORDS))
            self._prev_chunks[idr] = nch
            stream = np.concatenate(
                [get_chunk(c)[f] for c in range(nch)]).astype(">u4").tobytes()
            nals = []
            off = 0
            ref_idc, ntype = (3, NAL_IDR) if idr else (2, NAL_SLICE)
            for row in range(self.mbh):
                rb = int(row_bytes[row])
                nals.append(nal_unit(ref_idc, ntype,
                                     stream[off:off + rb],
                                     long_start_code=(row == 0)))
                off += int(row_words[row]) * 4
            return EncodedFrame(data=b"".join(nals), keyframe=idr, qp=qp,
                                _recon_dev=recon_f)

        return PendingFrame(finish, idr, qp)

    def _encode_run_cabac(self, frames, qp, qps, source, indices,
                          force_idr: bool) -> list[PendingFrame]:
        """Fused-run CABAC scheduler: device compute stays in one
        lax.scan per GOP segment (IDR frames dispatch alone through
        the intra executable, P spans through the P-run executable —
        same split as the HEVC run path), the sparse-compacted syntax
        transfers per run, and the threaded native row coder
        (native/src/h264_cabac.cc) finishes each frame on .result()
        so entropy overlaps the next run's device compute."""
        import jax.numpy as jnp

        from ceracoder_tpu.codec.h264 import cabac_run

        nf = len(frames) if frames is not None else len(indices)
        if nf == 0:
            return []

        # split mixed runs at IDR boundaries
        sim_pos, sim_have = self._gop_pos, self._ref is not None
        flags = []
        for f in range(nf):
            idr = ((force_idr and f == 0) or not sim_have
                   or sim_pos >= self.gop)
            flags.append(idr)
            sim_pos = 1 if idr else sim_pos + 1
            sim_have = True
        if any(flags) and nf > 1:
            cuts = [f for f in range(nf) if flags[f]]
            bounds = sorted({0, nf} | set(cuts) | {c + 1 for c in cuts})
            pend: list[PendingFrame] = []
            for a, b in zip(bounds, bounds[1:]):
                pend += self._encode_run_cabac(
                    None if frames is None else frames[a:b],
                    qp,
                    None if qps is None else qps[a:b],
                    source,
                    None if indices is None else list(indices)[a:b],
                    flags[a])
            return pend
        idr_run = bool(flags[0])        # single IDR, or pure-P span

        qp_a = np.zeros(nf, np.int32)
        qpc_a = np.zeros(nf, np.int32)
        fnum_a = np.zeros(nf, np.int32)
        ipid_a = np.zeros(nf, np.int32)
        for f in range(nf):
            qp_f = (qps[f] if qps is not None
                    else (self.qp if qp is None else qp))
            qp_a[f] = qp_f
            qpc_a[f] = chroma_qp(qp_f, self.chroma_qp_offset)
            fnum_a[f] = 0 if flags[f] else self.frame_num
            ipid_a[f] = self.idr_pic_id
            self._advance_state(flags[f])
            self.frame_idx += 1

        prev_ref = self._ref

        def planes_of(f):
            if frames is not None:
                return tuple(jnp.asarray(p) for p in frames[f])
            return source.gen_fn(int(indices[f]))

        if idr_run:
            chunk = self._cabac_idr_chunk
            cap = max(self._cabac_cap, 2 * chunk)
            y, u, v = planes_of(0)
            packed, chunks, recon = cabac_run.encode_idr_syntax(
                y, u, v, jnp.asarray(qp_a[0]), jnp.asarray(qpc_a[0]),
                cap=cap, chunk=chunk, deblock=self.deblock)
            self._ref = recon
            recons = None
        else:
            chunk = cabac_run.CHUNK
            cap = self._cabac_cap
            if frames is not None:
                ys = jnp.stack([jnp.asarray(t[0]) for t in frames])
                us = jnp.stack([jnp.asarray(t[1]) for t in frames])
                vs = jnp.stack([jnp.asarray(t[2]) for t in frames])
                source_fn = None
                fidx = np.zeros(nf, np.int32)
            else:
                dummy = jnp.zeros((nf, 1, 1), jnp.uint8)
                ys = us = vs = dummy
                source_fn = source.gen_fn
                fidx = np.asarray(indices, np.int32)
            if prev_ref is None:      # unreachable: flags[0] would be IDR
                raise AssertionError("P run without a reference")
            packed, chunks, recons = cabac_run.encode_run_syntax_p(
                ys, us, vs, jnp.asarray(qp_a), jnp.asarray(qpc_a),
                *prev_ref, jnp.asarray(fidx), cap=cap, chunk=chunk,
                deblock=self.deblock, source_fn=source_fn,
                intra_in_p=self.intra_in_p)
            self._ref = tuple(r[-1] for r in recons)
            recon = None

        # start the device->host copies now so they overlap compute:
        # the packed row always, plus the extra level chunks the
        # previous run needed
        try:
            packed.copy_to_host_async()
            for c in chunks[:self._prev_cabac_extra]:
                c.copy_to_host_async()
        except AttributeError:
            pass

        cache: dict = {}

        def get_packed():
            if "p" not in cache:
                cache["p"] = np.asarray(packed)
            return cache["p"]

        def get_chunk(c):
            if ("c", c) not in cache:
                cache[("c", c)] = np.asarray(chunks[c])
            return cache[("c", c)]

        pend = []
        for f in range(nf):
            pend.append(self._make_cabac_pending(
                f, bool(flags[f]), int(qp_a[f]), int(qpc_a[f]),
                int(fnum_a[f]), int(ipid_a[f]), get_packed, get_chunk,
                cap, chunk, recon, recons, prev_ref, planes_of))
        return pend

    def _make_cabac_pending(self, f, idr, qp, qp_c, frame_num,
                            idr_pic_id, get_packed, get_chunk, cap,
                            chunk, recon, recons, run_ref,
                            planes_of) -> PendingFrame:
        from ceracoder_tpu.codec.h264.cabac_assemble import (
            assemble_i_snake,
            assemble_p_snake,
        )
        from ceracoder_tpu.codec.h264.cabac_run import unpack_syntax

        def finish() -> EncodedFrame:
            recon_f = (recon if recons is None
                       else tuple(r[f] for r in recons))
            row = get_packed()[f]
            nnz, arrays = unpack_syntax(row, get_chunk, f, self.mbh,
                                        self.mbw, idr, cap, chunk)
            if arrays is None:
                # capacity overflow: redo this frame on the exact
                # dense host path, referencing the in-run recon; an
                # overflowing frame transferred no valid extra chunks,
                # so drop the prefetch hint (cf. the HEVC twin)
                self._prev_cabac_extra = 0
                yj, uj, vj = planes_of(f)
                ref = (run_ref if f == 0 or recons is None
                       else tuple(r[f - 1] for r in recons))
                data, _ = self._encode_host_path(
                    yj, uj, vj, qp, qp_c, idr, frame_num, idr_pic_id,
                    ref)
            else:
                if not idr:
                    self._prev_cabac_extra = max(0, -(-nnz // chunk) - 1)
                if idr:
                    data = assemble_i_snake(
                        arrays, qp, idr_pic_id, self.mbh, self.mbw,
                        self.pps.pic_init_qp, self.deblock)
                else:
                    data = assemble_p_snake(
                        arrays, qp, frame_num, self.mbh, self.mbw,
                        self.pps.pic_init_qp, self.deblock)
            return EncodedFrame(data=data, keyframe=idr, qp=qp,
                                _recon_dev=recon_f)

        return PendingFrame(finish, idr, qp)

    def _advance_state(self, idr: bool) -> None:
        if idr:
            self.frame_num = 1          # IDR was frame_num 0
            self._gop_pos = 1
            self.idr_pic_id = (self.idr_pic_id + 1) % 16
        else:
            self.frame_num = (self.frame_num + 1) % (
                1 << self.sps.log2_max_frame_num)
            self._gop_pos += 1

    def _frame_bytes_from_buf(self, hdr, chunks, idr: bool, qp: int,
                              qp_c: int, yj, uj, vj, frame_num: int,
                              idr_pic_id: int, prev_ref) -> bytes:
        """Split the device-packed buffer into per-row NAL units; on
        capacity overflow, redo the frame through the host entropy
        path (exact, just slower)."""
        from ceracoder_tpu.codec.h264.device_entropy import CHUNK_WORDS
        mbh = self.mbh
        row_bytes = np.asarray(hdr).astype(np.int64)
        row_words = (row_bytes + 3) >> 2
        if (int(row_words.sum()) > self._totcap // 4
                or int(row_bytes.max()) > self._capw * 4):
            data, _ = self._encode_host_path(
                yj, uj, vj, qp, qp_c, idr, frame_num, idr_pic_id, prev_ref)
            return data
        used_words = int(row_words.sum())
        nch = max(1, -(-used_words // CHUNK_WORDS))
        self._prev_chunks[idr] = nch
        # device words are MSB-first byte containers
        stream = np.concatenate(
            [np.asarray(c) for c in chunks[:nch]]).astype(">u4").tobytes()
        nals = []
        off = 0
        ref_idc, ntype = (3, NAL_IDR) if idr else (2, NAL_SLICE)
        for row in range(mbh):
            rb = int(row_bytes[row])
            nals.append(nal_unit(ref_idc, ntype, stream[off:off + rb],
                                 long_start_code=(row == 0)))
            off += int(row_words[row]) * 4
        return b"".join(nals)

    def _encode_host_path(self, yj, uj, vj, qp: int, qp_c: int, idr: bool,
                          frame_num: int, idr_pic_id: int, prev_ref):
        """Original host-entropy path: device compute, host CAVLC."""
        from ceracoder_tpu.ops.deblock import deblock_frame_rows
        import jax.numpy as jnp
        if idr:
            outs = encode_frame_i16_rows(yj, uj, vj, qp, qp_c)
            recon = outs["recon"]
            if self.deblock:
                zero_nnz = jnp.zeros((self.mbh, self.mbw, 4, 4), jnp.int32)
                zero_mv = jnp.zeros((self.mbh, self.mbw, 2), jnp.int32)
                recon = deblock_frame_rows(*recon, zero_nnz, zero_mv,
                                           qp, qp_c, intra_frame=True)
            outs_np = {k: np.asarray(o) for k, o in outs.items()
                       if not isinstance(o, tuple)}
            if self.cabac:
                from ceracoder_tpu.codec.h264.cabac_assemble import (
                    assemble_i_cabac,
                )
                data = assemble_i_cabac(
                    outs_np, qp, idr_pic_id, self.mbh, self.mbw,
                    self.pps.pic_init_qp, self.deblock, LUMA_SNAKE)
            else:
                data = self._assemble(outs_np, qp, idr_pic_id)
        else:
            outs = encode_frame_p(yj, uj, vj, *prev_ref, qp, qp_c,
                                  intra_in_p=self.intra_in_p)
            recon = outs["recon"]
            if self.deblock:
                nnz44 = (outs["luma_levels"] != 0).any(-1).astype(jnp.int32)
                recon = deblock_frame_rows(*recon, nnz44, outs["mv"],
                                           qp, qp_c, intra_frame=False,
                                           intra_mb=outs.get("is_intra"))
            outs_np = {k: np.asarray(o) for k, o in outs.items()
                       if not isinstance(o, tuple)}
            if self.cabac:
                from ceracoder_tpu.codec.h264.cabac_assemble import (
                    assemble_p_cabac,
                )
                data = assemble_p_cabac(
                    outs_np, qp, frame_num, self.mbh, self.mbw,
                    self.pps.pic_init_qp, self.deblock, LUMA_SNAKE)
            else:
                data = self._assemble_p(outs_np, qp, frame_num)
        # NOTE: does not touch self._ref — the overflow fallback runs
        # after later frames may already be in flight; the caller that
        # owns the submission order assigns the reference.
        return data, recon

    # ------------------------------------------------------------------
    def _assemble(self, outs: dict, qp: int,
                  idr_pic_id: int) -> bytes:
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
                idr=True, idr_pic_id=idr_pic_id, qp=qp,
                pic_init_qp=self.pps.pic_init_qp,
                deblock_idc=2 if self.deblock else 1))
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

    # ------------------------------------------------------------------
    def _assemble_p(self, outs: dict, qp: int, frame_num: int) -> bytes:
        """P-slice assembly: P_L0_16x16 + P_Skip, one slice per MB row
        (spec 7.3.4/7.4.4; MV prediction 8.4.1.3 under slice-row
        neighbor availability)."""
        mbh, mbw = self.mbh, self.mbw
        n = mbh * mbw
        S_ = S

        mvg = outs["mv"].astype(np.int64)               # (mbh, mbw, 2) dy,dx
        ll = outs["luma_levels"].reshape(mbh, mbw, 4, 4, 16)
        dc_chroma = outs["dc_chroma"]                   # (mbh, mbw, 2, 4)
        ac_chroma = outs["ac_chroma"]                   # (mbh, mbw, 2, 2, 2, 15)

        # --- coded block pattern
        nz44 = (ll != 0).any(-1)                        # (mbh, mbw, 4, 4)
        qbits = np.zeros((mbh, mbw, 4), np.int64)
        for q in range(4):
            r0, c0 = 2 * (q // 2), 2 * (q % 2)
            qbits[..., q] = nz44[:, :, r0:r0 + 2, c0:c0 + 2].any((-1, -2))
        cbp_luma = (qbits << np.arange(4)).sum(-1)      # (mbh, mbw)
        any_cac = (ac_chroma != 0).reshape(mbh, mbw, -1).any(-1)
        any_cdc = (dc_chroma != 0).reshape(mbh, mbw, -1).any(-1)
        cbp_chroma = np.where(any_cac, 2, np.where(any_cdc, 1, 0))
        cbp = cbp_luma | (cbp_chroma << 4)

        # --- MV prediction (slice-row: top/topright unavailable =>
        # pmv = left MB's mv, 0 for the first MB; spec 8.4.1.3.1)
        pmv = np.zeros_like(mvg)
        pmv[:, 1:] = mvg[:, :-1]
        # mv/mvd are in quarter-pel units throughout (spec 7.4.5.1)
        mvd = mvg - pmv

        # --- P_Skip: mv equals the skip predictor (always (0,0) with the
        # top row unavailable, spec 8.4.1.1) and cbp == 0
        skip = (mvg[..., 0] == 0) & (mvg[..., 1] == 0) & (cbp == 0)

        # mb_skip_run before each non-skip MB (per slice = per row)
        run_val = np.zeros((mbh, mbw), np.int64)
        trailing = np.zeros(mbh, np.int64)
        for r in range(mbh):
            idx = np.nonzero(~skip[r])[0]
            prev = np.concatenate([[-1], idx[:-1]])
            run_val[r, idx] = idx - prev - 1
            trailing[r] = mbw - 1 - (idx[-1] if idx.size else -1)

        coded = ~skip.reshape(n)

        # --- nC from 16-coeff TotalCoeffs
        nnz = (ll != 0).sum(-1)                         # (mbh, mbw, 4, 4)
        grid = nnz.swapaxes(1, 2).reshape(mbh * 4, mbw * 4)
        nc_luma = _neighbor_nc(grid, 4, same_row_only=True)
        nc_grid = nc_luma.reshape(mbh, 4, mbw, 4).swapaxes(1, 2)

        snake_r, snake_c = LUMA_SNAKE[:, 0], LUMA_SNAKE[:, 1]
        blocks = ll[:, :, snake_r, snake_c].reshape(n * 16, 16)
        nc_blk = nc_grid[:, :, snake_r, snake_c].reshape(n * 16)
        v_l, l_l, _ = cavlc.encode_blocks(blocks, nc_blk, 16)
        # mask: block coded iff its quadrant bit set and MB not skipped
        blk_q = np.arange(16) // 4                      # snake: 4 per 8x8
        blk_coded = (qbits.reshape(n, 4)[:, blk_q] > 0) & coded[:, None]
        l_l = l_l.reshape(n, 16, S_) * blk_coded[:, :, None]

        cdc = dc_chroma.reshape(n * 2, 4)
        v_cdc, l_cdc, _ = cavlc.encode_blocks(cdc, np.full(n * 2, -1), 4)
        l_cdc = (l_cdc.reshape(n, 2, S_)
                 * ((cbp_chroma.reshape(n) > 0) & coded)[:, None, None])

        chroma_nnz = (ac_chroma != 0).sum(-1)
        nc_cac = np.empty((2, mbh * 2, mbw * 2), np.int64)
        for comp in range(2):
            g = chroma_nnz[:, :, comp].swapaxes(1, 2).reshape(mbh * 2, mbw * 2)
            nc_cac[comp] = _neighbor_nc(g, 2, same_row_only=True)
        nc_cac_g = np.stack([nc_cac[c].reshape(mbh, 2, mbw, 2).swapaxes(1, 2)
                             for c in range(2)])
        nc_cac_flat = nc_cac_g.transpose(1, 2, 0, 3, 4).reshape(n * 8)
        cac = ac_chroma.reshape(n * 8, 15)
        v_cac, l_cac, _ = cavlc.encode_blocks(cac, nc_cac_flat, 15)
        l_cac = (l_cac.reshape(n, 8, S_)
                 * ((cbp_chroma.reshape(n) == 2) & coded)[:, None, None])

        # --- header symbols
        v_run, l_run = _ue_arr(run_val.reshape(n))
        v_mt, l_mt = _ue_arr(np.zeros(n, np.int64))     # P_L0_16x16
        v_mvx, l_mvx = _se_arr(mvd[..., 1].reshape(n))  # x first
        v_mvy, l_mvy = _se_arr(mvd[..., 0].reshape(n))
        cbp_code = CBP_INTER_TO_CODE[cbp.reshape(n)]
        v_cbp, l_cbp = _ue_arr(cbp_code)
        has_qpd = (cbp.reshape(n) > 0)

        vals = np.zeros((n, P_MB_SLOTS), np.uint32)
        lens = np.zeros((n, P_MB_SLOTS), np.int32)
        vals[:, 0], lens[:, 0] = v_run, l_run * coded
        vals[:, 1], lens[:, 1] = v_mt, l_mt * coded
        vals[:, 2], lens[:, 2] = v_mvx, l_mvx * coded
        vals[:, 3], lens[:, 3] = v_mvy, l_mvy * coded
        vals[:, 4], lens[:, 4] = v_cbp, l_cbp * coded
        vals[:, 5] = 1                                  # se(0)
        lens[:, 5] = (has_qpd & coded).astype(np.int32)
        o = 6
        vals[:, o:o + 16 * S_] = v_l.reshape(n, 16 * S_)
        lens[:, o:o + 16 * S_] = l_l.reshape(n, 16 * S_)
        o += 16 * S_
        vals[:, o:o + 2 * S_] = v_cdc.reshape(n, 2 * S_)
        lens[:, o:o + 2 * S_] = l_cdc.reshape(n, 2 * S_)
        o += 2 * S_
        vals[:, o:o + 8 * S_] = v_cac.reshape(n, 8 * S_)
        lens[:, o:o + 8 * S_] = l_cac.reshape(n, 8 * S_)

        vals = vals.reshape(mbh, mbw * P_MB_SLOTS)
        lens = lens.reshape(mbh, mbw * P_MB_SLOTS)

        nals = []
        for row in range(mbh):
            hdr = write_slice_header(SliceConfig(
                first_mb=row * mbw, slice_type=SLICE_P_ALL,
                frame_num=frame_num, idr=False, qp=qp,
                pic_init_qp=self.pps.pic_init_qp,
                deblock_idc=2 if self.deblock else 1))
            hv, hl = hdr.arrays()
            parts_v = [hv.astype(np.uint32), vals[row]]
            parts_l = [hl, lens[row]]
            if trailing[row] > 0:
                tv, tl = _ue_arr(np.array([trailing[row]]))
                parts_v.append(tv)
                parts_l.append(tl)
            rv = np.concatenate(parts_v)
            rl = np.concatenate(parts_l)
            total = int(rl.sum())
            pad = (-(total + 1)) % 8
            rv = np.concatenate([rv, np.array([1 << pad], np.uint32)])
            rl = np.concatenate([rl, np.array([1 + pad], np.int32)])
            payload = pack_bits(rv, rl)
            nals.append(nal_unit(2, NAL_SLICE, payload,
                                 long_start_code=(row == 0)))
        return b"".join(nals)
