"""HEVC device encoder: JAX compute on chip + native C++ entropy.

Per frame: the device op (ops/h265.py) produces per-CTB decision and
level arrays plus the reconstruction (which stays on device as the
next reference); the arrays transfer to host where the native CABAC
stage (native/src/hevc_entropy.cc, fallback rowslice.entropy_rows)
emits one slice per CTB row. The pipeline is async like the H.264
encoder: dispatch returns immediately, `.result()` materializes the
bitstream, so several frames stay in flight over the transfer.

Replaces the reference's external HEVC encoder elements end to end
(reference: pipeline/ *h265*, e.g. pipeline/jetson/h265_test_pattern;
SURVEY.md §2.2, §7.1-§7.2).
"""

from __future__ import annotations

import numpy as np

from ceracoder_tpu.codec.h264.encoder import EncodedFrame, PendingFrame
from ceracoder_tpu.codec.h265.rowslice import (
    entropy_rows,
    entropy_rows_native,
)
from ceracoder_tpu.codec.h265.syntax import (
    NAL_IDR_W_RADL,
    NAL_TRAIL_R,
    HevcParams,
    nal_unit,
    write_pps,
    write_sps,
    write_vps,
)

CTB = 16


class H265DeviceEncoder:
    """IDR + low-delay-P HEVC encoder, device compute + host entropy.

    The bitstream is identical to H265RowEncoder's (same arrays, same
    entropy stage); the oracle conformance carries over and is
    re-checked end to end in tests/test_h265_device.py.
    """

    def __init__(self, width: int, height: int, qp: int = 32,
                 gop: int = 60, native_entropy: bool = True,
                 deblock: bool = True, bframes: int = 0,
                 tile_rows: bool = True, sao: bool = False,
                 tu_split: bool = False):
        from ceracoder_tpu.codec.h265.intra import chroma_qp

        if width % 2 or height % 2:
            raise ValueError("4:2:0 requires even dimensions (the "
                             "conformance window crops in 2-sample "
                             "units)")
        self.width, self.height = width, height
        self.qp = qp
        self.gop = max(1, gop)
        self.native_entropy = native_entropy
        self.deblock = deblock
        self.sao = sao
        self.tu_split = tu_split
        self.bframes = 1 if bframes else 0
        self._chroma_qp = chroma_qp
        self.params = HevcParams(width=width, height=height, qp=qp,
                                 pcm_enabled=False, deblock=deblock,
                                 max_reorder=self.bframes,
                                 max_dpb_minus1=1 + self.bframes,
                                 tile_rows=tile_rows, sao=sao,
                                 tu_split_inter=tu_split)
        self.pw = -(-width // CTB) * CTB
        self.ph = -(-height // CTB) * CTB
        self._ref = None              # device recon planes
        self._pending = None          # buffered B candidate
        self._poc = 0

    def headers(self) -> bytes:
        p = self.params
        return write_vps(p) + write_sps(p) + write_pps(p)

    def resume(self) -> None:
        """Drop all transient state (references, buffered B, GOP
        position): the next frame codes as a fresh IDR (SURVEY.md §5
        recovery model)."""
        self._ref = None
        self._pending = None
        self._poc = 0

    def _post_filter_dev(self, outs, src_planes, qp, mv1=None):
        """Frame post-pass on device: deblock, then SAO (params
        returned for the entropy stage). Uses the module-level jitted
        entry points — a fresh jax.jit wrapper per frame would
        re-trace every call."""
        from ceracoder_tpu.ops.h265 import (
            deblock_frame_jit,
            sao_apply_jit,
            sao_estimate_jit,
        )

        rec = outs["recon"]
        sao_params = None
        if self.deblock:
            cbf_l = outs["luma_lv"].reshape(
                *outs["luma_lv"].shape[:2], -1).any(-1)
            rec = deblock_frame_jit(*outs["recon"], outs["is_intra"],
                                    cbf_l, outs["mv"], qp, mv1,
                                    tu_split=outs["tu_split"],
                                    luma_lv=outs["luma_lv"])
        if self.sao:
            sao_params = sao_estimate_jit(src_planes, rec, qp)
            rec = sao_apply_jit(rec, sao_params)
        return rec, sao_params

    def _pad_dev(self, plane, h, w):
        import jax.numpy as jnp
        plane = jnp.asarray(plane)
        ph, pw = plane.shape
        if ph == h and pw == w:
            return plane
        return jnp.pad(plane, ((0, h - ph), (0, w - pw)), mode="edge")

    def encode_frame(self, y, u, v, qp: int | None = None,
                     force_idr: bool = False) -> EncodedFrame:
        assert self.bframes == 0, "use push_frame/flush with B frames"
        return self.encode_frame_async(y, u, v, qp, force_idr).result()

    # -- B-frame (IBPBP) entry points -----------------------------------
    def push_frame(self, y, u, v, qp: int | None = None,
                   force_idr: bool = False, allow_b: bool = True):
        """Feed one display-order frame (bframes == 1); returns
        (data, poc, kind, display_recon_dev) tuples in coding order.
        allow_b=False (a lookahead hint: erratic motion) codes the
        frame as P instead of holding it as a B candidate."""
        qp = self.qp if qp is None else qp
        idr = force_idr or self._ref is None or self._poc >= self.gop
        out = []
        if idr:
            out += self.flush()
            fr = self.encode_frame_async(y, u, v, qp=qp,
                                         force_idr=True).result()
            out.append((fr.data, 0, "I", self._ref))
            return out
        if (self.bframes and self._pending is None and allow_b
                and self._poc <= self.gop - 2):
            self._pending = ((y, u, v), self._poc, qp)
            self._poc += 1
            return out
        if self._pending is not None:
            bplanes, bpoc, bqp = self._pending
            self._pending = None
            past = self._ref
            fr = self._encode_px(y, u, v, qp, poc=self._poc,
                                 ref_delta=2)
            out.append((fr.data, self._poc, "P", self._ref))
            out.append(self._encode_b(bplanes, past, self._ref, bpoc,
                                      bqp))
            self._poc += 1
            return out
        fr = self._encode_px(y, u, v, qp, poc=self._poc, ref_delta=1)
        out.append((fr.data, self._poc, "P", self._ref))
        self._poc += 1
        return out

    def flush(self):
        """Code any buffered B candidate as a trailing P frame."""
        if self._pending is None:
            return []
        (y, u, v), poc, qp = self._pending
        self._pending = None
        fr = self._encode_px(y, u, v, qp, poc=poc, ref_delta=1)
        # _poc already advanced when the frame was buffered
        return [(fr.data, poc, "P", self._ref)]

    def _encode_px(self, y, u, v, qp, poc: int,
                   ref_delta: int) -> EncodedFrame:
        """P frame at an explicit POC/ref distance (B-GOP path)."""
        fr = self._dispatch(y, u, v, qp, self._chroma_qp(qp),
                            idr=False, poc=poc, ref_delta=ref_delta)
        return fr.result()

    def _encode_b(self, planes, past, fut, poc: int, qp: int):
        from ceracoder_tpu.ops.h265 import encode_frame_b_rows

        qp_c = self._chroma_qp(qp)
        y, u, v = planes
        yj = self._pad_dev(y, self.ph, self.pw)
        uj = self._pad_dev(u, self.ph // 2, self.pw // 2)
        vj = self._pad_dev(v, self.ph // 2, self.pw // 2)
        outs = encode_frame_b_rows(yj, uj, vj, *past, *fut, qp, qp_c,
                                   tu_split=self.tu_split)
        rec, sp = self._post_filter_dev(outs, (yj, uj, vj), qp,
                                        mv1=outs["mv1"])
        arrays = {k: np.asarray(outs[k]) for k in
                  ("is_intra", "mode", "mv", "mv1", "tu_split",
                   "luma_lv", "cb_lv", "cr_lv")}
        if sp is not None:
            arrays["sao"] = np.asarray(sp)
        rbsps = self._entropy(arrays, idr=False, poc=poc, qp=qp,
                              slice_type="B")
        from ceracoder_tpu.codec.h265.syntax import NAL_TRAIL_N
        data = b"".join(nal_unit(NAL_TRAIL_N, r,
                                 long_start_code=(i == 0))
                        for i, r in enumerate(rbsps))
        return (data, poc, "B", rec)

    def encode_frame_async(self, y, u, v, qp: int | None = None,
                           force_idr: bool = False) -> PendingFrame:
        qp = self.qp if qp is None else qp
        qp_c = self._chroma_qp(qp)
        idr = force_idr or self._ref is None or self._poc >= self.gop
        poc = 0 if idr else self._poc
        if idr:
            self._poc = 1
        else:
            self._poc += 1
        return self._dispatch(y, u, v, qp, qp_c, idr, poc, ref_delta=1)

    def _dispatch(self, y, u, v, qp, qp_c, idr: bool, poc: int,
                  ref_delta: int) -> PendingFrame:
        import jax.numpy as jnp

        from ceracoder_tpu.ops.h265 import (
            encode_frame_i_rows,
            encode_frame_p_rows,
        )

        yj = self._pad_dev(y, self.ph, self.pw)
        uj = self._pad_dev(u, self.ph // 2, self.pw // 2)
        vj = self._pad_dev(v, self.ph // 2, self.pw // 2)

        if idr:
            outs = encode_frame_i_rows(yj, uj, vj, qp, qp_c)
        else:
            outs = encode_frame_p_rows(yj, uj, vj, *self._ref, qp,
                                       qp_c, tu_split=self.tu_split)
        rec, sao_params = self._post_filter_dev(outs, (yj, uj, vj),
                                                qp)
        self._ref = rec

        # compact for transfer: levels fit int16 (quantizer output of
        # 8-bit residuals is < 2^14 at any QP)
        send = {
            "is_intra": outs["is_intra"],
            "mode": outs["mode"],
            "mv": outs["mv"],
            "tu_split": outs["tu_split"],
            "luma_lv": outs["luma_lv"].astype(jnp.int16),
            "cb_lv": outs["cb_lv"].astype(jnp.int16),
            "cr_lv": outs["cr_lv"].astype(jnp.int16),
        }
        for a in send.values():
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        recon_dev = self._ref          # decoder output (post-deblock)

        def finish() -> EncodedFrame:
            arrays = {k: np.asarray(a) for k, a in send.items()}
            if sao_params is not None:
                arrays["sao"] = np.asarray(sao_params)
            rbsps = self._entropy(arrays, idr=idr, poc=poc, qp=qp,
                                  ref_delta=ref_delta)
            ntype = NAL_IDR_W_RADL if idr else NAL_TRAIL_R
            data = b"".join(
                nal_unit(ntype, r, long_start_code=(i == 0))
                for i, r in enumerate(rbsps))
            return EncodedFrame(data=data, keyframe=idr, qp=qp,
                                _recon_dev=recon_dev)

        return PendingFrame(finish, idr, qp)

    def encode_run_async(self, frames=None, qp: int | None = None,
                         qps=None, source=None, indices=None,
                         force_idr: bool = False,
                         cap: int | None = None) -> list[PendingFrame]:
        """Encode a run of consecutive frames in ONE device dispatch
        (lax.scan carries the deblocked reference; the HEVC analog of
        H264Encoder.encode_run_async). Levels transfer sparse-compacted
        in fixed chunks; a frame whose levels overflow the capacity is
        redone exactly on the host path."""
        import jax.numpy as jnp

        from ceracoder_tpu.ops.h265 import LEVEL_CHUNK, encode_run_rows

        nf = len(frames) if frames is not None else len(indices)
        if nf == 0:
            return []

        # split mixed runs at IDR boundaries: an IDR frame dispatches
        # alone through the statically-intra executable (idr_only) and
        # P spans through the plain P-run executable. The dual-core
        # lax.cond body the mixed run would otherwise need compiles
        # pathologically at 4K (~15 min compile, ~25 s per IDR step —
        # vs 41 ms for the standalone intra core).
        sim_poc, sim_have = self._poc, self._ref is not None
        flags = []
        for f in range(nf):
            idr = ((force_idr and f == 0) or not sim_have
                   or sim_poc >= self.gop)
            flags.append(idr)
            sim_poc = 1 if idr else sim_poc + 1
            sim_have = True
        if any(flags) and nf > 1:
            cuts = [f for f in range(nf) if flags[f]]
            bounds = sorted({0, nf}
                            | {c for c in cuts} | {c + 1 for c in cuts})
            pendings: list[PendingFrame] = []
            for a, b in zip(bounds, bounds[1:]):
                pendings += self.encode_run_async(
                    frames=None if frames is None else frames[a:b],
                    qp=qp,
                    qps=None if qps is None else qps[a:b],
                    source=source,
                    indices=None if indices is None
                    else list(indices)[a:b],
                    force_idr=flags[a], cap=cap)
            return pendings
        idr_only = bool(flags[0]) and nf == 1

        n_ctb = (self.ph // CTB) * (self.pw // CTB)
        cap = cap or max(2 * LEVEL_CHUNK, n_ctb * 48)
        cap = -(-cap // LEVEL_CHUNK) * LEVEL_CHUNK
        # IDR chunk-0 sized for ~25% of the dense 384 slots/CTB so a
        # typical all-intra frame transfers in ONE chunk (measured
        # ~13% at qp30 on detailed content); cap at 50% before the
        # exact host-path redo kicks in
        self._idr_chunk = -(-(n_ctb * 96) // LEVEL_CHUNK) * LEVEL_CHUNK

        idr_flags = np.zeros(nf, bool)
        qp_arr = np.zeros(nf, np.int32)
        qpc_arr = np.zeros(nf, np.int32)
        pocs = np.zeros(nf, np.int32)
        have_ref = self._ref is not None
        for f in range(nf):
            qp_f = (qps[f] if qps is not None
                    else (self.qp if qp is None else qp))
            idr = ((force_idr and f == 0) or not have_ref
                   or self._poc >= self.gop)
            idr_flags[f] = idr
            qp_arr[f] = qp_f
            qpc_arr[f] = self._chroma_qp(qp_f)
            pocs[f] = 0 if idr else self._poc
            self._poc = 1 if idr else self._poc + 1
            have_ref = True

        prev_ref = self._ref
        if prev_ref is None:
            prev_ref = (jnp.zeros((self.ph, self.pw), jnp.uint8),
                        jnp.zeros((self.ph // 2, self.pw // 2),
                                  jnp.uint8),
                        jnp.zeros((self.ph // 2, self.pw // 2),
                                  jnp.uint8))
        any_idr = bool(idr_flags.any())

        if frames is not None:
            ys = jnp.stack([self._pad_dev(t[0], self.ph, self.pw)
                            for t in frames])
            us = jnp.stack([self._pad_dev(t[1], self.ph // 2,
                                          self.pw // 2) for t in frames])
            vs = jnp.stack([self._pad_dev(t[2], self.ph // 2,
                                          self.pw // 2) for t in frames])
            source_fn = None
            fidx = np.zeros(nf, np.int32)
        else:
            dummy = jnp.zeros((nf, 1, 1), jnp.uint8)
            ys = us = vs = dummy
            source_fn = source.gen_fn
            fidx = np.asarray(indices, np.int32)

        if idr_only:
            from ceracoder_tpu.ops.h265 import encode_idr_rows
            if source_fn is not None:
                y1, u1, v1 = source.frame(int(fidx[0]))
                y1 = self._pad_dev(y1, self.ph, self.pw)
                u1 = self._pad_dev(u1, self.ph // 2, self.pw // 2)
                v1 = self._pad_dev(v1, self.ph // 2, self.pw // 2)
            else:
                y1, u1, v1 = ys[0], us[0], vs[0]
            # IDR frames carry far more levels than P frames (every
            # CTB intra-coded): size the compaction for ~50% of the
            # dense 384 slots/CTB and use a large transfer chunk so
            # chunk 0 covers the whole stream in one transfer (the
            # tunnel charges ~25 ms latency per transfer)
            chunk = self._idr_chunk
            cap_idr = max(cap, 2 * chunk)
            outs = encode_idr_rows(
                y1, u1, v1, jnp.asarray(qp_arr[0]),
                jnp.asarray(qpc_arr[0]),
                cap=cap_idr, deblock=self.deblock, sao=self.sao,
                chunk=chunk)
            cap = cap_idr
        else:
            outs = encode_run_rows(
                ys, us, vs, jnp.asarray(idr_flags),
                jnp.asarray(qp_arr), jnp.asarray(qpc_arr), *prev_ref,
                jnp.asarray(fidx), cap=cap,
                any_idr=any_idr and not idr_only, deblock=self.deblock,
                sao=self.sao, tu_split=self.tu_split,
                source_fn=source_fn, idr_only=idr_only)
        recons = outs["recon"]
        self._ref = tuple(r[-1] for r in recons)

        small = [outs["packed"]]
        if self.sao:
            small.append(outs["sao"])
        # prefetch the extra level chunks the previous run needed
        # (typically none: chunk 0 covers a whole frame at normal QPs)
        npre = min(len(outs["lv_chunks"]),
                   getattr(self, "_prev_nextra", 0))
        small += [outs["lv_chunks"][c] for c in range(npre)]
        for a in small:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass

        cache: dict = {}

        def get(name, c=None):
            key = (name, c)
            if key not in cache:
                cache[key] = np.asarray(
                    outs[name] if c is None else outs[name][c])
            return cache[key]

        pend = []
        for f in range(nf):
            dense_get = None
            if idr_only and "dense_lv" in outs:
                dense_get = (lambda ff=f: tuple(
                    np.asarray(a[ff]) for a in outs["dense_lv"]))
            pend.append(self._make_run_pending(
                f, bool(idr_flags[f]), int(qp_arr[f]), int(qpc_arr[f]),
                int(pocs[f]), get, cap, recons, prev_ref, frames,
                source, fidx,
                chunk=self._idr_chunk if idr_only else None,
                dense_get=dense_get))
        return pend

    def _unpack_row(self, row, get, f, cap, with_mv1=False,
                    chunk=None, dense_get=None):
        """Decode one frame's slice of the packed transfer buffer
        (ops/h265.run_pack_layout) into the entropy-stage arrays.
        Returns (nnz, arrays) — arrays is None when nnz overflowed cap
        and the frame must be redone on the host path."""
        from ceracoder_tpu.codec.h265.rowslice import densify_levels
        from ceracoder_tpu.ops.h265 import LEVEL_CHUNK, run_pack_layout

        if chunk is None:
            chunk = LEVEL_CHUNK
        nch, ncw = self.ph // CTB, self.pw // CTB
        n_ctb = nch * ncw
        lay = run_pack_layout(n_ctb, with_mv1=with_mv1, chunk=chunk)
        nnz = int(row[lay["nnz"]:lay["nnz"] + 4].view(np.int32)[0])
        overflow = nnz > cap
        if overflow:
            # an overflowing frame transfers no valid extra chunks —
            # reset the prefetch hint so the stale count from an
            # earlier run stops driving lv_chunks prefetches
            self._prev_nextra = 0
        if overflow and dense_get is None:
            return nnz, None
        meta = row[lay["meta"]:lay["meta"] + n_ctb].reshape(nch, ncw)
        arrays = {
            "is_intra": (meta & 0x80) != 0,
            "tu_split": (meta & 0x40) != 0,
            "mode": (meta & 0x3F).astype(np.int32),
            "mv": row[lay["mv"]:lay["mv"] + 2 * n_ctb]
            .view(np.int8).reshape(nch, ncw, 2).astype(np.int32),
        }
        if with_mv1:
            arrays["mv1"] = row[lay["mv1"]:lay["mv1"] + 2 * n_ctb] \
                .view(np.int8).reshape(nch, ncw, 2).astype(np.int32)
        if overflow:
            ly, cb, cr = dense_get()
            arrays["luma_lv"] = ly.astype(np.int32)
            arrays["cb_lv"] = cb.astype(np.int32)
            arrays["cr_lv"] = cr.astype(np.int32)
            return nnz, arrays
        counts = row[lay["counts"]:lay["counts"] + 2 * n_ctb] \
            .view(np.uint16).reshape(nch, ncw)
        pv0 = row[lay["lv0"]:lay["lv0"] + 4 * chunk] \
            .view(np.int16).reshape(chunk, 2)
        pos, val = pv0[:, 0], pv0[:, 1]
        nextra = max(0, -(-nnz // chunk) - 1)
        self._prev_nextra = nextra
        if nextra:
            ext = [np.asarray(get("lv_chunks", c)[f])
                   for c in range(nextra)]
            pos = np.concatenate([pos] + [e[:, 0] for e in ext])
            val = np.concatenate([val] + [e[:, 1] for e in ext])
        arrays.update(densify_levels(counts, pos, val))
        return nnz, arrays

    def _make_run_pending(self, f, idr, qp, qp_c, poc, get, cap,
                          recons, run_ref, frames, source, fidx,
                          chunk=None, dense_get=None):
        def finish() -> EncodedFrame:
            recon_dev = tuple(r[f] for r in recons)
            row = get("packed")[f]
            nnz, arrays = self._unpack_row(row, get, f, cap,
                                           chunk=chunk,
                                           dense_get=dense_get)
            if arrays is None:
                sao_f = get("sao")[f] if self.sao else None
                data = self._host_fallback(f, idr, qp, qp_c, poc,
                                           recons, run_ref, frames,
                                           source, fidx, sao_f)
                return EncodedFrame(data=data, keyframe=idr, qp=qp,
                                    _recon_dev=recon_dev)
            if self.sao:
                arrays["sao"] = get("sao")[f]
            rbsps = self._entropy(arrays, idr=idr, poc=poc, qp=qp)
            ntype = NAL_IDR_W_RADL if idr else NAL_TRAIL_R
            data = b"".join(
                nal_unit(ntype, r, long_start_code=(i == 0))
                for i, r in enumerate(rbsps))
            return EncodedFrame(data=data, keyframe=idr, qp=qp,
                                _recon_dev=recon_dev)

        return PendingFrame(finish, idr, qp)

    def encode_run_b_async(self, frames=None, qp: int | None = None,
                           source=None, indices=None,
                           cap: int | None = None):
        """Encode display-order frames with the IBPBP structure in
        fused dispatches (one lax.scan over (B, P) pairs per GOP
        segment; IDRs and odd tails go through single dispatches).
        Returns (PendingFrame, poc, kind) tuples in coding order."""
        from ceracoder_tpu.ops.h265 import LEVEL_CHUNK

        assert self.bframes, "encode_run_b_async requires bframes=1"
        nf = len(frames) if frames is not None else len(indices)
        qp = self.qp if qp is None else qp
        qp_c = self._chroma_qp(qp)
        n_ctb = (self.ph // CTB) * (self.pw // CTB)
        cap = cap or max(2 * LEVEL_CHUNK, n_ctb * 48)
        cap = -(-cap // LEVEL_CHUNK) * LEVEL_CHUNK

        def get_planes(i):
            if frames is not None:
                t = frames[i]
                return (self._pad_dev(t[0], self.ph, self.pw),
                        self._pad_dev(t[1], self.ph // 2, self.pw // 2),
                        self._pad_dev(t[2], self.ph // 2, self.pw // 2))
            return None

        out = []
        i = 0
        while i < nf:
            if self._ref is None or self._poc >= self.gop:
                pf = self._dispatch_frame_i(i, frames, source, indices,
                                            qp, qp_c)
                out.append((pf, 0, "I"))
                self._poc = 1
                i += 1
                continue
            # pairs until the GOP boundary or frames run out; a pair's
            # B sits at poc0 + 2k and its P at poc0 + 2k + 1, which
            # must stay below the IDR trigger (poc >= gop)
            npair = 0
            poc0 = self._poc
            while (i + 2 * (npair + 1) <= nf
                   and poc0 + 2 * npair <= self.gop - 2):
                npair += 1
            if npair == 0:
                # odd tail (or GOP leaves one slot): plain P
                pf = self._dispatch_frame_p(i, frames, source, indices,
                                            qp, qp_c, self._poc, 1)
                out.append((pf, self._poc, "P"))
                self._poc += 1
                i += 1
                continue
            out += self._dispatch_pairs(i, npair, frames, source,
                                        indices, qp, qp_c, cap)
            i += 2 * npair
            self._poc += 2 * npair
        return out

    def _dispatch_frame_i(self, i, frames, source, indices, qp, qp_c):
        if frames is not None:
            y, u, v = frames[i]
        else:
            y, u, v = source.gen_fn(int(indices[i]))
        return self._dispatch(y, u, v, qp, qp_c, idr=True, poc=0,
                              ref_delta=1)

    def _dispatch_frame_p(self, i, frames, source, indices, qp, qp_c,
                          poc, ref_delta):
        if frames is not None:
            y, u, v = frames[i]
        else:
            y, u, v = source.gen_fn(int(indices[i]))
        return self._dispatch(y, u, v, qp, qp_c, idr=False, poc=poc,
                              ref_delta=ref_delta)

    def _dispatch_pairs(self, i0, npair, frames, source, indices, qp,
                        qp_c, cap):
        import jax.numpy as jnp

        from ceracoder_tpu.ops.h265 import encode_run_pairs

        poc0 = self._poc
        run_ref = self._ref
        if frames is not None:
            def stack(sel, pi):
                return jnp.stack([
                    self._pad_dev(frames[i0 + 2 * k + pi][sel],
                                  self.ph if sel == 0 else self.ph // 2,
                                  self.pw if sel == 0 else self.pw // 2)
                    for k in range(npair)])
            ybs, ubs, vbs = stack(0, 0), stack(1, 0), stack(2, 0)
            yps, ups, vps = stack(0, 1), stack(1, 1), stack(2, 1)
            source_fn = None
            fidx_b = np.zeros(npair, np.int32)
            fidx_p = np.zeros(npair, np.int32)
        else:
            dummy = jnp.zeros((npair, 1, 1), jnp.uint8)
            ybs = ubs = vbs = yps = ups = vps = dummy
            source_fn = source.gen_fn
            fidx_b = np.asarray(
                [indices[i0 + 2 * k] for k in range(npair)], np.int32)
            fidx_p = np.asarray(
                [indices[i0 + 2 * k + 1] for k in range(npair)],
                np.int32)

        qa = jnp.full(npair, qp, jnp.int32)
        qca = jnp.full(npair, qp_c, jnp.int32)
        outs = encode_run_pairs(
            ybs, ubs, vbs, yps, ups, vps, qa, qca, qa, qca,
            *run_ref, jnp.asarray(fidx_b), jnp.asarray(fidx_p),
            cap=cap, deblock=self.deblock, sao=self.sao,
            tu_split=self.tu_split, source_fn=source_fn)
        self._ref = tuple(r[-1] for r in outs["p"]["recon"])

        for key in ("p", "b"):
            pre = [outs[key]["packed"]]
            if self.sao:
                pre.append(outs[key]["sao"])
            for a in pre:
                try:
                    a.copy_to_host_async()
                except AttributeError:
                    pass

        cache: dict = {}

        def get(key, name, c=None):
            k = (key, name, c)
            if k not in cache:
                cache[k] = np.asarray(
                    outs[key][name] if c is None
                    else outs[key][name][c])
            return cache[k]

        res = []
        for k in range(npair):
            poc_p = poc0 + 2 * k + 1
            poc_b = poc0 + 2 * k
            pf_p = self._pair_pending(outs, "p", k, qp, qp_c, poc_p,
                                      get, cap, run_ref, frames,
                                      source, fidx_b, fidx_p, i0)
            pf_b = self._pair_pending(outs, "b", k, qp, qp_c, poc_b,
                                      get, cap, run_ref, frames,
                                      source, fidx_b, fidx_p, i0)
            res.append((pf_p, poc_p, "P"))
            res.append((pf_b, poc_b, "B"))
        return res

    def _pair_pending(self, outs, key, k, qp, qp_c, poc, get, cap,
                      run_ref, frames, source, fidx_b, fidx_p, i0):
        from ceracoder_tpu.codec.h265.syntax import NAL_TRAIL_N

        is_b = key == "b"
        recons = outs[key]["recon"]

        def finish() -> EncodedFrame:
            recon_dev = tuple(r[k] for r in recons)
            row = get(key, "packed")[k]
            nnz, arrays = self._unpack_row(
                row, lambda name, c=None: get(key, name, c), k, cap,
                with_mv1=is_b)
            if arrays is None:
                data = self._pair_fallback(outs, key, k, qp, qp_c,
                                           poc, run_ref, frames,
                                           source, fidx_b, fidx_p, i0)
                return EncodedFrame(data=data, keyframe=False, qp=qp,
                                    _recon_dev=recon_dev)
            if self.sao:
                arrays["sao"] = get(key, "sao")[k]
            rbsps = self._entropy(arrays, idr=False, poc=poc, qp=qp,
                                  ref_delta=1 if is_b else 2,
                                  slice_type="B" if is_b else None)
            ntype = NAL_TRAIL_N if is_b else NAL_TRAIL_R
            data = b"".join(
                nal_unit(ntype, r, long_start_code=(i == 0))
                for i, r in enumerate(rbsps))
            return EncodedFrame(data=data, keyframe=False, qp=qp,
                                _recon_dev=recon_dev)

        return PendingFrame(finish, False, qp)

    def _pair_fallback(self, outs, key, k, qp, qp_c, poc, run_ref,
                       frames, source, fidx_b, fidx_p, i0) -> bytes:
        """Redo one overflowing pair frame on the host path."""
        from ceracoder_tpu.codec.h265.rowslice import (
            compute_b_rows,
            compute_p_rows,
        )
        from ceracoder_tpu.codec.h265.syntax import NAL_TRAIL_N

        def planes_of(disp_i):
            if frames is not None:
                y, u, v = frames[disp_i]
            else:
                idx = (fidx_b if (disp_i - i0) % 2 == 0
                       else fidx_p)[(disp_i - i0) // 2]
                y, u, v = (np.asarray(p) for p in source.gen_fn(int(idx)))
            return (np.asarray(self._pad_dev(y, self.ph, self.pw)),
                    np.asarray(self._pad_dev(u, self.ph // 2,
                                             self.pw // 2)),
                    np.asarray(self._pad_dev(v, self.ph // 2,
                                             self.pw // 2)))

        past = (run_ref if k == 0
                else tuple(r[k - 1] for r in outs["p"]["recon"]))
        past = tuple(np.asarray(p).astype(np.int32) for p in past)
        if key == "p":
            y, u, v = planes_of(i0 + 2 * k + 1)
            arrays, _ = compute_p_rows(y, u, v, past, qp, qp_c,
                                       tu_split=self.tu_split)
            if self.sao:
                arrays["sao"] = np.asarray(outs[key]["sao"][k])
            rbsps = self._entropy(arrays, idr=False, poc=poc, qp=qp,
                                  ref_delta=2)
            ntype = NAL_TRAIL_R
        else:
            fut = tuple(np.asarray(r[k]).astype(np.int32)
                        for r in outs["p"]["recon"])
            y, u, v = planes_of(i0 + 2 * k)
            arrays, _ = compute_b_rows(y, u, v, past, fut, qp, qp_c,
                                       tu_split=self.tu_split)
            if self.sao:
                arrays["sao"] = np.asarray(outs[key]["sao"][k])
            rbsps = self._entropy(arrays, idr=False, poc=poc, qp=qp,
                                  slice_type="B")
            ntype = NAL_TRAIL_N
        return b"".join(nal_unit(ntype, r, long_start_code=(i == 0))
                        for i, r in enumerate(rbsps))

    def _host_fallback(self, f, idr, qp, qp_c, poc, recons, run_ref,
                       frames, source, fidx, sao_f=None) -> bytes:
        """Redo one overflowing frame exactly on the host path,
        referencing the in-run (deblocked) reconstruction."""
        from ceracoder_tpu.codec.h265.rowslice import (
            compute_intra_rows,
            compute_p_rows,
        )

        if frames is not None:
            y, u, v = frames[f]
        else:
            y, u, v = (np.asarray(p) for p in source.gen_fn(int(fidx[f])))
        y = np.asarray(self._pad_dev(y, self.ph, self.pw))
        u = np.asarray(self._pad_dev(u, self.ph // 2, self.pw // 2))
        v = np.asarray(self._pad_dev(v, self.ph // 2, self.pw // 2))
        if idr:
            arrays, _ = compute_intra_rows(y, u, v, qp, qp_c)
        else:
            ref = run_ref if f == 0 else tuple(r[f - 1] for r in recons)
            ref = tuple(np.asarray(p).astype(np.int32) for p in ref)
            arrays, _ = compute_p_rows(y, u, v, ref, qp, qp_c,
                                       tu_split=self.tu_split)
        if sao_f is not None:
            arrays["sao"] = np.asarray(sao_f)
        rbsps = self._entropy(arrays, idr=idr, poc=poc, qp=qp)
        ntype = NAL_IDR_W_RADL if idr else NAL_TRAIL_R
        return b"".join(nal_unit(ntype, r, long_start_code=(i == 0))
                        for i, r in enumerate(rbsps))

    @property
    def recon(self):
        """Cropped reconstruction of the last encoded frame (host)."""
        if self._ref is None:
            return None
        ry, ru, rv = (np.asarray(p) for p in self._ref)
        return (ry[:self.height, :self.width],
                ru[:self.height // 2, :self.width // 2],
                rv[:self.height // 2, :self.width // 2])

    def _entropy(self, arrays, idr: bool, poc: int, qp: int,
                 ref_delta: int = 1, slice_type: str | None = None):
        if self.native_entropy:
            rbsps = entropy_rows_native(self.params, arrays, qp,
                                        idr=idr, poc=poc,
                                        ref_poc_delta=ref_delta,
                                        slice_type=slice_type)
            if rbsps is not None:
                return rbsps
        return entropy_rows(self.params, arrays, qp, idr=idr, poc=poc,
                            ref_poc_delta=ref_delta,
                            slice_type=slice_type)
