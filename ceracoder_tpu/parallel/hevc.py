"""Sharded HEVC encode step: streams x CTB-row bands over a device
mesh, with ICI halo exchange.

Parallelism axes (SURVEY.md §2.7):
- ``streams`` (DP analog): independent streams, no communication.
- ``rows`` (SP/CP analog): CTB-row bands of one frame. The row-slice
  coding schedule makes the bands' *coding* loops fully independent;
  the cross-chip traffic is exactly the physics of the codec:
    * motion search / MC reads +-SEARCH_RANGE reference rows past the
      band -> 8-row luma (6-row chroma) halos via ``ppermute``
    * the deblock horizontal pass crosses band seams -> 4-row
      post-vertical halos + 1-CTB-row metadata via ``ppermute``
  Outputs are bit-identical to the single-chip ops (enforced by
  tests/test_parallel_hevc.py), so the sharded step feeds the same
  host entropy stage.

Replaces the reference's single-box scaling story with mesh scaling
(reference has no parallelism; SURVEY.md §2.7 maps its axes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ceracoder_tpu.ops.h265 import (
    CHROMA_PAD,
    CTB,
    LUMA_SRC_PAD,
    _chroma_edge_filter,
    _deblock_axis,
    _edge_bs_dev,
    _i_frame_core,
    _luma_edge_filter,
    _nnz8_map_dev,
    _p_frame_core_padded,
    _seg_bs_dev,
)


def _halo_rows(x, k: int, n_rows: int, axis_name: str = "rows"):
    """Extend (S, Hb, W) with k rows from the row-band neighbors;
    outermost bands replicate their border row (== the single-chip
    picture-edge padding)."""
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(n_rows - 1)]
    bwd = [(i + 1, i) for i in range(n_rows - 1)]
    top = jax.lax.ppermute(x[:, -k:, :], axis_name, fwd)
    bot = jax.lax.ppermute(x[:, :k, :], axis_name, bwd)
    top = jnp.where(idx == 0, jnp.repeat(x[:, :1, :], k, axis=1), top)
    bot = jnp.where(idx == n_rows - 1,
                    jnp.repeat(x[:, -1:, :], k, axis=1), bot)
    return jnp.concatenate([top, x, bot], axis=1)


def _deblock_banded(rec, is_intra, cbf_l, mv, qp, n_rows: int,
                    tu_split=None, luma_lv=None):
    """Band-local deblock matching the whole-frame filter: vertical
    pass (row-local, incl. interior TU edges of split CUs), then
    internal horizontal edges plus the band-seam edges using
    post-vertical halos from the neighbors."""
    y, u, v = (p.astype(jnp.int32) for p in rec)
    hb, w = y.shape
    nbh, ncw = hb // CTB, w // CTB
    idx = jax.lax.axis_index("rows")

    split = (jnp.zeros((nbh, ncw), bool) if tu_split is None
             else tu_split)
    if luma_lv is None:
        luma_lv = jnp.zeros((nbh, ncw, CTB, CTB), jnp.int32)
    nnz8 = _nnz8_map_dev(luma_lv, cbf_l, split)      # (2nbh, 2ncw)
    bs_v, bs_h = _edge_bs_dev(is_intra, cbf_l, mv)

    def seg_and_int(ii, mvx, nnz8x, splitx, n):
        segs = _seg_bs_dev(
            ii[:, :-1], ii[:, 1:], mvx[:, :-1], mvx[:, 1:], None,
            None, nnz8x[:, 1:-1:2] | nnz8x[:, 2::2]) if n > 1 else \
            jnp.zeros((2 * ii.shape[0], 0), jnp.int32)
        nz_int = nnz8x[:, ::2] | nnz8x[:, 1::2]
        sp2 = jnp.repeat(splitx, 2, axis=0)
        return segs, jnp.where(sp2 & nz_int, 1, 0).astype(jnp.int32)

    # vertical edges: band-local
    seg_v, int_v = seg_and_int(is_intra, mv, nnz8, split, ncw)
    y, u, v = _deblock_axis(y, u, v, bs_v, seg_v, int_v, qp, ncw)
    # internal horizontal edges on the vertically-filtered band
    seg_h, int_h = seg_and_int(is_intra.T, mv.swapaxes(0, 1), nnz8.T,
                               split.T, nbh)
    yt, ut, vt = _deblock_axis(y.T, u.T, v.T, bs_h.T, seg_h, int_h,
                               qp, nbh)
    y_i, u_i, v_i = yt.T, ut.T, vt.T

    # ---- seam edges: exchange post-vertical strips + CTB metadata.
    # Reads (rows 0..3 / Hb-4..Hb-1) are disjoint from the internal
    # pass's writes (rows 12..Hb-13), so we exchange from the
    # post-vertical arrays and write into the internally-filtered ones.
    fwd = [(i, i + 1) for i in range(n_rows - 1)]   # to next band
    bwd = [(i + 1, i) for i in range(n_rows - 1)]   # to prev band
    send_fwd = lambda a: jax.lax.ppermute(a, "rows", fwd)
    send_bwd = lambda a: jax.lax.ppermute(a, "rows", bwd)

    # prev band's last CTB row metadata / next band's first; the
    # nonzero-TB condition is per adjacent 8x8 quadrant (nnz8 edge row)
    p_ii, p_mv, p_nz = (send_fwd(a)
                        for a in (is_intra[-1], mv[-1], nnz8[-1]))
    n_ii, n_mv, n_nz = (send_bwd(a)
                        for a in (is_intra[0], mv[0], nnz8[0]))
    p_cb, n_cb = send_fwd(cbf_l[-1]), send_bwd(cbf_l[0])

    def seam_seg(ia, ib, ma, mb, nza, nzb):
        ii = jnp.repeat(ia | ib, 2)
        mvd = jnp.repeat((jnp.abs(ma - mb) >= 4).any(-1), 2)
        return jnp.where(ii, 2, jnp.where(nza | nzb | mvd, 1, 0)
                         ).astype(jnp.int32)

    def seam_cbs(ia, ib, ca, cb):
        return jnp.where(ia | ib, 2, jnp.where(ca | cb, 1, 0)
                         ).astype(jnp.int32)

    bs_top = seam_seg(p_ii, is_intra[0], p_mv, mv[0], p_nz, nnz8[0])
    bs_bot = seam_seg(is_intra[-1], n_ii, mv[-1], n_mv, nnz8[-1], n_nz)
    bs_ctop = seam_cbs(p_ii, is_intra[0], p_cb, cbf_l[0])
    bs_cbot = seam_cbs(is_intra[-1], n_ii, cbf_l[-1], n_cb)

    # post-vertical strips from the neighbors
    yp_prev = send_fwd(y[-4:, :])
    yq_next = send_bwd(y[:4, :])
    up_prev = send_fwd(u[-2:, :])
    uq_next = send_bwd(u[:2, :])
    vp_prev = send_fwd(v[-2:, :])
    vq_next = send_bwd(v[:2, :])

    # --- top seam (skip on band 0): filter (prev rows | own rows 0..3)
    bs_l = jnp.repeat(bs_top, 8)                   # (w,)
    p_lines = yp_prev.T[None]                      # (1, w, 4) p3..p0
    q_lines = y[:4, :].T[None]                     # (1, w, 4) q0..q3
    fp_top, fq_top = _luma_edge_filter(p_lines, q_lines, bs_l[None], qp)
    own_q = jnp.where(idx == 0, y_i[:4, :],
                      fq_top[0].T)                 # keep q side
    y_i = y_i.at[:4, :].set(own_q)

    # --- bottom seam (skip on last band): keep p side
    bs_l2 = jnp.repeat(bs_bot, 8)
    p_lines2 = y[-4:, :].T[None]
    q_lines2 = yq_next.T[None]
    fp_bot, _ = _luma_edge_filter(p_lines2, q_lines2, bs_l2[None], qp)
    own_p = jnp.where(idx == n_rows - 1, y_i[-4:, :], fp_bot[0].T)
    y_i = y_i.at[-4:, :].set(own_p)

    # --- chroma seams
    bs_ct = jnp.repeat(bs_ctop, CTB // 2)
    bs_cb2 = jnp.repeat(bs_cbot, CTB // 2)
    outs = []
    for pl, pl_i, pp, qn in ((u, u_i, up_prev, uq_next),
                             (v, v_i, vp_prev, vq_next)):
        fpc, fqc = _chroma_edge_filter(pp.T[None], pl[:2, :].T[None],
                                       bs_ct[None], qp)
        q_side = jnp.where(idx == 0, pl_i[:2, :], fqc[0].T)
        pl_i = pl_i.at[:2, :].set(q_side)
        fpc2, _ = _chroma_edge_filter(pl[-2:, :].T[None], qn.T[None],
                                      bs_cb2[None], qp)
        p_side = jnp.where(idx == n_rows - 1, pl_i[-2:, :], fpc2[0].T)
        pl_i = pl_i.at[-2:, :].set(p_side)
        outs.append(pl_i)

    return (y_i.astype(jnp.uint8), outs[0].astype(jnp.uint8),
            outs[1].astype(jnp.uint8))


def hevc_sharded_step_t(mesh, idr: bool = False,
                        deblock: bool = True, tu_split: bool = False):
    """Build a jitted sharded HEVC encode step over (streams, rows)
    with TRACED qp/qp_c (one executable serves every QP — rate
    control changes QP per frame and a recompile per value would be
    prohibitive on hardware).

    Inputs: y (S, H, W), u, v (S, H/2, W/2) uint8 planes, the previous
    deblocked reconstruction (same shapes) — all sharded
    streams x row-bands — and scalar qp, qp_c. Returns the per-CTB
    arrays and the deblocked reconstruction (sharded like the inputs)
    plus a per-stream psum of nonzero-level counts for rate control.
    Bit-identical to the single-chip ops for any band split.
    """
    n_rows = mesh.shape["rows"]

    def shard_fn(y, u, v, ry, ru, rv, qp, qp_c):
        if not idr:
            ry = _halo_rows(ry.astype(jnp.int32), LUMA_SRC_PAD, n_rows)
            ru = _halo_rows(ru.astype(jnp.int32), CHROMA_PAD, n_rows)
            rv = _halo_rows(rv.astype(jnp.int32), CHROMA_PAD, n_rows)

        def per_stream(yb, ub, vb, ryb, rub, rvb):
            if idr:
                outs = _i_frame_core(yb, ub, vb, qp, qp_c)
            else:
                kp = LUMA_SRC_PAD
                kc = CHROMA_PAD
                ry_pad = jnp.pad(ryb, ((0, 0), (kp, kp)), mode="edge")
                ru_pad = jnp.pad(rub, ((0, 0), (kc, kc)), mode="edge")
                rv_pad = jnp.pad(rvb, ((0, 0), (kc, kc)), mode="edge")
                outs = _p_frame_core_padded(yb, ub, vb, ry_pad, ru_pad,
                                            rv_pad, qp, qp_c,
                                            tu_split=tu_split)
            return outs

        outs = jax.vmap(per_stream)(y, u, v, ry, ru, rv)
        if deblock:
            cbf = outs["luma_lv"].reshape(
                *outs["luma_lv"].shape[:3], -1).any(-1)

            def db(rec_y, rec_u, rec_v, ii, cb, mvv, sp_f, ll):
                return _deblock_banded((rec_y, rec_u, rec_v), ii, cb,
                                       mvv, qp, n_rows,
                                       tu_split=sp_f, luma_lv=ll)
            outs["recon"] = jax.vmap(db)(
                *outs["recon"], outs["is_intra"], cbf, outs["mv"],
                outs["tu_split"], outs["luma_lv"])
        nz = (outs["luma_lv"] != 0).reshape(y.shape[0], -1).sum(1) \
            + (outs["cb_lv"] != 0).reshape(y.shape[0], -1).sum(1) \
            + (outs["cr_lv"] != 0).reshape(y.shape[0], -1).sum(1)
        nz_total = jax.lax.psum(nz, "rows")
        return outs, nz_total

    sp = P("streams", "rows", None)
    band2 = P("streams", "rows")
    out_specs = (
        dict(is_intra=band2, mode=band2, mv=band2, tu_split=band2,
             luma_lv=band2, cb_lv=band2, cr_lv=band2,
             recon=(band2, band2, band2)),
        P("streams"),
    )
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(sp, sp, sp, sp, sp, sp, P(), P()),
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)


def hevc_sharded_step(mesh, qp: int, qp_c: int, idr: bool = False,
                      deblock: bool = True, tu_split: bool = False):
    """Back-compat wrapper of hevc_sharded_step_t with fixed QP."""
    fn = hevc_sharded_step_t(mesh, idr=idr, deblock=deblock,
                             tu_split=tu_split)

    def call(y, u, v, ry, ru, rv):
        return fn(y, u, v, ry, ru, rv, jnp.int32(qp), jnp.int32(qp_c))

    return call


class ShardedH265Encoder:
    """App-facing banded encoder (config[3] analog: one frame's CTB-row
    bands sharded across chips with ICI halos): H265DeviceEncoder
    surface (headers/encode_frame/resume) over hevc_sharded_step_t,
    feeding the same host entropy stage. Bit-identical to the
    single-chip encoder for any band count (tests/test_parallel_hevc,
    tests/test_app_parallel)."""

    bframes = 0

    def __init__(self, width: int, height: int, qp: int = 32,
                 gop: int = 60, n_bands: int = 2, mesh=None,
                 native_entropy: bool = True, deblock: bool = True,
                 tu_split: bool = False):
        import numpy as np

        from ceracoder_tpu.codec.h265.intra import chroma_qp
        from ceracoder_tpu.codec.h265.syntax import HevcParams
        from ceracoder_tpu.parallel.mesh import make_mesh

        self.width, self.height = width, height
        self.qp = qp
        self.gop = max(1, gop)
        self.native_entropy = native_entropy
        self.deblock = deblock
        self.tu_split = tu_split
        self._chroma_qp = chroma_qp
        self.n_bands = n_bands
        self.mesh = mesh if mesh is not None else make_mesh(
            n_streams=1, n_rows=n_bands)
        # pad so CTB rows split evenly into bands
        self.pw = -(-width // CTB) * CTB
        rows = -(-height // CTB)
        rows = -(-rows // n_bands) * n_bands
        self.ph = rows * CTB
        self.params = HevcParams(width=width, height=height, qp=qp,
                                 pcm_enabled=False, deblock=deblock,
                                 max_reorder=0, max_dpb_minus1=1,
                                 tile_rows=True, sao=False,
                                 tu_split_inter=tu_split)
        self._fn_i = hevc_sharded_step_t(self.mesh, idr=True,
                                         deblock=deblock,
                                         tu_split=tu_split)
        self._fn_p = hevc_sharded_step_t(self.mesh, idr=False,
                                         deblock=deblock,
                                         tu_split=tu_split)
        self._np = np
        self._ref = None
        self._poc = 0

    def headers(self) -> bytes:
        from ceracoder_tpu.codec.h265.syntax import (
            write_pps, write_sps, write_vps)
        p = self.params
        return write_vps(p) + write_sps(p) + write_pps(p)

    def resume(self) -> None:
        self._ref = None
        self._poc = 0

    def _pad(self, plane, h, w):
        plane = jnp.asarray(plane)
        ph, pw = plane.shape
        if ph == h and pw == w:
            return plane
        return jnp.pad(plane, ((0, h - ph), (0, w - pw)), mode="edge")

    def encode_frame(self, y, u, v, qp: int | None = None,
                     force_idr: bool = False):
        from ceracoder_tpu.codec.h264.encoder import EncodedFrame
        from ceracoder_tpu.codec.h265.rowslice import (
            entropy_rows, entropy_rows_native)
        from ceracoder_tpu.codec.h265.syntax import (
            NAL_IDR_W_RADL, NAL_TRAIL_R, nal_unit)

        np = self._np
        qp = self.qp if qp is None else qp
        qp_c = self._chroma_qp(qp)
        idr = force_idr or self._ref is None or self._poc >= self.gop
        poc = 0 if idr else self._poc
        self._poc = 1 if idr else self._poc + 1

        yb = self._pad(y, self.ph, self.pw)[None]
        ub = self._pad(u, self.ph // 2, self.pw // 2)[None]
        vb = self._pad(v, self.ph // 2, self.pw // 2)[None]
        ref = self._ref
        if ref is None:
            ref = (jnp.zeros_like(yb), jnp.zeros_like(ub),
                   jnp.zeros_like(vb))
        fn = self._fn_i if idr else self._fn_p
        outs, _nz = fn(yb, ub, vb, *ref, jnp.int32(qp),
                       jnp.int32(qp_c))
        self._ref = outs["recon"]

        arrays = {k: np.asarray(outs[k][0]) for k in
                  ("is_intra", "mode", "mv", "tu_split", "luma_lv",
                   "cb_lv", "cr_lv")}
        rbsps = None
        if self.native_entropy:
            rbsps = entropy_rows_native(self.params, arrays, qp,
                                        idr=idr, poc=poc)
        if rbsps is None:
            rbsps = entropy_rows(self.params, arrays, qp, idr=idr,
                                 poc=poc)
        ntype = NAL_IDR_W_RADL if idr else NAL_TRAIL_R
        data = b"".join(nal_unit(ntype, r, long_start_code=(i == 0))
                        for i, r in enumerate(rbsps))
        return EncodedFrame(data=data, keyframe=idr, qp=qp,
                            _recon_dev=tuple(r[0]
                                             for r in outs["recon"]))

    @property
    def recon(self):
        if self._ref is None:
            return None
        np = self._np
        ry, ru, rv = (np.asarray(p[0]) for p in self._ref)
        return (ry[:self.height, :self.width],
                ru[:self.height // 2, :self.width // 2],
                rv[:self.height // 2, :self.width // 2])


class GopParallelStreamEncoder:
    """App-facing GOP-parallel encoder: each encode_run_async batch is
    a closed GOP dispatched round-robin across devices (the PP axis of
    SURVEY.md §2.7 as a product capability — the app's pipelined loop
    drains run N while run N+1 computes on the next device). The
    stream is byte-identical to a single-device encode at the same
    GOP length because every GOP is closed."""

    bframes = 0

    def __init__(self, width: int, height: int, qp: int = 32,
                 gop: int = 60, devices=None, **enc_kwargs):
        import jax as _jax

        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder

        self._jax = _jax
        self.devices = list(devices if devices is not None
                            else _jax.devices())
        self.gop = max(1, gop)
        self.qp = qp
        self.encoders = [H265DeviceEncoder(width, height, qp=qp,
                                           gop=self.gop, **enc_kwargs)
                         for _ in self.devices]
        self._slot = 0

    def headers(self) -> bytes:
        return self.encoders[0].headers()

    def resume(self) -> None:
        for e in self.encoders:
            e.resume()
        self._slot = 0

    def encode_run_async(self, frames=None, qp: int | None = None,
                         force_idr: bool = False, **kw):
        enc = self.encoders[self._slot]
        dev = self.devices[self._slot]
        self._slot = (self._slot + 1) % len(self.devices)
        enc.resume()                     # closed GOP: fresh chain
        with self._jax.default_device(dev):
            return enc.encode_run_async(frames=frames, qp=qp,
                                        force_idr=True, **kw)

    def encode_frame(self, y, u, v, qp: int | None = None,
                     force_idr: bool = False):
        """Per-frame path degenerates to single-device encode."""
        return self.encoders[0].encode_frame(y, u, v, qp=qp,
                                             force_idr=force_idr)
