"""Device (JAX) HEVC row-slice compute: prediction, transforms,
quantization, motion search/compensation, reconstruction.

Produces exactly the flat per-CTB arrays of the numpy reference
(codec/h265/rowslice.py: compute_intra_rows / compute_p_rows) — array
equality is enforced by tests/test_h265_device.py — which the native
entropy stage (native/src/hevc_entropy.cc) turns into the bitstream.

Design notes (mirrors ops/intra.py's H.264 layout):
- One slice per CTB row => rows are data-independent: the column scan
  carries only each row's right recon column (vmapped over rows), and
  a 128-filled initial carry reproduces the spec's no-neighbor
  substitution for column 0 for free.
- Intra references reduce to (left column, corner = left[0]); the
  four candidate modes (planar/DC/hor/ver) collapse to closed forms.
- All integer math is int32: the worst-case dequant product is
  level_max(qp) * (invScale << (qp//6)) ~= 8 * qScale * invScale
  ~= 2^23 because level_max shrinks as the dequant scale grows (the
  device only ever dequantizes its own quantizer's output).
- The exhaustive +-8 full-pel motion search evaluates shifts in the
  reference's center-outward order via packed (sad << 9 | rank) keys,
  so argmin reproduces the numpy tie-breaking exactly.

Replaces the compute core of the reference's external HEVC encoders
(reference: pipeline/ *h265*; SURVEY.md §2.2, §7.1 steps 3-4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ceracoder_tpu.codec.h265.sao import SAO_LAMBDA
from ceracoder_tpu.codec.h265.tables import (
    CHROMA_FILTER,
    INV_QUANT_SCALES,
    QUANT_SCALES,
    T4,
    T8,
    T16,
)

CTB = 16
SEARCH_RANGE = 8

# candidate modes in decision order (must match intra.CAND_MODES):
# planar, DC, hor, ver, then left-only angular 2..9
_MODES = jnp.array([0, 1, 10, 26, 2, 3, 4, 5, 6, 7, 8, 9], jnp.int32)
_ANGLES = (32, 26, 21, 17, 13, 9, 5, 2)        # modes 2..9 (Table 8-5)

# center-outward shift enumeration matching
# codec/h265/inter.py:motion_search (ties prefer the shorter MV)
_OFFS = sorted(((dy, dx)
                for dy in range(-SEARCH_RANGE, SEARCH_RANGE + 1)
                for dx in range(-SEARCH_RANGE, SEARCH_RANGE + 1)),
               key=lambda o: (abs(o[0]) + abs(o[1]), abs(o[0])))
_OFF_DY = np.array([o[0] for o in _OFFS], np.int32)
_OFF_DX = np.array([o[1] for o in _OFFS], np.int32)


# ---------------------------------------------------------------------------
# transforms / quant (spec 8.6; int32 throughout — see module note)
# ---------------------------------------------------------------------------

def _limb_mm(x, mm):
    """Exact integer matmul on the MXU: int32 einsums don't map to
    the MXU (XLA emulates them — measured ~0.2 ms per 1080p luma
    pass vs ~0.01 for f32). Split x (|x| <= 65535) into 8-bit limbs
    so every bf16-rounded operand is exact (integers < 2^8 for lo,
    < 2^8 after the shift for hi) and each f32 accumulation against
    the transform matrix (entries <= 90) stays < 2^24. Two bf16 MXU
    passes == one exact int32 product. mm: f32 tensor -> f32 matmul
    against the (constant) transform matrix."""
    hi = x >> 8                                # floor: lo in [0, 256)
    lo = x - (hi << 8)
    h = mm(hi.astype(jnp.float32)).astype(jnp.int32)
    l = mm(lo.astype(jnp.float32)).astype(jnp.int32)
    return (h << 8) + l


def _fwd_transform(res, t, log2n: int):
    """res (..., n, n) int32 in [-255, 255] -> coefficients.
    Stage 1 runs directly in f32 (8-bit inputs are bf16-exact and
    accumulation <= n*90*255 < 2^24); stage 2 via 8-bit limbs
    (|a| <= 45900 after the stage-1 shift)."""
    s1 = log2n - 1
    s2 = log2n + 6
    tf = t.astype(jnp.float32)
    a = jnp.einsum("ij,...jk->...ik", tf, res.astype(jnp.float32))
    a = (a.astype(jnp.int32) + (1 << (s1 - 1))) >> s1
    p = _limb_mm(a, lambda x: jnp.einsum("...ij,kj->...ik", x, tf))
    return (p + (1 << (s2 - 1))) >> s2


def _inv_transform(coef, t, log2n: int):
    """coef (dequantized, clipped to +-32767) -> residual. Both
    stages via 8-bit limbs (operands exceed bf16's integer
    exactness range; per-limb accumulation <= n*90*255 < 2^24)."""
    tf = t.astype(jnp.float32)
    a = (_limb_mm(coef,
                  lambda x: jnp.einsum("ji,...jk->...ik", tf, x))
         + 64) >> 7
    a = jnp.clip(a, -32768, 32767)
    r = (_limb_mm(a, lambda x: jnp.einsum("...ij,jk->...ik", x, tf))
         + 2048) >> 12
    return jnp.clip(r, -32768, 32767)


def _quantize(coef, qp, log2n: int, intra: bool = True):
    qbits = 21 + qp // 6 - log2n
    scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp % 6]
    # HM rounding offsets: 171/512 intra, 85/512 inter
    off = (171 if intra else 85) << (qbits - 9)
    level = (jnp.abs(coef) * scale + off) >> qbits
    return jnp.sign(coef) * level


def _dequantize(level, qp, log2n: int):
    bd_shift = log2n + 3
    scale = jnp.asarray(INV_QUANT_SCALES, jnp.int32)[qp % 6] * 16
    d = (level * (scale << (qp // 6)) + (1 << (bd_shift - 1))) >> bd_shift
    return jnp.clip(d, -32768, 32767)


def _code_tu(src, pred, qp, t, log2n: int, intra: bool = True):
    """Quantized levels + reconstruction for one batch of TUs."""
    lv = _quantize(_fwd_transform(src - pred, t, log2n), qp, log2n,
                   intra=intra)
    cbf = lv.reshape(*lv.shape[:-2], -1).any(-1)
    rec_res = _inv_transform(_dequantize(lv, qp, log2n), t, log2n)
    rec = jnp.clip(pred + jnp.where(cbf[..., None, None], rec_res, 0),
                   0, 255)
    return lv, rec


def _quads(x):
    """(..., n, n) -> (..., 4, n/2, n/2), z-order TL/TR/BL/BR."""
    *lead, n, _ = x.shape
    h = n // 2
    q = x.reshape(*lead, 2, h, 2, h)
    q = jnp.moveaxis(q, -2, -3)               # (..., 2, 2, h, h)
    return q.reshape(*lead, 4, h, h)


def _unquads(q):
    """Inverse of _quads."""
    *lead, _, h, _ = q.shape
    q = q.reshape(*lead, 2, 2, h, h)
    q = jnp.moveaxis(q, -3, -2)
    return q.reshape(*lead, 2 * h, 2 * h)


def _tb_bits_dev(lv):
    """Twin of rowslice._tb_bits: (..., n, n) -> (...,) int32."""
    a = jnp.abs(lv)
    flat = a.reshape(*a.shape[:-2], -1)
    nnz = (flat > 0).sum(-1)
    bits = 24 + 6 * nnz + 2 * jnp.minimum(flat, 8).sum(-1)
    return jnp.where(nnz == 0, 2, bits)


def _code_inter_tus_dev(sy, su, sv, py, pu, pv, qp, qp_c, lam,
                        t16, t8, t4):
    """Twin of rowslice._code_inter_tus, batched over leading dims:
    per-CU choice of single TUs (16 luma / 8 chroma) vs quadrant
    split (4x8 luma / 4x4 chroma) by 16*SSD + lambda*bits. Returns
    (split, lv_y, lv_u, lv_v, rec_y, rec_u, rec_v) with split-level
    arrays stored in place."""
    # option A: single TUs
    alv = [_code_tu(sy, py, qp, t16, 4, intra=False),
           _code_tu(su, pu, qp_c, t8, 3, intra=False),
           _code_tu(sv, pv, qp_c, t8, 3, intra=False)]
    # option B: quadrants (coded independently; inter pred has no
    # intra-CU dependency so the 4 sub-TUs batch on the MXU)
    blv = []
    for src, pred, t, l2, q in ((sy, py, t8, 3, qp),
                                (su, pu, t4, 2, qp_c),
                                (sv, pv, t4, 2, qp_c)):
        lq, rq = _code_tu(_quads(src), _quads(pred), q, t, l2,
                          intra=False)
        blv.append((_unquads(lq), _unquads(rq)))

    # int32 bounds (qp <= 51): 16*ssd <= 16*(256+2*64)*255^2 ~ 4.0e8,
    # lam*bits <= 74711 * 8740 ~ 6.6e8; sum < 2^31.
    def cost(opt, split):
        ssd = jnp.zeros(sy.shape[:-2], jnp.int32)
        bits = jnp.full(sy.shape[:-2], 4 if split else 2, jnp.int32)
        for (lv, rec), src in zip(opt, (sy, su, sv)):
            d = src - rec
            ssd += (d * d).reshape(*d.shape[:-2], -1).sum(-1)
            if split:
                bits += _tb_bits_dev(_quads(lv)).sum(-1)
            else:
                bits += _tb_bits_dev(lv)
        return 16 * ssd + lam * bits

    split = cost(blv, True) < cost(alv, False)
    m = split[..., None, None]
    out = [jnp.where(m, b, a)
           for (b, _), (a, _) in zip(blv, alv)]
    rec = [jnp.where(m, b, a)
           for (_, b), (_, a) in zip(blv, alv)]
    return (split, *out, *rec)


# ---------------------------------------------------------------------------
# intra prediction from a left column (row-slice reference reduction)
# ---------------------------------------------------------------------------

_ANG_MATS: dict = {}


def _angular_matrix(n: int, modes):
    """Static (len(modes), 2n+1, n*n) f32 weights: output pixel (y,x)
    of angle `a` is (32-fact)*ref[y+idx] + fact*ref[y+idx+1] with
    idx = ((x+1)*a) >> 5, fact = ((x+1)*a) & 31 (spec 8.4.4.2.6)."""
    key = (n, tuple(modes))
    if key not in _ANG_MATS:
        w = np.zeros((len(modes), 2 * n + 1, n * n), np.float32)
        for mi, a in enumerate(modes):
            for x in range(n):
                idx = ((x + 1) * a) >> 5
                fact = ((x + 1) * a) & 31
                for y in range(n):
                    p = y * n + x
                    w[mi, y + idx, p] += 32 - fact
                    w[mi, y + idx + 1, p] += fact
        _ANG_MATS[key] = w          # numpy: a jnp constant cached
    return jnp.asarray(_ANG_MATS[key])  # here would leak tracers


def _intra_preds(left, n: int, luma: bool):
    """All 4 candidate predictions from the left recon column.

    left: (R, n) int32 (rows batch). In the row-slice schedule the
    only reference is the left column; corner == left[0], the top row
    and below-left substitute to corner / left[-1] (spec 8.4.4.2.2).
    Returns (R, 4, n, n).
    """
    r = left.shape[0]
    log2n = n.bit_length() - 1
    corner = left[:, :1]                             # (R, 1)
    xs = jnp.arange(n, dtype=jnp.int32)
    # full 2n reference column: below-left substitutes from the last
    # available sample (spec 8.4.4.2.2)
    left2 = jnp.concatenate(
        [left, jnp.repeat(left[:, -1:], n, axis=1)], axis=1)

    # planar (spec 8.4.4.2.6); luma n>=8 smooths the refs (8.4.4.2.3):
    # with top == corner everywhere only the left column changes
    # (smoothed corner (l0+2c+t0+2)>>2 == c since c == l0 == t0)
    if luma and n >= 8:
        ext = jnp.concatenate([corner, left2], axis=1)  # (R, 2n+1)
        fl = (ext[:, :-2] + 2 * ext[:, 1:-1] + ext[:, 2:] + 2) >> 2
        fl = jnp.concatenate([fl, left2[:, -1:]], axis=1)
    else:
        fl = left2
    pl_left = fl[:, :n]
    bl = fl[:, n:n + 1]                              # p[-1][nTbS]
    planar = ((n - 1 - xs)[None, None, :] * pl_left[:, :, None]
              + (xs + 1)[None, None, :] * corner[:, :, None]
              + (n - 1 - xs)[None, :, None] * corner[:, :, None]
              + (xs + 1)[None, :, None] * bl[:, :, None]
              + n) >> (log2n + 1)

    # DC (8.4.4.2.5): top sums to n * corner
    dc = (left.sum(1, keepdims=True) + n * corner + n) >> (log2n + 1)
    dcp = jnp.broadcast_to(dc[:, :, None], (r, n, n))
    if luma and n < 32:
        row0 = (corner + 3 * dc + 2) >> 2            # top[x] == corner
        col0 = (left + 3 * dc + 2) >> 2
        c00 = (left[:, :1] + 2 * dc + corner + 2) >> 2
        dcp = dcp.at[:, 0, :].set(jnp.broadcast_to(row0, (r, n)))
        dcp = dcp.at[:, :, 0].set(col0)
        dcp = dcp.at[:, 0, 0].set(c00[:, 0])

    # horizontal (mode 10): rows replicate left; the luma row-0 filter
    # adds ((top - corner) >> 1) == 0
    hor = jnp.broadcast_to(left[:, :, None], (r, n, n))

    # vertical (mode 26): columns replicate top == corner; luma col-0
    # filter: clip(corner + ((left - corner) >> 1))
    ver = jnp.broadcast_to(corner[:, :, None], (r, n, n))
    if luma and n < 32:
        ver = ver.at[:, :, 0].set(
            jnp.clip(corner + ((left - corner) >> 1), 0, 255))

    # angular 2..9 (spec 8.4.4.2.6, horizontal class: only the left
    # reference participates). Smoothing (8.4.4.2.3): luma 16x16
    # filters modes 2..8 (minDist > 1); mode 9 (minDist 1) does not;
    # chroma never. Each angular pixel is a static 2-tap of the
    # reference column, so the whole group is one MXU matmul against
    # a precomputed weight matrix (per-element indexing here cost
    # ~3.4 ms/frame inside the column scan).
    if luma and n >= 8:
        groups = (( _ANGLES[:7], fl), (_ANGLES[7:], left2))
    else:
        groups = ((_ANGLES, left2),)
    angulars = []
    for modes, base_ref in groups:
        wmat = _angular_matrix(n, modes)
        refl = jnp.concatenate([base_ref, base_ref[:, -1:]], axis=1)
        acc = jnp.einsum("rj,mjp->rmp", refl.astype(jnp.float32), wmat,
                         preferred_element_type=jnp.float32)
        pred = (acc.astype(jnp.int32) + 16) >> 5
        angulars.append(pred.reshape(r, len(modes), n, n))
    angulars = jnp.concatenate(angulars, axis=1)

    return jnp.concatenate(
        [jnp.stack([planar, dcp, hor, ver], axis=1), angulars], axis=1)


def _select_cand(preds, midx):
    """Select each row's winning candidate: preds (R, M, n, n) with
    midx (R,) -> (R, n, n). A masked sum: jnp.take_along_axis lowers
    to a per-element gather that costs ~3.8 ms/frame at 1080p on TPU,
    while M dense compare-selects are ~free (VPU, no data movement)."""
    m = preds.shape[1]
    out = jnp.zeros_like(preds[:, 0])
    for k in range(m):
        out = out + jnp.where((midx == k)[:, None, None],
                              preds[:, k], 0)
    return out


# ---------------------------------------------------------------------------
# motion search / compensation
# ---------------------------------------------------------------------------

def motion_search_dev(cur, ref=None, ref_pad=None,
                      pad: int | None = None):
    """Exhaustive +-8 full-pel SAD search per 16x16 CU, reproducing
    codec/h265/inter.py:motion_search bit for bit (packed sad|rank
    keys encode the center-outward tie order).

    Either ref (edge-padded here) or ref_pad padded by `pad` on every
    side — sharded callers supply neighbor-halo rows instead of edge
    replication."""
    h, w = cur.shape
    nch, ncw = h // CTB, w // CTB
    rng = SEARCH_RANGE
    if ref_pad is None:
        ref_pad = jnp.pad(ref, rng, mode="edge")
        pad = rng
    elif pad is None:
        pad = rng
    n_off = len(_OFFS)

    def one(off_idx, dy, dx):
        sh = jax.lax.dynamic_slice(ref_pad, (dy + pad, dx + pad), (h, w))
        sad = jnp.abs(cur - sh).reshape(nch, CTB, ncw, CTB).sum((1, 3))
        return (sad << 9) | off_idx                   # sad<=65280 fits

    chunk = 17
    dys = jnp.asarray(_OFF_DY).reshape(n_off // chunk, chunk)
    dxs = jnp.asarray(_OFF_DX).reshape(n_off // chunk, chunk)
    idxs = jnp.arange(n_off, dtype=jnp.int32).reshape(-1, chunk)

    def step(best, xs):
        i, dy, dx = xs
        keys = jax.vmap(one)(i, dy, dx)               # (chunk, nch, ncw)
        return jnp.minimum(best, keys.min(0)), None

    best = jnp.full((nch, ncw), jnp.iinfo(jnp.int32).max, jnp.int32)
    best, _ = jax.lax.scan(step, best, (idxs, dys, dxs))
    rank = best & 511
    mv = jnp.stack([jnp.asarray(_OFF_DY)[rank],
                    jnp.asarray(_OFF_DX)[rank]], axis=-1)
    return mv                                         # (nch, ncw, 2) f-pel


CHROMA_PAD = SEARCH_RANGE // 2 + 2
PLANE_PAD = SEARCH_RANGE + 1     # qpel MVs floor to -(rng+1) integer
LUMA_SRC_PAD = PLANE_PAD + 4     # 8-tap DCT-IF reaches -3..+4

# sub-pel refinement candidates (must match inter.SUBPEL_OFFS)
_SUB_DY = np.array([0, 0, 0, -1, 1, -1, -1, 1, 1], np.int32)
_SUB_DX = np.array([0, -1, 1, 0, 0, -1, 1, -1, 1], np.int32)


# ---------------------------------------------------------------------------
# gather-free motion pipeline
#
# TPU per-element gathers run at ~50M elem/s (measured: one whole-
# frame MC gather = 37 ms at 1080p), so the production P/B path avoids
# them entirely:
#   1. hierarchical full-pel search: exhaustive +-4 SAD at half
#      resolution (static whole-frame shifts), then +-1 full-pel SAD
#      refine per CU from a window canvas;
#   2. window canvas: E[cu, wy, wx] = ref[cu*16 + mv0 + w - 5] built
#      with two static strided re-tilings plus masked shift-selects
#      (pure dense VPU work, no gather);
#   3. sub-pel: all 16 qpel phases computed locally on each CU's
#      24x24 window (8-tap filters as static slices), SATD refinement
#      and the final MC are slices/selects of those phase tensors.
# Numpy twin: codec/h265/inter.py (motion_search / refine_subpel) —
# array equality is enforced by tests/test_h265_device.py.
# ---------------------------------------------------------------------------

COARSE_RANGE = 4                 # half-res exhaustive range (full +-8)
MV_FULL_MAX = 8                  # |full-pel MV| bound after refine
_C_OFFS = sorted(((dy, dx)
                  for dy in range(-COARSE_RANGE, COARSE_RANGE + 1)
                  for dx in range(-COARSE_RANGE, COARSE_RANGE + 1)),
                 key=lambda o: (abs(o[0]) + abs(o[1]), abs(o[0])))
_C_DY = np.array([o[0] for o in _C_OFFS], np.int32)
_C_DX = np.array([o[1] for o in _C_OFFS], np.int32)

WIN_L = 26                       # luma window (covers +-1 refine+qpel)
WIN_C = 11                       # chroma window (8 + 4-tap reach)


def _down2_dev(x):
    """Half-resolution image: 2x2 mean with +2 >> 2 rounding.

    Reshape-sum form: stride-2 slicing on the minor (lane) dim costs
    ~26 ms/frame on TPU; the reshape lowers to a fast relayout."""
    h, w = x.shape
    return (x.reshape(h // 2, 2, w // 2, 2).sum((1, 3)) + 2) >> 2


def _blocks(x, n: int):
    """(H, W) -> (nch, ncw, n, n) row-major tiles."""
    h, w = x.shape
    return x.reshape(h // n, n, w // n, n).transpose(0, 2, 1, 3)


def _unblocks(b):
    """(nch, ncw, n, n) -> (H, W)."""
    nch, ncw, n, _ = b.shape
    return b.transpose(0, 2, 1, 3).reshape(nch * n, ncw * n)


def _coarse_search_dev(cur_h, ref_h_pad):
    """Exhaustive +-4 SAD over 8x8 blocks at half resolution; packed
    (sad << 7 | rank) keys reproduce the center-outward tie order of
    inter.motion_search's coarse stage."""
    h, w = cur_h.shape
    nbh, nbw = h // 8, w // 8
    pad = COARSE_RANGE
    n_off = len(_C_OFFS)                               # 81 = 3 * 27

    # column-group sums ride the MXU: rows (nbh, w) @ bsel (w, nbw)
    # with a 0/1 block-diagonal selector. Values are integers
    # <= 16320 < 2^24, exact in f32 — the (nbh, 8, nbw, 8) reshape-
    # reduce form leaves the 8-wide minor dim on the lanes and runs
    # ~5x slower.
    bsel = jnp.equal(jnp.arange(w, dtype=jnp.int32)[:, None] // 8,
                     jnp.arange(nbw, dtype=jnp.int32)[None, :]
                     ).astype(jnp.float32)

    def one(off_idx, dy, dx):
        sh = jax.lax.dynamic_slice(ref_h_pad, (dy + pad, dx + pad),
                                   (h, w))
        rows = jnp.abs(cur_h - sh).reshape(nbh, 8, w).sum(
            1, dtype=jnp.int32)                        # (nbh, w)
        sad = jax.lax.dot(rows.astype(jnp.float32), bsel,
                          precision=jax.lax.Precision.HIGHEST
                          ).astype(jnp.int32)
        return (sad << 7) | off_idx                    # sad <= 16320

    chunk = 27
    dys = jnp.asarray(_C_DY).reshape(n_off // chunk, chunk)
    dxs = jnp.asarray(_C_DX).reshape(n_off // chunk, chunk)
    idxs = jnp.arange(n_off, dtype=jnp.int32).reshape(-1, chunk)

    def step(best, xs):
        i, dy, dx = xs
        keys = jax.vmap(one)(i, dy, dx)
        return jnp.minimum(best, keys.min(0)), None

    best = jnp.full((nbh, nbw), jnp.iinfo(jnp.int32).max, jnp.int32)
    best, _ = jax.lax.scan(step, best, (idxs, dys, dxs))
    rank = best & 127
    dy = jnp.zeros_like(rank)
    dx = jnp.zeros_like(rank)
    for k, (ody, odx) in enumerate(_C_OFFS):           # no table gather
        sel = rank == k
        if ody:
            dy = jnp.where(sel, ody, dy)
        if odx:
            dx = jnp.where(sel, odx, dx)
    return jnp.stack([dy, dx], axis=-1)                # (nbh, nbw, 2)


def _window_canvas_dev(ref_pad, off_yx, blk: int, win: int, orig: int,
                       lo: int, hi: int, pad: int):
    """Per-CU windows without gathers:

      E[cy, cx, wy, wx] =
        ref_pad[cy*blk + off_y + wy + orig + pad,
                cx*blk + off_x + wx + orig + pad]

    off_yx (nch, ncw, 2) int32 with components in [lo, hi]. Built as
    two static strided re-tilings (x then y) followed by one masked
    shift-select per axis (S = hi-lo+1 dense select terms each)."""
    nch, ncw = off_yx.shape[:2]
    s_count = hi - lo + 1
    t_len = s_count - 1 + win
    a0 = lo + orig + pad

    # x re-tile: F[y, cx, t] = ref_pad[y, cx*blk + t + a0]
    f = jnp.stack([ref_pad[:, a0 + t: a0 + t + ncw * blk: blk]
                   for t in range(t_len)], axis=-1)    # (Hp, ncw, T)
    # y re-tile: D[cy, t, cx, t2] = F[cy*blk + t + a0, cx, t2]
    d = jnp.stack([f[a0 + t: a0 + t + nch * blk: blk]
                   for t in range(t_len)], axis=1)     # (nch,T,ncw,T)

    sy = off_yx[..., 0] - lo                           # (nch, ncw)
    sx = off_yx[..., 1] - lo
    a = jnp.zeros((nch, win, ncw, t_len), d.dtype)
    for s in range(s_count):
        a = a + jnp.where((sy == s)[:, None, :, None],
                          d[:, s:s + win], 0)
    e = jnp.zeros((nch, win, ncw, win), d.dtype)
    for s in range(s_count):
        e = e + jnp.where((sx == s)[:, None, :, None],
                          a[..., s:s + win], 0)
    return e.transpose(0, 2, 1, 3)                     # (nch,ncw,W,W)


def _blocks_t(x, n: int):
    """(H, W) -> (n, n, nch, ncw) CU-TRAILING tiles. The lane (minor)
    dimension is ncw — 120 at 1080p, ~94% of the 128 VPU lanes —
    instead of the window width (16/17/24/26, <= 20% lane use). All
    hot per-CU motion tensors use this layout."""
    h, w = x.shape
    return x.reshape(h // n, n, w // n, n).transpose(1, 3, 0, 2)


def _unblocks_t(b):
    """(n, n, nch, ncw) -> (H, W)."""
    n, _, nch, ncw = b.shape
    return b.transpose(2, 0, 3, 1).reshape(nch * n, ncw * n)


def _window_canvas_t(ref_pad, off_yx, blk: int, win: int, orig: int,
                     lo: int, hi: int, pad: int):
    """CU-trailing window canvas (layout twin of _window_canvas_dev):

      E[wy, wx, cy, cx] =
        ref_pad[cy*blk + off_y + wy + orig + pad,
                cx*blk + off_x + wx + orig + pad]

    Same two static strided re-tilings + masked shift-selects, but
    with (nch, ncw) trailing so every select is lane-aligned and the
    (nch, ncw) masks broadcast with no reshapes."""
    nch, ncw = off_yx.shape[:2]
    s_count = hi - lo + 1
    t_len = s_count - 1 + win
    a0 = lo + orig + pad

    # x re-tile: F[t, y, cx] = ref_pad[y, cx*blk + t + a0]
    f = jnp.stack([ref_pad[:, a0 + t: a0 + t + ncw * blk: blk]
                   for t in range(t_len)], axis=0)     # (T, Hp, ncw)
    # y re-tile: D[ty, t, cy, cx] = F[t, cy*blk + ty + a0, cx]
    d = jnp.stack([f[:, a0 + ty: a0 + ty + nch * blk: blk]
                   for ty in range(t_len)], axis=0)    # (Ty,T,nch,ncw)

    sy = off_yx[..., 0] - lo                           # (nch, ncw)
    sx = off_yx[..., 1] - lo
    a = jnp.zeros((win, t_len, nch, ncw), d.dtype)
    for s in range(s_count):
        a = a + jnp.where(sy == s, d[s:s + win], 0)
    e = jnp.zeros((win, win, nch, ncw), d.dtype)
    for s in range(s_count):
        e = e + jnp.where(sx == s, a[:, s:s + win], 0)
    return e                                           # (W,W,nch,ncw)


def _satd8_t(d):
    """8x8 Hadamard SATD per CU, CU-trailing layout: d (16, 16, ...)
    with |d| <= 255 -> (...) int32. Value-equal to _satd8_blocks_bf
    (same butterflies, axes permuted); int16 stages stay within
    +-16320."""
    tail = d.shape[2:]
    x = d.astype(jnp.int16).reshape(2, 8, 2, 8, *tail)

    def stage(t, axis, half):
        n = t.shape[axis]
        sl = [slice(None)] * t.ndim
        outs = []
        for s in range(0, n, 2 * half):
            sl[axis] = slice(s, s + half)
            a = t[tuple(sl)]
            sl[axis] = slice(s + half, s + 2 * half)
            b = t[tuple(sl)]
            outs.append(a + b)
            outs.append(a - b)
        return jnp.concatenate(outs, axis=axis)

    for half in (4, 2, 1):
        x = stage(x, 1, half)
    for half in (4, 2, 1):
        x = stage(x, 3, half)
    s8 = jnp.abs(x).sum((1, 3), dtype=jnp.int32) >> 2  # (2, 2, ...)
    return s8.sum((0, 1))


def _satd8_blocks_bf(d):
    """8x8 Hadamard SATD per 16x16 block via add/sub butterflies
    (value-equal to _satd8_blocks; avoids tiny 8x8 matmuls).
    d: (..., 16, 16) with |d| <= 255 (8-bit prediction diffs) ->
    (...) int32. Butterflies run in int16 — both stages stay within
    +-64*255 = +-16320 — halving HBM traffic (measured 5x on the
    chip); the abs-sum accumulates in int32."""
    lead = d.shape[:-2]
    x = d.astype(jnp.int16).reshape(*lead, 2, 8, 2, 8)

    def stage(t, axis, half):
        n = t.shape[axis]
        sl = [slice(None)] * t.ndim
        outs = []
        for s in range(0, n, 2 * half):
            sl[axis] = slice(s, s + half)
            a = t[tuple(sl)]
            sl[axis] = slice(s + half, s + 2 * half)
            b = t[tuple(sl)]
            outs.append(a + b)
            outs.append(a - b)
        return jnp.concatenate(outs, axis=axis)

    for half in (4, 2, 1):
        x = stage(x, -3, half)
    for half in (4, 2, 1):
        x = stage(x, -1, half)
    s8 = jnp.abs(x).sum((-1, -3), dtype=jnp.int32) >> 2  # (..., 2, 2)
    return s8.sum((-1, -2))


def _fullpel_refine_dev(cur_t, e):
    """+-1 full-pel SAD refine from the window canvas (CU-trailing
    layout). cur_t (16, 16, nch, ncw); e (26, 26, nch, ncw) with the
    full-pel block at rows/cols [5:21]. Tie order = SUBPEL_OFFS
    (earlier wins). Returns (d_yx, w24): the chosen offset and the
    24x24 window re-based at it (origin -4 relative to the refined
    MV)."""
    cur16 = cur_t.astype(e.dtype)
    best = jnp.full(cur_t.shape[2:], jnp.iinfo(jnp.int32).max,
                    jnp.int32)
    for k in range(9):
        dy, dx = int(_SUB_DY[k]), int(_SUB_DX[k])
        blk = e[5 + dy:21 + dy, 5 + dx:21 + dx]
        # abs-diff in the canvas dtype (int16: <= 255), row sums
        # <= 16*255 still fit; accumulate the final sum in int32
        sad = jnp.abs(cur16 - blk).sum(0).sum(0, dtype=jnp.int32)
        best = jnp.minimum(best, (sad << 4) | k)
    rank = best & 15
    dy = jnp.zeros_like(rank)
    dx = jnp.zeros_like(rank)
    w24 = jnp.zeros((24, 24) + e.shape[2:], e.dtype)
    for k in range(9):
        sel = rank == k
        ody, odx = int(_SUB_DY[k]), int(_SUB_DX[k])
        if ody:
            dy = jnp.where(sel, ody, dy)
        if odx:
            dx = jnp.where(sel, odx, dx)
        w24 = w24 + jnp.where(
            sel, e[1 + ody:25 + ody, 1 + odx:25 + odx], 0)
    return jnp.stack([dy, dx], axis=-1), w24


def _window_phases14(w24):
    """All 16 qpel phases of each 24x24 window at 14-bit intermediate
    precision (spec 8.5.4.2.2.1; acc >> 6 like luma_qpel_planes14).
    Phase index c of the 17-wide output corresponds to integer offset
    c - 1 relative to the window's full-pel MV.
    w24 (24, 24, nch, ncw) -> (16, 17, 17, nch, ncw) int16 (CU-
    trailing layout)."""
    from ceracoder_tpu.codec.h265.tables import LUMA_FILTER

    # NOTE: running the FILTER ARITHMETIC in int16 is value-exact on
    # CPU but MISCOMPILES on the axon TPU backend in fused context
    # (P-frame luma recon diverged from the oracle; bisected
    # 2026-08-20). Interpolation math therefore stays int32; the
    # phase tensor is merely STORED int16 (values fit +-30855) and
    # upcast on load — the int16-store/int32-compute pattern the
    # window canvas already uses safely on chip. This halves the HBM
    # traffic of the 16x17x17-per-CU tensor that the subpel refine
    # re-reads ~18 times.
    w32 = w24.astype(jnp.int32)
    tmps = []
    for fx in range(4):
        if fx == 0:
            tmps.append(w32[:, 3:20] * 64)
        else:
            th = [int(t) for t in LUMA_FILTER[fx]]
            tmps.append(sum(th[k] * w32[:, k:k + 17]
                            for k in range(8)))
    phases = []
    for fy in range(4):
        tv = [int(t) for t in LUMA_FILTER[fy]]
        for fx in range(4):
            tmp = tmps[fx]
            if fy == 0:
                # (tmp * 64) >> 6 == tmp exactly
                acc = tmp[3:20]
            else:
                acc = sum(tv[k] * tmp[k:k + 17]
                          for k in range(8)) >> 6
            phases.append(acc.astype(jnp.int16))
    return jnp.stack(phases, axis=0)               # (16,17,17,nch,ncw)


def _pred8_from14(p14):
    return jnp.clip((p14 + 32) >> 6, 0, 255)


def _subpel_refine_local(cur_t, ph14):
    """Half- then quarter-pel SATD refinement on the per-CU phase
    tensors (no gathers; CU-trailing layout). Candidate order and
    strictly-better rule match inter.refine_subpel. cur_t
    (16, 16, nch, ncw); ph14 (16, 17, 17, nch, ncw) int16. Returns
    (rel_q, pred14): the chosen qpel offset relative to the window's
    full-pel MV (components in [-3, 3]) and the winning 14-bit
    prediction blocks (16, 16, nch, ncw)."""
    nch, ncw = cur_t.shape[2:]

    def cand_raw(fy: int, fx: int):
        p = ((fy & 3) << 2) | (fx & 3)
        sy = (fy >> 2) + 1
        sx = (fx >> 2) + 1
        return ph14[p, sy:sy + 16, sx:sx + 16]        # int16 stored

    def cand_slice14(fy: int, fx: int):
        # upcast right at the load so arithmetic is int32 (axon-safe)
        return cand_raw(fy, fx).astype(jnp.int32)

    # step 1: half-pel (static phases per candidate). All 9 offsets:
    # dropping the diagonals here costs >2 dB on panning content
    # (measured on the rd_compare pan clip) — the half grid is where
    # diagonal motion is captured.
    best = jnp.full((nch, ncw), jnp.iinfo(jnp.int32).max, jnp.int32)
    for k in range(9):
        ey, ex = 2 * int(_SUB_DY[k]), 2 * int(_SUB_DX[k])
        pred8 = _pred8_from14(cand_slice14(ey, ex))
        cost = _satd8_t(cur_t - pred8)
        best = jnp.minimum(best, (cost << 4) | k)
    rank1 = best & 15

    # step 2: quarter-pel over the PLUS-shape candidates only
    # (SUBPEL_OFFS[:5]; the numpy twin inter.refine_subpel matches).
    # Diagonal quarter offsets buy <0.05 dB after a 9-way half-pel
    # stage but cost 4 more SATDs and 36 more masked window reads —
    # the rebase select chain below is the memory-bound core of the
    # refine (each p14 build reads 9 candidate windows).
    best = jnp.full((nch, ncw), jnp.iinfo(jnp.int32).max, jnp.int32)
    preds14 = []
    for k in range(5):
        oy, ox = int(_SUB_DY[k]), int(_SUB_DX[k])
        # 14-bit values are +-30855: the 9-way masked rebase runs in
        # the stored phase dtype (int16) — exactly one mask is true
        # per CU so no sum overflows
        p14 = jnp.zeros((16, 16, nch, ncw), ph14.dtype)
        for k1 in range(9):
            hy = 2 * int(_SUB_DY[k1])
            hx = 2 * int(_SUB_DX[k1])
            p14 = p14 + jnp.where(rank1 == k1,
                                  cand_raw(hy + oy, hx + ox),
                                  jnp.zeros((), ph14.dtype))
        preds14.append(p14)
        cost = _satd8_t(cur_t - _pred8_from14(p14).astype(jnp.int32))
        best = jnp.minimum(best, (cost << 4) | k)
    rank2 = best & 15

    rel_y = jnp.zeros((nch, ncw), jnp.int32)
    rel_x = jnp.zeros((nch, ncw), jnp.int32)
    pred14 = jnp.zeros((16, 16, nch, ncw), ph14.dtype)
    for k1 in range(9):
        sel = rank1 == k1
        rel_y = rel_y + jnp.where(sel, 2 * int(_SUB_DY[k1]), 0)
        rel_x = rel_x + jnp.where(sel, 2 * int(_SUB_DX[k1]), 0)
    for k in range(5):
        sel = rank2 == k
        rel_y = rel_y + jnp.where(sel, int(_SUB_DY[k]), 0)
        rel_x = rel_x + jnp.where(sel, int(_SUB_DX[k]), 0)
        pred14 = pred14 + jnp.where(sel, preds14[k], 0)
    return jnp.stack([rel_y, rel_x], axis=-1), pred14


def _motion_luma_dev(cur, ref_pad, pad: int):
    """Full luma motion pipeline: hierarchical full-pel search +
    window-local subpel refine and MC. cur (H, W) int32; ref_pad
    padded by `pad` >= LUMA_SRC_PAD on every side. Returns
    (mv_q (nch, ncw, 2), pred14 blocks (16, 16, nch, ncw) —
    CU-trailing layout; _unblocks_t restores the plane)."""
    h, w = cur.shape
    # int16 halves the coarse stage's HBM traffic (values <= 255 and
    # the 8x8 SAD accumulates in int32)
    cur_h = _down2_dev(cur).astype(jnp.int16)
    ref_ext = ref_pad[pad - 8:pad + h + 8, pad - 8:pad + w + 8]
    ref_h_pad = _down2_dev(ref_ext).astype(jnp.int16)  # half-res pad 4
    mvh = _coarse_search_dev(cur_h, ref_h_pad)
    mv0 = jnp.clip(2 * mvh, -(MV_FULL_MAX - 1), MV_FULL_MAX - 1)

    # int16 canvas: samples are 8-bit, and the canvas select chain is
    # pure HBM traffic (measured 1.36 -> 0.66 ms at 1080p)
    e = _window_canvas_t(ref_pad.astype(jnp.int16), mv0, blk=CTB,
                         win=WIN_L, orig=-5,
                         lo=-(MV_FULL_MAX - 1), hi=MV_FULL_MAX - 1,
                         pad=pad)
    cur_t = _blocks_t(cur, CTB)
    d_yx, w24 = _fullpel_refine_dev(cur_t, e)
    ph14 = _window_phases14(w24)
    rel_q, pred14 = _subpel_refine_local(cur_t, ph14)
    mv_q = 4 * (mv0 + d_yx) + rel_q
    return mv_q, pred14


def _mc_chroma_window(ref_c_pad, mv_q, pad: int, out14: bool = False):
    """Chroma MC from per-CU windows (no gathers): canvas + one-hot
    4-tap weights (spec 8.5.4.2.2.2; value-equal to _mc_chroma_qpel).
    ref_c_pad padded by `pad` >= CHROMA_PAD. Returns (hc, wc) plane."""
    oy = mv_q[..., 0] >> 3                             # in [-5, 4]
    ox = mv_q[..., 1] >> 3
    lo = -(MV_FULL_MAX * 4 + 3) >> 3                   # -5
    hi = (MV_FULL_MAX * 4 + 3) >> 3                    # 4
    e = _window_canvas_dev(ref_c_pad, jnp.stack([oy, ox], axis=-1),
                           blk=CTB // 2, win=WIN_C, orig=-1,
                           lo=lo, hi=hi, pad=pad)
    cf = np.asarray(CHROMA_FILTER, np.int32)
    fy = mv_q[..., 0] & 7
    fx = mv_q[..., 1] & 7
    nch, ncw = fy.shape
    ty = jnp.zeros((nch, ncw, 4), jnp.int32)
    tx = jnp.zeros((nch, ncw, 4), jnp.int32)
    for f in range(8):
        ty = ty + jnp.where((fy == f)[..., None],
                            jnp.asarray(cf[f]), 0)
        tx = tx + jnp.where((fx == f)[..., None],
                            jnp.asarray(cf[f]), 0)
    n = CTB // 2
    tmp = sum(tx[:, :, None, None, m] * e[..., :, m:m + n]
              for m in range(4))                       # (nch,ncw,11,8)
    acc = sum(ty[:, :, None, None, k] * tmp[..., k:k + n, :]
              for k in range(4))                       # (nch,ncw,8,8)
    if out14:
        return _unblocks(acc >> 6)
    return _unblocks(jnp.clip((acc + 2048) >> 12, 0, 255))


def _luma_qpel_planes(ref_y_pad, out14: bool = False):
    """All 16 (fy, fx) quarter-sample planes from a LUMA_SRC_PAD-
    padded reference (8-tap DCT-IF, spec 8.5.4.2.2.1; device twin of
    inter.luma_qpel_planes). Output planes are PLANE_PAD-padded.
    out14: 14-bit intermediates (acc >> 6) for bi-prediction instead
    of the rounded/clipped uni-prediction samples."""
    from ceracoder_tpu.codec.h265.tables import LUMA_FILTER

    src = ref_y_pad.astype(jnp.int32)
    hs, ws = src.shape
    ho = hs - 8
    wo = ws - 8
    planes = []
    for fy in range(4):
        tv = [int(x) for x in LUMA_FILTER[fy]]
        for fx in range(4):
            th = [int(x) for x in LUMA_FILTER[fx]]
            tmp = sum(th[k] * src[:, 1 + k:1 + k + wo] for k in range(8))
            acc = sum(tv[k] * tmp[1 + k:1 + k + ho, :] for k in range(8))
            if out14:
                planes.append(acc >> 6)
            else:
                planes.append(jnp.clip((acc + 2048) >> 12, 0, 255))
    return jnp.stack(planes)


def _uni_from_14(p14):
    """8-bit uni-prediction samples from 14-bit intermediates."""
    return jnp.clip((p14 + 32) >> 6, 0, 255)


def _mc_luma_qpel(planes, mv_q, h: int, w: int):
    """Whole-frame luma MC from the qpel planes (per-CU qpel MVs)."""
    dyi = jnp.repeat(jnp.repeat(mv_q[..., 0] >> 2, CTB, 0), CTB, 1)
    dxi = jnp.repeat(jnp.repeat(mv_q[..., 1] >> 2, CTB, 0), CTB, 1)
    sel = (jnp.repeat(jnp.repeat(mv_q[..., 0] & 3, CTB, 0), CTB, 1) * 4
           + jnp.repeat(jnp.repeat(mv_q[..., 1] & 3, CTB, 0), CTB, 1))
    ri = jnp.arange(h)[:, None] + dyi + PLANE_PAD
    ci = jnp.arange(w)[None, :] + dxi + PLANE_PAD
    return planes[sel, ri, ci]


_H8 = np.array([[1]])
while _H8.shape[0] < 8:
    _H8 = np.block([[_H8, _H8], [_H8, -_H8]])


def _satd8_frame(diff):
    """Per-16x16-CU sum of 8x8 Hadamard SATD (device twin of
    inter.satd8_frame; butterfly form — 8x8 einsum matmuls are too
    small for the MXU and fall to a slow path). diff: (H, W) int32."""
    return _satd8_blocks(_blocks(diff, CTB))


def _satd8_blocks(d):
    """8x8 Hadamard SATD per 16x16 block: d (..., 16, 16) int32 ->
    (...) int32 (device twin of inter.satd8_block; butterfly form,
    value-equal to the H8 @ d @ H8 definition)."""
    return _satd8_blocks_bf(d)


def _refine_subpel(cur, planes, mv_full, h: int, w: int):
    """Half- then quarter-pel SATD refinement (device twin of
    inter.refine_subpel: packed cost|rank keys reproduce the
    strictly-better / earlier-candidate-wins order)."""
    nch, ncw = h // CTB, w // CTB
    mv_q = mv_full * 4
    for step in (2, 1):
        def key_of(k):
            cand = mv_q + jnp.stack(
                [jnp.full((nch, ncw), _SUB_DY[k] * step, jnp.int32),
                 jnp.full((nch, ncw), _SUB_DX[k] * step, jnp.int32)],
                axis=-1)
            pred = _mc_luma_qpel(planes, cand, h, w)
            cost = _satd8_frame(cur - pred)
            return (cost << 4) | k, cand

        nk = 9 if step == 2 else 5     # quarter = plus shape only
        keys, cands = zip(*[key_of(k) for k in range(nk)])
        keys = jnp.stack(keys)                    # (nk, nch, ncw)
        cands = jnp.stack(cands)
        best = keys.argmin(0)
        mv_q = jnp.take_along_axis(
            cands, best[None, ..., None], axis=0)[0]
    return mv_q


def _mc_chroma_qpel(ref_c_pad, mv_q, hc: int, wc: int,
                    out14: bool = False):
    """Whole-frame chroma MC for arbitrary luma qpel MVs (eighth-
    sample chroma, spec 8.5.4.2.2.2): 4x4 tap window with per-CU
    fraction weights over the CHROMA_PAD-padded plane (device twin of
    inter.mc_chroma_qpel / mc_chroma_qpel14)."""
    pad = CHROMA_PAD
    n = CTB // 2
    p = ref_c_pad.astype(jnp.int32)
    dyi = jnp.repeat(jnp.repeat(mv_q[..., 0] >> 3, n, 0), n, 1)
    dxi = jnp.repeat(jnp.repeat(mv_q[..., 1] >> 3, n, 0), n, 1)
    fy = jnp.repeat(jnp.repeat(mv_q[..., 0] & 7, n, 0), n, 1)
    fx = jnp.repeat(jnp.repeat(mv_q[..., 1] & 7, n, 0), n, 1)
    cf = jnp.asarray(CHROMA_FILTER, jnp.int32)
    ty = cf[fy]                                   # (hc, wc, 4)
    tx = cf[fx]
    ri = jnp.arange(hc)[:, None] + dyi + pad
    ci = jnp.arange(wc)[None, :] + dxi + pad
    acc = jnp.zeros((hc, wc), jnp.int32)
    for k in range(4):
        tmp = jnp.zeros((hc, wc), jnp.int32)
        for m in range(4):
            tmp += tx[..., m] * p[ri - 1 + k, ci - 1 + m]
        acc += ty[..., k] * tmp
    if out14:
        return acc >> 6
    return jnp.clip((acc + 2048) >> 12, 0, 255)


def _bi_combine(p0_14, p1_14):
    """Default bi-prediction combine (spec 8.5.4.2.3.2, 8-bit).
    Upcasts first: 14-bit inputs may arrive int16 and their sum
    (up to +-61710) would wrap."""
    return jnp.clip((p0_14.astype(jnp.int32) + p1_14 + 64) >> 7,
                    0, 255)


# ---------------------------------------------------------------------------
# in-loop deblocking (spec 8.7.2; device twin of codec/h265/deblock.py)
# ---------------------------------------------------------------------------

_BETA_TABLE = np.array(
    [0] * 16 + [6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22,
                24, 26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50,
                52, 54, 56, 58, 60, 62, 64], np.int32)
_TC_TABLE = np.array(
    [0] * 18 + [1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4,
                4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20,
                22, 24], np.int32)


def _edge_bs_dev(is_intra, cbf_l, mv, mv1=None):
    def pair(ia, ib, ca, cb, ma, mb, m1a=None, m1b=None):
        two = ia | ib
        diff = (jnp.abs(ma - mb) >= 4).any(-1)
        if m1a is not None:
            diff |= (jnp.abs(m1a - m1b) >= 4).any(-1)
        one = ca | cb | diff
        return jnp.where(two, 2, jnp.where(one, 1, 0)).astype(jnp.int32)

    bs_v = pair(is_intra[:, :-1], is_intra[:, 1:], cbf_l[:, :-1],
                cbf_l[:, 1:], mv[:, :-1], mv[:, 1:],
                *((None, None) if mv1 is None
                  else (mv1[:, :-1], mv1[:, 1:])))
    bs_h = pair(is_intra[:-1, :], is_intra[1:, :], cbf_l[:-1, :],
                cbf_l[1:, :], mv[:-1, :], mv[1:, :],
                *((None, None) if mv1 is None
                  else (mv1[:-1, :], mv1[1:, :])))
    return bs_v, bs_h


def _luma_edge_filter(p, q, bs, qp):
    """p: (E, L, 4) p3..p0, q: (E, L, 4) q0..q3, bs: (E, L); L a
    multiple of 4 (decision groups). Vectorized spec 8.7.2.5.3/.5.7."""
    e, li, _ = p.shape
    beta = jnp.asarray(_BETA_TABLE)[jnp.clip(qp, 0, 51)]
    # bs is only ever 0/1/2: two scalar table lookups + a dense
    # select (a per-element table gather here costs ~1 ms/frame)
    tc_bs1 = jnp.asarray(_TC_TABLE)[jnp.clip(qp, 0, 53)]
    tc_bs2 = jnp.asarray(_TC_TABLE)[jnp.clip(qp + 2, 0, 53)]
    tc_all = jnp.where(bs == 2, tc_bs2,
                       jnp.where(bs == 1, tc_bs1, 0)).astype(p.dtype)

    p3, p2, p1, p0 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    dp = jnp.abs(p2 - 2 * p1 + p0)
    dq = jnp.abs(q2 - 2 * q1 + q0)

    g = li // 4
    dp4 = dp.reshape(e, g, 4)
    dq4 = dq.reshape(e, g, 4)
    dpq0 = dp4[..., 0] + dq4[..., 0]
    dpq3 = dp4[..., 3] + dq4[..., 3]
    d = dpq0 + dpq3
    tc_g = tc_all.reshape(e, g, 4)[..., 0]
    bs_g = bs.reshape(e, g, 4)[..., 0]
    filt = (d < beta) & (bs_g > 0)

    def dsam(i):
        dpq = dp4[..., i] + dq4[..., i]
        sap = jnp.abs(p3 - p0).reshape(e, g, 4)[..., i]
        saq = jnp.abs(q0 - q3).reshape(e, g, 4)[..., i]
        spq = jnp.abs(p0 - q0).reshape(e, g, 4)[..., i]
        return ((2 * dpq < (beta >> 2))
                & (sap + saq < (beta >> 3))
                & (spq < ((5 * tc_g + 1) >> 1)))

    strong = filt & dsam(0) & dsam(3)
    rep = lambda a: jnp.repeat(a, 4, axis=1)
    filt_l, strong_l, tc = rep(filt), rep(strong), rep(tc_g)

    c2 = lambda x, ref: jnp.clip(x, ref - 2 * tc, ref + 2 * tc)
    sp0 = c2((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3, p0)
    sp1 = c2((p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = c2((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = c2((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3, q0)
    sq1 = c2((p0 + q0 + q1 + q2 + 2) >> 2, q1)
    sq2 = c2((p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3, q2)

    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    wtake = jnp.abs(delta) < 10 * tc
    dlt = jnp.clip(delta, -tc, tc)
    wp0 = jnp.clip(p0 + dlt, 0, 255)
    wq0 = jnp.clip(q0 - dlt, 0, 255)
    side_th = (beta + (beta >> 1)) >> 3
    dep = rep(dp4[..., 0] + dp4[..., 3] < side_th)
    deq = rep(dq4[..., 0] + dq4[..., 3] < side_th)
    tc2 = tc >> 1
    dp1v = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1, -tc2, tc2)
    wp1 = jnp.clip(p1 + dp1v, 0, 255)
    dq1v = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1, -tc2, tc2)
    wq1 = jnp.clip(q1 + dq1v, 0, 255)

    wk = filt_l & ~strong_l & wtake
    st = filt_l & strong_l
    out_p = jnp.stack([
        p3,
        jnp.where(st, sp2, p2),
        jnp.where(st, sp1, jnp.where(wk & dep, wp1, p1)),
        jnp.where(st, sp0, jnp.where(wk, wp0, p0)),
    ], axis=-1)
    out_q = jnp.stack([
        jnp.where(st, sq0, jnp.where(wk, wq0, q0)),
        jnp.where(st, sq1, jnp.where(wk & deq, wq1, q1)),
        jnp.where(st, sq2, q2),
        q3,
    ], axis=-1)
    return out_p, out_q


def _chroma_edge_filter(p, q, bs, qp):
    """p: (E, L, 2) p1,p0; q: (E, L, 2) q0,q1; bs == 2 filters
    (spec 8.7.2.5.5)."""
    from ceracoder_tpu.codec.h265.tables import CHROMA_SCALE
    qpc = jnp.asarray(CHROMA_SCALE, jnp.int32)[jnp.clip(qp, 0, 69)]
    tc = jnp.asarray(_TC_TABLE)[jnp.clip(qpc + 2, 0, 53)].astype(p.dtype)
    p1, p0 = p[..., 0], p[..., 1]
    q0, q1 = q[..., 0], q[..., 1]
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    f = bs == 2
    out_p = jnp.stack(
        [p1, jnp.where(f, jnp.clip(p0 + delta, 0, 255), p0)], axis=-1)
    out_q = jnp.stack(
        [jnp.where(f, jnp.clip(q0 - delta, 0, 255), q0), q1], axis=-1)
    return out_p, out_q


def _nnz8_map_dev(luma_lv, cbf_l, tu_split):
    """Twin of deblock.nnz8_map: per-8x8-quadrant luma TB nonzero map
    (2nch, 2ncw) — quadrant flag for split CUs, CU TB flag else."""
    nch, ncw = cbf_l.shape
    qz = (luma_lv.reshape(nch, ncw, 2, 8, 2, 8) != 0).any((3, 5))
    cu = jnp.broadcast_to(cbf_l[:, :, None, None] != 0,
                          (nch, ncw, 2, 2))
    sp = jnp.broadcast_to(tu_split[:, :, None, None],
                          (nch, ncw, 2, 2))
    out = jnp.where(sp, qz, cu)
    return out.transpose(0, 2, 1, 3).reshape(2 * nch, 2 * ncw)


def _seg_bs_dev(ii_a, ii_b, mv_a, mv_b, m1a, m1b, nz_pair):
    """Twin of deblock._seg_bs, batched: per-CU inputs (nch, E),
    nz_pair per segment (2nch, E); returns (2nch, E) strengths."""
    ii = jnp.repeat(ii_a | ii_b, 2, axis=0)
    mvd = (jnp.abs(mv_a - mv_b) >= 4).any(-1)
    if m1a is not None:
        mvd |= (jnp.abs(m1a - m1b) >= 4).any(-1)
    mvd = jnp.repeat(mvd, 2, axis=0)
    return jnp.where(ii, 2,
                     jnp.where(nz_pair | mvd, 1, 0)).astype(jnp.int32)


def _deblock_axis(y, u, v, bs, bs_seg, int_bs, qp, nblk: int):
    """Filter all vertical edges of one orientation.

    y: (H, W) with CU edges every 16 columns. bs: (nrow_blocks, E)
    per-CTB strengths (chroma; constant along the edge), bs_seg:
    (2*nrow_blocks, E) luma per-8-sample-segment strengths, int_bs:
    (2*nrow_blocks, nblk) interior TU-edge strengths of split CUs (or
    None). CU-boundary and interior filters touch disjoint samples
    (>=2 columns apart), so their order is immaterial."""
    h, w = y.shape
    e = nblk - 1
    if e:
        yv = y.reshape(h, nblk, CTB)
        p = yv[:, :-1, CTB - 4:].transpose(1, 0, 2)  # (E, H, 4)
        q = yv[:, 1:, :4].transpose(1, 0, 2)
        bs_l = jnp.repeat(bs_seg, 8, axis=0).T       # (E, H)
        fp, fq = _luma_edge_filter(p, q, bs_l, qp)
        yv = yv.at[:, :-1, CTB - 4:].set(fp.transpose(1, 0, 2))
        yv = yv.at[:, 1:, :4].set(fq.transpose(1, 0, 2))
        y = yv.reshape(h, w)

        hc, wc = u.shape
        nc = CTB // 2
        bs_c = jnp.repeat(bs, nc, axis=0).T          # (E, Hc)
        outs = []
        for plane in (u, v):
            pv = plane.reshape(hc, nblk, nc)
            pc = pv[:, :-1, nc - 2:].transpose(1, 0, 2)
            qc = pv[:, 1:, :2].transpose(1, 0, 2)
            fpc, fqc = _chroma_edge_filter(pc, qc, bs_c, qp)
            pv = pv.at[:, :-1, nc - 2:].set(fpc.transpose(1, 0, 2))
            pv = pv.at[:, 1:, :2].set(fqc.transpose(1, 0, 2))
            outs.append(pv.reshape(hc, wc))
        u, v = outs
    if int_bs is not None:
        yv = y.reshape(h, nblk, CTB)
        p = yv[:, :, 4:8].transpose(1, 0, 2)         # (nblk, H, 4)
        q = yv[:, :, 8:12].transpose(1, 0, 2)
        bs_i = jnp.repeat(int_bs, 8, axis=0).T       # (nblk, H)
        fp, fq = _luma_edge_filter(p, q, bs_i, qp)
        yv = yv.at[:, :, 4:8].set(fp.transpose(1, 0, 2))
        yv = yv.at[:, :, 8:12].set(fq.transpose(1, 0, 2))
        y = yv.reshape(h, w)
    return y, u, v


def deblock_frame_dev(rec_y, rec_u, rec_v, is_intra, cbf_l, mv, qp,
                      mv1=None, tu_split=None, luma_lv=None):
    """Device HEVC deblock post-pass; twin of
    codec/h265/deblock.py:deblock_frame (vertical edges over the whole
    picture, then horizontal edges on the result). mv1 for B frames;
    tu_split + luma_lv enable per-quadrant boundary strengths and the
    interior 8-aligned TU edges of split CUs."""
    # int16 planes: every filter intermediate fits (largest sums are
    # the strong-filter taps <= 8*255 + 4 and delta in +-3068), and
    # the pass is dominated by plane relayout traffic
    y = jnp.asarray(rec_y).astype(jnp.int32)
    u = jnp.asarray(rec_u).astype(jnp.int32)
    v = jnp.asarray(rec_v).astype(jnp.int32)
    is_intra = jnp.asarray(is_intra)
    cbf_l = jnp.asarray(cbf_l)
    mv = jnp.asarray(mv)
    if mv1 is not None:
        mv1 = jnp.asarray(mv1)
    h, w = y.shape
    nch, ncw = h // CTB, w // CTB
    split = (jnp.zeros((nch, ncw), bool) if tu_split is None
             else jnp.asarray(tu_split))
    if luma_lv is None:
        nnz8 = _nnz8_map_dev(jnp.zeros((nch, ncw, 1, 1), jnp.int32)
                             .repeat(CTB, 2).repeat(CTB, 3),
                             cbf_l, split)
    else:
        nnz8 = _nnz8_map_dev(jnp.asarray(luma_lv), cbf_l, split)
    bs_v, bs_h = _edge_bs_dev(is_intra, cbf_l, mv, mv1)

    def seg_and_int(ii, mvx, m1x, nnz8x, splitx, n):
        if n > 1:
            segs = _seg_bs_dev(
                ii[:, :-1], ii[:, 1:], mvx[:, :-1], mvx[:, 1:],
                None if m1x is None else m1x[:, :-1],
                None if m1x is None else m1x[:, 1:],
                nnz8x[:, 1:-1:2] | nnz8x[:, 2::2])
        else:
            segs = jnp.zeros((2 * ii.shape[0], 0), jnp.int32)
        nz_int = nnz8x[:, ::2] | nnz8x[:, 1::2]
        sp2 = jnp.repeat(splitx, 2, axis=0)
        int_bs = jnp.where(sp2 & nz_int, 1, 0).astype(jnp.int32)
        return segs, int_bs

    seg_v, int_v = seg_and_int(is_intra, mv, mv1, nnz8, split, ncw)
    y, u, v = _deblock_axis(y, u, v, bs_v, seg_v, int_v, qp, ncw)

    mv_t = mv.swapaxes(0, 1)
    mv1_t = None if mv1 is None else mv1.swapaxes(0, 1)
    seg_h, int_h = seg_and_int(is_intra.T, mv_t, mv1_t, nnz8.T,
                               split.T, nch)
    yt, ut, vt = _deblock_axis(y.T, u.T, v.T, bs_h.T, seg_h, int_h,
                               qp, nch)
    return (yt.T.astype(jnp.uint8), ut.T.astype(jnp.uint8),
            vt.T.astype(jnp.uint8))


# ---------------------------------------------------------------------------
# frame ops
# ---------------------------------------------------------------------------

def _col_view(plane, n: int):
    """(H, W) -> (ncols, nrows, n, n) column-major CTB tiles."""
    h, w = plane.shape
    return (plane.reshape(h // n, n, w // n, n)
            .transpose(2, 0, 1, 3))


def _from_cols(cols):
    """(ncols, nrows, n, n) -> (H, W)."""
    ncw, nch, n, _ = cols.shape
    return cols.transpose(1, 2, 0, 3).reshape(nch * n, ncw * n)


def _intra_col(ly, lu, lv, sy, su, sv, qp, qp_c, t16, t8):
    """One CTB column of intra coding for all rows. Carries the right
    recon columns; returns per-row (mode, levels, recon tiles)."""
    preds = _intra_preds(ly, CTB, luma=True)         # (R, M, 16, 16)
    sad = _satd8_blocks(sy[:, None] - preds)         # (R, M)
    midx = jnp.argmin(sad, axis=1)
    best = _select_cand(preds, midx)
    lv_y, rec_y = _code_tu(sy, best, qp, t16, 4)

    pu = _intra_preds(lu, CTB // 2, luma=False)
    pv = _intra_preds(lv, CTB // 2, luma=False)
    pu = _select_cand(pu, midx)
    pv = _select_cand(pv, midx)
    lv_u, rec_u = _code_tu(su, pu, qp_c, t8, 3)
    lv_v, rec_v = _code_tu(sv, pv, qp_c, t8, 3)

    mode = _MODES[midx]
    return mode, (lv_y, lv_u, lv_v), (rec_y, rec_u, rec_v)


def _make_scan(body, mbw_unroll: int):
    """Wrap a per-column body into an unrolled lax.scan step."""
    def step(carry, xs):
        outs = []
        for k in range(mbw_unroll):
            carry, out = body(carry, jax.tree_util.tree_map(
                lambda a: a[k], xs))
            outs.append(out)
        return carry, jax.tree_util.tree_map(
            lambda *ts: jnp.stack(ts), *outs)
    return step


def _unroll_for(ncw: int) -> int:
    return next(u for u in (8, 6, 5, 4, 3, 2, 1) if ncw % u == 0)


def _i_frame_core(y, u, v, qp, qp_c):
    """Intra frame core (see encode_frame_i_rows)."""
    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)
    h, w = y.shape
    nch, ncw = h // CTB, w // CTB
    t16 = jnp.asarray(T16, jnp.int32)
    t8 = jnp.asarray(T8, jnp.int32)

    ys = _col_view(y, CTB)
    us = _col_view(u, CTB // 2)
    vs = _col_view(v, CTB // 2)

    def body(carry, xs):
        ly, lu, lv = carry
        sy, su, sv = xs
        mode, lvs, recs = _intra_col(ly, lu, lv, sy, su, sv,
                                     qp, qp_c, t16, t8)
        new_carry = (recs[0][:, :, -1], recs[1][:, :, -1],
                     recs[2][:, :, -1])
        return new_carry, (mode, *lvs, *recs)

    unroll = _unroll_for(ncw)
    init = (jnp.full((nch, CTB), 128, jnp.int32),
            jnp.full((nch, CTB // 2), 128, jnp.int32),
            jnp.full((nch, CTB // 2), 128, jnp.int32))
    xs = jax.tree_util.tree_map(
        lambda a: a.reshape(ncw // unroll, unroll, *a.shape[1:]),
        (ys, us, vs))
    _, outs = jax.lax.scan(_make_scan(body, unroll), init, xs)
    outs = jax.tree_util.tree_map(
        lambda a: a.reshape(ncw, *a.shape[2:]), outs)
    mode, lv_y, lv_u, lv_v, rec_y, rec_u, rec_v = outs

    return {
        "is_intra": jnp.ones((nch, ncw), bool),
        "mode": mode.T,
        "mv": jnp.zeros((nch, ncw, 2), jnp.int32),
        "tu_split": jnp.zeros((nch, ncw), bool),
        "luma_lv": lv_y.swapaxes(0, 1),
        "cb_lv": lv_u.swapaxes(0, 1),
        "cr_lv": lv_v.swapaxes(0, 1),
        "recon": (_from_cols(rec_y).astype(jnp.uint8),
                  _from_cols(rec_u).astype(jnp.uint8),
                  _from_cols(rec_v).astype(jnp.uint8)),
    }


def compact_slots(flat, cap: int):
    """Sparse-compact (n, 384) int16 slot rows for transfer.

    Keeps only nonzeros, in slot order within each row (row-major
    stream). Returns
      pos  (cap,) int16  slot index within the row's 384-slot layout
      val  (cap,) int16  level
      nnz  () int32 total (> cap means the buffer overflowed and the
                           frame must be redone on the host path)
    Shared by the HEVC CTB stream (384 = 256 luma + 64 cb + 64 cr) and
    the H.264 CABAC MB stream (codec/h264/cabac_run.py, also 384
    slots/MB).
    """
    n_ctb = flat.shape[0]
    mask = flat != 0

    # three-level compaction: a whole-frame element scatter costs
    # ~45 ms on TPU (~14 ns/update over all 3.1M slots) while row
    # scatters are cheap. Level 1 compacts nonzero 128-wide segments,
    # level 2 compacts nonzero 16-wide subsegments of the survivors,
    # level 3 element-scatters only the ~subcap*16 remaining slots.
    # Each level's cumsum is order-preserving, so the output stream
    # stays CTB-major ([luma0|luma1|cb+cr] within a CTB) — unchanged
    # vs the dense flattening.
    n_seg = n_ctb * 3
    segcap = min(n_seg, 6144)
    segs = flat.reshape(n_seg, 128)
    seg_nz = mask.reshape(n_seg, 128).any(-1)
    n_seg_nz = seg_nz.sum().astype(jnp.int32)
    dstr = jnp.cumsum(seg_nz) - 1
    dstr = jnp.where(seg_nz, dstr, segcap)
    comp = jnp.zeros((segcap + 1, 128), jnp.int16).at[dstr].set(
        segs, mode="drop")
    segid = jnp.zeros(segcap + 1, jnp.int32).at[dstr].set(
        jnp.arange(n_seg, dtype=jnp.int32), mode="drop")

    # level 2: 16-wide subsegments; posbase = slot offset within the
    # CTB's 384-slot layout of each subsegment's first element
    subw = 16
    n_sub = segcap * (128 // subw)
    subcap = min(n_sub, 16384)
    subs = comp[:segcap].reshape(n_sub, subw)
    posbase = ((segid[:segcap] % 3) * 128)[:, None] + jnp.arange(
        0, 128, subw, dtype=jnp.int32)                # (segcap, 8)
    sub_nz = (subs != 0).any(-1)
    n_sub_nz = sub_nz.sum().astype(jnp.int32)
    dsts = jnp.cumsum(sub_nz) - 1
    dsts = jnp.where(sub_nz, dsts, subcap)
    comp2 = jnp.zeros((subcap + 1, subw), jnp.int16).at[dsts].set(
        subs, mode="drop")
    pos2 = jnp.zeros(subcap + 1, jnp.int32).at[dsts].set(
        posbase.reshape(-1), mode="drop")

    red = comp2[:subcap].reshape(-1)
    posr = pos2[:subcap, None] + jnp.arange(subw, dtype=jnp.int32)
    m2 = red != 0
    packed = ((posr.reshape(-1) << 16)
              | (red.astype(jnp.int32) & 0xFFFF))
    dst = jnp.cumsum(m2) - 1
    dst = jnp.where(m2, dst, cap)
    out = jnp.zeros(cap + 1, jnp.int32).at[dst].set(packed,
                                                    mode="drop")
    out = out[:cap]
    pos = (out >> 16).astype(jnp.int16)
    val = jax.lax.bitcast_convert_type(
        (out & 0xFFFF).astype(jnp.uint16), jnp.int16)
    nnz = mask.sum().astype(jnp.int32)
    # dropped segments/subsegments would corrupt the stream: force
    # host fallback
    nnz = jnp.where((n_seg_nz > segcap) | (n_sub_nz > subcap),
                    jnp.int32(cap + 1), nnz)
    return pos, val, nnz


def _compact_levels(luma_lv, cb_lv, cr_lv, cap: int):
    """Sparse-compact the quantized levels of one frame for transfer.

    Flattens per CTB as [luma 256 | cb 64 | cr 64] (raster inside each
    TU); see compact_slots. Also returns counts (nch, ncw, 3) int32
    per-TU nonzero counts. The stream is CTB-major, so the host
    entropy stage reconstructs each TU with a running offset — no
    full-frame dense materialization on the host side.
    """
    nch, ncw = luma_lv.shape[:2]
    n_ctb = nch * ncw
    flat = jnp.concatenate([
        luma_lv.reshape(n_ctb, 256),
        cb_lv.reshape(n_ctb, 64),
        cr_lv.reshape(n_ctb, 64),
    ], axis=1).astype(jnp.int16)                      # (n_ctb, 384)
    mask = flat != 0
    counts = jnp.stack([mask[:, :256].sum(1), mask[:, 256:320].sum(1),
                        mask[:, 320:].sum(1)], axis=1).astype(jnp.int32)
    pos, val, nnz = compact_slots(flat, cap)
    return pos, val, counts.reshape(nch, ncw, 3), nnz


def _p_frame_core(y, u, v, ref_y, ref_u, ref_v, qp, qp_c,
                  tu_split: bool = False):
    """P frame core (see encode_frame_p_rows). Single-chip: the
    reference is edge-padded here (== the spec's picture-edge clip);
    sharded callers use _p_frame_core_padded with halo rows instead."""
    ref_y_pad = jnp.pad(ref_y.astype(jnp.int32), LUMA_SRC_PAD,
                        mode="edge")
    ref_u_pad = jnp.pad(jnp.asarray(ref_u), CHROMA_PAD, mode="edge")
    ref_v_pad = jnp.pad(jnp.asarray(ref_v), CHROMA_PAD, mode="edge")
    return _p_frame_core_padded(y, u, v, ref_y_pad, ref_u_pad,
                                ref_v_pad, qp, qp_c,
                                tu_split=tu_split)


def _p_frame_core_padded(y, u, v, ref_y_pad, ref_u_pad, ref_v_pad,
                         qp, qp_c, tu_split: bool = False):
    """P frame core over pre-padded references: ref_y_pad carries
    LUMA_SRC_PAD extra rows/cols, ref_u/v_pad CHROMA_PAD. The pad
    content defines the out-of-band semantics (edge replication on a
    single chip; neighbor halos + edge replication at picture borders
    when row bands are sharded across chips). Motion runs on the
    gather-free window pipeline (_motion_luma_dev)."""
    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)

    mv_q, pred14_t = _motion_luma_dev(y, ref_y_pad, LUMA_SRC_PAD)
    pred_y = _unblocks_t(_pred8_from14(pred14_t.astype(jnp.int32)))
    pred_u = _mc_chroma_window(ref_u_pad, mv_q, CHROMA_PAD)
    pred_v = _mc_chroma_window(ref_v_pad, mv_q, CHROMA_PAD)

    outs = _inter_frame_tail(y, u, v, pred_y, pred_u, pred_v, qp,
                             qp_c, tu_split=tu_split)
    is_intra = outs["is_intra"]
    outs["mv"] = jnp.where(is_intra[..., None], 0, mv_q)
    return outs


def _b_frame_core(y, u, v, r0y, r0u, r0v, r1y, r1u, r1v, qp, qp_c,
                  tu_split: bool = False):
    """B frame core: per-list quarter-pel motion against the past
    (list 0) and future (list 1) references, 14-bit bi-prediction
    combine (spec 8.5.4.2.3.2), per-CTB intra fallback. Matches
    rowslice.compute_b_rows bit for bit."""
    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)

    mvs = []
    preds14 = []
    pu14 = []
    pv14 = []
    for ry, ru, rv in ((r0y, r0u, r0v), (r1y, r1u, r1v)):
        ry_pad = jnp.pad(ry.astype(jnp.int32), LUMA_SRC_PAD,
                         mode="edge")
        ru_pad = jnp.pad(jnp.asarray(ru), CHROMA_PAD, mode="edge")
        rv_pad = jnp.pad(jnp.asarray(rv), CHROMA_PAD, mode="edge")
        mv_q, p14_t = _motion_luma_dev(y, ry_pad, LUMA_SRC_PAD)
        mvs.append(mv_q)
        preds14.append(_unblocks_t(p14_t.astype(jnp.int32)))
        pu14.append(_mc_chroma_window(ru_pad, mv_q, CHROMA_PAD,
                                      out14=True))
        pv14.append(_mc_chroma_window(rv_pad, mv_q, CHROMA_PAD,
                                      out14=True))

    pred_y = _bi_combine(preds14[0], preds14[1])
    pred_u = _bi_combine(pu14[0], pu14[1])
    pred_v = _bi_combine(pv14[0], pv14[1])

    outs = _inter_frame_tail(y, u, v, pred_y, pred_u, pred_v, qp,
                             qp_c, tu_split=tu_split)
    is_intra = outs["is_intra"]
    outs["mv"] = jnp.where(is_intra[..., None], 0, mvs[0])
    outs["mv1"] = jnp.where(is_intra[..., None], 0, mvs[1])
    return outs


def _inter_frame_tail(y, u, v, pred_y, pred_u, pred_v, qp, qp_c,
                      tu_split: bool = False):
    """Shared P/B tail: inter residuals + FULLY PARALLEL per-CTB
    intra fallback.

    Intra fallback is only allowed when the left neighbor codes
    inter (an encoder-side choice — the bitstream stays legal). That
    makes every intra CTB's left reference column equal to the left
    neighbor's INTER reconstruction, which is carry-independent: the
    whole frame's intra candidates, the mode decision, and the
    selection run as one batched computation instead of the previous
    sequential lax.scan over CTB columns (~7 ms/frame at 1080p). The
    alternation rule itself (use[c] = want[c] & ~use[c-1]) collapses
    to run-start parity, computed with one cummax."""
    h, w = y.shape
    nch, ncw = h // CTB, w // CTB
    t16 = jnp.asarray(T16, jnp.int32)
    t8 = jnp.asarray(T8, jnp.int32)

    inter_sad = _satd8_frame(y - pred_y)

    # inter residuals for every CTB
    if tu_split:
        t4 = jnp.asarray(T4, jnp.int32)
        lam = jnp.asarray(SAO_LAMBDA, jnp.int32)[jnp.clip(qp, 0, 69)]
        (split_cols, ilv_y, ilv_u, ilv_v,
         irec_y, irec_u, irec_v) = _code_inter_tus_dev(
            _col_view(y, CTB), _col_view(u, CTB // 2),
            _col_view(v, CTB // 2), _col_view(pred_y, CTB),
            _col_view(pred_u, CTB // 2), _col_view(pred_v, CTB // 2),
            qp, qp_c, lam, t16, t8, t4)
    else:
        split_cols = jnp.zeros((ncw, nch), bool)
        ilv_y, irec_y = _code_tu(_col_view(y, CTB),
                                 _col_view(pred_y, CTB),
                                 qp, t16, 4, intra=False)
        ilv_u, irec_u = _code_tu(_col_view(u, CTB // 2),
                                 _col_view(pred_u, CTB // 2), qp_c, t8,
                                 3, intra=False)
        ilv_v, irec_v = _code_tu(_col_view(v, CTB // 2),
                                 _col_view(pred_v, CTB // 2), qp_c, t8,
                                 3, intra=False)

    r = ncw * nch
    sy = _col_view(y, CTB).reshape(r, CTB, CTB)
    su = _col_view(u, CTB // 2).reshape(r, CTB // 2, CTB // 2)
    sv = _col_view(v, CTB // 2).reshape(r, CTB // 2, CTB // 2)

    # left reference column per CTB = left neighbor's inter recon
    # right column (column 0: the spec's no-neighbor 128 substitution)
    def left_cols(irec, n):
        first = jnp.full((1, nch, n), 128, jnp.int32)
        return jnp.concatenate([first, irec[:-1, :, :, -1]],
                               axis=0).reshape(r, n)

    preds = _intra_preds(left_cols(irec_y, CTB), CTB, luma=True)
    sads = _satd8_blocks(sy[:, None] - preds)          # (R, M)
    midx = jnp.argmin(sads, axis=1)
    intra_sad = jnp.min(sads, axis=1)
    from ceracoder_tpu.codec.h265.rowslice import (
        INTRA_BIAS_DEN,
        INTRA_BIAS_NUM,
    )
    want = (intra_sad * INTRA_BIAS_DEN
            < inter_sad.T.reshape(r) * INTRA_BIAS_NUM).reshape(
                ncw, nch)

    # use[c] = want[c] & ~use[c-1]: within a run of want, alternation
    # starts at the run head => parity of (c - run_start)
    cidx = jnp.arange(ncw, dtype=jnp.int32)[:, None]
    last0 = jax.lax.cummax(jnp.where(want, -1, cidx), axis=0)
    use_cols = want & (((cidx - last0 - 1) & 1) == 0)  # (ncw, nch)
    use = use_cols.reshape(r)

    best = _select_cand(preds, midx)
    alv_y, arec_y = _code_tu(sy, best, qp, t16, 4)
    pu = _intra_preds(left_cols(irec_u, CTB // 2), CTB // 2,
                      luma=False)
    pv = _intra_preds(left_cols(irec_v, CTB // 2), CTB // 2,
                      luma=False)
    pu = _select_cand(pu, midx)
    pv = _select_cand(pv, midx)
    alv_u, arec_u = _code_tu(su, pu, qp_c, t8, 3)
    alv_v, arec_v = _code_tu(sv, pv, qp_c, t8, 3)

    m = use[:, None, None]

    def sel(a, b):
        return jnp.where(m, a, b.reshape(a.shape)).reshape(
            ncw, nch, *a.shape[1:])

    lv_y = sel(alv_y, ilv_y)
    lv_u = sel(alv_u, ilv_u)
    lv_v = sel(alv_v, ilv_v)
    rec_y = sel(arec_y, irec_y)
    rec_u = sel(arec_u, irec_u)
    rec_v = sel(arec_v, irec_v)
    mode = _MODES[midx].reshape(ncw, nch)

    is_intra = use_cols.T
    return {
        "is_intra": is_intra,
        "mode": jnp.where(is_intra, mode.T, 0),
        "tu_split": split_cols.T & ~is_intra,
        "luma_lv": lv_y.swapaxes(0, 1),
        "cb_lv": lv_u.swapaxes(0, 1),
        "cr_lv": lv_v.swapaxes(0, 1),
        "recon": (_from_cols(rec_y).astype(jnp.uint8),
                  _from_cols(rec_u).astype(jnp.uint8),
                  _from_cols(rec_v).astype(jnp.uint8)),
    }


encode_frame_i_rows = jax.jit(_i_frame_core)
encode_frame_p_rows = jax.jit(_p_frame_core,
                              static_argnames=("tu_split",))
encode_frame_b_rows = jax.jit(_b_frame_core,
                              static_argnames=("tu_split",))


# ---------------------------------------------------------------------------
# fused multi-frame run dispatch
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("cap", "any_idr", "deblock", "sao",
                          "tu_split", "source_fn", "idr_only"))
def encode_run_rows(ys, us, vs, idr_flags, qps, qpcs,
                    ref_y, ref_u, ref_v, frame_idx,
                    cap: int, any_idr: bool, deblock: bool,
                    sao: bool = False, tu_split: bool = False,
                    source_fn=None, idr_only: bool = False):
    """Encode a run of frames in ONE compiled dispatch (the HEVC
    analog of codec/h264/device_entropy.encode_run_packed).

    A lax.scan over frames carries the (deblocked) reference, so the
    per-launch host round trip is paid once per run. Per frame the
    quantized levels are sparse-compacted on device (_compact_levels)
    — device->host traffic scales with coded content, not frame area.
    ys/us/vs: (N, H, W)/... stacked planes, or dummies when source_fn
    generates frames on device from frame_idx. Returns per-frame
    stacked arrays + deblocked recons (recons[f] is frame f's
    decoder-output picture; also the reference of frame f+1).
    """

    def one_frame(ref, y, u, v, idr, qp, qp_c):
        if idr_only:
            outs = _i_frame_core(y, u, v, qp, qp_c)
        elif any_idr:
            outs = jax.lax.cond(
                idr,
                lambda r: _i_frame_core(y, u, v, qp, qp_c),
                lambda r: _p_frame_core(y, u, v, *r, qp, qp_c,
                                        tu_split=tu_split),
                ref)
        else:
            outs = _p_frame_core(y, u, v, *ref, qp, qp_c,
                                 tu_split=tu_split)
        if deblock:
            cbf = outs["luma_lv"].reshape(
                *outs["luma_lv"].shape[:2], -1).any(-1)
            rec = deblock_frame_dev(*outs["recon"], outs["is_intra"],
                                    cbf, outs["mv"], qp,
                                    tu_split=outs["tu_split"],
                                    luma_lv=outs["luma_lv"])
        else:
            rec = outs["recon"]
        # narrow transfer dtypes: modes are <= 34 and qpel MV
        # components <= 4*MV_FULL_MAX + 3 = 35 (int8); per-TU counts
        # <= 256 (uint16). The host upcasts after np.asarray.
        out = {"is_intra": outs["is_intra"],
               "mode": outs["mode"].astype(jnp.int8),
               "mv": outs["mv"].astype(jnp.int8),
               "tu_split": outs["tu_split"]}
        if sao:
            sp = sao_estimate_dev((y, u, v), rec, qp)
            rec = sao_apply_dev(rec, sp)
            out["sao"] = sp
        pos, val, counts, nnz = _compact_levels(
            outs["luma_lv"], outs["cb_lv"], outs["cr_lv"], cap)
        out.update(pos=pos, val=val, counts=counts.astype(jnp.uint16),
                   nnz=nnz, recon=rec)
        return rec, out

    def step(ref, xs):
        y, u, v, idr, qp, qp_c, fi = xs
        if source_fn is not None:
            y, u, v = source_fn(fi)
        return one_frame(ref, y, u, v, idr, qp, qp_c)

    init = (ref_y, ref_u, ref_v)
    _, outs = jax.lax.scan(
        step, init, (ys, us, vs, idr_flags, qps, qpcs, frame_idx))
    return _pack_run_streams(outs, idr_flags.shape[0])


_i_core_jit = jax.jit(_i_frame_core)


def encode_idr_rows(y, u, v, qp, qp_c, cap: int,
                    deblock: bool, sao: bool = False,
                    chunk: int | None = None):
    """One IDR frame as TWO dedicated dispatches (intra core, then
    deblock/compact/pack tail), packed in the run-transfer layout
    (frame axis of length 1).

    The run scheduler (codec/h265/device.py) splits mixed runs at IDR
    boundaries and sends IDR frames here. On the axon backend ANY
    single program that contains _i_frame_core's column scan plus the
    downstream tail compiles pathologically at 4K (~15-20 min compile
    and 25-45 s per IDR even warm, whether the frames are wrapped in a
    lax.scan, guarded by lax.cond, or separated by an
    optimization_barrier), while the same ops in two programs compile
    in seconds and run in ~40 ms + a P-tail-sized epilogue."""
    outs = _i_core_jit(y, u, v, qp, qp_c)
    return _idr_tail(outs, y, u, v, qp, cap=cap, deblock=deblock,
                     sao=sao, chunk=chunk)


@partial(jax.jit, static_argnames=("cap", "deblock", "sao", "chunk"))
def _idr_tail(outs, y, u, v, qp, cap: int, deblock: bool,
              sao: bool, chunk: int | None):
    if deblock:
        cbf = outs["luma_lv"].reshape(
            *outs["luma_lv"].shape[:2], -1).any(-1)
        rec = deblock_frame_dev(*outs["recon"], outs["is_intra"],
                                cbf, outs["mv"], qp,
                                tu_split=outs["tu_split"],
                                luma_lv=outs["luma_lv"])
    else:
        rec = outs["recon"]
    out = {"is_intra": outs["is_intra"],
           "mode": outs["mode"].astype(jnp.int8),
           "mv": outs["mv"].astype(jnp.int8),
           "tu_split": outs["tu_split"]}
    if sao:
        sp = sao_estimate_dev((y, u, v), rec, qp)
        rec = sao_apply_dev(rec, sp)
        out["sao"] = sp
    pos, val, counts, nnz = _compact_levels(
        outs["luma_lv"], outs["cb_lv"], outs["cr_lv"], cap)
    # dense twin of the sparse stream: stays on device unless fetched —
    # the worst-case intra frame (dense noise) overflows any sparse
    # cap, and pulling these three arrays (~2 B/slot) beats redoing
    # the whole frame on the host path by ~30 s
    out["dense_lv"] = (outs["luma_lv"].astype(jnp.int16),
                       outs["cb_lv"].astype(jnp.int16),
                       outs["cr_lv"].astype(jnp.int16))
    out.update(pos=pos, val=val, counts=counts.astype(jnp.uint16),
               nnz=nnz, recon=rec)
    outs1 = jax.tree_util.tree_map(lambda a: a[None], out)
    return _pack_run_streams(outs1, 1, chunk=chunk)


LEVEL_CHUNK = 6144       # sparse-level entries in chunk 0 / extra chunks


def run_pack_layout(n_ctb: int, with_mv1: bool = False,
                    chunk: int = None) -> dict:
    """Byte offsets of each section in one frame's row of the packed
    run-transfer buffer (_pack_run_streams). Sections are padded to
    4-byte boundaries so host numpy views land aligned."""
    def pad4(x):
        return -(-x // 4) * 4

    off = {"nnz": 0}
    o = 4
    off["meta"] = o
    o += pad4(n_ctb)
    off["counts"] = o
    o += pad4(2 * n_ctb)
    off["mv"] = o
    o += pad4(2 * n_ctb)
    if with_mv1:
        off["mv1"] = o
        o += pad4(2 * n_ctb)
    off["lv0"] = o
    o += 4 * (chunk if chunk is not None else LEVEL_CHUNK)
    off["total"] = o
    return off


def _pack_run_streams(d, n, with_mv1: bool = False,
                      chunk: int | None = None):
    """Fuse the per-run transfer set into ONE uint8 buffer per frame.

    The axon device tunnel charges ~25 ms fixed latency per transfer
    regardless of size, so six small per-run arrays cost ~150 ms while
    one packed buffer costs ~30 ms. Layout per frame row (offsets from
    run_pack_layout): nnz int32 | meta uint8 (bit7 is_intra, bit6
    tu_split, low bits intra mode) | per-CTB nonzero level counts
    uint16 | mv int8 pairs | [mv1 int8 pairs] | level chunk 0 as
    interleaved (pos, val) int16. Per-TU counts are NOT transferred:
    the level stream is slot-ordered within each CTB, so per-CTB
    totals + the pos values reconstruct the dense layout on the host
    (codec/h265/rowslice.densify_levels). Level entries beyond
    LEVEL_CHUNK stay in separate (n, LEVEL_CHUNK, 2) int16 chunks,
    transferred only for frames that overflow chunk 0."""
    nch, ncw = d["is_intra"].shape[1:3]
    n_ctb = nch * ncw
    if chunk is None:
        chunk = LEVEL_CHUNK

    def u8(a):
        return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(n, -1)

    def pad4(a):
        return jnp.pad(a, ((0, 0), (0, (-a.shape[1]) % 4)))

    meta = ((d.pop("is_intra").astype(jnp.uint8) << 7)
            | (d.pop("tu_split").astype(jnp.uint8) << 6)
            | d.pop("mode").astype(jnp.uint8))
    counts = d.pop("counts").reshape(n, n_ctb, -1).sum(-1)
    parts = [u8(d["nnz"].astype(jnp.int32).reshape(n, 1)),
             pad4(meta.reshape(n, n_ctb)),
             pad4(u8(counts.astype(jnp.uint16))),
             pad4(u8(d.pop("mv").reshape(n, -1)))]
    if with_mv1:
        parts.append(pad4(u8(d.pop("mv1").reshape(n, -1))))
    pos = d.pop("pos").reshape(n, -1)
    val = d.pop("val").reshape(n, -1)
    parts.append(u8(jnp.stack([pos[:, :chunk],
                               val[:, :chunk]], axis=-1)))
    d["packed"] = jnp.concatenate(parts, axis=1)
    d["lv_chunks"] = tuple(
        jnp.stack([pos[:, s:s + chunk],
                   val[:, s:s + chunk]], axis=-1)
        for s in range(chunk, pos.shape[1], chunk))
    return d


@partial(jax.jit,
         static_argnames=("cap", "deblock", "sao", "tu_split",
                          "source_fn"))
def encode_run_pairs(ybs, ubs, vbs, yps, ups, vps,
                     qps_b, qpcs_b, qps_p, qpcs_p,
                     ref_y, ref_u, ref_v, fidx_b, fidx_p,
                     cap: int, deblock: bool, sao: bool = False,
                     tu_split: bool = False, source_fn=None):
    """Encode an IBPBP segment's (B, P) display pairs in ONE dispatch.

    Pair i covers display frames (2i, 2i+1) after the segment's
    reference: the P frame (display 2i+1) codes first against the
    carried reference at delta 2, then the B frame (display 2i)
    bi-predicts between the old and new references. The scan carries
    the deblocked P recon. Outputs stacked per pair: "p" and "b"
    sub-dicts with the same fields as encode_run_rows (B adds mv1).
    """

    def one(ref, yb, ub, vb, yp, up, vp, qpb, qpcb, qpp, qpcp):
        outs_p = _p_frame_core(yp, up, vp, *ref, qpp, qpcp,
                               tu_split=tu_split)
        cbf_p = outs_p["luma_lv"].reshape(
            *outs_p["luma_lv"].shape[:2], -1).any(-1)
        rec_p = deblock_frame_dev(*outs_p["recon"], outs_p["is_intra"],
                                  cbf_p, outs_p["mv"], qpp,
                                  tu_split=outs_p["tu_split"],
                                  luma_lv=outs_p["luma_lv"]) \
            if deblock else outs_p["recon"]
        sao_p = None
        if sao:
            sao_p = sao_estimate_dev((yp, up, vp), rec_p, qpp)
            rec_p = sao_apply_dev(rec_p, sao_p)
        outs_b = _b_frame_core(yb, ub, vb, *ref, *rec_p, qpb, qpcb,
                               tu_split=tu_split)
        cbf_b = outs_b["luma_lv"].reshape(
            *outs_b["luma_lv"].shape[:2], -1).any(-1)
        rec_b = deblock_frame_dev(*outs_b["recon"], outs_b["is_intra"],
                                  cbf_b, outs_b["mv"], qpb,
                                  outs_b["mv1"],
                                  tu_split=outs_b["tu_split"],
                                  luma_lv=outs_b["luma_lv"]) \
            if deblock else outs_b["recon"]
        sao_b = None
        if sao:
            sao_b = sao_estimate_dev((yb, ub, vb), rec_b, qpb)
            rec_b = sao_apply_dev(rec_b, sao_b)

        def pack(o, rec, sp, extra_mv1=None):
            pos, val, counts, nnz = _compact_levels(
                o["luma_lv"], o["cb_lv"], o["cr_lv"], cap)
            # narrow transfer dtypes (see encode_run_rows.one_frame)
            d = {"is_intra": o["is_intra"],
                 "mode": o["mode"].astype(jnp.int8),
                 "mv": o["mv"].astype(jnp.int8),
                 "tu_split": o["tu_split"],
                 "pos": pos, "val": val,
                 "counts": counts.astype(jnp.uint16), "nnz": nnz,
                 "recon": rec}
            if sp is not None:
                d["sao"] = sp
            if extra_mv1 is not None:
                d["mv1"] = extra_mv1.astype(jnp.int8)
            return d

        out = {"p": pack(outs_p, rec_p, sao_p),
               "b": pack(outs_b, rec_b, sao_b, outs_b["mv1"])}
        return rec_p, out

    def step(ref, xs):
        yb, ub, vb, yp, up, vp, qpb, qpcb, qpp, qpcp, fib, fip = xs
        if source_fn is not None:
            yb, ub, vb = source_fn(fib)
            yp, up, vp = source_fn(fip)
        return one(ref, yb, ub, vb, yp, up, vp, qpb, qpcb, qpp, qpcp)

    _, outs = jax.lax.scan(
        step, (ref_y, ref_u, ref_v),
        (ybs, ubs, vbs, yps, ups, vps, qps_b, qpcs_b, qps_p, qpcs_p,
         fidx_b, fidx_p))
    # pack the transfer set like encode_run_rows (B rows add mv1)
    n = qps_b.shape[0]
    for key in ("p", "b"):
        outs[key] = _pack_run_streams(outs[key], n,
                                      with_mv1=(key == "b"))
    return outs


# ---------------------------------------------------------------------------
# SAO (spec 8.7.3; device twin of codec/h265/sao.py)
# ---------------------------------------------------------------------------

_EO_NEIGHBORS = ((0, -1, 0, 1), (-1, 0, 1, 0),
                 (-1, -1, 1, 1), (-1, 1, 1, -1))


def _eo_category_dev(p, n0, n1):
    a = jnp.sign(p - n0) + jnp.sign(p - n1)
    return jnp.select([a == -2, a == -1, a == 1, a == 2],
                      [1, 2, 3, 4], 0)


def _offset_gain_dev(sums, cnts, force_sign=0):
    cnts = jnp.maximum(cnts, 1)
    raw = (2 * jnp.abs(sums) + cnts) // (2 * cnts)
    off = jnp.minimum(raw, 7) * jnp.sign(sums)
    if force_sign > 0:
        off = jnp.maximum(off, 0)
    elif force_sign < 0:
        off = jnp.minimum(off, 0)
    gain = 2 * off * sums - cnts * off * off
    off = jnp.where(gain > 0, off, 0)
    gain = jnp.where(gain > 0, gain, 0)
    return off.astype(jnp.int32), gain


def _ctb_view_n(plane, n):
    h, w = plane.shape
    return plane.reshape(h // n, n, w // n, n).swapaxes(1, 2)


def _sao_plane_stats(src, rec, n):
    """Per-CTB edge-class and band stats for one plane (device twin of
    sao._full_stats). Returns dict of eo_off (4,nch,ncw,4), eo_gain
    (4,nch,ncw), bo_off (nch,ncw,32), bo_win (nch,ncw,29)."""
    diff = src.astype(jnp.int32) - rec.astype(jnp.int32)
    h, w = rec.shape
    dv = _ctb_view_n(diff, n)
    r = rec.astype(jnp.int32)
    iy = jnp.arange(h) % n
    ix = jnp.arange(w) % n
    interior = (((iy > 0) & (iy < n - 1))[:, None]
                & ((ix > 0) & (ix < n - 1))[None, :])

    eo_offs, eo_gains = [], []
    for dy0, dx0, dy1, dx1 in _EO_NEIGHBORS:
        n0 = jnp.roll(r, (-dy0, -dx0), (0, 1))
        n1 = jnp.roll(r, (-dy1, -dx1), (0, 1))
        cat = jnp.where(interior, _eo_category_dev(r, n0, n1), 0)
        catv = _ctb_view_n(cat, n)
        offs, gain = [], 0
        for k in (1, 2, 3, 4):
            m = catv == k
            cnts = m.sum((2, 3))
            sums = jnp.where(m, dv, 0).sum((2, 3))
            o, g = _offset_gain_dev(sums, cnts,
                                    force_sign=1 if k <= 2 else -1)
            offs.append(o)
            gain = gain + g
        eo_offs.append(jnp.stack(offs, -1))
        eo_gains.append(gain)

    band = _ctb_view_n(r >> 3, n)
    bo_sums, bo_cnts = [], []
    for b in range(32):
        m = band == b
        bo_cnts.append(m.sum((2, 3)))
        bo_sums.append(jnp.where(m, dv, 0).sum((2, 3)))
    ob, gb = _offset_gain_dev(jnp.stack(bo_sums, -1),
                              jnp.stack(bo_cnts, -1))
    win = jnp.stack([gb[..., s:s + 4].sum(-1) for s in range(29)], -1)
    return {"eo_off": jnp.stack(eo_offs), "eo_gain": jnp.stack(eo_gains),
            "bo_off": ob, "bo_win": win}


def _sao_pick(stats_list, band_only: bool = False):
    """Choose (type, cls, offsets per plane) maximizing the summed
    gain over the given planes' stats (1 for luma, 2 for chroma)."""
    nch, ncw = stats_list[0]["eo_gain"].shape[1:]
    best_gain = jnp.zeros((nch, ncw), jnp.int32)
    bt = jnp.zeros((nch, ncw), jnp.int32)
    bc = jnp.zeros((nch, ncw), jnp.int32)
    boffs = [jnp.zeros((nch, ncw, 4), jnp.int32) for _ in stats_list]

    # band candidate
    win = sum(s["bo_win"] for s in stats_list)
    bp = jnp.argmax(win, -1).astype(jnp.int32)
    bgain = jnp.take_along_axis(win, bp[..., None], -1)[..., 0]
    take = bgain > best_gain
    best_gain = jnp.where(take, bgain, best_gain)
    bt = jnp.where(take, 1, bt)
    bc = jnp.where(take, bp, bc)
    for i, s in enumerate(stats_list):
        offs = jnp.stack([
            jnp.take_along_axis(s["bo_off"], bp[..., None] + k,
                                -1)[..., 0]
            for k in range(4)], -1)
        boffs[i] = jnp.where(take[..., None], offs, boffs[i])

    if not band_only:
        for cls in range(4):
            g = sum(s["eo_gain"][cls] for s in stats_list)
            take = g > best_gain
            best_gain = jnp.where(take, g, best_gain)
            bt = jnp.where(take, 2, bt)
            bc = jnp.where(take, cls, bc)
            for i, s in enumerate(stats_list):
                boffs[i] = jnp.where(take[..., None], s["eo_off"][cls],
                                     boffs[i])
    return bt, bc, boffs, best_gain


def sao_estimate_dev(src_planes, rec_planes, qp=32):
    """Device SAO parameter estimation (twin of sao.sao_estimate).
    Returns (nch, ncw, 3, 6) int32 params."""
    from ceracoder_tpu.codec.h265.sao import (
        SAO_BITS_CHROMA, SAO_BITS_LUMA, SAO_LAMBDA)

    y_s, u_s, v_s = (jnp.asarray(p) for p in src_planes)
    y_r, u_r, v_r = (jnp.asarray(p) for p in rec_planes)
    h, w = y_r.shape
    nch, ncw = h // CTB, w // CTB
    lam = jnp.asarray(SAO_LAMBDA, jnp.int32)[jnp.clip(qp, 0, 69)]
    th_l = (lam * SAO_BITS_LUMA) // 16
    th_c = (lam * SAO_BITS_CHROMA) // 16

    sy = _sao_plane_stats(y_s, y_r, CTB)
    ty, cy_, (oy,), gy = _sao_pick([sy])
    keep = gy > th_l
    ty = jnp.where(keep, ty, 0)
    cy_ = jnp.where(keep, cy_, 0)
    oy = jnp.where(keep[..., None], oy, 0)
    su = _sao_plane_stats(u_s, u_r, CTB // 2)
    sv = _sao_plane_stats(v_s, v_r, CTB // 2)
    tc, cc, (ou, ov), gc = _sao_pick([su, sv], band_only=True)
    keep_c = gc > th_c
    tc = jnp.where(keep_c, tc, 0)
    cc = jnp.where(keep_c, cc, 0)
    ou = jnp.where(keep_c[..., None], ou, 0)
    ov = jnp.where(keep_c[..., None], ov, 0)

    params = jnp.zeros((nch, ncw, 3, 6), jnp.int32)
    params = params.at[:, :, 0, 0].set(ty)
    params = params.at[:, :, 0, 1].set(cy_)
    params = params.at[:, :, 0, 2:].set(oy)
    for ci, oc in ((1, ou), (2, ov)):
        params = params.at[:, :, ci, 0].set(tc)
        params = params.at[:, :, ci, 1].set(cc)
        params = params.at[:, :, ci, 2:].set(oc)
    return params


def sao_apply_dev(rec_planes, params):
    """Apply SAO params (twin of sao.sao_apply)."""
    outs = []
    for ci, rec in enumerate(rec_planes):
        n = CTB if ci == 0 else CTB // 2
        r = jnp.asarray(rec).astype(jnp.int32)
        h, w = r.shape
        ptype = params[:, :, ci, 0]
        pcls = params[:, :, ci, 1]
        offs = params[:, :, ci, 2:]
        rep = lambda a: jnp.repeat(jnp.repeat(a, n, 0), n, 1)
        t_full = rep(ptype)
        bp = rep(pcls)
        band = r >> 3
        delta = jnp.zeros_like(r)
        for i in range(4):
            delta = jnp.where((t_full == 1) & (band == bp + i),
                              rep(offs[..., i]), delta)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        for cls, (dy0, dx0, dy1, dx1) in enumerate(_EO_NEIGHBORS):
            n0 = jnp.roll(r, (-dy0, -dx0), (0, 1))
            n1 = jnp.roll(r, (-dy1, -dx1), (0, 1))
            cat = _eo_category_dev(r, n0, n1)
            ok = ((ys + dy0 >= 0) & (ys + dy0 < h)
                  & (ys + dy1 >= 0) & (ys + dy1 < h)
                  & (xs + dx0 >= 0) & (xs + dx0 < w)
                  & (xs + dx1 >= 0) & (xs + dx1 < w))
            sel = (t_full == 2) & rep(pcls == cls) & ok
            for k in (1, 2, 3, 4):
                delta = jnp.where(sel & (cat == k),
                                  rep(offs[..., k - 1]), delta)
        outs.append(jnp.clip(r + delta, 0, 255).astype(jnp.uint8))
    return tuple(outs)


# module-level jitted post-filter entry points: re-wrapping jax.jit
# per call would discard the trace cache and re-trace every frame
deblock_frame_jit = jax.jit(deblock_frame_dev)
sao_estimate_jit = jax.jit(sao_estimate_dev)
sao_apply_jit = jax.jit(sao_apply_dev)
