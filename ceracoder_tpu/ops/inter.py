"""Inter-frame (P) encoding compute path: motion estimation + motion
compensation + residual coding (JAX, jittable).

Replaces the ME/MC stages of the external encoders (SURVEY.md §2.2).
v1 design choices, each spec-conformant:

- P_L0_16x16 partitions, one reference frame (the previous recon).
- Full-pel luma MVs chosen by a two-stage search (coarse on 4x-
  decimated planes, refine at full-pel). Decoders only interpolate for
  fractional MVs, so integer-MV streams skip the 6-tap filter; chroma
  still needs its bilinear (mv/2 can be half-pel) which is implemented
  exactly per spec 8.4.2.2.2.
- All MBs in a P slice are inter — no intra-in-P yet — which removes
  every intra neighbor dependency: the whole frame encodes in parallel
  (no scan), the TPU-friendly property motivating this scheme.
"""

from __future__ import annotations

import functools

from ceracoder_tpu.utils.jaxenv import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from ceracoder_tpu.ops.transform import (
    dequant4,
    fdct4,
    from_blocks4,
    idct4,
    quant4,
    to_blocks4,
    zigzag_scan,
)


def _mb_view(plane, mb=16):
    h, w = plane.shape
    return plane.reshape(h // mb, mb, w // mb, mb).swapaxes(1, 2)


def motion_search_fullpel(cur: jnp.ndarray, ref: jnp.ndarray,
                          coarse_range: int = 4, refine_range: int = 3):
    """Two-stage full-pel 16x16 motion search.

    cur, ref: (H, W) uint8 luma. Returns mv (mbh, mbw, 2) int32 in
    full-pel units (dy, dx) and the best SAD (mbh, mbw) int32.

    Stage 1 scans (2*coarse_range+1)^2 shifts on 4x-decimated planes
    (so +-4 coarse = +-16 full-pel) with a running argmin; stage 2
    refines +-refine_range at full resolution around the coarse winner
    via per-MB dynamic slices.
    """
    h, w = cur.shape
    mbh, mbw = h // 16, w // 16
    cur32 = cur.astype(jnp.int32)
    ref32 = ref.astype(jnp.int32)

    # ---- stage 1: coarse, on a 4x average-pooled pyramid level
    # (averaging, not decimation: decimated noise aliases and the SAD
    # landscape loses its minimum for shifts that are not multiples of 4)
    def pool4(p):
        return p.reshape(p.shape[0] // 4, 4, p.shape[1] // 4, 4) \
                .sum((1, 3)) >> 4
    cur_c = pool4(cur32)
    ref_c = pool4(ref32)
    rc = coarse_range
    ref_c_pad = jnp.pad(ref_c, rc, mode="edge")
    n_sh = 2 * rc + 1

    def coarse_step(carry, idx):
        best_sad, best_mv = carry
        dy = idx // n_sh - rc
        dx = idx % n_sh - rc
        shifted = jax.lax.dynamic_slice(ref_c_pad, (dy + rc, dx + rc),
                                        cur_c.shape)
        diff = jnp.abs(cur_c - shifted)
        sad = _mb_view(diff, 4).sum((-1, -2))          # (mbh, mbw)
        better = sad < best_sad
        best_mv = jnp.where(better[..., None],
                            jnp.stack([jnp.full_like(sad, dy),
                                       jnp.full_like(sad, dx)], -1),
                            best_mv)
        return (jnp.minimum(best_sad, sad), best_mv), None

    init = (jnp.full((mbh, mbw), 1 << 30, jnp.int32),
            jnp.zeros((mbh, mbw, 2), jnp.int32))
    (csad, cmv), _ = jax.lax.scan(coarse_step, init,
                                  jnp.arange(n_sh * n_sh))
    cmv = cmv * 4                                      # to full-pel units

    # ---- stage 2: refine at full-pel around the coarse winner
    rr = refine_range
    pad = 4 * rc + rr + 16                             # worst-case reach
    ref_pad = jnp.pad(ref32, pad, mode="edge")
    curmb = _mb_view(cur32)                            # (mbh, mbw, 16, 16)

    by = jnp.arange(mbh)[:, None] * 16
    bx = jnp.arange(mbw)[None, :] * 16

    def refine_mb(c, base_y, base_x, mv0):
        # window around mv0: (16 + 2rr)^2
        win = jax.lax.dynamic_slice(
            ref_pad,
            (base_y + mv0[0] - rr + pad, base_x + mv0[1] - rr + pad),
            (16 + 2 * rr, 16 + 2 * rr))

        def sad_at(idx):
            dy = idx // (2 * rr + 1)
            dx = idx % (2 * rr + 1)
            cand = jax.lax.dynamic_slice(win, (dy, dx), (16, 16))
            return jnp.abs(c - cand).sum()

        sads = jax.vmap(sad_at)(jnp.arange((2 * rr + 1) ** 2))
        k = jnp.argmin(sads)
        off = jnp.stack([k // (2 * rr + 1) - rr, k % (2 * rr + 1) - rr])
        return mv0 + off, sads[k]

    refine = jax.vmap(jax.vmap(refine_mb))
    mv, sad = refine(curmb, jnp.broadcast_to(by, (mbh, mbw)),
                     jnp.broadcast_to(bx, (mbh, mbw)), cmv)
    return mv.astype(jnp.int32), sad.astype(jnp.int32)


_PAD = 64  # edge padding for unrestricted MVs (spec clips refs to edge)


def half_pel_planes(ref: jnp.ndarray):
    """Spec 8.4.2.2.1 6-tap half-sample interpolation.

    ref: (H, W) int/uint. Returns four (H+2*_PAD, W+2*_PAD) int32
    planes: integer, half-horizontal (b), half-vertical (h), and
    half-diagonal (j, filtered from unrounded horizontal intermediates).
    Index [y, x] of each plane is the sample at full-pel (y, x) plus
    (0,0) / (0,+1/2) / (+1/2,0) / (+1/2,+1/2).
    """
    p = jnp.pad(ref.astype(jnp.int32), _PAD + 3, mode="edge")

    def tap6(a):  # along last axis; out[k] filters a[k..k+5]
        return (a[..., 0:-5] - 5 * a[..., 1:-4] + 20 * a[..., 2:-3]
                + 20 * a[..., 3:-2] - 5 * a[..., 4:-1] + a[..., 5:])

    # p[y + _PAD + 3, x + _PAD + 3] == ref[y, x] (edge-clamped); the
    # half-sample right of x filters ref[x-2..x+3] = tap6 col x+_PAD+1,
    # so drop the first output column to align plane[.., _PAD+x].
    bx = tap6(p)                                  # (H+2P+6, W+2P+1)
    b_plane = jnp.clip((bx[3:-3, 1:] + 16) >> 5, 0, 255)

    hy = tap6(p.T).T                              # (H+2P+1, W+2P+6)
    h_plane = jnp.clip((hy[1:, 3:-3] + 16) >> 5, 0, 255)

    # j: vertical 6-tap over the unrounded horizontal intermediates
    jxy = tap6(bx[:, 1:].T).T                     # (H+2P+1, W+2P)
    j_plane = jnp.clip((jxy[1:, :] + 512) >> 10, 0, 255)

    i_plane = p[3:-3, 3:-3]
    return i_plane, b_plane, h_plane, j_plane


def mc_luma_qpel(planes, mv: jnp.ndarray):
    """Luma MC for quarter-pel MVs restricted to half-pel positions
    (mv quarter-pel components must be even).

    planes: output of half_pel_planes; mv: (mbh, mbw, 2) quarter-pel.
    Returns (mbh, mbw, 16, 16) int32 predictions.
    """
    i_p, b_p, h_p, j_p = planes
    hp = i_p.shape[0] - 2 * _PAD
    wp = i_p.shape[1] - 2 * _PAD
    mbh, mbw = hp // 16, wp // 16
    stacked = jnp.stack([i_p, b_p, h_p, j_p])    # (4, H+2P, W+2P)
    by = jnp.broadcast_to(jnp.arange(mbh)[:, None] * 16, (mbh, mbw))
    bx = jnp.broadcast_to(jnp.arange(mbw)[None, :] * 16, (mbh, mbw))

    def one(base_y, base_x, m):
        iy = base_y + (m[0] >> 2) + _PAD
        ix = base_x + (m[1] >> 2) + _PAD
        fy = (m[0] >> 1) & 1
        fx = (m[1] >> 1) & 1
        sel = fy * 2 + fx
        return jax.lax.dynamic_slice(stacked, (sel, iy, ix), (1, 16, 16))[0]

    return jax.vmap(jax.vmap(one))(by, bx, mv)


def halfpel_refine(cur_mb, planes, mv_full):
    """Refine full-pel MVs over the 8 half-pel neighbors by SAD.

    cur_mb: (mbh, mbw, 16, 16) int32; mv_full: (mbh, mbw, 2) full-pel.
    Returns quarter-pel mv (mbh, mbw, 2) with even components.
    """
    mbh, mbw = mv_full.shape[:2]
    mv_q = mv_full * 4
    cands = jnp.array([[0, 0], [0, 2], [0, -2], [2, 0], [-2, 0],
                       [2, 2], [2, -2], [-2, 2], [-2, -2]], jnp.int32)
    stacked = jnp.stack(planes)
    by = jnp.broadcast_to(jnp.arange(mbh)[:, None] * 16, (mbh, mbw))
    bx = jnp.broadcast_to(jnp.arange(mbw)[None, :] * 16, (mbh, mbw))

    def one(c, base_y, base_x, m):
        def sad_at(off):
            mm = m + off
            iy = base_y + (mm[0] >> 2) + _PAD
            ix = base_x + (mm[1] >> 2) + _PAD
            sel = ((mm[0] >> 1) & 1) * 2 + ((mm[1] >> 1) & 1)
            pred = jax.lax.dynamic_slice(stacked, (sel, iy, ix),
                                         (1, 16, 16))[0]
            return jnp.abs(c - pred).sum()
        sads = jax.vmap(sad_at)(cands)
        return m + cands[jnp.argmin(sads)]

    return jax.vmap(jax.vmap(one))(cur_mb, by, bx, mv_q)


def mc_chroma(ref_c: jnp.ndarray, mv_q: jnp.ndarray):
    """Chroma MC with eighth-pel bilinear (spec 8.4.2.2.2).

    ref_c: (H/2, W/2); mv_q: (mbh, mbw, 2) in QUARTER-pel luma units,
    which for 4:2:0 are eighth-pel chroma units directly:
    integer chroma offset = mv >> 3, fraction = mv & 7.
    Returns (mbh, mbw, 8, 8) int32 predictions.
    """
    hc, wc = ref_c.shape
    mbh, mbw = hc // 8, wc // 8
    pad = _PAD
    ref_pad = jnp.pad(ref_c.astype(jnp.int32), pad, mode="edge")
    by = jnp.broadcast_to(jnp.arange(mbh)[:, None] * 8, (mbh, mbw))
    bx = jnp.broadcast_to(jnp.arange(mbw)[None, :] * 8, (mbh, mbw))

    def one(base_y, base_x, m):
        cy = base_y + (m[0] >> 3) + pad          # integer chroma offset
        cx = base_x + (m[1] >> 3) + pad
        yf = m[0] & 7                            # eighth-pel fractions
        xf = m[1] & 7
        block = jax.lax.dynamic_slice(ref_pad, (cy, cx), (9, 9))
        a = block[:8, :8]
        b = block[:8, 1:9]
        c = block[1:9, :8]
        d = block[1:9, 1:9]
        return ((8 - xf) * (8 - yf) * a + xf * (8 - yf) * b
                + (8 - xf) * yf * c + xf * yf * d + 32) >> 6

    return jax.vmap(jax.vmap(one))(by, bx, mv_q)


@functools.partial(jax.jit, static_argnames=("qp", "qp_c"))
def encode_frame_p(y, u, v, ref_y, ref_u, ref_v, qp: int, qp_c: int):
    """Encode a P frame (all P_L0_16x16, full-pel MVs, prev-frame ref).

    Returns per-MB arrays: mv (mbh,mbw,2), luma levels (mbh,mbw,4,4,16)
    (full 16-coeff blocks, zigzag), chroma DC/AC, recon planes.
    """
    h, w = y.shape
    mbh, mbw = h // 16, w // 16

    mv_full, sad = motion_search_fullpel(y, ref_y)
    cur_y = _mb_view(y.astype(jnp.int32))
    planes = half_pel_planes(ref_y)
    mv = halfpel_refine(cur_y, planes, mv_full)         # quarter-pel
    pred_y = mc_luma_qpel(planes, mv)                   # (mbh,mbw,16,16)
    res_y = cur_y - pred_y
    blocks = to_blocks4(res_y)                          # (mbh,mbw,4,4,4,4)
    wcoef = fdct4(blocks)
    z = quant4(wcoef, qp, intra=False)
    d = dequant4(z, qp)
    recon_y = jnp.clip(pred_y + from_blocks4(idct4(d)), 0, 255)
    luma_levels = zigzag_scan(z)                        # (mbh,mbw,4,4,16)

    from ceracoder_tpu.ops.transform import (
        dequant_dc2, hadamard2_fwd, quant_dc2)

    def chroma_comp(plane, ref_plane):
        pred = mc_chroma(ref_plane, mv)                 # (mbh,mbw,8,8)
        cur = _mb_view(plane.astype(jnp.int32), 8)
        res = cur - pred
        wc = fdct4(to_blocks4(res))                     # (mbh,mbw,2,2,4,4)
        zdc = quant_dc2(hadamard2_fwd(wc[..., 0, 0]), qp_c, intra=False)
        zac = quant4(wc, qp_c, intra=False).at[..., 0, 0].set(0)
        dd = dequant4(zac, qp_c).at[..., 0, 0].set(dequant_dc2(zdc, qp_c))
        rec = jnp.clip(pred + from_blocks4(idct4(dd)), 0, 255)
        return (zdc.reshape(*zdc.shape[:-2], 4),
                zigzag_scan(zac)[..., 1:], rec)

    dc_u, ac_u, rec_u = chroma_comp(u, ref_u)
    dc_v, ac_v, rec_v = chroma_comp(v, ref_v)

    def unmb(x, mb):
        return x.swapaxes(1, 2).reshape(mbh * mb, mbw * mb)

    return dict(
        mv=mv,
        sad=sad,
        luma_levels=luma_levels.astype(jnp.int16),
        dc_chroma=jnp.stack([dc_u, dc_v], axis=2).astype(jnp.int16),
        ac_chroma=jnp.stack([ac_u, ac_v], axis=2).astype(jnp.int16),
        recon=(unmb(recon_y, 16).astype(jnp.uint8),
               unmb(rec_u, 8).astype(jnp.uint8),
               unmb(rec_v, 8).astype(jnp.uint8)),
    )
