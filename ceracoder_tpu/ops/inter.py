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
- The base schedule keeps every MB inter, which removes every intra
  neighbor dependency: the whole frame encodes in parallel (no scan),
  the TPU-friendly property motivating this scheme.
- `intra_in_p=True` adds Intra_16x16 fallback MBs (uncovered content /
  partial scene change — the cheap big RD lever toward x264, whose
  default always considers intra in P): a source-pixel cost estimate
  picks the intra MBs up front (branch-free), then a column scan —
  entered only when the frame has any (lax.cond) — recodes them
  against the true decoded left columns, exactly the structure the
  HEVC P core uses for its intra-fallback CUs (ops/h265.py
  _inter_frame_tail).
"""

from __future__ import annotations

import functools

from ceracoder_tpu.utils.jaxenv import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

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


def tile_apron(plane, mb: int, margin: int):
    """(H, W) -> (nbh, T, nbw, T), T = mb + 2*margin: tile (i, j)
    covers plane[i*mb-margin : (i+1)*mb+margin] (edge-clamped), built
    from 2T strided slices — no gathers."""
    h, w = plane.shape
    nbh, nbw = h // mb, w // mb
    t = mb + 2 * margin
    p = jnp.pad(plane, margin, mode="edge")
    rows = jnp.stack([p[a:a + mb * (nbh - 1) + 1:mb, :]
                      for a in range(t)], axis=1)       # (nbh, T, w+2m)
    return jnp.stack([rows[:, :, b:b + mb * (nbw - 1) + 1:mb]
                      for b in range(t)], axis=-1)      # (nbh, T, nbw, T)


COARSE_RANGE = 4          # +-4 on the 4x pyramid = +-16 full-pel
REFINE_RANGE = 3          # full-pel refine around the coarse winner


def coarse_mv(cur32, ref32, rc: int = COARSE_RANGE):
    """Coarse stage of the motion search: argmin over all (2rc+1)^2
    shifts of 4x average-pooled planes. Returns (mbh, mbw, 2) full-pel
    MVs that are multiples of 4 in [-4rc, 4rc].

    All shifts are evaluated in one dense batch (static slices stacked
    on a leading axis): a lax.scan over shifts serializes (2rc+1)^2
    small latency-bound kernels on device, while the batched form is
    one well-utilized elementwise+reduce."""
    h, w = cur32.shape
    mbh, mbw = h // 16, w // 16

    def pool4(p):
        return p.reshape(p.shape[0] // 4, 4, p.shape[1] // 4, 4) \
                .sum((1, 3)) >> 4
    cur_c = pool4(cur32)
    hc, wc = cur_c.shape
    ref_c_pad = jnp.pad(pool4(ref32), rc, mode="edge")
    n_sh = 2 * rc + 1

    shifted = jnp.stack(
        [ref_c_pad[dy:dy + hc, dx:dx + wc]
         for dy in range(n_sh) for dx in range(n_sh)])      # (S, hc, wc)
    diff = jnp.abs(cur_c[None] - shifted)
    sad = diff.reshape(n_sh * n_sh, mbh, 4, mbw, 4).sum((2, 4))
    k = jnp.argmin(sad, axis=0)                             # (mbh, mbw)
    cmv = jnp.stack([k // n_sh - rc, k % n_sh - rc], axis=-1)
    return cmv * 4


def _tap6_last(a):
    """Unrounded 6-tap along the last axis; out[k] filters a[k..k+5]."""
    return (a[..., 0:-5] - 5 * a[..., 1:-4] + 20 * a[..., 2:-3]
            + 20 * a[..., 3:-2] - 5 * a[..., 4:-1] + a[..., 5:])


def _me_mc_luma(y32, ref32):
    """Dense motion search + half-pel refine + luma MC.

    All data-dependent addressing is expressed as dense select-warps
    over small candidate sets (81 coarse MVs, 49 refine offsets, 9
    half-pel offsets) — per-MB dynamic_slice/gather formulations cost
    ~200 ms/frame on this TPU (9 ns per gathered element); this runs in
    a few ms. Returns (mv_q, pred (mbh,mbw,16,16), sad).
    """
    h, w = y32.shape
    mbh, mbw = h // 16, w // 16
    rr = REFINE_RANGE
    reach = 4 * COARSE_RANGE
    marg = reach + rr + 4                  # + 6-tap/half-pel margin
    # the warp/SAD pipeline is memory-bound; pixels, diffs, and 6-tap
    # half-pel intermediates all fit int16, halving HBM traffic
    apron = tile_apron(ref32.astype(jnp.int16), 16, marg)

    cmv = coarse_mv(y32, ref32)            # multiples of 4

    # warp 1: per-MB windows at the coarse MV. The (dy, dx) select is
    # SEPARABLE: select rows by the 9 dy candidates, then columns by
    # the 9 dx candidates — 18 masked passes instead of 81, and the
    # intermediate is read 9x less (the warp is memory-bound).
    w1 = 16 + 2 * (rr + 4)
    o1 = marg - (rr + 4)
    rows = jnp.zeros((mbh, w1, mbw, apron.shape[3]), jnp.int16)
    for dy in range(-reach, reach + 1, 4):
        m = cmv[..., 0] == dy
        rows = rows + jnp.where(m[:, None, :, None],
                                apron[:, o1 + dy:o1 + dy + w1, :, :], 0)
    warped = jnp.zeros((mbh, w1, mbw, w1), jnp.int16)
    for dx in range(-reach, reach + 1, 4):
        m = cmv[..., 1] == dx
        warped = warped + jnp.where(m[:, None, :, None],
                                    rows[:, :, :, o1 + dx:o1 + dx + w1], 0)

    # full-pel refine: 49 static-slice SAD maps over the warped windows
    cur_l = y32.reshape(mbh, 16, mbw, 16).astype(jnp.int16)
    b1 = rr + 4
    offs = [(dy, dx) for dy in range(-rr, rr + 1)
            for dx in range(-rr, rr + 1)]
    sads = jnp.stack([
        jnp.abs(cur_l - warped[:, b1 + dy:b1 + dy + 16,
                               :, b1 + dx:b1 + dx + 16])
        .sum((1, 3), dtype=jnp.int32)
        for dy, dx in offs])               # (49, mbh, mbw)
    k = jnp.argmin(sads, axis=0)
    sad = jnp.min(sads, axis=0)
    offs_a = jnp.asarray(np.array(offs, np.int32))
    noff = len(offs)
    off = (jnp.stack([jnp.where(k == i, 1, 0) for i in range(noff)], 0)
           [:, :, :, None] * offs_a[:, None, None, :]).sum(0)
    mv_full = cmv + off

    # warp 2: re-center windows at the refined MV. offs is row-major
    # over (dy, dx), so k splits into independent row/col candidate
    # indices and the select is separable (7+7 passes, not 49).
    w2 = 16 + 2 * 4
    nsh = 2 * rr + 1
    ky, kx = k // nsh, k % nsh
    rows2 = jnp.zeros((mbh, w2, mbw, warped.shape[3]), jnp.int16)
    for i, dy in enumerate(range(-rr, rr + 1)):
        rows2 = rows2 + jnp.where(
            (ky == i)[:, None, :, None],
            warped[:, b1 + dy - 4:b1 + dy - 4 + w2, :, :], 0)
    warped2 = jnp.zeros((mbh, w2, mbw, w2), jnp.int16)
    for i, dx in enumerate(range(-rr, rr + 1)):
        warped2 = warped2 + jnp.where(
            (kx == i)[:, None, :, None],
            rows2[:, :, :, b1 + dx - 4:b1 + dx - 4 + w2], 0)

    # half-pel planes of the warped windows (spec 8.4.2.2.1 filters and
    # rounding; shift-invariance makes window-local interpolation equal
    # to sampling the global planes)
    w2t = warped2.transpose(0, 2, 1, 3)    # (mbh, mbw, 24, 24) int16
    # the 6-tap filters run in int32: the axon backend miscompiles
    # fused int16 filter chains in larger programs (first seen in the
    # HEVC interpolation, round 3; resurfaced here as context-dependent
    # wrong half-pel planes -> non-spec predictions -> conformance
    # diffs vs libavcodec at 192x128). Windows/warps/SAD stay int16 —
    # the memory-bound stages — only the filter arithmetic widens.
    w2t32 = w2t.astype(jnp.int32)
    bxu = _tap6_last(w2t32)                # b at (y, x=k+2), unrounded
    b_w = jnp.clip((bxu + 16) >> 5, 0, 255).astype(jnp.int16)
    hyu = _tap6_last(w2t32.swapaxes(-1, -2)).swapaxes(-1, -2)
    h_w = jnp.clip((hyu + 16) >> 5, 0, 255).astype(jnp.int16)
    jxy = _tap6_last(bxu.swapaxes(-1, -2)).swapaxes(-1, -2)
    j_w = jnp.clip((jxy + 512) >> 10, 0, 255).astype(jnp.int16)

    base = 4
    cur_mb = (y32.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3)
              .astype(jnp.int16))

    def plane_win(p_idx, dy, dx):
        """16x16 window of plane {G, b, h, j} at integer offset
        (dy, dx) in [-1, +1] from the warped-window center."""
        iy = base + dy
        ix = base + dx
        if p_idx == 0:
            return w2t[..., iy:iy + 16, ix:ix + 16]
        if p_idx == 1:
            return b_w[..., iy:iy + 16, ix - 2:ix - 2 + 16]
        if p_idx == 2:
            return h_w[..., iy - 2:iy - 2 + 16, ix:ix + 16]
        return j_w[..., iy - 2:iy - 2 + 16, ix - 2:ix - 2 + 16]

    # quarter-sample table (spec 8.4.2.2.1 Figure 8-4): every position
    # is the rounding average of two {G, b, h, j} samples; the four
    # base positions average a sample with itself ((v+v+1)>>1 == v)
    G, B, HH, J = 0, 1, 2, 3
    qtab = {
        (0, 0): ((G, 0, 0), (G, 0, 0)),
        (0, 1): ((G, 0, 0), (B, 0, 0)),
        (0, 2): ((B, 0, 0), (B, 0, 0)),
        (0, 3): ((B, 0, 0), (G, 0, 1)),
        (1, 0): ((G, 0, 0), (HH, 0, 0)),
        (1, 1): ((B, 0, 0), (HH, 0, 0)),
        (1, 2): ((B, 0, 0), (J, 0, 0)),
        (1, 3): ((B, 0, 0), (HH, 0, 1)),
        (2, 0): ((HH, 0, 0), (HH, 0, 0)),
        (2, 1): ((HH, 0, 0), (J, 0, 0)),
        (2, 2): ((J, 0, 0), (J, 0, 0)),
        (2, 3): ((J, 0, 0), (HH, 0, 1)),
        (3, 0): ((HH, 0, 0), (G, 1, 0)),
        (3, 1): ((HH, 0, 0), (B, 1, 0)),
        (3, 2): ((J, 0, 0), (B, 1, 0)),
        (3, 3): ((B, 1, 0), (HH, 0, 1)),
    }

    def qpred(oy, ox):
        """Prediction at qpel offset (oy, ox) in [-3, 3] from the
        full-pel center."""
        dy, dx = oy >> 2, ox >> 2
        (p1, a1, b1_), (p2, a2, b2_) = qtab[(oy & 3, ox & 3)]
        s1 = plane_win(p1, dy + a1, dx + b1_)
        s2 = plane_win(p2, dy + a2, dx + b2_)
        return (s1 + s2 + 1) >> 1

    # one 49-way sub-pel stage (covers full/half/quarter positions)
    q_cands = [(oy, ox) for oy in range(-3, 4) for ox in range(-3, 4)]
    preds = [qpred(oy, ox) for oy, ox in q_cands]
    qsads = jnp.stack([jnp.abs(cur_mb - p).sum((-1, -2)) for p in preds])
    qk = jnp.argmin(qsads, axis=0)
    pred = jnp.zeros_like(preds[0])
    for i, p in enumerate(preds):
        pred = pred + jnp.where((qk == i)[..., None, None], p, 0)
    qoff = jnp.asarray(np.array(q_cands, np.int32))
    qsel = (jnp.stack([jnp.where(qk == i, 1, 0) for i in
                       range(len(q_cands))], 0)[..., None]
            * qoff[:, None, None, :]).sum(0)
    mv_q = mv_full * 4 + qsel
    return mv_q, cmv, pred, sad


def _mc_chroma_dense(ref_c32, cmv, mv_q):
    """Chroma MC (spec 8.4.2.2.2 bilinear) via hierarchical dense
    select-warp: coarse chroma shift (81-way, = luma cmv / 2) then the
    small residual integer offset (25-way), then per-MB-weight bilinear.
    Returns (mbh, mbw, 8, 8) int32."""
    hc, wc = ref_c32.shape
    mbh, mbw = hc // 8, wc // 8
    reach_c = 2 * COARSE_RANGE
    marg_c = reach_c + 3
    apron = tile_apron(ref_c32, 8, marg_c)

    # separable (dy, dx) selects — see _me_mc_luma warp 1
    wc1 = 8 + 2 * 3
    o1 = marg_c - 3
    rows = jnp.zeros((mbh, wc1, mbw, apron.shape[3]), jnp.int32)
    for dy in range(-reach_c, reach_c + 1, 2):
        m = cmv[..., 0] == 2 * dy
        rows = rows + jnp.where(m[:, None, :, None],
                                apron[:, o1 + dy:o1 + dy + wc1, :, :], 0)
    warped = jnp.zeros((mbh, wc1, mbw, wc1), jnp.int32)
    for dx in range(-reach_c, reach_c + 1, 2):
        m = cmv[..., 1] == 2 * dx
        warped = warped + jnp.where(m[:, None, :, None],
                                    rows[:, :, :, o1 + dx:o1 + dx + wc1], 0)

    extra = (mv_q >> 3) - (cmv >> 1)       # in [-2, 2]
    wc2 = 9
    rows2 = jnp.zeros((mbh, wc2, mbw, wc1), jnp.int32)
    for ey in range(-2, 3):
        m = extra[..., 0] == ey
        rows2 = rows2 + jnp.where(m[:, None, :, None],
                                  warped[:, 3 + ey:3 + ey + wc2, :, :], 0)
    warped2 = jnp.zeros((mbh, wc2, mbw, wc2), jnp.int32)
    for ex in range(-2, 3):
        m = extra[..., 1] == ex
        warped2 = warped2 + jnp.where(m[:, None, :, None],
                                      rows2[:, :, :, 3 + ex:3 + ex + wc2], 0)

    wt = warped2.transpose(0, 2, 1, 3)     # (mbh, mbw, 9, 9)
    a = wt[..., :8, :8]
    b = wt[..., :8, 1:9]
    c = wt[..., 1:9, :8]
    d = wt[..., 1:9, 1:9]
    yf = (mv_q[..., 0] & 7)[..., None, None]
    xf = (mv_q[..., 1] & 7)[..., None, None]
    return ((8 - xf) * (8 - yf) * a + xf * (8 - yf) * b
            + (8 - xf) * yf * c + xf * yf * d + 32) >> 6


def _encode_frame_p_inter(y, u, v, ref_y, ref_u, ref_v, qp, qp_c):
    """All-inter P frame core (see encode_frame_p)."""
    h, w = y.shape
    mbh, mbw = h // 16, w // 16

    y32 = y.astype(jnp.int32)
    mv, cmv, pred_t, sad = _me_mc_luma(y32, ref_y.astype(jnp.int32))
    cur_y = _mb_view(y32)
    pred_y = pred_t                                     # (mbh,mbw,16,16)
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
        pred = _mc_chroma_dense(ref_plane.astype(jnp.int32), cmv, mv)
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


# ---------------------------------------------------------------------------
# Intra_16x16 fallback MBs in P frames (intra-in-P)
# ---------------------------------------------------------------------------

def _intra_fallback(y, u, v, outs, qp, qp_c):
    """Add Intra_16x16 fallback MBs to an all-inter P frame.

    Decision (branch-free, source pixels): an MB goes intra when the
    best left-only intra predictor beats the chosen inter prediction's
    SAD by >= 1/8 (the margin stands in for the intra mode's larger
    header cost). Coding: a column scan — entered only when the frame
    has any intra MB — recodes the chosen MBs with ops.intra._encode_mb
    against the true decoded left columns; the carry hands forward the
    SELECTED reconstruction (intra where chosen, the parallel inter
    recon elsewhere), which is exactly the decoder's neighbor state.
    """
    from ceracoder_tpu.ops.intra import _encode_mb

    h, w = y.shape
    mbh, mbw = h // 16, w // 16
    y32 = y.astype(jnp.int32)
    cur = _mb_view(y32)                              # (mbh,mbw,16,16)

    # source-pixel intra estimate: left-neighbor H and DC predictors
    redge = y32[:, 15::16]                           # (h, mbw) right edges
    lcols = jnp.concatenate(
        [jnp.full((h, 1), 128, jnp.int32), redge[:, :-1]], axis=1)
    lmb = lcols.reshape(mbh, 16, mbw).swapaxes(1, 2)  # (mbh,mbw,16)
    sad_h = jnp.abs(cur - lmb[..., :, None]).sum((-1, -2))
    dc = (lmb.sum(-1) + 8) >> 4
    sad_dc = jnp.abs(cur - dc[..., None, None]).sum((-1, -2))
    est = jnp.minimum(sad_h, sad_dc)
    is_intra = 8 * est < 7 * outs["sad"]
    any_intra = is_intra.any()

    ymb = cur.astype(jnp.uint8)
    umb = _mb_view(u, 8)
    vmb = _mb_view(v, 8)
    ry_mb = _mb_view(outs["recon"][0])
    ru_mb = _mb_view(outs["recon"][1], 8)
    rv_mb = _mb_view(outs["recon"][2], 8)

    def do_intra(_):
        mb_fn = jax.vmap(_encode_mb,
                         in_axes=(0, 0, 0, 0, 0, 0, None, None))

        def one_col(carry, xs):
            ly, lu, lv = carry
            ymb_c, umb_c, vmb_c, iry, iru, irv, m = xs
            out, (nly, nlu, nlv) = mb_fn(ymb_c, umb_c, vmb_c,
                                         ly, lu, lv, qp, qp_c)
            m1 = m[:, None]
            nly = jnp.where(m1, nly, iry.astype(nly.dtype))
            nlu = jnp.where(m1, nlu, iru.astype(nlu.dtype))
            nlv = jnp.where(m1, nlv, irv.astype(nlv.dtype))
            return (nly, nlu, nlv), out

        unroll = next(uu for uu in (8, 6, 5, 4, 3, 2, 1)
                      if mbw % uu == 0)

        def step(carry, xs):
            outs_u = []
            for k in range(unroll):
                carry, o = one_col(
                    carry,
                    jax.tree_util.tree_map(lambda a: a[k], xs))
                outs_u.append(o)
            return carry, jax.tree_util.tree_map(
                lambda *ts: jnp.stack(ts), *outs_u)

        init = (jnp.full((mbh, 16), 128, jnp.uint8),
                jnp.full((mbh, 8), 128, jnp.uint8),
                jnp.full((mbh, 8), 128, jnp.uint8))
        xs = (ymb.swapaxes(0, 1), umb.swapaxes(0, 1),
              vmb.swapaxes(0, 1),
              ry_mb[..., :, 15].swapaxes(0, 1),
              ru_mb[..., :, 7].swapaxes(0, 1),
              rv_mb[..., :, 7].swapaxes(0, 1),
              is_intra.swapaxes(0, 1))
        xs = jax.tree_util.tree_map(
            lambda a: a.reshape(mbw // unroll, unroll, *a.shape[1:]),
            xs)
        _, iouts = jax.lax.scan(step, init, xs)
        # (mbw/U, U, mbh, ...) -> (mbh, mbw, ...)
        return {k: jnp.swapaxes(o.reshape(mbw, *o.shape[2:]), 0, 1)
                for k, o in iouts.items()}

    def no_intra(_):
        return dict(
            dc_luma=jnp.zeros((mbh, mbw, 16), jnp.int16),
            ac_luma=jnp.zeros((mbh, mbw, 4, 4, 15), jnp.int16),
            mode_luma=jnp.zeros((mbh, mbw), jnp.uint8),
            dc_chroma=jnp.zeros((mbh, mbw, 2, 4), jnp.int16),
            ac_chroma=jnp.zeros((mbh, mbw, 2, 2, 2, 15), jnp.int16),
            mode_chroma=jnp.zeros((mbh, mbw), jnp.uint8),
            recon_y=jnp.zeros((mbh, mbw, 16, 16), jnp.uint8),
            recon_u=jnp.zeros((mbh, mbw, 8, 8), jnp.uint8),
            recon_v=jnp.zeros((mbh, mbw, 8, 8), jnp.uint8),
        )

    iouts = jax.lax.cond(any_intra, do_intra, no_intra, None)

    m = is_intra
    m2 = m[..., None, None]

    def unmb(x, mb):
        return x.swapaxes(1, 2).reshape(mbh * mb, mbw * mb)

    rec_y = unmb(jnp.where(m2, iouts["recon_y"], ry_mb), 16)
    rec_u = unmb(jnp.where(m2, iouts["recon_u"], ru_mb), 8)
    rec_v = unmb(jnp.where(m2, iouts["recon_v"], rv_mb), 8)

    keep = (~m).astype(jnp.int16)
    outs = dict(outs)
    outs["recon"] = (rec_y, rec_u, rec_v)
    outs["mv"] = outs["mv"] * (~m)[..., None]
    outs["luma_levels"] = outs["luma_levels"] * keep[..., None, None,
                                                    None]
    outs["dc_chroma"] = jnp.where(m[..., None, None],
                                  iouts["dc_chroma"],
                                  outs["dc_chroma"])
    outs["ac_chroma"] = jnp.where(m[..., None, None, None, None],
                                  iouts["ac_chroma"],
                                  outs["ac_chroma"])
    outs["is_intra"] = m
    outs["mode_luma"] = iouts["mode_luma"] * m
    outs["mode_chroma"] = iouts["mode_chroma"] * m
    outs["dc_luma"] = iouts["dc_luma"] * m[..., None]
    outs["ac_luma"] = iouts["ac_luma"] * m[..., None, None, None]
    return outs


@functools.partial(jax.jit, static_argnames=("intra_in_p",))
def encode_frame_p(y, u, v, ref_y, ref_u, ref_v, qp: int, qp_c: int,
                   intra_in_p: bool = False):
    """Encode a P frame (P_L0_16x16 + optional Intra_16x16 fallback,
    quarter-pel MVs, prev-frame ref).

    Returns per-MB arrays: mv (mbh,mbw,2), luma levels (mbh,mbw,4,4,16)
    (full 16-coeff blocks, zigzag), chroma DC/AC, recon planes; with
    intra_in_p also is_intra/mode_luma/mode_chroma/dc_luma/ac_luma
    (zeroed at inter MBs).
    """
    outs = _encode_frame_p_inter(y, u, v, ref_y, ref_u, ref_v, qp,
                                 qp_c)
    if not intra_in_p:
        return outs
    return _intra_fallback(y, u, v, outs, qp, qp_c)
