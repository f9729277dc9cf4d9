"""In-loop deblocking filter (H.264 spec 8.7; JAX, jittable).

Scheduled like the rest of the codec: slice-per-MB-row with
``disable_deblocking_filter_idc == 2`` (filter inside a slice, not
across slice boundaries), so rows stay independent — ``vmap`` over MB
rows, ``lax.scan`` over columns with a 4-column carry implementing the
spec's macroblock-raster ordering (a vertical MB-boundary edge filters
the left MB's columns AFTER that MB's own horizontal edges — the carry
hands those columns forward and the finalized values are scattered back).

Intra prediction uses pre-filter samples and inter prediction uses
post-filter samples (spec 8.3/8.4), so callers run this after full-frame
reconstruction and store the result as the reference picture.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# spec table 8-16 (indexed by indexA / indexB = clipped QP here)
ALPHA = np.array([0] * 16 + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20,
                             22, 25, 28, 32, 36, 40, 45, 50, 56, 63, 71,
                             80, 90, 101, 113, 127, 144, 162, 182, 203,
                             226, 255, 255], np.int32)
BETA = np.array([0] * 16 + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8,
                            8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14,
                            14, 15, 15, 16, 16, 17, 17, 18, 18], np.int32)
# spec table 8-17: tc0 for bS = 1, 2, 3 (rows = indexA 0..51),
# extracted from libavcodec's tc0_table and validated bit-exactly by
# the QP-sweep conformance tests
TC0 = np.array(
    [[0, 0, 0]] * 17
    + [[0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 1, 1], [0, 1, 1],
       [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 2], [1, 1, 2],
       [1, 1, 2], [1, 1, 2], [1, 2, 3], [1, 2, 3], [2, 2, 3], [2, 2, 4],
       [2, 3, 4], [2, 3, 4], [3, 3, 5], [3, 4, 6], [3, 4, 6], [4, 5, 7],
       [4, 5, 8], [4, 6, 9], [5, 7, 10], [6, 8, 11], [6, 8, 13],
       [7, 10, 14], [8, 11, 16], [9, 12, 18], [10, 13, 20], [11, 15, 23],
       [13, 17, 25]], np.int32)


def _clip255(x):
    return jnp.clip(x, 0, 255)


def _filter_luma_edge(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta,
                      tc0_row):
    """One luma edge (spec 8.7.2.3/8.7.2.4). All args are per-sample
    arrays along the edge; bs likewise (0..4). Returns new
    (p2, p1, p0, q0, q1, q2)."""
    ap = jnp.abs(p2 - p0)
    aq = jnp.abs(q2 - q0)
    filt = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta) & (bs > 0))

    # --- bS in 1..3 (8.7.2.3)
    tc0 = tc0_row[jnp.clip(bs, 1, 3) - 1]
    tc = tc0 + (ap < beta) + (aq < beta)
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = _clip255(p0 + delta)
    nq0 = _clip255(q0 - delta)
    dp1 = jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
    np1 = p1 + jnp.where(ap < beta, dp1, 0)
    dq1 = jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
    nq1 = q1 + jnp.where(aq < beta, dq1, 0)

    # --- bS == 4 (8.7.2.4)
    small = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = (ap < beta) & small
    sp0 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
    wp0 = (2 * p1 + p0 + q1 + 2) >> 2
    s4p0 = jnp.where(sp, sp0, wp0)
    s4p1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    s4p2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq = (aq < beta) & small
    sq0 = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
    wq0 = (2 * q1 + q0 + p1 + 2) >> 2
    s4q0 = jnp.where(sq, sq0, wq0)
    s4q1 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    s4q2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    out_p0 = jnp.where(filt, jnp.where(is4, s4p0, np0), p0)
    out_q0 = jnp.where(filt, jnp.where(is4, s4q0, nq0), q0)
    out_p1 = jnp.where(filt, jnp.where(is4, s4p1, np1), p1)
    out_q1 = jnp.where(filt, jnp.where(is4, s4q1, nq1), q1)
    out_p2 = jnp.where(filt & is4, s4p2, p2)
    out_q2 = jnp.where(filt & is4, s4q2, q2)
    return out_p2, out_p1, out_p0, out_q0, out_q1, out_q2


def _filter_chroma_edge(p1, p0, q0, q1, bs, alpha, beta, tc0_row):
    """One chroma edge: only p0/q0 change (spec 8.7.2.3/8.7.2.4)."""
    filt = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta) & (bs > 0))
    tc = tc0_row[jnp.clip(bs, 1, 3) - 1] + 1
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = _clip255(p0 + delta)
    nq0 = _clip255(q0 - delta)
    s4p0 = (2 * p1 + p0 + q1 + 2) >> 2
    s4q0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    out_p0 = jnp.where(filt, jnp.where(is4, s4p0, np0), p0)
    out_q0 = jnp.where(filt, jnp.where(is4, s4q0, nq0), q0)
    return out_p0, out_q0


def _deblock_mb_luma(mb, left4, bs_v, bs_h, alpha, beta, tc0_row):
    """One 16x16 luma MB: vertical edges (incl. left boundary) then
    internal horizontal edges. left4 = left MB's columns 12..15 (already
    horizontally filtered). Returns (fixed_left3, body)."""
    cols = jnp.concatenate([left4, mb], axis=1)       # (16, 20)
    for e in range(4):
        x = 4 + 4 * e
        bs = jnp.repeat(bs_v[e], 4)
        args = [cols[:, x - 4 + k] for k in range(4)] + \
               [cols[:, x + k] for k in range(4)]
        p2, p1, p0, q0, q1, q2 = _filter_luma_edge(
            *args, bs, alpha, beta, tc0_row)
        cols = cols.at[:, x - 3].set(p2).at[:, x - 2].set(p1) \
                   .at[:, x - 1].set(p0).at[:, x].set(q0) \
                   .at[:, x + 1].set(q1).at[:, x + 2].set(q2)
    for e in range(3):
        y = 4 * (e + 1)
        bs = jnp.repeat(bs_h[e], 4)
        args = [cols[y - 4 + k, 4:] for k in range(4)] + \
               [cols[y + k, 4:] for k in range(4)]
        p2, p1, p0, q0, q1, q2 = _filter_luma_edge(
            *args, bs, alpha, beta, tc0_row)
        cols = cols.at[y - 3, 4:].set(p2).at[y - 2, 4:].set(p1) \
                   .at[y - 1, 4:].set(p0).at[y, 4:].set(q0) \
                   .at[y + 1, 4:].set(q1).at[y + 2, 4:].set(q2)
    return cols[:, 1:4], cols[:, 4:]


def _deblock_mb_chroma(mb, left2, bs_v, bs_h, alpha, beta, tc0_row):
    """One 8x8 chroma MB component. Chroma edges take the bS of the
    co-located luma edge (chroma edge x=0 -> luma x=0, x=4 -> luma x=8;
    chroma sample row r -> luma segment r//2). left2 = left MB cols 6,7."""
    cols = jnp.concatenate([left2, mb], axis=1)       # (8, 10)
    for e, luma_e in ((0, 0), (1, 2)):
        x = 2 + 4 * e
        bs = jnp.repeat(bs_v[luma_e], 2)
        p1, p0, q0, q1 = (cols[:, x - 2], cols[:, x - 1],
                          cols[:, x], cols[:, x + 1])
        np0, nq0 = _filter_chroma_edge(p1, p0, q0, q1, bs, alpha, beta,
                                       tc0_row)
        cols = cols.at[:, x - 1].set(np0).at[:, x].set(nq0)
    # internal horizontal edge at chroma y=4 (luma y=8 -> bs_h index 1)
    bs = jnp.repeat(bs_h[1], 2)
    p1, p0, q0, q1 = cols[2, 2:], cols[3, 2:], cols[4, 2:], cols[5, 2:]
    np0, nq0 = _filter_chroma_edge(p1, p0, q0, q1, bs, alpha, beta, tc0_row)
    cols = cols.at[3, 2:].set(np0).at[4, 2:].set(nq0)
    return cols[:, 1:2], cols[:, 2:]


def compute_bs(nnz44, mv_q, intra_frame: bool, intra_mb=None):
    """Boundary strengths (spec 8.7.2.1) for the slice-row schedule.

    nnz44: (mbh, mbw, 4, 4) nonzero-coefficient flags per luma 4x4.
    mv_q: (mbh, mbw, 2) quarter-pel MVs (ignored for intra frames).
    intra_mb: optional (mbh, mbw) bool — Intra_16x16 MBs inside a P
    frame (intra-in-P): their MB-boundary edges get bS 4 and internal
    edges bS 3 regardless of the inter-side rules.
    Returns (bs_v (mbh, mbw, 4, 4), bs_h (mbh, mbw, 3, 4)).
    """
    mbh, mbw = nnz44.shape[:2]
    if intra_frame:
        bs_v = jnp.full((mbh, mbw, 4, 4), 3, jnp.int32)
        bs_v = bs_v.at[:, :, 0, :].set(4)
        # picture-left boundary is never filtered
        bs_v = bs_v.at[:, 0, 0, :].set(0)
        bs_h = jnp.full((mbh, mbw, 3, 4), 3, jnp.int32)
        return bs_v, bs_h

    nz = (nnz44 > 0).astype(jnp.int32)
    bs_v = jnp.zeros((mbh, mbw, 4, 4), jnp.int32)
    for e in range(1, 4):
        pair = nz[:, :, :, e - 1] | nz[:, :, :, e]
        bs_v = bs_v.at[:, :, e, :].set(2 * pair)
    nz_left = jnp.roll(nz, 1, axis=1)
    mv_left = jnp.roll(mv_q, 1, axis=1)
    mvdiff = (jnp.abs(mv_q - mv_left) >= 4).any(-1)
    pair0 = nz_left[:, :, :, 3] | nz[:, :, :, 0]
    bs0 = jnp.where(pair0 > 0, 2, jnp.where(mvdiff[..., None], 1, 0))
    bs_v = bs_v.at[:, :, 0, :].set(bs0)

    bs_h = jnp.zeros((mbh, mbw, 3, 4), jnp.int32)
    for e in range(1, 4):
        pair = nz[:, :, e - 1, :] | nz[:, :, e, :]
        bs_h = bs_h.at[:, :, e - 1, :].set(2 * pair)

    if intra_mb is not None:
        ii = intra_mb.astype(bool)
        il = jnp.roll(ii, 1, axis=1).at[:, 0].set(False)
        # MB-boundary vertical edge: either side intra -> 4
        bs_v = bs_v.at[:, :, 0, :].set(
            jnp.where((ii | il)[..., None], 4, bs_v[:, :, 0, :]))
        # internal edges of an intra MB -> at least 3
        bs_v = bs_v.at[:, :, 1:, :].set(
            jnp.where(ii[..., None, None], 3, bs_v[:, :, 1:, :]))
        bs_h = jnp.where(ii[..., None, None], 3, bs_h)
    # picture-left boundary is never filtered
    bs_v = bs_v.at[:, 0, 0, :].set(0)
    return bs_v, bs_h


@functools.partial(jax.jit, static_argnames=("intra_frame",))
def deblock_frame_rows(y, u, v, nnz44, mv_q, qp, qp_c,
                       intra_frame: bool, intra_mb=None):
    """Deblock a reconstructed frame under the slice-row schedule.

    qp / qp_c may be traced scalars — the filter-strength tables are
    indexed on device so adaptive rate control never recompiles.
    intra_mb: optional (mbh, mbw) bool mask of Intra_16x16 MBs in a P
    frame (see compute_bs)."""
    h, w = y.shape
    mbh, mbw = h // 16, w // 16
    qp = jnp.clip(jnp.asarray(qp, jnp.int32), 0, 51)
    qp_c = jnp.clip(jnp.asarray(qp_c, jnp.int32), 0, 51)
    alpha = jnp.asarray(ALPHA)[qp]
    beta = jnp.asarray(BETA)[qp]
    tc0_row = jnp.asarray(TC0)[qp]
    alpha_c = jnp.asarray(ALPHA)[qp_c]
    beta_c = jnp.asarray(BETA)[qp_c]
    tc0_row_c = jnp.asarray(TC0)[qp_c]

    bs_v, bs_h = compute_bs(nnz44, mv_q, intra_frame, intra_mb)

    ymb = y.astype(jnp.int32).reshape(mbh, 16, mbw, 16).swapaxes(1, 2)
    umb = u.astype(jnp.int32).reshape(mbh, 8, mbw, 8).swapaxes(1, 2)
    vmb = v.astype(jnp.int32).reshape(mbh, 8, mbw, 8).swapaxes(1, 2)

    def one_col(carry, xs):
        ly4, lu2, lv2 = carry
        ymb_c, umb_c, vmb_c, bsv_c, bsh_c = xs
        fy, by = jax.vmap(_deblock_mb_luma, in_axes=(0, 0, 0, 0, None,
                                                     None, None))(
            ymb_c, ly4, bsv_c, bsh_c, alpha, beta, tc0_row)
        fu, bu = jax.vmap(_deblock_mb_chroma, in_axes=(0, 0, 0, 0, None,
                                                       None, None))(
            umb_c, lu2, bsv_c, bsh_c, alpha_c, beta_c, tc0_row_c)
        fv, bv = jax.vmap(_deblock_mb_chroma, in_axes=(0, 0, 0, 0, None,
                                                       None, None))(
            vmb_c, lv2, bsv_c, bsh_c, alpha_c, beta_c, tc0_row_c)
        new_carry = (by[:, :, 12:], bu[:, :, 6:], bv[:, :, 6:])
        return new_carry, (fy, by, fu, bu, fv, bv)

    # unroll several MB columns per scan step: the left-neighbor carry
    # makes columns sequential, but a short on-device loop per step
    # amortizes the per-iteration latency (120 -> 120/U steps at 1080p)
    unroll = next(u for u in (8, 6, 5, 4, 3, 2, 1) if mbw % u == 0)

    def mb_step(carry, xs):
        outs = []
        for k in range(unroll):
            carry, out = one_col(carry,
                                 jax.tree_util.tree_map(lambda a: a[k], xs))
            outs.append(out)
        stacked = jax.tree_util.tree_map(
            lambda *ts: jnp.stack(ts), *outs)
        return carry, stacked

    init = (jnp.zeros((mbh, 16, 4), jnp.int32),
            jnp.zeros((mbh, 8, 2), jnp.int32),
            jnp.zeros((mbh, 8, 2), jnp.int32))
    xs = (ymb.swapaxes(0, 1), umb.swapaxes(0, 1), vmb.swapaxes(0, 1),
          bs_v.swapaxes(0, 1), bs_h.swapaxes(0, 1))
    xs = jax.tree_util.tree_map(
        lambda a: a.reshape(mbw // unroll, unroll, *a.shape[1:]), xs)
    _, outs = jax.lax.scan(mb_step, init, xs)
    # (mbw//U, U, ...) -> (mbw, ...)
    fy, by, fu, bu, fv, bv = jax.tree_util.tree_map(
        lambda a: a.reshape(mbw, *a.shape[2:]), outs)

    def assemble(bodies, fixes, mbp, nfix):
        # bodies: (mbw, mbh, mb, mb); fixes[c] patches MB c-1's right cols
        bodies = bodies.at[:-1, :, :, mbp - nfix:].set(fixes[1:])
        full = bodies.swapaxes(0, 1).swapaxes(1, 2)  # (mbh, mb, mbw, mb)
        return full.reshape(mbh * mbp, mbw * mbp)

    out_y = assemble(by, fy, 16, 3)
    out_u = assemble(bu, fu, 8, 1)
    out_v = assemble(bv, fv, 8, 1)
    return (jnp.clip(out_y, 0, 255).astype(jnp.uint8),
            jnp.clip(out_u, 0, 255).astype(jnp.uint8),
            jnp.clip(out_v, 0, 255).astype(jnp.uint8))