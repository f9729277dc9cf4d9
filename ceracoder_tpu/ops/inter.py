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


def mc_luma_fullpel(ref: jnp.ndarray, mv: jnp.ndarray):
    """Motion-compensated luma prediction for integer MVs.

    ref: (H, W); mv: (mbh, mbw, 2) full-pel. Returns (mbh, mbw, 16, 16).
    """
    h, w = ref.shape
    mbh, mbw = h // 16, w // 16
    pad = 256  # generous MV clamp window
    ref_pad = jnp.pad(ref.astype(jnp.int32), pad, mode="edge")
    by = jnp.broadcast_to(jnp.arange(mbh)[:, None] * 16, (mbh, mbw))
    bx = jnp.broadcast_to(jnp.arange(mbw)[None, :] * 16, (mbh, mbw))

    def one(base_y, base_x, m):
        return jax.lax.dynamic_slice(
            ref_pad, (base_y + m[0] + pad, base_x + m[1] + pad), (16, 16))

    return jax.vmap(jax.vmap(one))(by, bx, mv)


def mc_chroma(ref_c: jnp.ndarray, mv: jnp.ndarray):
    """Chroma MC with eighth-pel bilinear (spec 8.4.2.2.2).

    ref_c: (H/2, W/2); mv: (mbh, mbw, 2) in full-pel LUMA units. The
    chroma vector is mv/2 in chroma samples = mv*4 in eighth-pel units;
    for integer luma MVs xFrac/yFrac are 0 or 4.
    Returns (mbh, mbw, 8, 8) int32 predictions.
    """
    hc, wc = ref_c.shape
    mbh, mbw = hc // 8, wc // 8
    pad = 256
    ref_pad = jnp.pad(ref_c.astype(jnp.int32), pad, mode="edge")
    by = jnp.broadcast_to(jnp.arange(mbh)[:, None] * 8, (mbh, mbw))
    bx = jnp.broadcast_to(jnp.arange(mbw)[None, :] * 8, (mbh, mbw))

    def one(base_y, base_x, m):
        cy = base_y + (m[0] >> 1) + pad          # integer chroma offset
        cx = base_x + (m[1] >> 1) + pad
        yf = (m[0] & 1) * 4                      # eighth-pel fractions
        xf = (m[1] & 1) * 4
        block = jax.lax.dynamic_slice(ref_pad, (cy, cx), (9, 9))
        a = block[:8, :8]
        b = block[:8, 1:9]
        c = block[1:9, :8]
        d = block[1:9, 1:9]
        return ((8 - xf) * (8 - yf) * a + xf * (8 - yf) * b
                + (8 - xf) * yf * c + xf * yf * d + 32) >> 6

    return jax.vmap(jax.vmap(one))(by, bx, mv)


@functools.partial(jax.jit, static_argnames=("qp", "qp_c"))
def encode_frame_p(y, u, v, ref_y, ref_u, ref_v, qp: int, qp_c: int):
    """Encode a P frame (all P_L0_16x16, full-pel MVs, prev-frame ref).

    Returns per-MB arrays: mv (mbh,mbw,2), luma levels (mbh,mbw,4,4,16)
    (full 16-coeff blocks, zigzag), chroma DC/AC, recon planes.
    """
    h, w = y.shape
    mbh, mbw = h // 16, w // 16

    mv, sad = motion_search_fullpel(y, ref_y)

    pred_y = mc_luma_fullpel(ref_y, mv)                 # (mbh,mbw,16,16)
    cur_y = _mb_view(y.astype(jnp.int32))
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
