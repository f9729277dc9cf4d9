"""Intra-frame encoding compute path (JAX, jittable).

Implements the device-side portion of an Intra_16x16 H.264 encoder with
the **slice-per-MB-row** schedule: each macroblock row is an independent
slice (like x264's sliced-threads low-latency mode), so rows carry no
inter-row dependency and the frame maps onto the TPU as
``lax.scan`` over columns x ``vmap`` over rows — the scan carries only
each row's right-edge reconstruction. This is the spatial-parallel
schedule from SURVEY.md §2.7 (tile-row parallelism); a single-slice
wavefront schedule can reuse the same per-MB kernel.

Prediction modes per spec 8.3.3 (luma 16x16) and 8.3.4 (chroma 8x8),
restricted to the left-neighbor modes available in slice-row scanning:
Horizontal and DC.
"""

from __future__ import annotations

from ceracoder_tpu.utils.jaxenv import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from ceracoder_tpu.ops.transform import (
    dequant4,
    dequant_dc2,
    dequant_dc4,
    fdct4,
    from_blocks4,
    hadamard2_fwd,
    hadamard4_fwd,
    idct4,
    quant4,
    quant_dc2,
    quant_dc4,
    to_blocks4,
    zigzag_scan,
)

# Intra16x16PredMode values (spec table 8-4)
LUMA_V, LUMA_H, LUMA_DC, LUMA_PLANE = 0, 1, 2, 3
# intra_chroma_pred_mode values (spec table 8-5)
CHROMA_DC, CHROMA_H, CHROMA_V, CHROMA_PLANE = 0, 1, 2, 3


def _sad(a, b):
    return jnp.abs(a - b).sum()


def _encode_luma_mb(orig, left_col, qp):
    """One 16x16 luma MB given the left neighbor's recon column.

    A borderless (column-0) MB is fed an all-128 left column instead of a
    conditional: its DC predictor is then exactly the spec's 128, and H
    mode loses the strict-< SAD tie so DC is signalled. This keeps the
    whole MB uniform data flow — no scalar branch inside the scan (which
    the axon XLA backend was observed to miscompile by duplicating the
    where() with inconsistent results between the levels and recon
    consumers).

    Returns (dc_levels(16), ac_levels(4,4,15), mode, recon(16,16)).
    """
    orig = orig.astype(jnp.int32)
    pred_h = jnp.broadcast_to(left_col[:, None], (16, 16)).astype(jnp.int32)
    dc_left = (left_col.astype(jnp.int32).sum() + 8) >> 4
    pred_dc = jnp.full((16, 16), dc_left, jnp.int32)

    use_h = _sad(orig, pred_h) < _sad(orig, pred_dc)
    pred = jnp.where(use_h, pred_h, pred_dc)
    mode = jnp.where(use_h, LUMA_H, LUMA_DC)

    res = orig - pred
    w = fdct4(to_blocks4(res))                      # (4,4,4,4)
    zdc = quant_dc4(hadamard4_fwd(w[..., 0, 0]), qp)
    zac = quant4(w, qp).at[..., 0, 0].set(0)

    d = dequant4(zac, qp).at[..., 0, 0].set(dequant_dc4(zdc, qp))
    recon = jnp.clip(pred + from_blocks4(idct4(d)), 0, 255)

    dc_levels = zigzag_scan(zdc)
    ac_levels = zigzag_scan(zac)[..., 1:]
    return dc_levels, ac_levels, mode, recon


def _chroma_pred(left):
    """8x8 chroma prediction for H and DC modes (spec 8.3.4), left-only.

    Column-0 MBs receive an all-128 left column (see _encode_luma_mb),
    which makes this DC predictor the spec's borderless 128."""
    left = left.astype(jnp.int32)
    pred_h = jnp.broadcast_to(left[:, None], (8, 8))
    tl = (left[:4].sum() + 2) >> 2
    bl = (left[4:].sum() + 2) >> 2
    dc_rows = jnp.concatenate([jnp.full(4, tl), jnp.full(4, bl)])
    pred_dc = jnp.broadcast_to(dc_rows[:, None], (8, 8))
    return pred_h, pred_dc


def _encode_chroma_comp(orig, pred, qp_c):
    """One 8x8 chroma component with a chosen prediction.

    Returns (dc_levels(4), ac_levels(2,2,15), recon(8,8))."""
    res = orig.astype(jnp.int32) - pred
    w = fdct4(to_blocks4(res))                      # (2,2,4,4)
    zdc = quant_dc2(hadamard2_fwd(w[..., 0, 0]), qp_c)
    zac = quant4(w, qp_c).at[..., 0, 0].set(0)
    d = dequant4(zac, qp_c).at[..., 0, 0].set(dequant_dc2(zdc, qp_c))
    recon = jnp.clip(pred + from_blocks4(idct4(d)), 0, 255)
    dc_levels = zdc.reshape(4)                      # 2x2 raster scan
    ac_levels = zigzag_scan(zac)[..., 1:]
    return dc_levels, ac_levels, recon


def _encode_mb(ymb, umb, vmb, ly, lu, lv, qp, qp_c):
    """One full macroblock. Returns outputs dict + new left columns."""
    dc_l, ac_l, mode_l, recon_y = _encode_luma_mb(ymb, ly, qp)

    ph_u, pdc_u = _chroma_pred(lu)
    ph_v, pdc_v = _chroma_pred(lv)
    u32, v32 = umb.astype(jnp.int32), vmb.astype(jnp.int32)
    sad_h = _sad(u32, ph_u) + _sad(v32, ph_v)
    sad_dc = _sad(u32, pdc_u) + _sad(v32, pdc_v)
    use_h = sad_h < sad_dc
    mode_c = jnp.where(use_h, CHROMA_H, CHROMA_DC)
    pred_u = jnp.where(use_h, ph_u, pdc_u)
    pred_v = jnp.where(use_h, ph_v, pdc_v)

    dc_u, ac_u, recon_u = _encode_chroma_comp(umb, pred_u, qp_c)
    dc_v, ac_v, recon_v = _encode_chroma_comp(vmb, pred_v, qp_c)

    # int16 keeps the host transfer small; quantized levels are bounded
    # well inside int16 (<= ~3.7k at qp 0)
    out = dict(
        dc_luma=dc_l.astype(jnp.int16),
        ac_luma=ac_l.astype(jnp.int16),
        mode_luma=mode_l.astype(jnp.uint8),
        dc_chroma=jnp.stack([dc_u, dc_v]).astype(jnp.int16),
        ac_chroma=jnp.stack([ac_u, ac_v]).astype(jnp.int16),
        mode_chroma=mode_c.astype(jnp.uint8),
        recon_y=recon_y.astype(jnp.uint8),
        recon_u=recon_u.astype(jnp.uint8),
        recon_v=recon_v.astype(jnp.uint8),
    )
    return out, (recon_y[:, 15].astype(jnp.uint8),
                 recon_u[:, 7].astype(jnp.uint8),
                 recon_v[:, 7].astype(jnp.uint8))


@jax.jit
def encode_frame_i16_rows(y, u, v, qp: int, qp_c: int):
    """Encode a frame as Intra_16x16 with one slice per MB row.

    y: (H, W) uint8 with H, W multiples of 16; u, v: (H/2, W/2).
    Returns a dict of per-MB arrays, leading dims (mb_rows, mb_cols).
    """
    h, w = y.shape
    mbh, mbw = h // 16, w // 16

    # (mbh, mbw, 16, 16) / (mbh, mbw, 8, 8)
    ymb = y.reshape(mbh, 16, mbw, 16).swapaxes(1, 2)
    umb = u.reshape(mbh, 8, mbw, 8).swapaxes(1, 2)
    vmb = v.reshape(mbh, 8, mbw, 8).swapaxes(1, 2)

    mb_fn = jax.vmap(_encode_mb, in_axes=(0, 0, 0, 0, 0, 0, None, None))

    def one_col(carry, xs):
        ly, lu, lv = carry
        ymb_c, umb_c, vmb_c = xs
        out, (nly, nlu, nlv) = mb_fn(ymb_c, umb_c, vmb_c, ly, lu, lv,
                                     qp, qp_c)
        return (nly, nlu, nlv), out

    # unroll several MB columns per scan step: the left-recon carry is
    # inherently sequential, but a short on-device loop per step
    # amortizes per-iteration latency (120 -> 120/U steps at 1080p)
    unroll = next(u for u in (8, 6, 5, 4, 3, 2, 1) if mbw % u == 0)

    def step(carry, xs):
        outs_u = []
        for k in range(unroll):
            carry, out = one_col(carry,
                                 jax.tree_util.tree_map(lambda a: a[k],
                                                        xs))
            outs_u.append(out)
        return carry, jax.tree_util.tree_map(
            lambda *ts: jnp.stack(ts), *outs_u)

    # 128-filled init columns make column-0 prediction the spec's
    # borderless DC=128 without a scalar conditional (see _encode_luma_mb)
    init = (jnp.full((mbh, 16), 128, jnp.uint8),
            jnp.full((mbh, 8), 128, jnp.uint8),
            jnp.full((mbh, 8), 128, jnp.uint8))
    # scan over column groups; outputs stack as (mbw/U, U, mbh, ...)
    xs = (ymb.swapaxes(0, 1), umb.swapaxes(0, 1), vmb.swapaxes(0, 1))
    xs = jax.tree_util.tree_map(
        lambda a: a.reshape(mbw // unroll, unroll, *a.shape[1:]), xs)
    _, outs = jax.lax.scan(step, init, xs)
    outs = {k: jnp.swapaxes(o.reshape(mbw, *o.shape[2:]), 0, 1)
            for k, o in outs.items()}

    recon_y = outs.pop("recon_y").swapaxes(1, 2).reshape(h, w)
    recon_u = outs.pop("recon_u").swapaxes(1, 2).reshape(h // 2, w // 2)
    recon_v = outs.pop("recon_v").swapaxes(1, 2).reshape(h // 2, w // 2)
    outs["recon"] = (recon_y, recon_u, recon_v)
    return outs
