#!/usr/bin/env python
"""Micro-benchmark of MC/window-extraction strategies on the chip.

Compares the whole-frame 3-index gather (current _mc_luma_qpel) with
per-CU dynamic-slice window extraction and window-local qpel phase
compute, to decide the subpel-refine redesign."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ceracoder_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ceracoder_tpu.ops.h265 import (  # noqa: E402
    CTB,
    PLANE_PAD,
    _luma_qpel_planes,
    _mc_luma_qpel,
    _satd8_blocks,
    _satd8_frame,
)

W, H = 1920, 1088
NCH, NCW = H // CTB, W // CTB
rng = np.random.default_rng(0)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return out


def main():
    ref_pad = jnp.asarray(rng.integers(
        0, 256, (H + 2 * (PLANE_PAD + 4), W + 2 * (PLANE_PAD + 4))
    ).astype(np.uint8))
    cur = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    mv = jnp.asarray(rng.integers(-8, 9, (NCH, NCW, 2)).astype(np.int32))
    mvq = mv * 4 + jnp.asarray(
        rng.integers(-2, 3, (NCH, NCW, 2)).astype(np.int32))

    planes = jax.jit(_luma_qpel_planes)(ref_pad.astype(jnp.int32))
    planes.block_until_ready()

    # A: current whole-frame gather MC
    f_a = jax.jit(lambda p, m: _mc_luma_qpel(p, m, H, W))
    timeit("A whole-frame gather MC", f_a, planes, mvq)

    # B: per-CU dynamic_slice windows from one plane (vmap x vmap)
    WIN = 24

    def windows_vmap(plane, mv):
        def one(i, j):
            # start at PLANE_PAD (not PLANE_PAD - 4): ref_pad carries
            # PLANE_PAD + 4 pad, so this puts integer sample (y, x) at
            # win[y + 4, x + 4] and keeps every start >= 1 (no clamp /
            # negative-wrap divergence vs variant C)
            return jax.lax.dynamic_slice(
                plane, (i * CTB + mv[i, j, 0] + PLANE_PAD,
                        j * CTB + mv[i, j, 1] + PLANE_PAD),
                (WIN, WIN))
        return jax.vmap(lambda i: jax.vmap(lambda j: one(i, j))(
            jnp.arange(NCW)))(jnp.arange(NCH))

    f_b = jax.jit(lambda m: windows_vmap(ref_pad.astype(jnp.int32), m))
    win = timeit("B per-CU dyn-slice 24x24 windows", f_b, mv)

    # C: whole-frame gather of the same windows (baseline compare)
    def windows_gather(plane, mv):
        yy = (jnp.arange(NCH)[:, None, None, None] * CTB
              + mv[:, :, 0][..., None, None] + PLANE_PAD
              + jnp.arange(WIN)[None, None, :, None])
        xx = (jnp.arange(NCW)[None, :, None, None] * CTB
              + mv[:, :, 1][..., None, None] + PLANE_PAD
              + jnp.arange(WIN)[None, None, None, :])
        return plane[yy, xx]

    f_c = jax.jit(lambda m: windows_gather(ref_pad.astype(jnp.int32), m))
    timeit("C gather 24x24 windows", f_c, mv)

    # D: 18x SATD whole frame (the refine's compute floor w/o MC)
    def satds(c, p):
        tot = jnp.zeros((NCH, NCW), jnp.int32)
        for k in range(18):
            # frame-aligned region of the PLANE_PAD-padded plane
            tot += _satd8_frame(
                c - p[k % 16, PLANE_PAD:PLANE_PAD + H,
                      PLANE_PAD:PLANE_PAD + W])
        return tot

    f_d = jax.jit(satds)
    timeit("D 18x whole-frame SATD", f_d, cur, planes)

    # E: window-local qpel phases (static shifts on windows) +
    #    9 half-pel candidate SATDs from local slices
    from ceracoder_tpu.codec.h265.tables import LUMA_FILTER

    def local_refine(win, curb):
        # win: (NCH, NCW, 24, 24) int32 centered so that integer
        # sample (y, x) of the block is win[..., y+4, x+4]
        w32 = win
        # horizontal then vertical 8-tap for phases {0, 2}
        def phase(fy, fx):
            tv = [int(t) for t in LUMA_FILTER[fy]]
            th = [int(t) for t in LUMA_FILTER[fx]]
            if fx == 0:
                # crop columns symmetrically with the fx != 0 branch's
                # tap window so all candidates share the same
                # horizontal alignment (tmp[p] = integer offset p - 1)
                tmp = w32[..., :, 3:3 + 17] * 64
            else:
                tmp = sum(th[k] * w32[..., :, k:k + 17]
                          for k in range(8))
            if fy == 0:
                acc = tmp[..., 3:3 + 17, :] * 64
            else:
                acc = sum(tv[k] * tmp[..., k:k + 17, :]
                          for k in range(8))
            return jnp.clip((acc + 2048) >> 12, 0, 255)

        ph = {(fy, fx): phase(fy, fx) for fy in (0, 2) for fx in (0, 2)}
        best = jnp.full((NCH, NCW), jnp.iinfo(jnp.int32).max, jnp.int32)
        for k, (dy, dx) in enumerate(
                [(0, 0), (0, -2), (0, 2), (-2, 0), (2, 0),
                 (-2, -2), (-2, 2), (2, -2), (2, 2)]):
            p = ph[(dy & 3, dx & 3)]
            iy = 1 + (dy >> 2)
            ix = 1 + (dx >> 2)
            pred = p[..., iy:iy + 16, ix:ix + 16]
            cost = _satd8_blocks(curb - pred)
            best = jnp.minimum(best, (cost << 4) | k)
        return best

    curb = cur.reshape(NCH, CTB, NCW, CTB).transpose(0, 2, 1, 3)
    f_e = jax.jit(local_refine)
    timeit("E local 4-phase qpel + 9 SATD (half step)", f_e, win, curb)

    return 0


if __name__ == "__main__":
    sys.exit(main())
