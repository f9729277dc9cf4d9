#!/usr/bin/env python
"""Probe of subpel-refine cost structure on the chip: isolates the
gather-MC, SATD formulation (einsum vs butterfly), and selection
logic to find the 554 ms pathology in _refine_subpel."""

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
    _refine_subpel,
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
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return out


def satd8_frame_butterfly(diff):
    """8x8 Hadamard SATD per 16x16 CU via add/sub butterflies
    (3 stages per axis) instead of 8x8 einsum matmuls."""
    h, w = diff.shape

    def hstage(x, axis, half):
        n = x.shape[axis]
        idx0 = [slice(None)] * x.ndim
        idx1 = [slice(None)] * x.ndim
        outs = []
        for s in range(0, n, 2 * half):
            idx0[axis] = slice(s, s + half)
            idx1[axis] = slice(s + half, s + 2 * half)
            a = x[tuple(idx0)]
            b = x[tuple(idx1)]
            outs.append(a + b)
            outs.append(a - b)
        return jnp.concatenate(outs, axis=axis)

    # rows: treat as (h/8, 8, w); butterfly over the 8-axis
    x = diff.reshape(h // 8, 8, w)
    for half in (4, 2, 1):
        x = hstage(x, 1, half)
    x = x.reshape(h, w).reshape(h, w // 8, 8)
    for half in (4, 2, 1):
        x = hstage(x, 2, half)
    s8 = jnp.abs(x).reshape(h // 8, 8, w // 8, 8).sum((1, 3)) >> 2
    return s8.reshape(h // CTB, 2, w // CTB, 2).sum((1, 3))


def main():
    ref_pad = jnp.asarray(rng.integers(
        0, 256, (H + 2 * (PLANE_PAD + 4), W + 2 * (PLANE_PAD + 4))
    ).astype(np.int32))
    cur = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    mv = jnp.asarray(rng.integers(-8, 9, (NCH, NCW, 2)).astype(np.int32))

    planes = jax.jit(_luma_qpel_planes)(ref_pad)
    planes.block_until_ready()

    # 1: current refine (reference point)
    f_ref = jax.jit(lambda c, p, m: _refine_subpel(c, p, m, H, W))
    timeit("1 current _refine_subpel", f_ref, cur, planes, mv, n=3)

    # 2: 18x (gather-MC + einsum SATD), no selection
    def mc_satd(c, p, m):
        tot = jnp.zeros((NCH, NCW), jnp.int32)
        for k in range(18):
            cand = m * 4 + (k % 9) - 4
            pred = _mc_luma_qpel(p, cand, H, W)
            tot += _satd8_frame(c - pred)
        return tot

    timeit("2 18x gather-MC + einsum SATD", jax.jit(mc_satd),
           cur, planes, mv, n=3)

    # 3: 18x (gather-MC + butterfly SATD)
    def mc_satd_b(c, p, m):
        tot = jnp.zeros((NCH, NCW), jnp.int32)
        for k in range(18):
            cand = m * 4 + (k % 9) - 4
            pred = _mc_luma_qpel(p, cand, H, W)
            tot += satd8_frame_butterfly(c - pred)
        return tot

    timeit("3 18x gather-MC + butterfly SATD", jax.jit(mc_satd_b),
           cur, planes, mv, n=3)

    # 4: 18x butterfly SATD alone
    def satd_b(c, p):
        tot = jnp.zeros((NCH, NCW), jnp.int32)
        for k in range(18):
            tot += satd8_frame_butterfly(
                c - p[k % 16, PLANE_PAD:PLANE_PAD + H,
                      PLANE_PAD:PLANE_PAD + W])
        return tot

    timeit("4 18x butterfly SATD alone", jax.jit(satd_b),
           cur, planes, n=3)

    # 5: refine with butterfly SATD + packed-key selection (the full
    #    algorithm, alternative SATD only)
    _SUB_DY = np.array([0, 0, 0, -1, 1, -1, -1, 1, 1], np.int32)
    _SUB_DX = np.array([0, -1, 1, 0, 0, -1, 1, -1, 1], np.int32)

    def refine_b(c, p, m):
        mv_q = m * 4
        for step in (2, 1):
            keys = []
            cands = []
            for k in range(9):
                cand = mv_q + jnp.stack(
                    [jnp.full((NCH, NCW), _SUB_DY[k] * step, jnp.int32),
                     jnp.full((NCH, NCW), _SUB_DX[k] * step, jnp.int32)],
                    axis=-1)
                pred = _mc_luma_qpel(p, cand, H, W)
                cost = satd8_frame_butterfly(c - pred)
                keys.append((cost << 4) | k)
                cands.append(cand)
            keys = jnp.stack(keys)
            cands = jnp.stack(cands)
            best = keys.argmin(0)
            mv_q = jnp.take_along_axis(
                cands, best[None, ..., None], axis=0)[0]
        return mv_q

    timeit("5 refine butterfly + selection", jax.jit(refine_b),
           cur, planes, mv, n=3)

    # 6: einsum SATD 18x alone with int8->int32 matmul dtype hint
    def satd_e(c, p):
        tot = jnp.zeros((NCH, NCW), jnp.int32)
        for k in range(18):
            tot += _satd8_frame(
                c - p[k % 16, PLANE_PAD:PLANE_PAD + H,
                      PLANE_PAD:PLANE_PAD + W])
        return tot

    timeit("6 18x einsum SATD alone", jax.jit(satd_e),
           cur, planes, n=3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
