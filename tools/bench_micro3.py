#!/usr/bin/env python
"""Micro-benchmarks for round-3 optimization candidates:
  1. int32 einsum DCT vs f32 split-matmul DCT
  2. take_along_axis candidate select vs masked-sum select
  3. SATD on int32 vs int16 diffs
  4. window canvas int32 vs int16
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ceracoder_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tools.chiptime import report  # noqa: E402

W, H = 1920, 1088
CTB = 16
R = (H // CTB) * (W // CTB)          # 8160


def main():
    from ceracoder_tpu.codec.h265.tables import T16
    rng = np.random.default_rng(0)
    res = jnp.asarray(rng.integers(-255, 256, (R, 16, 16))
                      .astype(np.int32))
    t16 = jnp.asarray(T16, jnp.int32)
    t16f = jnp.asarray(T16, jnp.float32)

    def fwd_int(r):
        a = (jnp.einsum("ij,...jk->...ik", t16, r,
                        preferred_element_type=jnp.int32) + 4) >> 3
        return (jnp.einsum("...ij,kj->...ik", a, t16,
                           preferred_element_type=jnp.int32)
                + (1 << 9)) >> 10

    def fwd_f32(r):
        # stage 1 exact in f32 (|acc| <= 367k < 2^24)
        a = jnp.einsum("ij,...jk->...ik", t16f, r.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        a = (a.astype(jnp.int32) + 4) >> 3
        # stage 2: split a into 12-bit halves for exactness
        hi = a >> 12
        lo = a - (hi << 12)
        p = (jnp.einsum("...ij,kj->...ik", hi.astype(jnp.float32),
                        t16f).astype(jnp.int32) << 12) + \
            jnp.einsum("...ij,kj->...ik", lo.astype(jnp.float32),
                       t16f).astype(jnp.int32)
        return (p + (1 << 9)) >> 10

    a1 = np.asarray(fwd_int(res))
    a2 = np.asarray(fwd_f32(res))
    print("fwd exact match:", bool((a1 == a2).all()))

    report("fwd DCT16 int32 einsum", fwd_int, (res,), k=8, perturb=0)
    report("fwd DCT16 f32 split", fwd_f32, (res,), k=8, perturb=0)

    # 2. candidate select
    preds = jnp.asarray(rng.integers(0, 256, (R, 12, 16, 16))
                        .astype(np.int32))
    midx = jnp.asarray(rng.integers(0, 12, (R,)).astype(np.int32))

    def sel_gather(m):
        return jnp.take_along_axis(
            preds, m[:, None, None, None], axis=1)[:, 0]

    def sel_mask(m):
        out = jnp.zeros((R, 16, 16), jnp.int32)
        for k in range(12):
            out = out + jnp.where((m == k)[:, None, None],
                                  preds[:, k], 0)
        return out

    print("select match:", bool(
        (np.asarray(sel_gather(midx)) == np.asarray(sel_mask(midx)))
        .all()))
    report("select take_along_axis", sel_gather, (midx,), k=8,
           perturb=0)
    report("select 12-term mask", sel_mask, (midx,), k=8, perturb=0)

    # 3. SATD int32 vs int16
    from ceracoder_tpu.ops.h265 import _satd8_blocks_bf
    d32 = jnp.asarray(rng.integers(-255, 256, (R, 16, 16))
                      .astype(np.int32))
    d16 = d32.astype(jnp.int16)

    def satd16(d):
        # butterflies reach 8*255 = 2040 -> int16 safe until the
        # abs-sum; upcast there
        lead = d.shape[:-2]
        x = d.reshape(*lead, 2, 8, 2, 8)

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
        s8 = jnp.abs(x.astype(jnp.int32)).sum((-1, -3)) >> 2
        return s8.sum((-1, -2))

    print("satd match:", bool(
        (np.asarray(_satd8_blocks_bf(d32)) == np.asarray(satd16(d16)))
        .all()))
    report("SATD8 int32", _satd8_blocks_bf, (d32,), k=8, perturb=0)
    report("SATD8 int16", satd16, (d16,), k=8, perturb=0)

    # 4. window canvas int32 vs int16
    from ceracoder_tpu.ops.h265 import (
        LUMA_SRC_PAD,
        MV_FULL_MAX,
        WIN_L,
        _window_canvas_dev,
    )
    ref = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    ref_pad = jnp.pad(ref, LUMA_SRC_PAD, mode="edge")
    off = jnp.asarray(rng.integers(-(MV_FULL_MAX - 1), MV_FULL_MAX,
                                   (H // CTB, W // CTB, 2))
                      .astype(np.int32))
    report("window canvas int32",
           lambda o: _window_canvas_dev(ref_pad, o, CTB, WIN_L, -5,
                                        -(MV_FULL_MAX - 1),
                                        MV_FULL_MAX - 1,
                                        LUMA_SRC_PAD),
           (off,), k=4, perturb=0)
    ref_pad16 = ref_pad.astype(jnp.int16)
    report("window canvas int16",
           lambda o: _window_canvas_dev(ref_pad16, o, CTB, WIN_L, -5,
                                        -(MV_FULL_MAX - 1),
                                        MV_FULL_MAX - 1,
                                        LUMA_SRC_PAD),
           (off,), k=4, perturb=0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
