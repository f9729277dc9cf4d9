#!/usr/bin/env python
"""Run-level stage breakdown at 1080p: time the pieces of the
encode_run_rows scan body (source gen, P core, intra-fallback tail
sub-pieces, deblock, compaction) with the chiptime harness so the
41.77 fps -> 60 fps gap can be attributed.

Run: python tools/profile_run_stages.py [WxH]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ceracoder_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tools.chiptime import report  # noqa: E402

SIZE = sys.argv[1] if len(sys.argv) > 1 else "1920x1088"
W, H = map(int, SIZE.split("x"))
QP = 30


def main():
    from ceracoder_tpu.app.source import DeviceTestPatternSource
    from ceracoder_tpu.codec.h265.sao import SAO_LAMBDA  # noqa: F401
    from ceracoder_tpu.ops.h265 import (
        CTB,
        LUMA_SRC_PAD,
        _code_tu,
        _col_view,
        _compact_levels,
        _intra_preds,
        _inter_frame_tail,
        _motion_luma_dev,
        _p_frame_core,
        _satd8_blocks,
        _satd8_frame,
        deblock_frame_dev,
    )
    from ceracoder_tpu.codec.h265.tables import T8, T16

    nch, ncw = H // CTB, W // CTB
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                    .astype(np.int32))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                    .astype(np.int32))
    ry = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    ru = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                     .astype(np.uint8))
    rv = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                     .astype(np.uint8))
    pred_y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    pred_u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                         .astype(np.int32))
    pred_v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                         .astype(np.int32))

    src = DeviceTestPatternSource(W, H, texture=6)
    report("source gen_fn", lambda i: src.gen_fn(i),
           (jnp.int32(3),), k=8, perturb=0)

    report("P-frame core", lambda yy: _p_frame_core(
        yy, u, v, ry, ru, rv, QP, QP - 1), (y,), k=4, perturb=0)

    ry_pad = jnp.pad(ry.astype(jnp.int32), LUMA_SRC_PAD, mode="edge")
    report("  motion (search+refine+MC luma)",
           lambda yy: _motion_luma_dev(yy, ry_pad, LUMA_SRC_PAD),
           (y,), k=4, perturb=0)

    report("  inter tail (dual-code + fallback)",
           lambda yy: _inter_frame_tail(yy, u, v, pred_y, pred_u,
                                        pred_v, QP, QP - 1),
           (y,), k=4, perturb=0)

    # tail sub-pieces
    t16 = jnp.asarray(T16, jnp.int32)
    t8 = jnp.asarray(T8, jnp.int32)
    report("    inter SATD map",
           lambda yy: _satd8_frame(yy - pred_y), (y,), k=8, perturb=0)
    report("    code inter TUs (y+u+v)",
           lambda yy: (_code_tu(_col_view(yy, CTB),
                                _col_view(pred_y, CTB), QP, t16, 4,
                                intra=False),
                       _code_tu(_col_view(u, CTB // 2),
                                _col_view(pred_u, CTB // 2), QP - 1,
                                t8, 3, intra=False),
                       _code_tu(_col_view(v, CTB // 2),
                                _col_view(pred_v, CTB // 2), QP - 1,
                                t8, 3, intra=False)),
           (y,), k=4, perturb=0)

    r = ncw * nch
    left = jnp.asarray(rng.integers(0, 256, (r, CTB)).astype(np.int32))
    sy = _col_view(y, CTB).reshape(r, CTB, CTB)
    report("    intra preds (12 cand)",
           lambda l: _intra_preds(l, CTB, luma=True), (left,), k=4,
           perturb=0)
    preds = _intra_preds(left, CTB, luma=True)
    report("    intra cand SATD (R,12)",
           lambda p: _satd8_blocks(sy[:, None] - p), (preds,), k=4,
           perturb=0)
    best = preds[:, 0]
    report("    code intra TUs (y)",
           lambda b: _code_tu(sy, b, QP, t16, 4), (best,), k=4,
           perturb=0)

    cbf = jnp.asarray(rng.integers(0, 2, (nch, ncw)).astype(bool))
    isin = jnp.asarray(rng.integers(0, 2, (nch, ncw)).astype(bool))
    mvq = jnp.asarray(rng.integers(-32, 33, (nch, ncw, 2))
                      .astype(np.int32))
    report("deblock", lambda yy: deblock_frame_dev(
        yy, ru, rv, isin, cbf, mvq, QP, None), (ry,), k=4, perturb=0)

    lv = jnp.asarray(rng.integers(-2, 3, (nch, ncw, CTB, CTB))
                     .astype(np.int32))
    lvc = jnp.asarray(rng.integers(-2, 3, (nch, ncw, 8, 8))
                      .astype(np.int32))
    cap = max(2 * 32768, r * 48)
    cap = -(-cap // 32768) * 32768
    report("level compaction", lambda a: _compact_levels(
        a, lvc, lvc, cap), (lv,), k=4, perturb=0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
