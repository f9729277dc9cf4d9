#!/usr/bin/env python
"""Per-stage HEVC timing with the trustworthy chiptime harness
(tools/chiptime.py): per-op device cost at 1080p, measured as
(T_loopK - T_loop0)/K with a single 4-byte materialization."""

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
    from ceracoder_tpu.ops.h265 import (
        CTB,
        LUMA_SRC_PAD,
        PLANE_PAD,
        _compact_levels,
        _i_frame_core,
        _luma_qpel_planes,
        _mc_chroma_qpel,
        _mc_luma_qpel,
        _p_frame_core,
        _refine_subpel,
        deblock_frame_dev,
        motion_search_dev,
    )

    nch, ncw = H // CTB, W // CTB
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                    .astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                    .astype(np.uint8))
    ry = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    ru = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                     .astype(np.uint8))
    rv = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                     .astype(np.uint8))
    cur = y.astype(jnp.int32)
    mv = jnp.asarray(rng.integers(-8, 9, (nch, ncw, 2))
                     .astype(np.int32))
    mvq = mv * 4 + jnp.asarray(rng.integers(-2, 3, (nch, ncw, 2))
                               .astype(np.int32))

    ry_pad = jnp.pad(ry.astype(jnp.int32), LUMA_SRC_PAD, mode="edge")
    planes = jax.jit(_luma_qpel_planes)(ry_pad)
    np.asarray(planes[0, 0, 0])

    report("I-frame op", lambda yy, uu, vv: _i_frame_core(
        yy, uu, vv, QP, QP - 1), (cur, u.astype(jnp.int32),
                                  v.astype(jnp.int32)), k=4)
    report("P-frame op (full)",
           lambda yy: _p_frame_core(yy, u, v, ry, ru, rv, QP, QP - 1),
           (y,), k=4)
    report("qpel planes (16)", _luma_qpel_planes, (ry_pad,), k=4)
    report("full-pel search (289)",
           lambda c, rp: motion_search_dev(c, ref_pad=rp,
                                           pad=PLANE_PAD),
           (cur, planes[0]), k=4)
    report("subpel refine (18 SATD)",
           lambda c, m: _refine_subpel(c, planes, m, H, W),
           (cur, mv), k=4, perturb=1)
    report("luma MC gather",
           lambda m: _mc_luma_qpel(planes, m, H, W), (mvq,), k=8)
    ru_pad = jnp.pad(ru, 6, mode="edge")
    report("chroma MC (one plane)",
           lambda m: _mc_chroma_qpel(ru_pad, m, H // 2, W // 2),
           (mvq,), k=8)
    cbf = jnp.asarray(rng.integers(0, 2, (nch, ncw)).astype(bool))
    isin = jnp.asarray(rng.integers(0, 2, (nch, ncw)).astype(bool))
    report("deblock",
           lambda yy: deblock_frame_dev(yy, ru, rv, isin, cbf, mvq,
                                        QP, None),
           (ry,), k=4)
    lv = jnp.asarray(rng.integers(-2, 3, (nch, ncw, CTB, CTB))
                     .astype(np.int32))
    lvc = jnp.asarray(rng.integers(-2, 3, (nch, ncw, 8, 8))
                      .astype(np.int32))
    report("level compaction",
           lambda a: _compact_levels(a, lvc, lvc, 1 << 18), (lv,), k=4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
