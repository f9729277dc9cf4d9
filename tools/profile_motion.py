#!/usr/bin/env python
"""Motion sub-stage timing at 1080p (chiptime harness): attribute the
~7 ms motion budget across coarse search, window canvas, full-pel
refine, phase build, subpel refine, and chroma MC."""

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


def main():
    from ceracoder_tpu.ops.h265 import (
        CHROMA_PAD,
        CTB,
        LUMA_SRC_PAD,
        MV_FULL_MAX,
        WIN_L,
        _blocks_t,
        _coarse_search_dev,
        _down2_dev,
        _fullpel_refine_dev,
        _mc_chroma_window,
        _motion_luma_dev,
        _subpel_refine_local,
        _window_canvas_t,
        _window_phases14,
    )

    rng = np.random.default_rng(0)
    nch, ncw = H // CTB, W // CTB
    cur = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    ref = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    ref_pad = jnp.pad(ref, LUMA_SRC_PAD, mode="edge")
    refc = jnp.asarray(
        rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))
    refc_pad = jnp.pad(refc, CHROMA_PAD, mode="edge")

    cur_h = _down2_dev(cur).astype(jnp.int16)
    ref_ext = ref_pad[LUMA_SRC_PAD - 8:LUMA_SRC_PAD + H + 8,
                      LUMA_SRC_PAD - 8:LUMA_SRC_PAD + W + 8]
    ref_h_pad = _down2_dev(ref_ext).astype(jnp.int16)
    mv0 = jnp.asarray(
        rng.integers(-(MV_FULL_MAX - 1), MV_FULL_MAX, (nch, ncw, 2))
        .astype(np.int32))
    mv_q = jnp.asarray(
        rng.integers(-31, 32, (nch, ncw, 2)).astype(np.int32))
    e = _window_canvas_t(ref_pad.astype(jnp.int16), mv0, blk=CTB,
                         win=WIN_L, orig=-5, lo=-(MV_FULL_MAX - 1),
                         hi=MV_FULL_MAX - 1, pad=LUMA_SRC_PAD)
    cur_t = _blocks_t(cur, CTB)
    _, w24 = _fullpel_refine_dev(cur_t, e)
    ph14 = jax.jit(_window_phases14)(w24)
    ph14 = jax.block_until_ready(ph14)

    report("whole _motion_luma_dev",
           lambda c, r: _motion_luma_dev(c, r, LUMA_SRC_PAD),
           (cur, ref_pad), k=4)
    report("coarse search", _coarse_search_dev, (cur_h, ref_h_pad),
           k=8)
    report("window canvas (luma)",
           lambda rp, m: _window_canvas_t(
               rp, m, blk=CTB, win=WIN_L, orig=-5,
               lo=-(MV_FULL_MAX - 1), hi=MV_FULL_MAX - 1,
               pad=LUMA_SRC_PAD),
           (ref_pad.astype(jnp.int16), mv0), k=8, perturb=1)
    report("full-pel refine", _fullpel_refine_dev, (cur_t, e), k=8)
    report("phases14 build", _window_phases14, (w24,), k=8)
    report("subpel refine local", _subpel_refine_local,
           (cur_t, ph14), k=4)
    report("chroma MC window (one plane)",
           lambda rp, m: _mc_chroma_window(rp, m, CHROMA_PAD),
           (refc_pad, mv_q), k=8, perturb=1)


if __name__ == "__main__":
    main()
