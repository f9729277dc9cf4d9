#!/usr/bin/env python
"""Per-stage timing of the HEVC device path on the real chip.

Stages jitted separately to isolate costs (the run dispatch fuses
them); then end-to-end encoder fps (single-frame async and fused run
dispatch). Run: python tools/profile_hevc.py [WxH]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ceracoder_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SIZE = sys.argv[1] if len(sys.argv) > 1 else "1920x1088"
W, H = map(int, SIZE.split("x"))
QP = 30


def planes(seed):
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, (H, W)).astype(np.uint8)
    y = ((base.astype(np.int32) * 3
          + r.integers(0, 64, (H, W))) // 4).astype(np.uint8)
    return (y, r.integers(0, 256, (H // 2, W // 2)).astype(np.uint8),
            r.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))


def timeit(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return out


def main():
    from ceracoder_tpu.ops.h265 import (
        LUMA_SRC_PAD,
        PLANE_PAD,
        _compact_levels,
        _luma_qpel_planes,
        _mc_luma_qpel,
        _refine_subpel,
        deblock_frame_dev,
        encode_frame_i_rows,
        encode_frame_p_rows,
        motion_search_dev,
    )

    y0, u0, v0 = (jnp.asarray(p) for p in planes(0))
    y1, u1, v1 = (jnp.asarray(p) for p in planes(1))

    outs_i = timeit("I-frame op", encode_frame_i_rows,
                    y0, u0, v0, QP, QP - 1)
    ref = outs_i["recon"]

    ry_pad = jnp.pad(ref[0].astype(jnp.int32), LUMA_SRC_PAD,
                     mode="edge")
    f_planes = jax.jit(_luma_qpel_planes)
    pl = timeit("qpel planes (16)", f_planes, ry_pad)

    y1i = y1.astype(jnp.int32)
    f_ms = jax.jit(lambda c, rp: motion_search_dev(c, ref_pad=rp,
                                                   pad=PLANE_PAD))
    mv = timeit("full-pel search (289)", f_ms, y1i, pl[0])

    f_ref = jax.jit(lambda c, p_, m: _refine_subpel(c, p_, m, H, W))
    mvq = timeit("subpel refine (18 SATD)", f_ref, y1i, pl, mv)

    f_mc = jax.jit(lambda p_, m: _mc_luma_qpel(p_, m, H, W))
    timeit("luma MC gather", f_mc, pl, mvq)

    outs_p = timeit("P-frame op (full)", encode_frame_p_rows,
                    y1, u1, v1, *ref, QP, QP - 1)

    cbf = outs_p["luma_lv"].reshape(
        *outs_p["luma_lv"].shape[:2], -1).any(-1)
    f_db = jax.jit(deblock_frame_dev)
    timeit("deblock", f_db, *outs_p["recon"], outs_p["is_intra"], cbf,
           outs_p["mv"], QP, None)

    f_cp = jax.jit(lambda a, b, c: _compact_levels(a, b, c, 1 << 18))
    timeit("level compaction", f_cp, outs_p["luma_lv"],
           outs_p["cb_lv"], outs_p["cr_lv"])

    # end-to-end
    from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
    enc = H265DeviceEncoder(W, H, qp=QP, gop=60)
    src = [planes(2 + i % 3) for i in range(12)]
    enc.encode_frame(*src[0])
    enc.encode_frame(*src[1])
    t0 = time.time()
    pend = []
    nb = 0
    for i in range(12):
        pend.append(enc.encode_frame_async(*src[i]))
        if len(pend) >= 4:
            nb += len(pend.pop(0).result().data)
    while pend:
        nb += len(pend.pop(0).result().data)
    dt = (time.time() - t0) / 12
    print(f"{'e2e single-frame async':28s} {dt * 1000:8.2f} ms/frame "
          f"({1 / dt:.1f} fps), {nb // 12} B/frame", flush=True)

    from ceracoder_tpu.app.source import DeviceTestPatternSource
    dsrc = DeviceTestPatternSource(W, H, texture=6)
    enc2 = H265DeviceEncoder(W, H, qp=QP, gop=60)
    for p in enc2.encode_run_async(source=dsrc, indices=range(15)):
        p.result()
    for p in enc2.encode_run_async(source=dsrc, indices=range(15, 30)):
        p.result()
    enc3 = H265DeviceEncoder(W, H, qp=QP, gop=60)
    t0 = time.time()
    pend = []
    nb = 0
    for s in range(8):
        new = enc3.encode_run_async(source=dsrc,
                                    indices=range(s * 15, s * 15 + 15))
        nb += sum(len(p.result().data) for p in pend)
        pend = new
    nb += sum(len(p.result().data) for p in pend)
    dt = (time.time() - t0) / 120
    print(f"{'e2e run dispatch (15/run)':28s} {dt * 1000:8.2f} ms/frame "
          f"({1 / dt:.1f} fps), {nb // 120} B/frame", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
