#!/usr/bin/env python
"""Sharded-step measurement on the virtual CPU mesh: the first
throughput numbers for the banded 4K path (VERDICT r4 item 2).

What a virtual mesh CAN measure honestly: the total device work the
banded schedule adds over the single-chip schedule (halo rows recoded
per band seam + psum) and the host entropy stage's absolute speed at
4K. What it CANNOT measure: real ICI latency or real per-chip wall
clock — this host has 4 cores and the 8 "devices" share them. So this
tool reports, per band count N:

  work_factor(N) = t_step(N bands) / t_step(1 band)

on the SAME host resources — compute inflation from halos, the term
that divides ideal N-chip scaling (chip-time(N) ~ work_factor(N)/N x
chip-time(1)) — plus the 4K entropy-stage ms/frame (host C++,
threaded), which is frame-serial and must overlap device compute.

Output: one JSON line per measurement.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("CERACODER_JAX_CACHE_DISABLE", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

W, H = map(int, os.environ.get("CERACODER_BENCH_SIZE",
                               "3840x2160").split("x"))
REPS = int(os.environ.get("CERACODER_BENCH_REPS", "3"))


def frame_pair(ph, pw):
    rng = np.random.default_rng(5)
    base = rng.integers(0, 220, (ph, pw)).astype(np.float32)
    y0 = np.clip(base, 0, 255).astype(np.uint8)
    y1 = np.clip(base + rng.normal(0, 6, (ph, pw)), 0, 255) \
        .astype(np.uint8)
    u = rng.integers(90, 160, (ph // 2, pw // 2)).astype(np.uint8)
    v = rng.integers(90, 160, (ph // 2, pw // 2)).astype(np.uint8)
    return (y0, u, v), (y1, u.copy(), v.copy())


def bench_step(n_bands: int) -> float:
    from ceracoder_tpu.parallel.hevc import hevc_sharded_step_t
    from ceracoder_tpu.parallel.mesh import make_mesh

    CTB = 16
    pw = -(-W // CTB) * CTB
    rows = -(-H // CTB)
    rows = -(-rows // n_bands) * n_bands
    ph = rows * CTB
    (ry, ru, rv), (y, u, v) = frame_pair(ph, pw)
    mesh = make_mesh(n_streams=1, n_rows=n_bands)
    fn = hevc_sharded_step_t(mesh, idr=False, deblock=True)

    args = tuple(jnp.asarray(a)[None] for a in (y, u, v, ry, ru, rv))
    outs, _ = fn(*args, jnp.int32(32), jnp.int32(34))   # compile
    jax.block_until_ready(outs["recon"])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        outs, _ = fn(*args, jnp.int32(32), jnp.int32(34))
        jax.block_until_ready(outs["recon"])
        best = min(best, time.time() - t0)
    return best, outs


def bench_entropy(outs) -> float:
    from ceracoder_tpu.codec.h265.rowslice import entropy_rows_native
    from ceracoder_tpu.codec.h265.syntax import HevcParams

    params = HevcParams(width=W, height=H, qp=32, pcm_enabled=False,
                        deblock=True, max_reorder=0, max_dpb_minus1=1,
                        tile_rows=True, sao=False)
    arrays = {k: np.asarray(outs[k][0]) for k in
              ("is_intra", "mode", "mv", "tu_split", "luma_lv",
               "cb_lv", "cr_lv")}
    r = entropy_rows_native(params, arrays, 32, idr=False, poc=1)
    if r is None:
        return float("nan")
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        entropy_rows_native(params, arrays, 32, idr=False, poc=1)
        best = min(best, time.time() - t0)
    return best


def main():
    t1 = None
    ent_done = False
    for n in (1, 2, 4, 8):
        t, outs = bench_step(n)
        if t1 is None:
            t1 = t
        print(json.dumps({
            "metric": f"{W}x{H}_hevc_sharded_step_{n}band_cpu",
            "value": round(t * 1000, 1), "unit": "ms",
            "work_factor_vs_1band": round(t / t1, 3),
        }), flush=True)
        if not ent_done:
            e = bench_entropy(outs)
            print(json.dumps({
                "metric": f"{W}x{H}_hevc_entropy_stage_host",
                "value": round(e * 1000, 1), "unit": "ms/frame",
            }), flush=True)
            ent_done = True
    return 0


if __name__ == "__main__":
    sys.exit(main())
