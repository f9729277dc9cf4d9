"""Per-stage timing of the P-frame encode path on the real chip.

Each stage is jitted separately and timed steady-state (the full
pipeline fuses them into one dispatch; this isolates where the time
goes). Run: python tools/profile_stages.py
"""
import time

import numpy as np

from ceracoder_tpu.utils.jaxenv import setup_jax

setup_jax()

import jax                                                # noqa: E402
import jax.numpy as jnp                                   # noqa: E402

from ceracoder_tpu.codec.h264.device_entropy import (     # noqa: E402
    assemble_p_slots, pack_frame)
from ceracoder_tpu.ops.deblock import deblock_frame_rows  # noqa: E402
from ceracoder_tpu.ops.inter import encode_frame_p        # noqa: E402
from ceracoder_tpu.ops.intra import encode_frame_i16_rows # noqa: E402

W, H = 1920, 1088
QP = 28
rng = np.random.default_rng(0)


def planes(seed):
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, (H, W)).astype(np.uint8)
    y = ((base.astype(np.int32) * 3 + r.integers(0, 64, (H, W))) // 4)
    return (y.astype(np.uint8),
            r.integers(0, 256, (H // 2, W // 2)).astype(np.uint8),
            r.integers(0, 256, (H // 2, W // 2)).astype(np.uint8))


def timeit(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:24s} {dt:8.2f} ms")
    return out


y0, u0, v0 = (jnp.asarray(p) for p in planes(0))
y1, u1, v1 = (jnp.asarray(p) for p in planes(1))

f_i = jax.jit(lambda y, u, v: encode_frame_i16_rows(y, u, v, QP, QP))
outs_i = timeit("I-compute", f_i, y0, u0, v0)
ref = outs_i["recon"]

f_p = jax.jit(lambda y, u, v, ry, ru, rv:
              encode_frame_p(y, u, v, ry, ru, rv, QP, QP))
outs_p = timeit("P-compute", f_p, y1, u1, v1, *ref)

nnz44 = (outs_p["luma_levels"] != 0).any(-1).astype(jnp.int32)
f_db = jax.jit(lambda r, nz, mv: deblock_frame_rows(
    *r, nz, mv, QP, QP, intra_frame=False))
timeit("deblock", f_db, outs_p["recon"], nnz44, outs_p["mv"])

outs_p_nr = {k: v for k, v in outs_p.items() if k != "recon"}
f_as = jax.jit(assemble_p_slots)
mb = timeit("assemble_p_slots", f_as, outs_p_nr)

mbh = H // 16
hv = jnp.zeros((mbh, 24), jnp.uint32)
hl = jnp.zeros((mbh, 24), jnp.int32)
capw = max(2048, (W // 16) * 192) // 4
totcap = max(1 << 16, W * H // 6)
totcap = -(-totcap // (8192 * 4)) * (8192 * 4)
f_pk = jax.jit(lambda hv, hl, mv_, ml: pack_frame(
    hv, hl, mv_, ml, capw, totcap))
timeit("pack_frame", f_pk, hv, hl, mb[0], mb[1])
