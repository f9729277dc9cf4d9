#!/usr/bin/env python
"""Time the whole encode_run_rows executable on device (chiptime: K
runs inside one jit), separating true device time from dispatch +
transfer overhead in the e2e number."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ceracoder_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tools.chiptime import report  # noqa: E402

SIZE = sys.argv[1] if len(sys.argv) > 1 else "1920x1088"
RUN = int(sys.argv[2]) if len(sys.argv) > 2 else 15
W, H = map(int, SIZE.split("x"))
QP = 30


def main():
    from ceracoder_tpu.app.source import DeviceTestPatternSource
    from ceracoder_tpu.ops.h265 import CTB, LEVEL_CHUNK, encode_run_rows

    nch, ncw = H // CTB, W // CTB
    n_ctb = nch * ncw
    cap = -(-(n_ctb * 48) // LEVEL_CHUNK) * LEVEL_CHUNK
    src = DeviceTestPatternSource(W, H, texture=6)
    dummy = jnp.zeros((RUN, 1, 1), jnp.uint8)
    idr = jnp.zeros(RUN, bool)
    qps = jnp.full(RUN, QP, jnp.int32)
    qpcs = jnp.full(RUN, QP, jnp.int32)
    rng = np.random.default_rng(0)
    ry = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    ru = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                     .astype(np.uint8))
    rv = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                     .astype(np.uint8))
    fidx = jnp.arange(RUN, dtype=jnp.int32)

    def run(fi, ry, ru, rv):
        outs = encode_run_rows(dummy, dummy, dummy, idr, qps, qpcs,
                               ry, ru, rv, fi, cap=cap, any_idr=False,
                               deblock=True, sao=False, tu_split=False,
                               source_fn=src.gen_fn)
        return outs["packed"], outs["recon"][0][-1]

    ms = report(f"whole P-run (RUN={RUN})", run, (fidx, ry, ru, rv),
                k=3, perturb=0)
    print(f"  per frame: {ms / RUN:.2f} ms")


if __name__ == "__main__":
    main()
