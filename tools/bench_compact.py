#!/usr/bin/env python
"""Measure compaction strategies on the chip: the current cumsum +
element scatter vs merged single scatter, segment (row) scatter
pre-pass, per-row sort, and raw cumsum cost. Decides the
_compact_levels redesign."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ceracoder_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tools.chiptime import report  # noqa: E402

N_CTB = 8160                  # 1080p
SLOTS = 384
CAP = 1 << 18


def main():
    rng = np.random.default_rng(0)
    # realistic sparsity: ~30K nonzeros across the frame
    flat = np.zeros((N_CTB, SLOTS), np.int16)
    nz = rng.random((N_CTB, SLOTS)) < 0.01
    flat[nz] = rng.integers(-100, 100, nz.sum()).astype(np.int16)
    flat_j = jnp.asarray(flat)

    def cumsum_only(f):
        fm = (f != 0).reshape(-1)
        return jnp.cumsum(fm)[-1]

    report("cumsum 3.1M", cumsum_only, (flat_j,), k=8)

    def scatter2(f):
        fm = f.reshape(-1) != 0
        fv = f.reshape(-1)
        fpos = jnp.tile(jnp.arange(SLOTS, dtype=jnp.int16), N_CTB)
        dst = jnp.cumsum(fm) - 1
        dst = jnp.where(fm, dst, CAP)
        pos = jnp.zeros(CAP + 1, jnp.int16).at[dst].set(
            fpos, mode="drop")
        val = jnp.zeros(CAP + 1, jnp.int16).at[dst].set(
            fv, mode="drop")
        return pos[:CAP].astype(jnp.int32).sum() + val[:CAP].astype(
            jnp.int32).sum()

    report("current: 2x element scatter", scatter2, (flat_j,), k=4)

    def scatter1(f):
        fm = f.reshape(-1) != 0
        fv = f.reshape(-1).astype(jnp.int32) & 0xFFFF
        fpos = jnp.tile(jnp.arange(SLOTS, dtype=jnp.int32), N_CTB)
        packed = (fpos << 16) | fv
        dst = jnp.cumsum(fm) - 1
        dst = jnp.where(fm, dst, CAP)
        out = jnp.zeros(CAP + 1, jnp.int32).at[dst].set(
            packed, mode="drop")
        return out[:CAP].sum()

    report("merged: 1x element scatter", scatter1, (flat_j,), k=4)

    SEG = 128
    NSEG = N_CTB * SLOTS // SEG
    SEGCAP = 4096

    def rowscatter(f):
        segs = f.reshape(NSEG, SEG)
        seg_nz = (segs != 0).any(-1)
        dst = jnp.cumsum(seg_nz) - 1
        dst = jnp.where(seg_nz, dst, SEGCAP)
        out = jnp.zeros((SEGCAP + 1, SEG), jnp.int16).at[dst].set(
            segs, mode="drop")
        ids = jnp.zeros(SEGCAP + 1, jnp.int32).at[dst].set(
            jnp.arange(NSEG, dtype=jnp.int32), mode="drop")
        return (out[:SEGCAP].astype(jnp.int32).sum()
                + ids[:SEGCAP].sum())

    report("segment row scatter (24K rows)", rowscatter, (flat_j,),
           k=4)

    def two_level(f):
        segs = f.reshape(NSEG, SEG)
        seg_nz = (segs != 0).any(-1)
        dstr = jnp.cumsum(seg_nz) - 1
        dstr = jnp.where(seg_nz, dstr, SEGCAP)
        comp = jnp.zeros((SEGCAP + 1, SEG), jnp.int16).at[dstr].set(
            segs, mode="drop")
        ids = jnp.zeros(SEGCAP + 1, jnp.int32).at[dstr].set(
            jnp.arange(NSEG, dtype=jnp.int32), mode="drop")
        # element compaction on the reduced buffer
        red = comp[:SEGCAP].reshape(-1)
        base = (ids[:SEGCAP, None] * SEG
                + jnp.arange(SEG, dtype=jnp.int32)).reshape(-1)
        m = red != 0
        packed = (((base % SLOTS).astype(jnp.int32) << 16)
                  | (red.astype(jnp.int32) & 0xFFFF))
        dst = jnp.cumsum(m) - 1
        dst = jnp.where(m, dst, CAP)
        out = jnp.zeros(CAP + 1, jnp.int32).at[dst].set(
            packed, mode="drop")
        return out[:CAP].sum()

    report("two-level (row + 524K elem)", two_level, (flat_j,), k=4)

    def sort_rows(f):
        # per-CTB-row sort: 68 rows x 46080
        fr = f.reshape(68, -1)
        m = fr != 0
        key = jnp.where(m, jnp.arange(fr.shape[1], dtype=jnp.int32),
                        1 << 30)
        sk, sv = jax.lax.sort_key_val(key, fr, dimension=1)
        return sk[:, :8192].sum() + sv[:, :8192].astype(jnp.int32).sum()

    report("per-row sort (68 x 46K)", sort_rows, (flat_j,), k=4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
