"""Variable-length bitstream window merging.

The entropy stage (device_entropy.py) reduces each row's symbol stream
to per-chunk word-window partials: chunk c's symbols contribute ORable
(add-as-or, bit-disjoint) values to a WIN-word window starting at the
chunk's first word sw[c]. What remains is the merge

    words[r, sw[r,c] : sw[r,c]+WIN] += partials[r,c]   for every chunk

whose offsets are data-dependent — a scatter. XLA TPU scatters cost
~67 ms/frame and gather-based range-sum workarounds ~25 ms (measured).

Two implementations:

- `tree_merge` (default): a fully vectorized binary merge tree. Each
  level pairs adjacent windows and adds the right window rolled right
  by its start delta; a dynamic per-pair roll is expressed as
  log2(width) CONDITIONAL STATIC rolls (select between x and
  roll(x, 2^b) on bit b of the delta), which the VPU executes as dense
  elementwise work with no serialization. ~1.2 ms/frame at 1080p vs
  4.7 ms for the serial Pallas kernel (measured; the kernel's
  per-chunk fori_loop is latency-bound at 864 tiny iterations).
  Wrap-around cannot occur below the capacity cap: a pair's delta is
  the left group's total span, and level width grows as 2w+2 >= span
  of either group; rows that do overflow the cap are flagged by the
  caller's bit-count check and take the exact host fallback.

- `merge_windows`: the original Pallas kernel (kept as a reference
  implementation and cross-check; the window buffer lives in VMEM and
  windows are placed via aligned 256-lane slices plus a dynamic lane
  roll).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 64           # partial window width (words); chunk span must fit
ROWS_PER_PROGRAM = 8


def tree_merge(sw, partials, capw_pad: int):
    """words[r, sw[r,c] : +W] += partials[r,c] via a vectorized binary
    merge tree. sw: (R, nch) int32 sorted start words (sw[:, 0] == 0);
    partials: (R, nch, W) uint32. Returns (R, capw_pad) uint32."""
    x = partials.astype(jnp.uint32)
    starts = sw.astype(jnp.int32)
    rows, nwin, w = x.shape
    while nwin > 1:
        if nwin % 2:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
            starts = jnp.concatenate([starts, starts[:, -1:] + w], axis=1)
            nwin += 1
        left, right = x[:, 0::2], x[:, 1::2]
        sl, sr = starts[:, 0::2], starts[:, 1::2]
        delta = sr - sl
        neww = min(2 * w + 2, capw_pad)
        left = jnp.pad(left, ((0, 0), (0, 0), (0, neww - w)))
        right = jnp.pad(right, ((0, 0), (0, 0), (0, neww - w)))
        for b in range(max(1, int(np.ceil(np.log2(neww))))):
            bit = (delta >> b) & 1
            rolled = jnp.roll(right, 1 << b, axis=-1)
            right = jnp.where((bit == 1)[..., None], rolled, right)
        x = left + right
        starts = sl
        w = neww
        nwin //= 2
    out = jnp.zeros((rows, capw_pad), jnp.uint32)
    return out.at[:, :w].set(x[:, 0, :])


def _dyn_roll_lanes(x, d):
    """Roll (1, N) lanes right by dynamic d in [0, 128) via conditional
    power-of-two rolls (Mosaic has no dynamic-shift roll)."""
    for k in range(7):
        bit = (d >> k) & 1
        rolled = pltpu.roll(x, shift=1 << k, axis=1)
        x = jnp.where(bit == 1, rolled, x)
    return x


def _merge_kernel(sw_ref, partials_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    nch = partials_ref.shape[1]
    capw_pad = out_ref.shape[1]

    def one_row(row):
        def body(c, _):
            base = sw_ref[row, c]
            al = jnp.minimum((base // 128) * 128, capw_pad - 2 * WIN)
            al = pl.multiple_of(al, 128)
            d = base - al      # < 128 unless the row overflows capacity
            part = partials_ref[row, pl.ds(c, 1), :]       # (1, WIN)
            win = jnp.concatenate([part, jnp.zeros_like(part)], axis=1)
            win = _dyn_roll_lanes(win, d)
            cur = out_ref[row:row + 1, pl.ds(al, 2 * WIN)]
            out_ref[row:row + 1, pl.ds(al, 2 * WIN)] = cur + win
            return 0
        jax.lax.fori_loop(0, nch, body, 0)

    for row in range(ROWS_PER_PROGRAM):
        one_row(row)


@functools.partial(jax.jit, static_argnames=("capw_pad",))
def merge_windows(sw, partials, capw_pad: int):
    """words[r, sw[r,c] : +WIN] += partials[r,c] for all chunks.

    sw: (R, nch) int32 sorted window start words; partials: (R, nch,
    WIN) uint32. Returns (R, capw_pad) uint32. capw_pad must be a
    multiple of 128 and at least 4*WIN. Pads R to a multiple of 8 and
    nch to a multiple of 8 internally.
    """
    r, nch = sw.shape
    rp = -(-r // ROWS_PER_PROGRAM) * ROWS_PER_PROGRAM
    nchp = -(-nch // 8) * 8
    if rp != r or nchp != nch:
        sw = jnp.pad(sw, ((0, rp - r), (0, nchp - nch)))
        partials = jnp.pad(partials,
                           ((0, rp - r), (0, nchp - nch), (0, 0)))
    grid = rp // ROWS_PER_PROGRAM
    out = pl.pallas_call(
        _merge_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_PROGRAM, nchp), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS_PER_PROGRAM, nchp, WIN),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS_PER_PROGRAM, capw_pad),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, capw_pad), jnp.uint32),
        interpret=jax.default_backend() == "cpu",
    )(sw, partials)
    return out[:r]
