"""H.264 integer transforms and quantization (spec 8.5; JAX, batched).

All functions operate on batches of 4x4 blocks: shape (..., 4, 4), int32.
They are pure jnp, jittable and vmappable, and are used by BOTH the
encoder's reconstruction loop and the verification decoder — bit-exact
integer math throughout (SURVEY.md §7.3 hard part #2). The decode-side
functions follow the spec section noted on each; encode-side quant follows
the standard JM/x264 convention (not normative, but the de-facto pairing).

Replaces the transform stage of the external encoders the reference
delegated to (reference: pipeline/ x264enc/nvv4l2h265enc elements;
SURVEY.md §2.2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------

# Forward transform matrix Cf (applied as Cf @ X @ Cf.T)
CF = np.array([[1, 1, 1, 1],
               [2, 1, -1, -2],
               [1, -1, -1, 1],
               [1, -2, 2, -1]], dtype=np.int32)

# 4x4 Hadamard for Intra_16x16 luma DC
H4 = np.array([[1, 1, 1, 1],
               [1, 1, -1, -1],
               [1, -1, -1, 1],
               [1, -1, 1, -1]], dtype=np.int32)

# Position classes for quant tables: 0 = (0,0),(0,2),(2,0),(2,2);
# 1 = (1,1),(1,3),(3,1),(3,3); 2 = the rest.
_POS_CLASS = np.array([[0, 2, 0, 2],
                       [2, 1, 2, 1],
                       [0, 2, 0, 2],
                       [2, 1, 2, 1]], dtype=np.int32)

# Encoder quant multipliers MF[qp%6][class]
_MF_CLASS = np.array([[13107, 5243, 8066],
                      [11916, 4660, 7490],
                      [10082, 4194, 6554],
                      [9362, 3647, 5825],
                      [8192, 3355, 5243],
                      [7282, 2893, 4559]], dtype=np.int64)

# Decoder dequant scale V[qp%6][class] (spec normAdjust4x4, table 8-15 class
# values {10..18}/{16..29}/{13..23})
_V_CLASS = np.array([[10, 16, 13],
                     [11, 18, 14],
                     [13, 20, 16],
                     [14, 23, 18],
                     [16, 25, 20],
                     [18, 29, 23]], dtype=np.int32)

MF = _MF_CLASS[:, _POS_CLASS]          # (6, 4, 4)
V = _V_CLASS[:, _POS_CLASS]            # (6, 4, 4)

# Chroma QP mapping (spec table 8-15 / QPc from qPI)
_CHROMA_QP = np.concatenate([
    np.arange(30),
    np.array([29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
              38, 38, 38, 39, 39, 39, 39]),
]).astype(np.int32)

# 4x4 zigzag scan (spec 8.5.6), as flat indices into a row-major 4x4 block
ZIGZAG4x4 = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15],
                     dtype=np.int32)


def chroma_qp(qp_luma: int, offset: int = 0) -> int:
    qpi = int(np.clip(qp_luma + offset, 0, 51))
    return int(_CHROMA_QP[qpi])


# ---------------------------------------------------------------------------
# Core 4x4 transform
# ---------------------------------------------------------------------------

def _fdct4_last(x: jnp.ndarray) -> jnp.ndarray:
    """Apply Cf along the last axis as an add/shift butterfly.

    Written as explicit adds rather than a matmul: batched tiny integer
    matmuls get lowered through the MXU float path on TPU, which is both
    slower and (observed on the axon platform) not exact; the butterfly
    stays on the VPU in int32 and is bit-exact by construction.
    """
    x0, x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    s0, s3 = x0 + x3, x0 - x3
    s1, s2 = x1 + x2, x1 - x2
    return jnp.stack([s0 + s1, 2 * s3 + s2, s0 - s1, s3 - 2 * s2], axis=-1)


def fdct4(x: jnp.ndarray) -> jnp.ndarray:
    """Forward 4x4 core transform: Cf @ X @ Cf.T (exact integer)."""
    x = x.astype(jnp.int32)
    t = _fdct4_last(x.swapaxes(-1, -2)).swapaxes(-1, -2)
    return _fdct4_last(t)


def quant4(coef: jnp.ndarray, qp: jnp.ndarray, intra: bool = True) -> jnp.ndarray:
    """Scalar quant of 4x4 core coefficients (JM convention).

    Z = sign(W) * ((|W| * MF[qp%6] + f) >> qbits), qbits = 15 + qp/6,
    f = (1<<qbits)/3 intra, /6 inter.
    """
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    mf = jnp.asarray(MF)[qp % 6]
    f = (jnp.int32(1) << qbits) // (3 if intra else 6)
    w = coef.astype(jnp.int32)
    mag = (jnp.abs(w) * mf + f) >> qbits
    return (jnp.sign(w) * mag).astype(jnp.int32)


def dequant4(z: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """Dequant of 4x4 core coefficients (spec 8.5.12.1, flat scaling list):
    d = z * V[qp%6] << (qp/6)."""
    qp = jnp.asarray(qp, jnp.int32)
    v = jnp.asarray(V)[qp % 6]
    return (z.astype(jnp.int32) * v) << (qp // 6)


def idct4(d: jnp.ndarray) -> jnp.ndarray:
    """Inverse 4x4 core transform with spec-exact butterflies and
    rounding (spec 8.5.12.2). Input dequantized coefs, output residual."""
    d = d.astype(jnp.int32)
    # horizontal (within each row)
    d0, d1, d2, d3 = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    e0 = d0 + d2
    e1 = d0 - d2
    e2 = (d1 >> 1) - d3
    e3 = d1 + (d3 >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    # vertical (within each column)
    f0, f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :], f[..., 3, :]
    g0 = f0 + f2
    g1 = f0 - f2
    g2 = (f1 >> 1) - f3
    g3 = f1 + (f3 >> 1)
    h = jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


# ---------------------------------------------------------------------------
# Intra_16x16 luma DC path (spec 8.5.10)
# ---------------------------------------------------------------------------

def _had4_last(x: jnp.ndarray) -> jnp.ndarray:
    """Apply H4 along the last axis (butterfly; see _fdct4_last)."""
    x0, x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    a, b = x0 + x1, x2 + x3
    c, d = x0 - x1, x2 - x3
    return jnp.stack([a + b, a - b, c - d, c + d], axis=-1)


def _had4_2d(x: jnp.ndarray) -> jnp.ndarray:
    """H4 @ X @ H4.T (H4 is symmetric)."""
    x = x.astype(jnp.int32)
    return _had4_last(_had4_last(x.swapaxes(-1, -2)).swapaxes(-1, -2))


def hadamard4_fwd(dc: jnp.ndarray) -> jnp.ndarray:
    """Forward 4x4 Hadamard on the 16 luma DC coefficients, with the
    JM /2 scaling."""
    return _had4_2d(dc) // 2


def quant_dc4(wdc: jnp.ndarray, qp: jnp.ndarray, intra: bool = True) -> jnp.ndarray:
    """Quant of Hadamard-transformed luma DC: uses MF(0,0) and qbits+1."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    mf00 = jnp.asarray(_MF_CLASS)[qp % 6, 0]
    f = ((jnp.int32(1) << qbits) // (3 if intra else 6)) * 2
    w = wdc.astype(jnp.int32)
    mag = (jnp.abs(w) * mf00 + f) >> (qbits + 1)
    return (jnp.sign(w) * mag).astype(jnp.int32)


def dequant_dc4(zdc: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """Decode-side luma DC: inverse Hadamard THEN scaling (spec 8.5.10).

    Returns the dequantized DC value for each 4x4 block, to be placed at
    position (0,0) before dequant-AC + idct4 of each block.
    """
    qp = jnp.asarray(qp, jnp.int32)
    f = _had4_2d(zdc)
    ls = jnp.asarray(_V_CLASS)[qp % 6, 0] * 16  # LevelScale4x4(m,0,0), flat list
    m = qp // 6
    f64 = f.astype(jnp.int32)
    hi = (f64 * ls) << jnp.maximum(m - 6, 0)
    lo = (f64 * ls + (jnp.int32(1) << jnp.maximum(5 - m, 0))) >> jnp.maximum(6 - m, 0)
    return jnp.where(m >= 6, hi, lo).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Chroma DC path (spec 8.5.11), 4:2:0 — 2x2 DC per chroma component
# ---------------------------------------------------------------------------

def _had2_2d(x: jnp.ndarray) -> jnp.ndarray:
    """H2 @ X @ H2.T as butterflies (see _fdct4_last for why)."""
    x = x.astype(jnp.int32)
    a = x[..., 0, :] + x[..., 1, :]
    b = x[..., 0, :] - x[..., 1, :]
    return jnp.stack([
        jnp.stack([a[..., 0] + a[..., 1], a[..., 0] - a[..., 1]], axis=-1),
        jnp.stack([b[..., 0] + b[..., 1], b[..., 0] - b[..., 1]], axis=-1),
    ], axis=-2)


def hadamard2_fwd(dc: jnp.ndarray) -> jnp.ndarray:
    """Forward 2x2 Hadamard on chroma DC (shape (..., 2, 2))."""
    return _had2_2d(dc)


def quant_dc2(wdc: jnp.ndarray, qp: jnp.ndarray, intra: bool = True) -> jnp.ndarray:
    """Quant of 2x2 chroma DC: MF(0,0), qbits+1 (JM convention)."""
    return quant_dc4(wdc, qp, intra)


def dequant_dc2(zdc: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """Decode-side chroma DC: inverse 2x2 Hadamard then scale
    (spec 8.5.11): dcC = ((f * LevelScale(m,0,0)) << (qp/6)) >> 5."""
    qp = jnp.asarray(qp, jnp.int32)
    f = _had2_2d(zdc)
    ls = jnp.asarray(_V_CLASS)[qp % 6, 0] * 16
    return ((f.astype(jnp.int32) * ls) << (qp // 6) >> 5).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Block (de)composition helpers
# ---------------------------------------------------------------------------

def to_blocks4(plane: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H//4, W//4, 4, 4) row-major 4x4 blocks."""
    h, w = plane.shape[-2:]
    x = plane.reshape(*plane.shape[:-2], h // 4, 4, w // 4, 4)
    return jnp.swapaxes(x, -3, -2)


def from_blocks4(blocks: jnp.ndarray) -> jnp.ndarray:
    """(H//4, W//4, 4, 4) -> (H, W)."""
    nbh, nbw = blocks.shape[-4], blocks.shape[-3]
    x = jnp.swapaxes(blocks, -3, -2)
    return x.reshape(*blocks.shape[:-4], nbh * 4, nbw * 4)


def zigzag_scan(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 16) in zigzag order."""
    flat = blocks.reshape(*blocks.shape[:-2], 16)
    return flat[..., jnp.asarray(ZIGZAG4x4)]


def zigzag_unscan(scanned: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) zigzag order -> (..., 4, 4)."""
    inv = np.argsort(ZIGZAG4x4)
    flat = scanned[..., jnp.asarray(inv)]
    return flat.reshape(*scanned.shape[:-1], 4, 4)
