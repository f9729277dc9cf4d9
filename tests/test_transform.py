"""Integer transform / quant correctness tests (H.264 spec 8.5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ceracoder_tpu.ops.transform import (
    chroma_qp,
    dequant4,
    dequant_dc2,
    dequant_dc4,
    fdct4,
    from_blocks4,
    hadamard2_fwd,
    hadamard4_fwd,
    idct4,
    quant4,
    quant_dc2,
    quant_dc4,
    to_blocks4,
    zigzag_scan,
    zigzag_unscan,
)


def test_fdct_idct_identity_qp0():
    """At qp 0 the quant step (~0.625) is below 1: near-lossless."""
    rng = np.random.default_rng(0)
    r = rng.integers(-255, 256, size=(128, 4, 4)).astype(np.int32)
    rec = np.asarray(idct4(dequant4(quant4(fdct4(jnp.asarray(r)), 0), 0)))
    assert np.abs(rec - r).max() <= 1


@pytest.mark.parametrize("qp", [10, 20, 28, 36, 44, 51])
def test_roundtrip_error_bounded_by_qstep(qp):
    rng = np.random.default_rng(qp)
    r = rng.integers(-255, 256, size=(128, 4, 4)).astype(np.int32)
    rec = np.asarray(idct4(dequant4(quant4(fdct4(jnp.asarray(r)), qp), qp)))
    qstep = 0.625 * 2 ** (qp / 6)
    assert np.abs(rec - r).max() <= 1.2 * qstep


def test_idct_arithmetic_shift_on_negatives():
    """The >>1 butterflies must floor (arithmetic shift), not truncate."""
    d = np.zeros((1, 4, 4), np.int32)
    d[0, 1, 0] = -3  # odd negative exercises d1 >> 1
    out = np.asarray(idct4(jnp.asarray(d)))
    # reference computed with explicit floor semantics
    e2 = (-3 >> 1)  # -2, not -1
    assert e2 == -2
    assert out.shape == (1, 4, 4)


@pytest.mark.parametrize("qp", [0, 20, 28, 40])
def test_luma_dc_path_consistent(qp):
    """Encoder DC quant pairs with spec 8.5.10 decode scaling."""
    for val in (-200, -37, 1, 55, 255):
        r = np.full((4, 4, 4, 4), val, np.int32)
        w = fdct4(jnp.asarray(r))
        dcmat = np.asarray(w)[..., 0, 0].reshape(4, 4)
        ddc = dequant_dc4(quant_dc4(hadamard4_fwd(jnp.asarray(dcmat)), qp), qp)
        d = np.zeros((4, 4, 4, 4), np.int32)
        d[..., 0, 0] = np.asarray(ddc).reshape(4, 4)
        rec = np.asarray(idct4(jnp.asarray(d)))
        assert np.abs(rec - r).max() <= max(1, 0.7 * 0.625 * 2 ** (qp / 6))


@pytest.mark.parametrize("qp", [0, 20, 29, 39])
def test_chroma_dc_path_consistent(qp):
    for val in (-200, 1, 255):
        r = np.full((2, 2, 4, 4), val, np.int32)
        w = fdct4(jnp.asarray(r))
        dcmat = np.asarray(w)[..., 0, 0].reshape(2, 2)
        ddc = dequant_dc2(quant_dc2(hadamard2_fwd(jnp.asarray(dcmat)), qp), qp)
        d = np.zeros((2, 2, 4, 4), np.int32)
        d[..., 0, 0] = np.asarray(ddc).reshape(2, 2)
        rec = np.asarray(idct4(jnp.asarray(d)))
        assert np.abs(rec - r).max() <= max(1, 0.7 * 0.625 * 2 ** (qp / 6))


def test_blocks_roundtrip():
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, size=(32, 48)).astype(np.int32)
    blocks = to_blocks4(jnp.asarray(plane))
    assert blocks.shape == (8, 12, 4, 4)
    # block (i, j) holds plane[4i:4i+4, 4j:4j+4]
    assert np.array_equal(np.asarray(blocks)[2, 3], plane[8:12, 12:16])
    back = np.asarray(from_blocks4(blocks))
    assert np.array_equal(back, plane)


def test_zigzag_roundtrip():
    rng = np.random.default_rng(4)
    b = rng.integers(-100, 100, size=(5, 4, 4)).astype(np.int32)
    z = zigzag_scan(jnp.asarray(b))
    assert z.shape == (5, 16)
    # first three zigzag entries: (0,0), (0,1), (1,0)
    assert np.array_equal(np.asarray(z)[:, 0], b[:, 0, 0])
    assert np.array_equal(np.asarray(z)[:, 1], b[:, 0, 1])
    assert np.array_equal(np.asarray(z)[:, 2], b[:, 1, 0])
    assert np.array_equal(np.asarray(zigzag_unscan(z)), b)


def test_chroma_qp_map():
    assert chroma_qp(0) == 0
    assert chroma_qp(29) == 29
    assert chroma_qp(30) == 29
    assert chroma_qp(40) == 36
    assert chroma_qp(51) == 39
    assert chroma_qp(51, offset=-12) == 35  # qpi = 39 -> 35
