"""CAVLC round-trip tests: vectorized encoder vs independent scalar
decoder (spec 9.2)."""

import numpy as np
import pytest

from ceracoder_tpu.codec.bitwriter import BitReader, pack_bits
from ceracoder_tpu.codec.h264.cavlc import decode_block, encode_blocks


def roundtrip(levels, nc, max_coeff):
    levels = np.asarray(levels)
    vals, lens, tc = encode_blocks(levels, np.asarray(nc), max_coeff)
    data = pack_bits(vals.reshape(-1), lens.reshape(-1))
    r = BitReader(data)
    out = np.zeros_like(levels)
    for i in range(levels.shape[0]):
        out[i] = decode_block(r, int(np.asarray(nc)[i]), max_coeff)
    return out, tc


def sparse_blocks(rng, n, c, density, mag):
    lv = rng.integers(-mag, mag + 1, size=(n, c))
    mask = rng.random((n, c)) < density
    return (lv * mask).astype(np.int64)


@pytest.mark.parametrize("nc", [0, 1, 2, 3, 4, 7, 8, 16])
@pytest.mark.parametrize("density", [0.05, 0.2, 0.5, 0.95])
def test_luma_roundtrip(nc, density):
    rng = np.random.default_rng(nc * 100 + int(density * 10))
    lv = sparse_blocks(rng, 200, 16, density, 8)
    out, _ = roundtrip(lv, np.full(200, nc), 16)
    assert np.array_equal(out, lv)


@pytest.mark.parametrize("density", [0.1, 0.5, 0.9])
def test_ac15_roundtrip(density):
    rng = np.random.default_rng(int(density * 100))
    lv = sparse_blocks(rng, 200, 15, density, 5)
    nc = rng.integers(0, 20, 200)
    out, _ = roundtrip(lv, nc, 15)
    assert np.array_equal(out, lv)


def test_chroma_dc_roundtrip():
    rng = np.random.default_rng(7)
    lv = sparse_blocks(rng, 300, 4, 0.5, 6)
    out, _ = roundtrip(lv, np.full(300, -1), 4)
    assert np.array_equal(out, lv)


def test_large_levels():
    """Levels large enough to exercise every escape regime."""
    lv = np.zeros((6, 16), np.int64)
    lv[0, 0] = 500
    lv[1, 0] = -2000
    lv[2, :4] = [900, -900, 800, -700]
    lv[3, 0] = 7          # suffix growth chain
    lv[3, 1] = -25
    lv[3, 2] = 100
    lv[4, :16] = 1        # all trailing ones territory
    lv[5, 0] = 16
    out, _ = roundtrip(lv, np.zeros(6), 16)
    assert np.array_equal(out, lv)


def test_level_clamp():
    lv = np.zeros((1, 16), np.int64)
    lv[0, 0] = 100000     # beyond MAX_LEVEL: clamped, still decodable
    out, _ = roundtrip(lv, np.zeros(1), 16)
    assert out[0, 0] == 2063


def test_empty_and_single():
    lv = np.zeros((4, 16), np.int64)
    lv[1, 0] = 1
    lv[2, 15] = -1
    lv[3, 7] = 3
    out, tc = roundtrip(lv, np.array([0, 1, 5, 9]), 16)
    assert np.array_equal(out, lv)
    assert tc.tolist() == [0, 1, 1, 1]


def test_mixed_nc_stream():
    """A stream mixing block kinds, like a real MB layer produces."""
    rng = np.random.default_rng(42)
    lv16 = sparse_blocks(rng, 50, 16, 0.3, 10)
    nc16 = rng.integers(0, 12, 50)
    v1, l1, _ = encode_blocks(lv16, nc16, 16)
    lvdc = sparse_blocks(rng, 50, 4, 0.6, 4)
    v2, l2, _ = encode_blocks(lvdc, np.full(50, -1), 4)
    # interleave: one 16-block then one chroma DC block per "MB"
    vals = np.concatenate([v1[:, None], v2[:, None]], axis=1).reshape(-1, 35)
    lens = np.concatenate([l1[:, None], l2[:, None]], axis=1).reshape(-1, 35)
    data = pack_bits(vals.reshape(-1), lens.reshape(-1))
    r = BitReader(data)
    for i in range(50):
        assert np.array_equal(decode_block(r, int(nc16[i]), 16), lv16[i])
        assert np.array_equal(decode_block(r, -1, 4), lvdc[i])
