"""Bitstream writer round-trip tests."""

import numpy as np
import pytest

from ceracoder_tpu.codec.bitwriter import (
    BitReader,
    BitWriter,
    emulation_prevent,
    nal_unit,
    pack_bits,
    se_code,
    strip_emulation,
    ue_code,
)


def test_u_roundtrip():
    w = BitWriter()
    w.u(0b101, 3).u(1, 1).u(0xFFFF, 16).u(0, 4)
    r = BitReader(w.to_bytes() if w.bit_length % 8 == 0 else None)
    assert r.u(3) == 0b101
    assert r.u(1) == 1
    assert r.u(16) == 0xFFFF
    assert r.u(4) == 0


def test_ue_se_roundtrip():
    w = BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 100, 65534]
    svals = [0, 1, -1, 2, -2, 50, -50, 2047]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.to_bytes())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_vectorized_golomb_matches_scalar():
    vals = np.array([0, 1, 2, 3, 4, 7, 8, 255, 65534])
    codes, lens = ue_code(vals)
    for v, c, l in zip(vals, codes, lens):
        w = BitWriter()
        w.ue(int(v))
        wv, wl = w.arrays()
        assert int(wv[0]) == c and int(wl[0]) == l

    svals = np.array([0, 1, -1, 2, -2, 100, -100])
    codes, lens = se_code(svals)
    for v, c, l in zip(svals, codes, lens):
        w = BitWriter()
        w.se(int(v))
        wv, wl = w.arrays()
        assert int(wv[0]) == c and int(wl[0]) == l


def test_pack_bits_skips_zero_length():
    vals = np.array([0b1, 0b0, 0b1111, 0b101], dtype=np.uint32)
    lens = np.array([1, 0, 4, 3], dtype=np.int32)
    out = pack_bits(vals, lens)
    r = BitReader(out)
    assert r.u(1) == 1
    assert r.u(4) == 0b1111
    assert r.u(3) == 0b101


def test_pack_bits_random_roundtrip():
    rng = np.random.default_rng(0)
    n = 10000
    lens = rng.integers(0, 25, size=n)
    vals = rng.integers(0, 1 << 24, size=n).astype(np.uint64)
    vals = np.where(lens > 0, vals & ((1 << lens.astype(np.uint64)) - 1), 0)
    out = pack_bits(vals.astype(np.uint32), lens.astype(np.int32))
    r = BitReader(out)
    for v, l in zip(vals, lens):
        if l:
            assert r.u(int(l)) == int(v)


@pytest.mark.parametrize(
    "raw,expected",
    [
        (b"\x00\x00\x00", b"\x00\x00\x03\x00"),
        (b"\x00\x00\x01", b"\x00\x00\x03\x01"),
        (b"\x00\x00\x03", b"\x00\x00\x03\x03"),
        (b"\x00\x00\x04", b"\x00\x00\x04"),
        (b"\x00\x00\x00\x00", b"\x00\x00\x03\x00\x00"),
        (b"\x00\x00\x00\x00\x00", b"\x00\x00\x03\x00\x00\x03\x00"),
        (b"\x00\x00\x01\x00\x00\x02", b"\x00\x00\x03\x01\x00\x00\x03\x02"),
        (b"ab\x00\x00\x02cd", b"ab\x00\x00\x03\x02cd"),
    ],
)
def test_emulation_prevention(raw, expected):
    assert emulation_prevent(raw) == expected
    assert strip_emulation(expected) == raw


def test_emulation_roundtrip_random():
    rng = np.random.default_rng(1)
    for _ in range(50):
        raw = rng.integers(0, 4, size=200).astype(np.uint8).tobytes()
        assert strip_emulation(emulation_prevent(raw)) == raw


def test_nal_unit_framing():
    out = nal_unit(3, 7, b"\x42\x00\x1f")
    assert out.startswith(b"\x00\x00\x00\x01")
    assert out[4] == (3 << 5) | 7
