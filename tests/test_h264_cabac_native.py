"""C++ H.264 CABAC row coder (native/src/h264_cabac.cc) must be
byte-identical to the Python executable spec (cabac.H264RowCabac via
cabac_assemble) — the same twin-implementation contract as
test_h265_rows.py for the HEVC entropy stage."""

import numpy as np
import pytest

from ceracoder_tpu import native
from ceracoder_tpu.codec.h264 import cabac_assemble as ca


@pytest.fixture(scope="module")
def lib():
    lb = native.load()
    if lb is None or not hasattr(lb, "h264_cabac_rows"):
        pytest.skip("native h264_cabac unavailable")
    return lb


def _rand_outs_i(rng, mbh, mbw, density=0.2):
    nmb = mbh * mbw
    def sp(shape, lo=-30, hi=30):
        a = rng.integers(lo, hi, shape)
        mask = rng.random(shape) < density
        return (a * mask).astype(np.int64)
    return {
        "ac_luma": sp((nmb, 4, 4, 15)),
        "dc_luma": sp((nmb, 16)),
        "dc_chroma": sp((mbh, mbw, 2, 4)),
        "ac_chroma": sp((mbh, mbw, 2, 2, 2, 15)),
        "mode_luma": rng.integers(0, 4, nmb),
        "mode_chroma": rng.integers(0, 4, nmb),
    }


def _rand_outs_p(rng, mbh, mbw, density=0.15):
    nmb = mbh * mbw
    def sp(shape, lo=-25, hi=25):
        a = rng.integers(lo, hi, shape)
        mask = rng.random(shape) < density
        return (a * mask).astype(np.int64)
    mv = rng.integers(-40, 41, (mbh, mbw, 2))
    mv[rng.random((mbh, mbw)) < 0.4] = 0       # make skips plausible
    return {
        "mv": mv,
        "luma_levels": sp((mbh, mbw, 4, 4, 16)),
        "dc_chroma": sp((mbh, mbw, 2, 4)),
        "ac_chroma": sp((mbh, mbw, 2, 2, 2, 15)),
    }


SNAKE = None


def _snake():
    global SNAKE
    if SNAKE is None:
        from ceracoder_tpu.codec.h264.encoder import LUMA_SNAKE
        SNAKE = LUMA_SNAKE
    return SNAKE


@pytest.mark.parametrize("seed,qp,mbh,mbw",
                         [(0, 27, 3, 5), (1, 20, 2, 2), (2, 40, 4, 7),
                          (3, 33, 1, 9), (4, 24, 6, 3)])
def test_i_rows_native_matches_python(lib, monkeypatch, seed, qp,
                                      mbh, mbw):
    rng = np.random.default_rng(seed)
    outs = _rand_outs_i(rng, mbh, mbw)
    got = ca.assemble_i_cabac(outs, qp, 0, mbh, mbw, 26, True,
                              _snake())
    monkeypatch.setattr(ca, "_native_rows",
                        lambda *a, **k: None)
    want = ca.assemble_i_cabac(outs, qp, 0, mbh, mbw, 26, True,
                               _snake())
    assert got == want


@pytest.mark.parametrize("seed,qp,mbh,mbw",
                         [(0, 30, 3, 5), (1, 22, 2, 8), (2, 38, 5, 4),
                          (3, 26, 1, 11)])
def test_p_rows_native_matches_python(lib, monkeypatch, seed, qp,
                                      mbh, mbw):
    rng = np.random.default_rng(100 + seed)
    outs = _rand_outs_p(rng, mbh, mbw)
    got = ca.assemble_p_cabac(outs, qp, 3, mbh, mbw, 26, True,
                              _snake())
    monkeypatch.setattr(ca, "_native_rows",
                        lambda *a, **k: None)
    want = ca.assemble_p_cabac(outs, qp, 3, mbh, mbw, 26, True,
                               _snake())
    assert got == want


def test_big_levels_escape_path(lib, monkeypatch):
    """UEG0 escape (|level| > 14) and large mvds must match too."""
    rng = np.random.default_rng(7)
    mbh, mbw = 2, 3
    outs = _rand_outs_p(rng, mbh, mbw, density=0.5)
    outs["luma_levels"] = (outs["luma_levels"] * 37).clip(-900, 900)
    outs["mv"] = outs["mv"] * 9
    got = ca.assemble_p_cabac(outs, 18, 1, mbh, mbw, 26, True,
                              _snake())
    monkeypatch.setattr(ca, "_native_rows", lambda *a, **k: None)
    want = ca.assemble_p_cabac(outs, 18, 1, mbh, mbw, 26, True,
                               _snake())
    assert got == want
