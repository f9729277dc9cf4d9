"""Randomized HEVC conformance fuzz: random configs x random content
through the full encoder and the libavcodec oracle. Catches parameter
interactions the targeted tests miss (size x GOP x QP x B x SAO x
framing x TU split)."""

import numpy as np
import pytest

from ceracoder_tpu.codec.h265.rowslice import H265RowEncoder
from tests.test_h265_rows import decode


def _clip(rng, w, h, n):
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.float64)
    k = np.ones(rng.integers(2, 6)) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), ax, base)
    base = (base - base.min()) * (255 / (base.max() - base.min() + 1))
    frames = []
    for i in range(n):
        dy, dx = int(1.5 * i), int(2.2 * i)
        y = base[dy:dy + h, dx:dx + w].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 50).astype(np.uint8)
        v = (y[1::2, 1::2] // 3 + 70).astype(np.uint8)
        frames.append((y, u, v))
    return frames


@pytest.mark.parametrize("seed", range(6))
def test_random_config_roundtrip(seed, tmp_path):
    rng = np.random.default_rng(100 + seed)
    w = int(rng.choice([48, 64, 88, 96, 112]))
    h = int(rng.choice([32, 48, 56, 64]))
    qp = int(rng.integers(20, 45))
    gop = int(rng.integers(2, 9))
    bframes = int(rng.integers(0, 2))
    sao = bool(rng.integers(0, 2))
    tiles = bool(rng.integers(0, 2))
    tu_split = bool(rng.integers(0, 2))
    n = int(rng.integers(4, 9))
    frames = _clip(rng, w, h, n)

    enc = H265RowEncoder(w, h, qp=qp, gop=gop, bframes=bframes,
                         sao=sao, tile_rows=tiles, tu_split=tu_split)
    out = enc.headers()
    coded = []
    for i, f in enumerate(frames):
        fqp = qp if i % 3 else int(np.clip(qp + rng.integers(-3, 4),
                                           20, 46))
        if bframes:
            coded += enc.push_frame(*f, qp=fqp)
        else:
            data, idr = enc.encode_frame(*f, qp=fqp)
            coded.append((data, i, "I" if idr else "P", enc.recon))
    if bframes:
        coded += enc.flush()
    for data, *_ in coded:
        out += data
    path = tmp_path / f"fuzz{seed}.265"
    path.write_bytes(out)
    decoded = decode(path, w, h, n)
    # display order: per-GOP-segment sort by poc for B streams
    if bframes:
        disp, seg = [], []
        for t in coded:
            if t[2] == "I" and seg:
                disp += sorted(seg, key=lambda x: x[1])
                seg = []
            seg.append(t)
        disp += sorted(seg, key=lambda x: x[1])
    else:
        disp = coded
    for i, d in enumerate(decoded):
        for name, dp, rp in zip("yuv", d, disp[i][3]):
            assert np.array_equal(dp, rp), \
                (seed, w, h, qp, gop, bframes, sao, tiles, tu_split,
                 i, name)
