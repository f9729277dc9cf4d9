"""Randomized H.264 conformance fuzz: random configs x random content
through the full encoder and the libavcodec oracle — the H.264 twin of
test_h265_fuzz.py (size x GOP x QP x entropy x deblock x per-frame QP
switches), raising H.264 conformance confidence to the HEVC level."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from ceracoder_tpu.codec.h264.encoder import H264Encoder

TOOLS = Path(__file__).resolve().parent.parent / "tools"
ORACLE = TOOLS / "decode_oracle"


@pytest.fixture(scope="session")
def oracle():
    if not ORACLE.exists():
        pytest.skip("decode_oracle unavailable")
    return str(ORACLE)


def _clip(rng, w, h, n):
    base = rng.integers(0, 256, (h + 48, w + 48)).astype(np.float64)
    k = np.ones(rng.integers(2, 6)) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), ax, base)
    base = (base - base.min()) * (255 / (base.max() - base.min() + 1))
    frames = []
    for i in range(n):
        dy, dx = int(1.7 * i), int(2.4 * i)
        y = base[dy:dy + h, dx:dx + w].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 50).astype(np.uint8)
        v = (y[1::2, 1::2] // 3 + 70).astype(np.uint8)
        frames.append((y, u, v))
    return frames


@pytest.mark.parametrize("seed", range(8))
def test_random_config_roundtrip(seed, oracle, tmp_path):
    rng = np.random.default_rng(500 + seed)
    w = 16 * int(rng.integers(3, 9))       # 48..128, MB multiple
    h = 16 * int(rng.integers(2, 6))       # 32..80
    qp = int(rng.integers(18, 45))
    gop = int(rng.integers(2, 9))
    cabac = bool(rng.integers(0, 2))
    deblock = bool(rng.integers(0, 2))
    n = int(rng.integers(4, 9))
    frames = _clip(rng, w, h, n)

    enc = H264Encoder(w, h, qp=qp, gop=gop, cabac=cabac,
                      deblock=deblock)
    data = enc.headers()
    recons = []
    for i, f in enumerate(frames):
        fqp = qp if i % 3 else int(np.clip(qp + rng.integers(-4, 5),
                                           12, 48))
        ef = enc.encode_frame(*f, qp=fqp)
        data += ef.data
        recons.append(ef.recon)

    path = tmp_path / f"fuzz{seed}.264"
    path.write_bytes(data)
    dst = tmp_path / f"fuzz{seed}.yuv"
    r = subprocess.run([oracle, str(path), str(dst)],
                       capture_output=True, text=True)
    cfg = (f"{w}x{h} qp{qp} gop{gop} "
           f"{'cabac' if cabac else 'cavlc'}"
           f"{' deblock' if deblock else ''}")
    assert r.returncode == 0, f"{cfg}: oracle rejected\n{r.stderr[-500:]}"
    raw = np.fromfile(dst, np.uint8)
    fsz = w * h * 3 // 2
    assert raw.size == fsz * n, cfg
    for i, (ry, ru, rv) in enumerate(recons):
        fo = raw[i * fsz:(i + 1) * fsz]
        assert np.array_equal(fo[:w * h].reshape(h, w), ry), \
            f"{cfg} frame {i} luma"
        assert np.array_equal(
            fo[w * h:w * h + w * h // 4].reshape(h // 2, w // 2), ru), \
            f"{cfg} frame {i} cb"
        assert np.array_equal(
            fo[w * h + w * h // 4:].reshape(h // 2, w // 2), rv), \
            f"{cfg} frame {i} cr"


@pytest.mark.parametrize("w,h", [(48, 32), (112, 48), (176, 144)])
def test_dimension_matrix_cabac(w, h, oracle, tmp_path):
    """CABAC across a small dimension matrix (row-slice counts 2..9,
    varying MBs/row) with per-frame QP switches."""
    rng = np.random.default_rng(w * 1000 + h)
    frames = _clip(rng, w, h, 5)
    enc = H264Encoder(w, h, qp=26, gop=5, cabac=True)
    data = enc.headers()
    recons = []
    for i, f in enumerate(frames):
        ef = enc.encode_frame(*f, qp=26 + 3 * (i % 2))
        data += ef.data
        recons.append(ef.recon)
    path = tmp_path / "dim.264"
    path.write_bytes(data)
    dst = tmp_path / "dim.yuv"
    r = subprocess.run([oracle, str(path), str(dst)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-400:]
    raw = np.fromfile(dst, np.uint8)
    fsz = w * h * 3 // 2
    assert raw.size == fsz * 5
    for i, (ry, _, _) in enumerate(recons):
        assert np.array_equal(
            raw[i * fsz:i * fsz + w * h].reshape(h, w), ry), i
