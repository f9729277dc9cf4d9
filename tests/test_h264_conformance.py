"""End-to-end codec conformance: our streams must decode through a real
reference decoder (libavcodec) with BIT-EXACT reconstruction match.

This is the codec analog of the reference's hermetic `make test` tier
(SURVEY.md §4): skip-if-unavailable external interop follows the
reference's test_srt_live_transmit.c pattern.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from ceracoder_tpu.codec.h264.encoder import H264Encoder
from ceracoder_tpu.codec.h264.ipcm import encode_ipcm_stream

TOOLS = Path(__file__).resolve().parent.parent / "tools"
ORACLE = TOOLS / "decode_oracle"


@pytest.fixture(scope="session")
def oracle():
    if not ORACLE.exists():
        r = subprocess.run(["make", "-C", str(TOOLS)], capture_output=True)
        if r.returncode != 0 or not ORACLE.exists():
            pytest.skip("decode_oracle unavailable (no libavcodec dev)")
    return str(ORACLE)


def oracle_decode(oracle, data: bytes, w: int, h: int, tmp: Path):
    src = tmp / "t.264"
    dst = tmp / "t.yuv"
    src.write_bytes(data)
    r = subprocess.run([oracle, str(src), str(dst)], capture_output=True,
                       text=True)
    assert r.returncode == 0, f"oracle rejected stream:\n{r.stderr[-800:]}"
    raw = np.fromfile(dst, np.uint8)
    fsz = w * h * 3 // 2
    assert raw.size % fsz == 0
    frames = []
    for i in range(raw.size // fsz):
        f = raw[i * fsz:(i + 1) * fsz]
        frames.append((f[:w * h].reshape(h, w),
                       f[w * h:w * h + w * h // 4].reshape(h // 2, w // 2),
                       f[w * h + w * h // 4:].reshape(h // 2, w // 2)))
    return frames


def synth_frame(rng, w, h, kind):
    if kind == "noise":
        return (rng.integers(0, 256, (h, w)).astype(np.uint8),
                rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
                rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
    yy, xx = np.mgrid[0:h, 0:w]
    y = (np.sin(xx / 7) * 80 + np.cos(yy / 9) * 60 + 128).clip(0, 255)
    u = (np.sin(xx[::2, ::2] / 15) * 50 + 128).clip(0, 255)
    v = (np.cos(yy[::2, ::2] / 13) * 50 + 128).clip(0, 255)
    return y.astype(np.uint8), u.astype(np.uint8), v.astype(np.uint8)


def test_ipcm_lossless(oracle, tmp_path):
    rng = np.random.default_rng(0)
    w, h = 64, 48
    frames = [synth_frame(rng, w, h, "noise") for _ in range(2)]
    data = encode_ipcm_stream(frames, w, h)
    dec = oracle_decode(oracle, data, w, h, tmp_path)
    assert len(dec) == 2
    for (dy, du, dv), (y, u, v) in zip(dec, frames):
        assert np.array_equal(dy, y)
        assert np.array_equal(du, u)
        assert np.array_equal(dv, v)


@pytest.mark.parametrize("qp", [0, 10, 22, 35, 51])
def test_i16_noise_bit_exact(oracle, tmp_path, qp):
    """Noise frames maximize CAVLC table coverage."""
    rng = np.random.default_rng(qp)
    w, h = 96, 64
    y, u, v = synth_frame(rng, w, h, "noise")
    enc = H264Encoder(w, h, qp=qp)
    f = enc.encode_frame(y, u, v)
    dec = oracle_decode(oracle, enc.headers() + f.data, w, h, tmp_path)
    ry, ru, rv = f.recon
    assert np.array_equal(dec[0][0], ry)
    assert np.array_equal(dec[0][1], ru)
    assert np.array_equal(dec[0][2], rv)


@pytest.mark.parametrize("qp", [15, 30, 45])
def test_i16_structured_bit_exact(oracle, tmp_path, qp):
    rng = np.random.default_rng(1)
    w, h = 160, 96
    y, u, v = synth_frame(rng, w, h, "sin")
    enc = H264Encoder(w, h, qp=qp)
    f = enc.encode_frame(y, u, v)
    dec = oracle_decode(oracle, enc.headers() + f.data, w, h, tmp_path)
    assert np.array_equal(dec[0][0], f.recon[0])
    assert np.array_equal(dec[0][1], f.recon[1])
    assert np.array_equal(dec[0][2], f.recon[2])


def test_i16_flat_frame(oracle, tmp_path):
    w, h = 64, 48
    enc = H264Encoder(w, h, qp=30)
    f = enc.encode_frame(np.full((h, w), 77, np.uint8),
                         np.full((h // 2, w // 2), 99, np.uint8),
                         np.full((h // 2, w // 2), 200, np.uint8))
    dec = oracle_decode(oracle, enc.headers() + f.data, w, h, tmp_path)
    assert np.array_equal(dec[0][0], f.recon[0])


def test_i16_multi_frame_stream(oracle, tmp_path):
    rng = np.random.default_rng(2)
    w, h = 64, 48
    enc = H264Encoder(w, h, qp=28)
    data = enc.headers()
    recons = []
    for _ in range(3):
        y, u, v = synth_frame(rng, w, h, "noise")
        f = enc.encode_frame(y, u, v)
        data += f.data
        recons.append(f.recon)
    dec = oracle_decode(oracle, data, w, h, tmp_path)
    assert len(dec) == 3
    for d, r in zip(dec, recons):
        assert np.array_equal(d[0], r[0])


def test_psnr_reasonable(oracle, tmp_path):
    """Quality sanity: structured content at qp 22 should clear 35 dB."""
    rng = np.random.default_rng(3)
    w, h = 160, 96
    y, u, v = synth_frame(rng, w, h, "sin")
    enc = H264Encoder(w, h, qp=22)
    f = enc.encode_frame(y, u, v)
    mse = np.mean((f.recon[0].astype(float) - y.astype(float)) ** 2)
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    assert psnr > 35.0, psnr


def test_p_recon_consistency(oracle, tmp_path):
    """Regression for the axon fused-recon miscompile: P-frame recon
    must equal libavcodec's decode bit-exactly on content whose
    unclipped pred+residual goes strongly negative (dark sine pattern
    with slow pan; the wrap showed up as isolated mod-128 pixels).
    Pins the optimization_barrier in ops/inter.py:encode_frame_p."""
    w, h = 192, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((np.sin(xx / 6) * 70 + np.cos(yy / 11) * 65 + 128)
         .clip(0, 255)).astype(np.uint8)
    u = ((np.sin(xx[::2, ::2] / 9) * 40 + 120).clip(0, 255)
         ).astype(np.uint8)
    v = ((np.cos(yy[::2, ::2] / 7) * 40 + 136).clip(0, 255)
         ).astype(np.uint8)
    for deblock in (False, True):
        enc = H264Encoder(w, h, qp=26, gop=4, deblock=deblock)
        data = enc.headers()
        recons = []
        for t in range(4):
            f = enc.encode_frame(np.roll(y, 2 * t, axis=1), u, v)
            data += f.data
            recons.append(f.recon)
        dec = oracle_decode(oracle, data, w, h, tmp_path)
        assert len(dec) == 4
        for i, (d, r) in enumerate(zip(dec, recons)):
            assert np.array_equal(d[0], r[0]), (deblock, i)
            assert np.array_equal(d[1], r[1]), (deblock, i)
            assert np.array_equal(d[2], r[2]), (deblock, i)
