"""HEVC codec tests: CABAC engine round-trip and all-PCM conformance
against the independent libavcodec decoder (tools/decode_oracle).

The PCM stage pins down the whole structural stack — NAL framing,
VPS/SPS/PPS, slice header alignment, the arithmetic engine's carry and
terminate paths, and the engine re-init after PCM samples — because a
single wrong bin or misaligned byte makes the oracle fail loudly."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from ceracoder_tpu.codec.h265.cabac import (
    CabacDecoder,
    CabacEncoder,
    init_context,
)
from ceracoder_tpu.codec.h265.encoder import H265PcmEncoder
from ceracoder_tpu.codec.h265.syntax import (
    HevcParams,
    write_pps,
    write_sps,
    write_vps,
)
from ceracoder_tpu.codec.h265 import tables as T

TOOLS = Path(__file__).resolve().parents[1] / "tools"


def oracle():
    exe = TOOLS / "decode_oracle"
    if not exe.exists():
        subprocess.run(["make", "-C", str(TOOLS), "decode_oracle"],
                       check=True, capture_output=True)
    return exe


def synth(w, h, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((np.sin(xx / 13) * 70 + np.cos(yy / 17) * 50 + 128)
         + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
    u = (np.sin(xx[::2, ::2] / 25) * 40 + 128).clip(0, 255).astype(np.uint8)
    v = (np.cos(yy[::2, ::2] / 21) * 40 + 128).clip(0, 255).astype(np.uint8)
    return y, u, v


def decode(path, w, h, nframes):
    out = str(path) + ".yuv"
    r = subprocess.run([str(oracle()), str(path), out],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert f"frames={nframes}" in r.stderr
    raw = np.fromfile(out, np.uint8)
    fsz = w * h * 3 // 2
    assert raw.size == nframes * fsz
    frames = []
    for i in range(nframes):
        a = raw[i * fsz:(i + 1) * fsz]
        frames.append((a[:w * h].reshape(h, w),
                       a[w * h:w * h + w * h // 4].reshape(h // 2, w // 2),
                       a[w * h + w * h // 4:].reshape(h // 2, w // 2)))
    return frames


class TestTables:
    def test_normative_anchors(self):
        assert list(T.LPS_TABLE[0]) == [128, 176, 208, 240]
        assert list(T.T4[1]) == [83, 36, -36, -83]
        assert list(T.QUANT_SCALES) == [26214, 23302, 20560, 18396,
                                        16384, 14564]
        assert list(T.LUMA_FILTER[2]) == [-1, 4, -11, 40, 40, -11, 4, -1]

    def test_transform_matrices_orthogonal(self):
        # HEVC core transforms are near-orthogonal integer DCT
        # approximations: T @ T.T ~ (64^2 * N) * I with small wobble
        for M in (T.T4, T.T8, T.T16, T.T32):
            n = M.shape[0]
            g = M.astype(np.int64) @ M.astype(np.int64).T
            diag = np.diagonal(g)
            assert np.abs(diag - 4096 * n).max() <= 4096 * n // 500
            off = g - np.diag(diag)
            assert np.abs(off).max() <= 4096 * n // 300


class TestCabacEngine:
    def test_round_trip_random(self):
        rng = np.random.default_rng(0)
        for trial in range(40):
            n_ctx = 6
            qp = int(rng.integers(0, 52))
            ctx_e = np.array([init_context(int(v), qp)
                              for v in rng.integers(16, 240, n_ctx)],
                             np.uint8)
            ctx_d = ctx_e.copy()
            ops = []
            enc = CabacEncoder()
            for _ in range(int(rng.integers(1, 300))):
                k = rng.random()
                if k < 0.6:
                    i, b = int(rng.integers(0, n_ctx)), int(rng.integers(0, 2))
                    enc.encode_bin(ctx_e, i, b)
                    ops.append(("ctx", i, b))
                elif k < 0.9:
                    b = int(rng.integers(0, 2))
                    enc.encode_bypass(b)
                    ops.append(("byp", 0, b))
                else:
                    v = int(rng.integers(0, 256))
                    enc.encode_bypass_bits(v, 8)
                    ops.append(("byp8", 0, v))
            enc.encode_terminate(1)
            enc.finish()
            enc.align_one()
            dec = CabacDecoder(enc.to_bytes())
            for kind, i, b in ops:
                got = (dec.decode_bin(ctx_d, i) if kind == "ctx"
                       else dec.decode_bypass() if kind == "byp"
                       else dec.decode_bypass_bits(8))
                assert got == b, f"trial {trial}"
            assert dec.decode_terminate() == 1

    def test_init_context_matches_known_value(self):
        # initValue 184 at any qp: m=(11)*5-45=10, n=(8<<3)-16=48
        # qp 32: pre = clip(((10*32)>>4)+48) = 68 -> state 4, mps 1
        assert init_context(184, 32) == ((68 - 64) << 1 | 1)


class TestPcmConformance:
    def test_single_frame_lossless(self, tmp_path):
        w, h = 320, 192
        y, u, v = synth(w, h)
        enc = H265PcmEncoder(w, h)
        bs = enc.headers() + enc.encode_frame(y, u, v)
        f = tmp_path / "a.265"
        f.write_bytes(bs)
        (dy, du, dv), = decode(f, w, h, 1)
        assert np.array_equal(dy, y)
        assert np.array_equal(du, u)
        assert np.array_equal(dv, v)

    def test_multi_frame_sequence(self, tmp_path):
        w, h = 160, 96
        enc = H265PcmEncoder(w, h)
        bs = enc.headers()
        frames = [synth(w, h, seed=s) for s in range(3)]
        for fr in frames:
            bs += enc.encode_frame(*fr)
        f = tmp_path / "b.265"
        f.write_bytes(bs)
        decoded = decode(f, w, h, 3)
        for (dy, du, dv), (ey, eu, ev) in zip(decoded, frames):
            assert np.array_equal(dy, ey)
            assert np.array_equal(du, eu)
            assert np.array_equal(dv, ev)

    def test_non_ctb_aligned_dimensions(self, tmp_path):
        # conformance window crops the CTB padding back off
        w, h = 200, 120
        y, u, v = synth(w, h, seed=9)
        enc = H265PcmEncoder(w, h)
        bs = enc.headers() + enc.encode_frame(y, u, v)
        f = tmp_path / "c.265"
        f.write_bytes(bs)
        (dy, du, dv), = decode(f, w, h, 1)
        assert np.array_equal(dy, y)
        assert np.array_equal(du, u)
        assert np.array_equal(dv, v)

    def test_parameter_sets_parse(self):
        p = HevcParams(width=1920, height=1080)
        for blob in (write_vps(p), write_sps(p), write_pps(p)):
            assert blob.startswith(b"\x00\x00\x00\x01")
            assert len(blob) > 6


class TestIntraConformance:
    """Lossy intra coding: the decoder's reconstruction must equal the
    encoder's bit for bit (deblocking and SAO are disabled), across the
    full QP range and adversarial content — this exercises every
    residual-coding context derivation and the Golomb-Rice escapes."""

    def _check(self, y, u, v, qp, tmp_path, tag):
        from ceracoder_tpu.codec.h265.encoder import H265IntraEncoder
        h, w = y.shape
        enc = H265IntraEncoder(w, h, qp=qp)
        bs = enc.headers() + enc.encode_frame(y, u, v)
        f = tmp_path / f"{tag}.265"
        f.write_bytes(bs)
        (dy, du, dv), = decode(f, w, h, 1)
        ry, ru, rv = enc.recon
        assert np.array_equal(dy, ry), f"{tag}: luma recon mismatch"
        assert np.array_equal(du, ru)
        assert np.array_equal(dv, rv)
        return len(bs), dy

    @pytest.mark.parametrize("qp", [10, 22, 30, 40, 51])
    def test_noise_all_qps(self, qp, tmp_path):
        rng = np.random.default_rng(3)
        w, h = 160, 96
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        self._check(y, u, v, qp, tmp_path, f"noise{qp}")

    def test_smooth_content_quality(self, tmp_path):
        w, h = 320, 192
        y, u, v = synth(w, h)
        nbytes, dy = self._check(y, u, v, 30, tmp_path, "smooth")
        mse = np.mean((dy.astype(float) - y.astype(float)) ** 2)
        psnr = 10 * np.log10(255 ** 2 / mse)
        assert psnr > 32.0
        assert nbytes < w * h // 8          # real compression happening

    def test_sharp_edges(self, tmp_path):
        w, h = 160, 96
        yy, xx = np.mgrid[0:h, 0:w]
        y = (((xx // 16 + yy // 16) % 2) * 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        self._check(y, u, v, 27, tmp_path, "edges")


def test_app_hevc_ts_end_to_end(tmp_path):
    """Full app run with codec=hevc: HEVC-in-TS (stream_type 0x24)
    decodable by the oracle."""
    from ceracoder_tpu.app.cli import parse_args
    from ceracoder_tpu.app.main import CeracoderApp

    job = tmp_path / "job.ini"
    job.write_text("[source]\nkind = test\nwidth = 160\nheight = 96\n"
                   "fps = 30\n[encode]\ncodec = hevc\n")
    out = tmp_path / "hevc.ts"
    opts = parse_args([str(job), str(out), "0"])
    app = CeracoderApp(opts, max_frames=5, realtime=False)
    assert app.run() == 0
    r = subprocess.run([str(oracle()), str(out), str(tmp_path / "o.yuv")],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "frames=5" in r.stderr
