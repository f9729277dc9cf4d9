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


class TestInterConformance:
    """P-frame coding: decoder reconstruction must equal the encoder's
    bit for bit across motion (incl. chroma half-pel interpolation),
    skip/merge/AMVP decisions, intra fallback, QP changes, GOP
    boundaries, and non-CTB-aligned dimensions."""

    def _run(self, w, h, frames, tmp_path, tag, qps=None, gop=50):
        from ceracoder_tpu.codec.h265.encoder import H265GopEncoder
        enc = H265GopEncoder(w, h, qp=30, gop=gop)
        out = enc.headers()
        recons, kinds = [], []
        for i, f in enumerate(frames):
            data, idr = enc.encode_frame(*f, qp=qps[i] if qps else None)
            out += data
            recons.append(enc.recon)
            kinds.append("I" if idr else "P")
        path = tmp_path / f"{tag}.265"
        path.write_bytes(out)
        decoded = decode(path, w, h, len(frames))
        for i, ((dy, du, dv), (ry, ru, rv)) in enumerate(
                zip(decoded, recons)):
            assert np.array_equal(dy, ry), f"{tag} frame {i}: luma"
            assert np.array_equal(du, ru), f"{tag} frame {i}: cb"
            assert np.array_equal(dv, rv), f"{tag} frame {i}: cr"
        return kinds

    @staticmethod
    def _panning(n, w=96, h=64, step=(3, 5)):
        rng = np.random.default_rng(11)
        base = rng.integers(0, 256, (3 * h, 3 * w)).astype(np.uint8)
        frames = []
        for i in range(n):
            dy, dx = step[0] * i - n, step[1] * i - n
            y = base[h + dy:2 * h + dy, w + dx:2 * w + dx].copy()
            u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
            v = (y[1::2, 1::2] // 3 + 80).astype(np.uint8)
            frames.append((y, u, v))
        return frames

    def test_panning_motion(self, tmp_path):
        """Odd per-frame shifts exercise full-pel luma MC plus the
        4-tap chroma half-sample interpolation (spec 8.5.4.2.2.2)."""
        kinds = self._run(96, 64, self._panning(5), tmp_path, "pan")
        assert kinds == ["I", "P", "P", "P", "P"]

    def test_static_content_skips(self, tmp_path):
        """Identical frames after the IDR: P frames should collapse to
        skip CUs (tiny) and still decode bit-exact."""
        from ceracoder_tpu.codec.h265.encoder import H265GopEncoder
        y, u, v = synth(96, 64)
        enc = H265GopEncoder(96, 64, qp=30, gop=50)
        out = enc.headers()
        sizes, recons = [], []
        for _ in range(4):
            data, _ = enc.encode_frame(y, u, v)
            sizes.append(len(data))
            recons.append(enc.recon)
            out += data
        # later P frames: recon has converged, everything skips
        assert sizes[3] < 40
        f = tmp_path / "static.265"
        f.write_bytes(out)
        dec = decode(f, 96, 64, 4)
        for (dy, du, dv), (ry, ru, rv) in zip(dec, recons):
            assert np.array_equal(dy, ry)
            assert np.array_equal(du, ru)
            assert np.array_equal(dv, rv)

    def test_scene_change_intra_fallback(self, tmp_path):
        rng = np.random.default_rng(5)
        frames = self._panning(2)
        y2 = rng.integers(0, 256, (64, 96)).astype(np.uint8)
        cut = (y2, (y2[::2, ::2] // 2 + 30).astype(np.uint8),
               (y2[1::2, 1::2] // 2 + 90).astype(np.uint8))
        self._run(96, 64, frames + [cut, cut], tmp_path, "cut")

    def test_qp_change_and_gop(self, tmp_path):
        frames = self._panning(6)
        kinds = self._run(96, 64, frames, tmp_path, "qpgop",
                          qps=[30, 30, 38, 24, 30, 30], gop=3)
        assert kinds == ["I", "P", "P", "I", "P", "P"]

    def test_non_aligned_dims(self, tmp_path):
        def fr(i, w=100, h=52):
            yy, xx = np.mgrid[0:h, 0:w]
            y = ((xx * 2 + yy * 3 + i * 11) % 256).astype(np.uint8)
            return (y, ((yy[::2, ::2] + i) % 256).astype(np.uint8),
                    ((xx[::2, ::2] * 2) % 256).astype(np.uint8))
        self._run(100, 52, [fr(i) for i in range(4)], tmp_path, "odd")

    def test_p_beats_intra_on_motion(self, tmp_path):
        """Compression sanity: P frames of panning content must be
        substantially smaller than coding every frame intra."""
        from ceracoder_tpu.codec.h265.encoder import (
            H265GopEncoder, H265IntraEncoder)
        frames = self._panning(4)
        gop = H265GopEncoder(96, 64, qp=30, gop=50)
        p_bytes = sum(len(gop.encode_frame(*f)[0]) for f in frames[1:])
        intra = H265IntraEncoder(96, 64, qp=30)
        i_bytes = sum(len(intra.encode_frame(*f)) for f in frames[1:])
        # 0.85: hierarchical ME (half-res coarse + +-1 refine) trades
        # ~0.07 dB on the rd_compare clip for a 10x search speedup;
        # on this tiny 96x64 pan it shows up as a few % of P bytes
        assert p_bytes < i_bytes * 0.85


class TestBFrames:
    """B-frame coding (IBPBP, one B between references): TRAIL_N
    bi-predicted B slices with dual explicit MVD, decoder reordering
    (max_reorder 1, DPB 3), and the 14-bit bi-prediction combine —
    all verified bit-exact through the oracle in display order."""

    def _roundtrip(self, frames, w, h, tmp_path, tag, gop=20):
        from ceracoder_tpu.codec.h265.encoder import H265GopEncoder
        enc = H265GopEncoder(w, h, qp=30, gop=gop, bframes=1)
        outs = []
        stream = enc.headers()
        for f in frames:
            outs += enc.push_frame(*f)
        outs += enc.flush()
        for data, _, _, _ in outs:
            stream += data
        path = tmp_path / f"{tag}.265"
        path.write_bytes(stream)
        decoded = decode(path, w, h, len(frames))
        # display order: POC within the GOP, GOPs in coding order
        disp = []
        base = 0
        for o in outs:
            if o[2] == "I" and disp:
                base = max(d for d, _ in disp) + 1
            disp.append((base + o[1], o))
        by_poc = [o for _, o in sorted(disp, key=lambda t: t[0])]
        for i, ((dy, du, dv), (_, _, kind, (ry, ru, rv))) in enumerate(
                zip(decoded, by_poc)):
            assert np.array_equal(dy, ry), f"{tag} poc {i} ({kind}) luma"
            assert np.array_equal(du, ru), f"{tag} poc {i} cb"
            assert np.array_equal(dv, rv), f"{tag} poc {i} cr"
        return [o[2] for o in outs]

    def test_ibpbp_structure_and_conformance(self, tmp_path):
        frames = TestInterConformance._panning(7)
        kinds = self._roundtrip(frames, 96, 64, tmp_path, "ibpbp")
        assert kinds == ["I", "P", "B", "P", "B", "P", "B"]

    def test_flush_trailing_b_as_p(self, tmp_path):
        frames = TestInterConformance._panning(4)   # ends on a B slot
        kinds = self._roundtrip(frames, 96, 64, tmp_path, "flush")
        assert kinds == ["I", "P", "B", "P"]

    def test_gop_boundary_flushes(self, tmp_path):
        frames = TestInterConformance._panning(8)
        kinds = self._roundtrip(frames, 96, 64, tmp_path, "bgop",
                                gop=4)
        assert kinds.count("I") == 2

    def test_b_smaller_than_p(self, tmp_path):
        from ceracoder_tpu.codec.h265.encoder import H265GopEncoder
        frames = TestInterConformance._panning(7)
        enc = H265GopEncoder(96, 64, qp=30, gop=20, bframes=1)
        outs = []
        for f in frames:
            outs += enc.push_frame(*f)
        b = [len(d) for d, _, k, _ in outs if k == "B"]
        p = [len(d) for d, _, k, _ in outs if k == "P"]
        assert sum(b) / len(b) < 0.8 * sum(p) / len(p)


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
