"""Row-slice HEVC path: oracle conformance of the numpy reference and
byte equality of the native (C++) entropy stage with the Python spec.

The row-slice schedule (one slice per CTB row) is the TPU coding
structure: the device op (ops/h265.py) must reproduce
compute_*_rows' arrays, and native/src/hevc_entropy.cc must reproduce
entropy_rows' bytes — both pinned here (SURVEY.md §4 takeaway (a):
pure cores driven by synthetic inputs; §7.1 step 4).
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from ceracoder_tpu.codec.h265.rowslice import (
    H265RowEncoder,
    compute_intra_rows,
    compute_p_rows,
    entropy_rows,
    entropy_rows_native,
)
from ceracoder_tpu.codec.h265.syntax import HevcParams

TOOLS = Path(__file__).resolve().parents[1] / "tools"


def oracle():
    exe = TOOLS / "decode_oracle"
    if not exe.exists():
        subprocess.run(["make", "-C", str(TOOLS)], check=True,
                       capture_output=True)
    return exe


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


def _panning(n, w=96, h=64, step=(3, 5), seed=11):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (3 * h, 3 * w)).astype(np.uint8)
    frames = []
    for i in range(n):
        dy, dx = step[0] * i - n, step[1] * i - n
        y = base[h + dy:2 * h + dy, w + dx:2 * w + dx].copy()
        u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
        v = (y[1::2, 1::2] // 3 + 80).astype(np.uint8)
        frames.append((y, u, v))
    return frames


class TestRowSliceConformance:
    def _run(self, frames, w, h, tmp_path, tag, qps=None, gop=50):
        enc = H265RowEncoder(w, h, qp=30, gop=gop)
        out = enc.headers()
        recons, kinds = [], []
        for i, f in enumerate(frames):
            data, idr = enc.encode_frame(
                *f, qp=qps[i] if qps else None)
            out += data
            recons.append(enc.recon)
            kinds.append("I" if idr else "P")
        path = tmp_path / f"{tag}.265"
        path.write_bytes(out)
        decoded = decode(path, w, h, len(frames))
        for i, (d, r) in enumerate(zip(decoded, recons)):
            for name, dp, rp in zip("yuv", d, r):
                assert np.array_equal(dp, rp), f"{tag} f{i} {name}"
        return kinds

    def test_intra_noise(self, tmp_path):
        rng = np.random.default_rng(5)
        y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
        u = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        v = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        self._run([(y, u, v)], 96, 64, tmp_path, "noise")

    def test_panning_gop(self, tmp_path):
        kinds = self._run(_panning(5), 96, 64, tmp_path, "pan")
        assert kinds == ["I", "P", "P", "P", "P"]

    def test_static_skips(self, tmp_path):
        y, u, v = _panning(1)[0]
        frames = [(y, u, v)] * 3
        enc = H265RowEncoder(96, 64, qp=30, gop=50)
        sizes = []
        out = enc.headers()
        for f in frames:
            data, _ = enc.encode_frame(*f)
            sizes.append(len(data))
            out += data
        # all-skip P rows are a few bytes each
        assert sizes[1] < sizes[0] // 10
        path = tmp_path / "static.265"
        path.write_bytes(out)
        decode(path, 96, 64, 3)

    def test_scene_change_intra_fallback(self, tmp_path):
        rng = np.random.default_rng(9)
        f0 = _panning(1)[0]
        y1 = rng.integers(0, 256, (64, 96)).astype(np.uint8)
        f1 = (y1, (y1[::2, ::2] // 2).astype(np.uint8),
              (y1[1::2, 1::2] // 2 + 99).astype(np.uint8))
        self._run([f0, f1], 96, 64, tmp_path, "scene")

    def test_qp_changes(self, tmp_path):
        self._run(_panning(4), 96, 64, tmp_path, "qp",
                  qps=[30, 34, 26, 30])

    def test_gop_boundary(self, tmp_path):
        kinds = self._run(_panning(5), 96, 64, tmp_path, "gop", gop=2)
        assert kinds == ["I", "P", "I", "P", "I"]

    def test_odd_dimensions(self, tmp_path):
        frames = _panning(3, w=88, h=56)
        self._run(frames, 88, 56, tmp_path, "odd")

    def test_subpixel_panning(self, tmp_path):
        """Non-integer motion (1.25 px/frame horizontal, 0.75
        vertical) drives the quarter-pel refinement into fractional
        MVs; the luma 8-tap and chroma 4-tap interpolation must match
        the oracle decoder exactly."""
        w, h = 96, 64
        xx, yy = np.meshgrid(np.arange(w + 32, dtype=float),
                             np.arange(h + 32, dtype=float))
        base = (128 + 60 * np.sin(xx / 9.3) * np.cos(yy / 11.7)
                + 40 * np.sin((xx + yy) / 23.0))
        frames = []
        for i in range(5):
            sx, sy = 8 + 1.25 * i, 8 + 0.75 * i
            x0, y0 = int(sx), int(sy)
            fx, fy = sx - x0, sy - y0
            a = base[y0:y0 + h + 1, x0:x0 + w + 1]
            y = ((1 - fy) * (1 - fx) * a[:-1, :-1]
                 + (1 - fy) * fx * a[:-1, 1:]
                 + fy * (1 - fx) * a[1:, :-1] + fy * fx * a[1:, 1:])
            y = np.clip(y, 0, 255).astype(np.uint8)
            frames.append((y, (y[::2, ::2] // 2 + 60).astype(np.uint8),
                           (y[1::2, 1::2] // 3 + 70).astype(np.uint8)))
        self._run(frames, w, h, tmp_path, "subpel")
        # the refinement must actually choose fractional MVs
        from ceracoder_tpu.codec.h265.rowslice import compute_p_rows
        from ceracoder_tpu.codec.h265.rowslice import compute_intra_rows
        _, rec = compute_intra_rows(*frames[0], 30, 29)
        arr, _ = compute_p_rows(*frames[1], rec, 30, 29)
        assert (arr["mv"] & 3).any()


class TestBFrames:
    def _roundtrip(self, frames, w, h, tmp_path, tag, gop=50):
        enc = H265RowEncoder(w, h, qp=30, gop=gop, bframes=1)
        out = enc.headers()
        coded = []
        for f in frames:
            coded += enc.push_frame(*f)
        coded += enc.flush()
        for data, _, _, _ in coded:
            out += data
        path = tmp_path / f"{tag}.265"
        path.write_bytes(out)
        decoded = decode(path, w, h, len(frames))
        disp = sorted(coded, key=lambda t: t[1])
        for i, d in enumerate(decoded):
            for name, dp, rp in zip("yuv", d, disp[i][3]):
                assert np.array_equal(dp, rp), f"{tag} f{i} {name}"
        return [k for _, _, k, _ in coded]

    def test_ibpbp_structure(self, tmp_path):
        kinds = self._roundtrip(_panning(7), 96, 64, tmp_path, "b")
        assert kinds == ["I", "P", "B", "P", "B", "P", "B"]

    def test_flush_trailing_b_as_p(self, tmp_path):
        kinds = self._roundtrip(_panning(6), 96, 64, tmp_path, "bf")
        assert kinds == ["I", "P", "B", "P", "B", "P"]

    def test_b_beats_p_on_subpixel_motion(self, tmp_path):
        """Bi-prediction should cost fewer bits than low-delay P at
        equal QP when residual bits dominate (textured content with
        sub-pixel panning; in the overhead-dominated smooth regime the
        per-row slice headers hide the gain)."""
        w, h = 96, 64
        rng = np.random.default_rng(3)
        big = rng.integers(0, 256, (h + 40, w + 40)).astype(np.float64)
        # band-limit so motion is compensable
        k = np.ones(5) / 5
        for ax in (0, 1):
            big = np.apply_along_axis(
                lambda r: np.convolve(r, k, "same"), ax, big)
        big = (big - big.min()) * (255 / (big.max() - big.min()))
        frames = []
        for i in range(7):
            sx, sy = 8 + 1.6 * i, 8 + 0.9 * i
            x0, y0 = int(sx), int(sy)
            fx, fy = sx - x0, sy - y0
            a = big[y0:y0 + h + 1, x0:x0 + w + 1]
            y = np.clip((1 - fy) * (1 - fx) * a[:-1, :-1]
                        + (1 - fy) * fx * a[:-1, 1:]
                        + fy * (1 - fx) * a[1:, :-1]
                        + fy * fx * a[1:, 1:], 0, 255).astype(np.uint8)
            frames.append((y, (y[::2, ::2] // 2 + 60).astype(np.uint8),
                           (y[1::2, 1::2] // 3 + 70).astype(np.uint8)))
        eb = H265RowEncoder(w, h, qp=26, gop=50, bframes=1)
        outs = []
        for f in frames:
            outs += eb.push_frame(*f)
        outs += eb.flush()
        b_sizes = [len(t[0]) for t in outs if t[2] == "B"]
        # bi-predicted B frames (both refs at distance 1) must be
        # cheaper than the same chain's P frames (distance 2)
        p2_sizes = [len(t[0]) for t in outs if t[2] == "P"][:-1]
        assert np.mean(b_sizes) < np.mean(p2_sizes)

    def test_native_b_entropy_bytes(self):
        from ceracoder_tpu import native
        if native.load() is None:
            pytest.skip("native library unavailable")
        from ceracoder_tpu.codec.h265.rowslice import compute_b_rows
        frames = _panning(3)
        _, rec0 = compute_intra_rows(*frames[0], 30, 29)
        _, rec2 = compute_intra_rows(*frames[2], 30, 29)
        arr, _ = compute_b_rows(*frames[1], rec0, rec2, 30, 29)
        p = HevcParams(width=96, height=64, qp=30, pcm_enabled=False,
                       max_reorder=1, max_dpb_minus1=2)
        a = entropy_rows(p, arr, 30, idr=False, poc=1, slice_type="B")
        b = entropy_rows_native(p, arr, 30, idr=False, poc=1,
                                slice_type="B")
        assert b is not None
        for i, (x, z) in enumerate(zip(a, b)):
            assert x == z, f"row {i}"
        # synthetic stress: random bi MVs, mixed intra, sparse levels
        rng = np.random.default_rng(29)
        nch, ncw = 3, 6
        arr2 = {
            "is_intra": rng.random((nch, ncw)) < 0.3,
            "mode": rng.choice([0, 1, 10, 26], (nch, ncw))
            .astype(np.int32),
            "mv": rng.integers(-33, 34, (nch, ncw, 2)).astype(np.int32),
            "mv1": rng.integers(-33, 34, (nch, ncw, 2))
            .astype(np.int32),
            "luma_lv": (rng.integers(-9, 10, (nch, ncw, 16, 16))
                        * (rng.random((nch, ncw, 16, 16)) < 0.1))
            .astype(np.int32),
            "cb_lv": (rng.integers(-5, 6, (nch, ncw, 8, 8))
                      * (rng.random((nch, ncw, 8, 8)) < 0.15))
            .astype(np.int32),
            "cr_lv": np.zeros((nch, ncw, 8, 8), np.int32),
        }
        a2 = entropy_rows(p, arr2, 34, idr=False, poc=3,
                          slice_type="B")
        b2 = entropy_rows_native(p, arr2, 34, idr=False, poc=3,
                                 slice_type="B")
        for i, (x, z) in enumerate(zip(a2, b2)):
            assert x == z, f"stress row {i}"


class TestNativeEntropy:
    """native/src/hevc_entropy.cc must be byte-identical to the
    Python entropy_rows spec."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from ceracoder_tpu import native
        if native.load() is None:
            pytest.skip("native library unavailable")

    def _check(self, arrays, qp, idr, poc=0, w=96, h=64):
        p = HevcParams(width=w, height=h, qp=qp, pcm_enabled=False)
        a = entropy_rows(p, arrays, qp, idr=idr, poc=poc)
        b = entropy_rows_native(p, arrays, qp, idr=idr, poc=poc)
        assert b is not None
        assert len(a) == len(b)
        for i, (x, z) in enumerate(zip(a, b)):
            assert x == z, f"row {i} differs"

    def test_intra_bytes(self):
        rng = np.random.default_rng(3)
        y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
        u = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        v = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        for qp in (20, 30, 40):
            arrays, _ = compute_intra_rows(y, u, v, qp, qp - 1)
            self._check(arrays, qp, idr=True)

    def test_p_bytes_motion_skip_intra(self):
        frames = _panning(3)
        enc_qp = 30
        arrays0, rec = compute_intra_rows(*frames[0], enc_qp, 29)
        # motion + residual
        arr1, rec1 = compute_p_rows(*frames[1], rec, enc_qp, 29)
        self._check(arr1, enc_qp, idr=False, poc=1)
        # static -> skips
        arr2, _ = compute_p_rows(*frames[1], rec1, enc_qp, 29)
        assert not arr2["is_intra"].any()
        self._check(arr2, enc_qp, idr=False, poc=2)
        # scene change to smooth content -> intra fallback CUs (intra
        # predicts a horizontal gradient well; inter from the detailed
        # previous scene cannot)
        y = np.tile(np.linspace(0, 255, 96).astype(np.uint8), (64, 1))
        u = np.full((32, 48), 100, np.uint8)
        v = np.full((32, 48), 160, np.uint8)
        arr3, _ = compute_p_rows(y, u, v, rec1, enc_qp, 29)
        assert arr3["is_intra"].any()
        self._check(arr3, enc_qp, idr=False, poc=3)

    def test_synthetic_levels_stress(self):
        """Random sparse level patterns stress every residual-coding
        branch (rice escapes, csbf inference, gr1 context sets)."""
        rng = np.random.default_rng(23)
        nch, ncw = 2, 6
        for trial in range(4):
            mag = [3, 40, 400, 30000][trial]
            luma = rng.integers(-mag, mag + 1, (nch, ncw, 16, 16))
            luma *= rng.random((nch, ncw, 16, 16)) < 0.15
            cb = rng.integers(-mag, mag + 1, (nch, ncw, 8, 8))
            cb *= rng.random((nch, ncw, 8, 8)) < 0.2
            cr = rng.integers(-mag, mag + 1, (nch, ncw, 8, 8))
            cr *= rng.random((nch, ncw, 8, 8)) < 0.1
            arrays = {
                "is_intra": rng.random((nch, ncw)) < 0.5,
                "mode": rng.choice([0, 1, 10, 26], (nch, ncw))
                .astype(np.int32),
                "mv": (rng.integers(-8, 9, (nch, ncw, 2)) * 4)
                .astype(np.int32),
                "luma_lv": luma.astype(np.int32),
                "cb_lv": cb.astype(np.int32),
                "cr_lv": cr.astype(np.int32),
            }
            self._check(arrays, 30, idr=False, poc=1)


class TestSao:
    """SAO (spec 8.7.3): streams with the post-deblock offset stage
    must decode bit-exact; the lambda gate keeps it off where the
    syntax outweighs the gain."""

    def test_sao_conformance_smooth(self, tmp_path):
        from tests.test_h265_device import _smooth
        frames = _smooth(4)
        enc = H265RowEncoder(176, 144, qp=34, gop=3, sao=True)
        out = enc.headers()
        recs = []
        for f in frames:
            data, _ = enc.encode_frame(*f)
            out += data
            recs.append(enc.recon)
        path = tmp_path / "sao.265"
        path.write_bytes(out)
        decoded = decode(path, 176, 144, len(frames))
        engaged = False
        for i, (d, r) in enumerate(zip(decoded, recs)):
            for dp, rp in zip(d, r):
                assert np.array_equal(dp, rp), i
        # estimator engagement: a systematic band error must clear
        # the lambda gate and be captured by band offsets
        from ceracoder_tpu.codec.h265.sao import sao_estimate
        rng = np.random.default_rng(3)
        src_y = rng.integers(60, 90, (64, 96)).astype(np.int32)
        rec_y = src_y.copy()
        rec_y[:16, :16] = np.clip(rec_y[:16, :16] - 5, 0, 255)
        flat = np.full((32, 48), 100, np.int32)
        params = sao_estimate((src_y, flat, flat),
                              (rec_y, flat.copy(), flat.copy()), 24)
        assert params[0, 0, 0, 0] != 0      # luma engages on CTB 0,0
        assert (params[0, 1:, 0, 0] == 0).all()

    def test_sao_engaged_stream_conformance(self, tmp_path):
        """A stream where SAO genuinely engages (a +4 brightness
        flicker whose residual partly quantizes away leaves a
        systematic positive error that band offsets capture) must
        decode bit-exact with nonzero SAO params."""
        from ceracoder_tpu.codec.h265.deblock import deblock_frame
        from ceracoder_tpu.codec.h265.sao import sao_estimate
        rng = np.random.default_rng(5)
        w, h = 96, 64
        y0 = rng.integers(40, 200, (h, w)).astype(np.uint8)
        u0 = rng.integers(60, 160, (h // 2, w // 2)).astype(np.uint8)
        v0 = rng.integers(60, 160, (h // 2, w // 2)).astype(np.uint8)
        y1 = np.clip(y0.astype(int) + 4, 0, 255).astype(np.uint8)

        # engagement check through the real coding chain
        arr, rec = compute_intra_rows(y0, u0, v0, 30, 29)
        cbf = arr["luma_lv"].reshape(*arr["luma_lv"].shape[:2],
                                     -1).any(-1)
        rec = deblock_frame(*rec, arr["is_intra"], cbf, arr["mv"], 30)
        arr2, rec2 = compute_p_rows(y1, u0, v0, rec, 30, 29)
        cbf2 = arr2["luma_lv"].reshape(*arr2["luma_lv"].shape[:2],
                                       -1).any(-1)
        rec2 = deblock_frame(*rec2, arr2["is_intra"], cbf2,
                             arr2["mv"], 30)
        params = sao_estimate(
            (y1.astype(np.int32), u0.astype(np.int32),
             v0.astype(np.int32)), rec2, 30)
        assert (params[:, :, 0, 0] != 0).any(), "SAO must engage"

        enc = H265RowEncoder(w, h, qp=30, gop=8, sao=True)
        out = enc.headers()
        recs = []
        for f in ((y0, u0, v0), (y1, u0, v0), (y0, u0, v0)):
            data, _ = enc.encode_frame(*f)
            out += data
            recs.append(enc.recon)
        path = tmp_path / "saoeng.265"
        path.write_bytes(out)
        decoded = decode(path, w, h, 3)
        for i, (d, r) in enumerate(zip(decoded, recs)):
            for dp, rp in zip(d, r):
                assert np.array_equal(dp, rp), i

    def test_sao_device_matches_row(self):
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        from tests.test_h265_device import _smooth
        frames = _smooth(3)
        d = H265DeviceEncoder(176, 144, qp=34, gop=3, sao=True)
        r = H265RowEncoder(176, 144, qp=34, gop=3, sao=True)
        for f in frames:
            assert d.encode_frame(*f).data == r.encode_frame(*f)[0]

    def test_sao_run_dispatch(self):
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        from tests.test_h265_device import _smooth
        frames = _smooth(5)
        d = H265DeviceEncoder(176, 144, qp=34, gop=3, sao=True)
        pend = d.encode_run_async(frames)
        a = b"".join(p.result().data for p in pend)
        r = H265RowEncoder(176, 144, qp=34, gop=3, sao=True)
        b = b"".join(r.encode_frame(*f)[0] for f in frames)
        assert a == b


def _split_heavy(n, w=96, h=64, seed=7):
    """Panning clip where one 8x8 quadrant per CU is fresh noise —
    residual energy concentrates in one quadrant, so the RD decision
    picks the quadrant TU split for most CUs."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 32, w + 32), np.uint8)
    frames = []
    for i in range(n):
        y = np.asarray(base[i:i + h, 2 * i:2 * i + w]).copy()
        for cy in range(0, h, 16):
            for cx in range(0, w, 16):
                y[cy:cy + 8, cx:cx + 8] = rng.integers(0, 255, (8, 8))
        u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
        v = (y[1::2, 1::2] // 3 + 80).astype(np.uint8)
        frames.append((y, u, v))
    return frames


class TestInterTuSplit:
    """Inter TU split (16 luma CU residual as 4x8 + 4x4 chroma,
    16*SSD + lambda*bits decision): oracle conformance including the
    interior TU-edge deblocking, native C++ == Python bytes, and the
    RD win on quadrant-concentrated residuals."""

    def _encode(self, frames, w, h, qp, native, bframes=0,
                tiles=False):
        enc = H265RowEncoder(w, h, qp=qp, gop=50, tu_split=True,
                             bframes=bframes, tile_rows=tiles,
                             native_entropy=native)
        chunks, recons = [enc.headers()], []
        outs = []
        for f in frames:
            outs += enc.push_frame(*f)
        outs += enc.flush()
        for data, poc, kind, rec in outs:
            chunks.append(data)
            recons.append((poc, rec))
        return b"".join(chunks), recons

    def test_oracle_and_native_p(self, tmp_path):
        w, h, qp = 96, 64, 30
        frames = _split_heavy(5, w, h)
        stream, recons = self._encode(frames, w, h, qp, native=False)
        nstream, _ = self._encode(frames, w, h, qp, native=True)
        assert stream == nstream, "C++ entropy != Python with tu_split"
        path = tmp_path / "tusplit.265"
        path.write_bytes(stream)
        decoded = decode(path, w, h, len(frames))
        for i, (d, (_, r)) in enumerate(zip(decoded, recons)):
            for name, dp, rp in zip("yuv", d, r):
                assert np.array_equal(dp, rp), f"f{i} {name}"

    def test_oracle_b_and_tiles(self, tmp_path):
        w, h, qp = 96, 64, 33
        frames = _split_heavy(6, w, h, seed=13)
        stream, recons = self._encode(frames, w, h, qp, native=False,
                                      bframes=1, tiles=True)
        nstream, _ = self._encode(frames, w, h, qp, native=True,
                                  bframes=1, tiles=True)
        assert stream == nstream
        path = tmp_path / "tusplit_b.265"
        path.write_bytes(stream)
        decoded = decode(path, w, h, len(frames))
        by_poc = sorted(recons, key=lambda t: t[0])
        for i, (d, (_, r)) in enumerate(zip(decoded, by_poc)):
            for name, dp, rp in zip("yuv", d, r):
                assert np.array_equal(dp, rp), f"poc {i} {name}"

    def test_split_chosen_and_rd_improves(self, tmp_path):
        """On quadrant-concentrated residuals the split must actually
        engage, and coding with it must not be worse in rate at equal
        or better distortion proxy (smaller stream, PSNR within
        noise)."""
        w, h, qp = 96, 64, 32
        frames = _split_heavy(4, w, h, seed=21)
        arrays, _ = compute_p_rows(
            *[p.astype(np.int32) for p in frames[1]],
            tuple(p.astype(np.int32) for p in
                  (frames[0][0], frames[0][1], frames[0][2])),
            qp, 31, tu_split=True)
        assert arrays["tu_split"].sum() >= arrays["tu_split"].size // 2

        on, _ = self._encode(frames, w, h, qp, native=True)
        enc = H265RowEncoder(w, h, qp=qp, gop=50, tu_split=False)
        off = enc.headers()
        for f in frames:
            off += enc.encode_frame(*f)[0]
        assert len(on) < len(off)
