"""Device HEVC path: ops/h265.py must reproduce the numpy reference
arrays bit for bit, and the full device encoder (device compute +
native entropy) must stream bit-exact through the libavcodec oracle.
"""

import numpy as np

from ceracoder_tpu.codec.h265.rowslice import (
    compute_intra_rows,
    compute_p_rows,
)
from tests.test_h265_rows import _panning, decode

KEYS = ("is_intra", "mode", "mv", "luma_lv", "cb_lv", "cr_lv")


def _dev(outs):
    return {k: np.asarray(v) for k, v in outs.items() if k != "recon"}, \
        tuple(np.asarray(p).astype(np.int32) for p in outs["recon"])


class TestDeviceOpsMatchReference:
    def test_intra_arrays(self):
        from ceracoder_tpu.ops.h265 import encode_frame_i_rows
        rng = np.random.default_rng(13)
        y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
        u = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        v = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        for qp in (22, 30, 38):
            ref, rec = compute_intra_rows(y, u, v, qp, qp - 1)
            arr, drec = _dev(encode_frame_i_rows(y, u, v, qp, qp - 1))
            for k in KEYS:
                assert np.array_equal(ref[k], arr[k]), f"qp{qp} {k}"
            for i in range(3):
                assert np.array_equal(rec[i], drec[i]), f"qp{qp} rec{i}"

    def test_p_arrays_motion_and_intra_fallback(self):
        from ceracoder_tpu.ops.h265 import encode_frame_p_rows
        frames = _panning(3)
        _, rec = compute_intra_rows(*frames[0], 30, 29)
        rec8 = tuple(r.astype(np.uint8) for r in rec)
        # motion + residual frame, then a smooth frame that flips CUs
        # to intra fallback
        grad = np.tile(np.linspace(0, 255, 96).astype(np.uint8), (64, 1))
        smooth = (grad, np.full((32, 48), 90, np.uint8),
                  np.full((32, 48), 170, np.uint8))
        prev = rec
        for f in (frames[1], frames[1], smooth):
            ref, refrec = compute_p_rows(*f, prev, 30, 29)
            arr, drec = _dev(encode_frame_p_rows(
                *f, *(r.astype(np.uint8) for r in prev), 30, 29))
            for k in KEYS:
                assert np.array_equal(ref[k], arr[k]), k
            for i in range(3):
                assert np.array_equal(refrec[i], drec[i]), f"rec{i}"
            prev = refrec
        del rec8


def _smooth(n, w=176, h=144):
    """Smooth sinusoidal content: engages the strong/weak luma filter
    decision paths that noise content never reaches (caught a device
    dp-derivative indexing bug noise tests missed)."""
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    for i in range(n):
        y = (128 + 90 * np.sin((xx + 5 * i) / 17.0)
             * np.cos((yy + 3 * i) / 23.0)).astype(np.uint8)
        frames.append((y, (y[::2, ::2] // 2 + 60).astype(np.uint8),
                       (y[1::2, 1::2] // 3 + 70).astype(np.uint8)))
    return frames


class TestDeviceDeblockMatchesReference:
    def test_deblock_equality_smooth(self):
        from ceracoder_tpu.codec.h265.deblock import deblock_frame
        from ceracoder_tpu.ops.h265 import deblock_frame_dev
        frames = _smooth(2)
        for qp in (28, 34):
            arr, rec = compute_intra_rows(*frames[0], qp, qp - 1)
            cbf = arr["luma_lv"].reshape(*arr["luma_lv"].shape[:2],
                                         -1).any(-1)
            ref = deblock_frame(*rec, arr["is_intra"], cbf, arr["mv"],
                                qp)
            dev = deblock_frame_dev(
                *(x.astype(np.uint8) for x in rec),
                arr["is_intra"], cbf, arr["mv"], qp)
            for i in range(3):
                assert np.array_equal(
                    ref[i], np.asarray(dev[i]).astype(np.int32)), (qp, i)

    def test_smooth_stream_conformance(self, tmp_path):
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        frames = _smooth(5)
        enc = H265DeviceEncoder(176, 144, qp=34, gop=3)
        out = enc.headers()
        recs = []
        for f in frames:
            fr = enc.encode_frame(*f)
            out += fr.data
            recs.append(fr.recon)
        path = tmp_path / "smooth.265"
        path.write_bytes(out)
        decoded = decode(path, 176, 144, len(frames))
        for i, (d, r) in enumerate(zip(decoded, recs)):
            for dp, rp in zip(d, r):
                hh, ww = dp.shape
                assert np.array_equal(dp, np.asarray(rp)[:hh, :ww]), i

    def test_deblock_equality(self):
        from ceracoder_tpu.codec.h265.deblock import deblock_frame
        from ceracoder_tpu.ops.h265 import deblock_frame_dev
        frames = _panning(2)
        for qp in (24, 32, 40):
            arr, rec = compute_intra_rows(*frames[0], qp, qp - 1)
            arrp, recp = compute_p_rows(*frames[1], rec, qp, qp - 1)
            for a, r in ((arr, rec), (arrp, recp)):
                cbf = a["luma_lv"].reshape(*a["luma_lv"].shape[:2],
                                           -1).any(-1)
                ref = deblock_frame(*r, a["is_intra"], cbf, a["mv"], qp)
                dev = deblock_frame_dev(
                    *(x.astype(np.uint8) for x in r),
                    a["is_intra"], cbf, a["mv"], qp)
                for i in range(3):
                    assert np.array_equal(ref[i],
                                          np.asarray(dev[i])
                                          .astype(np.int32)), (qp, i)


class TestDeviceEncoderConformance:
    def _roundtrip(self, frames, w, h, tmp_path, tag, gop=50, qps=None):
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        enc = H265DeviceEncoder(w, h, qp=30, gop=gop)
        out = enc.headers()
        pend, metas = [], []
        for i, f in enumerate(frames):
            pend.append(enc.encode_frame_async(
                *f, qp=qps[i] if qps else None))
        recon_by_frame = []
        for p in pend:
            fr = p.result()
            out += fr.data
            recon_by_frame.append(fr.recon)
            metas.append(fr.keyframe)
        path = tmp_path / f"{tag}.265"
        path.write_bytes(out)
        decoded = decode(path, w, h, len(frames))
        for i, (d, r) in enumerate(zip(decoded, recon_by_frame)):
            for name, dp, rp in zip("yuv", d, r):
                hh, ww = dp.shape
                assert np.array_equal(dp, rp[:hh, :ww]), \
                    f"{tag} f{i} {name}"
        return metas

    def test_gop_stream(self, tmp_path):
        kinds = self._roundtrip(_panning(6), 96, 64, tmp_path, "dev",
                                gop=3)
        assert kinds == [True, False, False, True, False, False]

    def test_qp_switching(self, tmp_path):
        self._roundtrip(_panning(4), 96, 64, tmp_path, "devqp",
                        qps=[30, 35, 25, 30])

    def test_async_pipeline_matches_sync(self, tmp_path):
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        frames = _panning(4)
        enc = H265DeviceEncoder(96, 64, qp=31, gop=8)
        pend = [enc.encode_frame_async(*f) for f in frames]
        a = enc.headers() + b"".join(p.result().data for p in pend)
        enc2 = H265DeviceEncoder(96, 64, qp=31, gop=8)
        b = enc2.headers() + b"".join(
            enc2.encode_frame(*f).data for f in frames)
        assert a == b

    def test_run_dispatch_matches_per_frame(self, tmp_path):
        """encode_run_async (whole segment in one lax.scan dispatch)
        must produce the identical stream to per-frame encoding,
        across run boundaries and with per-frame QP changes."""
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        frames = _panning(6)
        qps = [30, 30, 33, 33, 28, 28]
        enc = H265DeviceEncoder(96, 64, qp=30, gop=4)
        pend = enc.encode_run_async(frames[:3], qps=qps[:3])
        pend += enc.encode_run_async(frames[3:], qps=qps[3:])
        a = enc.headers() + b"".join(p.result().data for p in pend)
        enc2 = H265DeviceEncoder(96, 64, qp=30, gop=4)
        b = enc2.headers() + b"".join(
            enc2.encode_frame(*f, qp=q).data
            for f, q in zip(frames, qps))
        assert a == b
        path = tmp_path / "run.265"
        path.write_bytes(a)
        decode(path, 96, 64, 6)

    def test_run_dispatch_overflow_falls_back(self):
        """Frames whose sparse levels overflow the chunk capacity must
        be redone exactly on the host path."""
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        from ceracoder_tpu.ops.h265 import LEVEL_CHUNK
        rng = np.random.default_rng(3)
        frames = [(rng.integers(0, 256, (64, 96)).astype(np.uint8),
                   rng.integers(0, 256, (32, 48)).astype(np.uint8),
                   rng.integers(0, 256, (32, 48)).astype(np.uint8))
                  for _ in range(3)]
        enc = H265DeviceEncoder(96, 64, qp=22, gop=8)
        # noise at low QP: nnz per frame far exceeds one chunk; force
        # overflow by capping at one chunk
        pend = enc.encode_run_async(frames, cap=LEVEL_CHUNK)
        a = enc.headers() + b"".join(p.result().data for p in pend)
        enc2 = H265DeviceEncoder(96, 64, qp=22, gop=8)
        b = enc2.headers() + b"".join(
            enc2.encode_frame(*f).data for f in frames)
        assert a == b

    def test_run_dispatch_device_source(self):
        from ceracoder_tpu.app.source import DeviceTestPatternSource
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        src = DeviceTestPatternSource(96, 64, texture=4)
        enc = H265DeviceEncoder(96, 64, qp=30, gop=8)
        pend = enc.encode_run_async(source=src, indices=range(4))
        a = enc.headers() + b"".join(p.result().data for p in pend)
        enc2 = H265DeviceEncoder(96, 64, qp=30, gop=8)
        b = enc2.headers()
        for i in range(4):
            y, u, v = (np.asarray(p) for p in src.frame(i))
            b += enc2.encode_frame(y, u, v).data
        assert a == b

    def test_bframes_match_row_encoder_and_oracle(self, tmp_path):
        """Device IBPBP chain must equal the numpy reference stream
        byte for byte and decode bit-exact (display order rebuilt from
        POCs)."""
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        from ceracoder_tpu.codec.h265.rowslice import H265RowEncoder
        frames = _panning(7)
        d = H265DeviceEncoder(96, 64, qp=30, gop=50, bframes=1)
        r = H265RowEncoder(96, 64, qp=30, gop=50, bframes=1)
        dcoded, rbytes = [], b""
        for f in frames:
            dcoded += d.push_frame(*f)
            for t in r.push_frame(*f):
                rbytes += t[0]
        dcoded += d.flush()
        for t in r.flush():
            rbytes += t[0]
        dbytes = b"".join(t[0] for t in dcoded)
        assert dbytes == rbytes
        path = tmp_path / "devb.265"
        path.write_bytes(d.headers() + dbytes)
        decoded = decode(path, 96, 64, len(frames))
        disp = sorted(dcoded, key=lambda t: t[1])
        for i, dec in enumerate(decoded):
            rec = tuple(np.asarray(p) for p in disp[i][3])
            for nm, dp, rp in zip("yuv", dec, rec):
                hh, ww = dp.shape
                assert np.array_equal(dp, rp[:hh, :ww]), (i, nm)

    def test_odd_dimensions_device(self, tmp_path):
        """Non-CTB-aligned dims: device pads, SPS crops, oracle
        decodes at the true size."""
        frames = _panning(3, w=88, h=56)
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        enc = H265DeviceEncoder(88, 56, qp=31, gop=8)
        out = enc.headers()
        recs = []
        for f in frames:
            fr = enc.encode_frame(*f)
            out += fr.data
            recs.append(fr.recon)
        path = tmp_path / "odd.265"
        path.write_bytes(out)
        decoded = decode(path, 88, 56, 3)
        for i, (d, r) in enumerate(zip(decoded, recs)):
            for dp, rp in zip(d, r):
                hh, ww = dp.shape
                assert np.array_equal(dp, np.asarray(rp)[:hh, :ww]), i

    def test_wider_frame_arrays_match(self):
        """A larger, non-square shape (uneven unroll path: 20 CTB
        cols) must still match the numpy reference bit for bit."""
        from ceracoder_tpu.ops.h265 import (
            encode_frame_i_rows,
            encode_frame_p_rows,
        )
        rng = np.random.default_rng(41)
        w, h = 320, 48
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        ref, rec = compute_intra_rows(y, u, v, 31, 30)
        arr, drec = _dev(encode_frame_i_rows(y, u, v, 31, 30))
        for k in KEYS:
            assert np.array_equal(ref[k], arr[k]), k
        y2 = np.roll(y, (5, -7), (0, 1))
        refp, _ = compute_p_rows(y2, u, v, rec, 31, 30)
        arrp, _ = _dev(encode_frame_p_rows(
            y2, u, v, *(r.astype(np.uint8) for r in rec), 31, 30))
        for k in KEYS:
            assert np.array_equal(refp[k], arrp[k]), k

    def test_b_run_dispatch_matches_push_path(self, tmp_path):
        """The fused (B, P)-pair scan must reproduce the per-frame
        push path exactly across GOP boundaries and odd tails, and
        the stream must decode bit-exact in display order."""
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        frames = _panning(9)
        r = H265DeviceEncoder(96, 64, qp=30, gop=6, bframes=1)
        ref_out = []
        for f in frames:
            ref_out += r.push_frame(*f)
        ref_out += r.flush()
        ref_stream = b"".join(t[0] for t in ref_out)

        d = H265DeviceEncoder(96, 64, qp=30, gop=6, bframes=1)
        run = d.encode_run_b_async(frames)
        items = [(t[0].result(), t[1], t[2]) for t in run]
        assert b"".join(f.data for f, _, _ in items) == ref_stream

        path = tmp_path / "brun.265"
        path.write_bytes(d.headers() + ref_stream)
        decoded = decode(path, 96, 64, len(frames))
        # display order: segments of coding-order tuples sorted by poc
        disp = []
        seg = []
        for f, poc, kind in items:
            if kind == "I" and seg:
                disp += sorted(seg, key=lambda t: t[1])
                seg = []
            seg.append((f, poc, kind))
        disp += sorted(seg, key=lambda t: t[1])
        for i, dec in enumerate(decoded):
            rec = tuple(np.asarray(p) for p in disp[i][0].recon)
            for dp, rp in zip(dec, rec):
                hh, ww = dp.shape
                assert np.array_equal(dp, rp[:hh, :ww]), i

    def test_matches_row_encoder_stream(self, tmp_path):
        """Device encoder and the numpy H265RowEncoder must emit the
        identical bitstream (same arrays -> same entropy)."""
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        from ceracoder_tpu.codec.h265.rowslice import H265RowEncoder
        frames = _panning(3)
        d = H265DeviceEncoder(96, 64, qp=30, gop=50)
        r = H265RowEncoder(96, 64, qp=30, gop=50)
        for f in frames:
            dd = d.encode_frame(*f).data
            rr, _ = r.encode_frame(*f)
            assert dd == rr


class TestTuSplitDevice:
    """Inter TU split on the device path: per-frame and fused-run
    dispatches must equal the numpy row encoder byte for byte (the
    oracle conformance of that stream is pinned in
    tests/test_h265_rows.py::TestInterTuSplit)."""

    @staticmethod
    def _clip(n, w=96, h=64, seed=7):
        from tests.test_h265_rows import _split_heavy
        return _split_heavy(n, w, h, seed)

    def test_per_frame_matches_row_encoder(self):
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        from ceracoder_tpu.codec.h265.rowslice import H265RowEncoder
        frames = self._clip(4)
        d = H265DeviceEncoder(96, 64, qp=30, gop=50, tu_split=True)
        r = H265RowEncoder(96, 64, qp=30, gop=50, tu_split=True)
        a = d.headers() + b"".join(
            d.encode_frame(*f).data for f in frames)
        b = r.headers() + b"".join(
            r.encode_frame(*f)[0] for f in frames)
        assert a == b

    def test_run_dispatch_matches_per_frame(self):
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        frames = self._clip(5, seed=23)
        enc = H265DeviceEncoder(96, 64, qp=32, gop=50, tu_split=True)
        pend = enc.encode_run_async(frames)
        a = enc.headers() + b"".join(p.result().data for p in pend)
        enc2 = H265DeviceEncoder(96, 64, qp=32, gop=50, tu_split=True)
        b = enc2.headers() + b"".join(
            enc2.encode_frame(*f).data for f in frames)
        assert a == b

    def test_b_pairs_match_push_path(self):
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        frames = self._clip(6, seed=29)
        enc = H265DeviceEncoder(96, 64, qp=31, gop=50, bframes=1,
                                tu_split=True)
        outs = enc.encode_run_b_async(frames)
        a = enc.headers() + b"".join(
            t[0].result().data for t in outs)
        enc2 = H265DeviceEncoder(96, 64, qp=31, gop=50, bframes=1,
                                 tu_split=True)
        coded = []
        for f in frames:
            coded += enc2.push_frame(*f)
        coded += enc2.flush()
        b = enc2.headers() + b"".join(t[0] for t in coded)
        assert a == b


class TestLimbTransformExactness:
    """The MXU limb-split transforms must be bit-exact against a
    straight int32 formulation at WORST-CASE operand ranges (the
    content-driven parity tests above never reach the +-32767
    dequant clip rails)."""

    def test_fwd_inv_extreme_ranges(self):
        import jax.numpy as jnp

        from ceracoder_tpu.codec.h265.tables import T4, T8, T16
        from ceracoder_tpu.ops.h265 import (
            _fwd_transform,
            _inv_transform,
        )

        def fwd_int(res, t, log2n):
            s1, s2 = log2n - 1, log2n + 6
            a = (np.einsum("ij,njk->nik", t, res)
                 + (1 << (s1 - 1))) >> s1
            return (np.einsum("nij,kj->nik", a, t)
                    + (1 << (s2 - 1))) >> s2

        def inv_int(coef, t, log2n):
            a = (np.einsum("ji,njk->nik", t, coef) + 64) >> 7
            a = np.clip(a, -32768, 32767)
            r = (np.einsum("nij,jk->nik", a, t) + 2048) >> 12
            return np.clip(r, -32768, 32767)

        rng = np.random.default_rng(7)
        for t_np, log2n in ((np.asarray(T16, np.int64), 4),
                            (np.asarray(T8, np.int64), 3),
                            (np.asarray(T4, np.int64), 2)):
            n = 1 << log2n
            t = jnp.asarray(t_np, jnp.int32)
            # residuals: random full-range + all-extreme corners
            res = rng.integers(-255, 256, (64, n, n))
            res[0], res[1] = 255, -255
            res[2, :, ::2], res[2, :, 1::2] = 255, -255
            got = np.asarray(_fwd_transform(
                jnp.asarray(res, jnp.int32), t, log2n))
            assert (got == fwd_int(res, t_np, log2n)).all()
            # coefficients at the clip rails and random
            coef = rng.integers(-32768, 32768, (64, n, n))
            coef[0], coef[1] = 32767, -32768
            coef[2, ::2], coef[2, 1::2] = 32767, -32768
            got = np.asarray(_inv_transform(
                jnp.asarray(coef, jnp.int32), t, log2n))
            assert (got == inv_int(coef, t_np, log2n)).all()
