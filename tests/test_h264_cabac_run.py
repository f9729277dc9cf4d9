"""Fused-run CABAC path (codec/h264/cabac_run.py): byte-equality
against the dense host path (the oracle-verified executable spec), so
conformance carries over; plus the overflow fallback and the sparse
transfer round trip.

Reference behavior being replicated: the x264enc CABAC default of the
reference's software pipelines (reference:
bindings/typescript/src/pipeline/generic-builder.ts:49-55) at
streaming dispatch rate (one device launch per GOP segment, not per
frame).
"""

import numpy as np
import pytest

from ceracoder_tpu.codec.h264.encoder import H264Encoder


def _frames(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    base_y = rng.integers(0, 200, (h, w)).astype(np.float32)
    out = []
    for i in range(n):
        y = np.clip(base_y * 0.4 + 40 + i * 5
                    + rng.normal(0, 6, (h, w)), 0, 255).astype(np.uint8)
        u = rng.integers(90, 160, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(90, 160, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def _host_bytes(frames, w, h, **kw):
    enc = H264Encoder(w, h, cabac=True, device_entropy=False, **kw)
    return [enc.encode_frame(*f).data for f in frames]


def test_fused_run_matches_host_path():
    w, h = 96, 64
    frames = _frames(w, h, 7)
    ref = _host_bytes(frames, w, h, qp=30, gop=3)

    enc = H264Encoder(w, h, qp=30, gop=3, cabac=True)
    assert enc.cabac_fused
    got = [p.result().data for p in enc.encode_run_async(frames=frames)]
    assert got == ref


def test_fused_per_frame_async_matches():
    w, h = 96, 64
    frames = _frames(w, h, 4, seed=3)
    ref = _host_bytes(frames, w, h, qp=28, gop=2)

    enc = H264Encoder(w, h, qp=28, gop=2, cabac=True)
    pend = [enc.encode_frame_async(*f) for f in frames]
    assert [p.result().data for p in pend] == ref


def test_fused_overflow_falls_back_exactly():
    from ceracoder_tpu.codec.h264.cabac_run import CHUNK

    w, h = 96, 64
    frames = _frames(w, h, 5, seed=11)
    ref = _host_bytes(frames, w, h, qp=12, gop=3)  # low qp: dense levels

    enc = H264Encoder(w, h, qp=12, gop=3, cabac=True)
    # shrink the sparse capacity so every frame overflows
    enc._cabac_cap = CHUNK // 64
    enc._cabac_idr_chunk = CHUNK // 64
    got = [p.result().data for p in enc.encode_run_async(frames=frames)]
    assert got == ref


def test_per_frame_qp_array():
    w, h = 96, 64
    frames = _frames(w, h, 5, seed=5)
    qps = [30, 32, 28, 34, 30]

    enc_ref = H264Encoder(w, h, qp=30, gop=8, cabac=True,
                          device_entropy=False)
    ref = [enc_ref.encode_frame(*f, qp=q).data
           for f, q in zip(frames, qps)]

    enc = H264Encoder(w, h, qp=30, gop=8, cabac=True)
    got = [p.result().data
           for p in enc.encode_run_async(frames=frames, qps=qps)]
    assert got == ref


def test_pack_unpack_roundtrip():
    import jax.numpy as jnp

    from ceracoder_tpu.codec.h264 import cabac_run

    rng = np.random.default_rng(0)
    mbh, mbw = 3, 5
    n = mbh * mbw
    flat = ((rng.random((n, 384)) < 0.08)
            * rng.integers(-500, 500, (n, 384))).astype(np.int16)
    mv = rng.integers(-60, 60, (n, 2)).astype(np.int16)

    from ceracoder_tpu.ops.h265 import compact_slots
    pos, val, nnz = compact_slots(jnp.asarray(flat), 2 * cabac_run.CHUNK)
    counts = (flat != 0).sum(1).astype(np.uint16)
    meta = np.zeros(n, np.uint8)
    packed, chunks = cabac_run._pack_rows(
        jnp.asarray(meta)[None], jnp.asarray(counts)[None],
        jnp.asarray(mv)[None],
        pos[None], val[None], nnz[None][None], cabac_run.CHUNK)
    row = np.asarray(packed)[0]
    got_nnz, arrays = cabac_run.unpack_syntax(
        row, lambda c: np.asarray(chunks[c]), 0, mbh, mbw,
        intra=False, cap=2 * cabac_run.CHUNK)
    assert got_nnz == (flat != 0).sum()
    dense = np.concatenate([
        arrays["luma_lv"].reshape(n, 256),
        arrays["dc_chroma"].reshape(n, 8),
        arrays["ac_chroma"].reshape(n, 120)], axis=1)
    np.testing.assert_array_equal(dense, flat)
    np.testing.assert_array_equal(
        arrays["mv"].reshape(n, 2), mv.astype(np.int64))


def test_decodes_with_oracle(tmp_path):
    """End-to-end: the fused-run stream decodes with libavcodec and the
    decode matches the encoder's reconstruction bit-exactly (same
    oracle harness as tests/test_h264_conformance.py)."""
    from tests.test_h264_conformance import ORACLE, oracle_decode

    if not ORACLE.exists():
        pytest.skip("decode_oracle unavailable")
    w, h = 96, 64
    frames = _frames(w, h, 6, seed=9)
    enc = H264Encoder(w, h, qp=30, gop=3, cabac=True)
    pend = enc.encode_run_async(frames=frames)
    encoded = [p.result() for p in pend]
    data = enc.headers() + b"".join(e.data for e in encoded)

    dec = oracle_decode(str(ORACLE), data, w, h, tmp_path)
    assert len(dec) == len(frames)
    for df, ef in zip(dec, encoded):
        for dp, rp in zip(df, ef.recon):
            np.testing.assert_array_equal(dp, np.asarray(rp))


def _uncover_frames(w, h, n, seed=8):
    """Content change mid-clip: bottom half switches to smooth new
    content, so inter prediction fails there while left-only intra
    predicts well — exercises the Intra_16x16 fallback in P slices."""
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, (h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = base * 0.5 + 40 + i * 2
        if i >= 2:
            y[h // 2:] = 180 + xx[h // 2:] * 0.1 + yy[h // 2:] * 0.05
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = rng.integers(80, 170, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(80, 170, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def test_intra_in_p_fused_matches_host_and_decodes(tmp_path):
    """Intra-in-P: the device op picks intra MBs on uncovered content,
    the fused run matches the dense host path byte for byte, and the
    stream decodes bit-exact on the oracle (reference capability:
    x264's always-on intra-in-P consideration,
    bindings/typescript/src/pipeline/generic-builder.ts:49-55)."""
    import jax.numpy as jnp

    from ceracoder_tpu.ops.inter import encode_frame_p
    from tests.test_h264_conformance import ORACLE, oracle_decode

    w, h = 128, 96
    frames = _uncover_frames(w, h, 6)

    o = encode_frame_p(
        *(jnp.asarray(p) for p in frames[2]),
        *(jnp.asarray(p) for p in frames[1]), 28, 28,
        intra_in_p=True)
    assert int(np.asarray(o["is_intra"]).sum()) > 0

    ref = _host_bytes(frames, w, h, qp=28, gop=6)
    enc = H264Encoder(w, h, qp=28, gop=6, cabac=True)
    assert enc.intra_in_p
    got = [p.result() for p in enc.encode_run_async(frames=frames)]
    assert [g.data for g in got] == ref

    if not ORACLE.exists():
        pytest.skip("decode_oracle unavailable")
    data = enc.headers() + b"".join(g.data for g in got)
    dec = oracle_decode(str(ORACLE), data, w, h, tmp_path)
    assert len(dec) == len(frames)
    for df, g in zip(dec, got):
        for dp, rp in zip(df, g.recon):
            np.testing.assert_array_equal(dp, np.asarray(rp))
