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
    packed, chunks = cabac_run._pack_rows(
        None, jnp.asarray(counts)[None], jnp.asarray(mv)[None],
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
