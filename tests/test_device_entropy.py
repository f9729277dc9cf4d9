"""Device-side entropy path: CAVLC symbols, bit packer, and the full
packed-frame path must match the host implementations exactly (the host
path is in turn pinned to libavcodec by the conformance suite)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ceracoder_tpu.codec.bitwriter import pack_bits
from ceracoder_tpu.codec.h264 import cavlc
from ceracoder_tpu.codec.h264.device_entropy import (
    encode_blocks_jax,
    finalize_rows,
    neighbor_nc_jax,
    pack_rows,
)
from ceracoder_tpu.codec.h264.encoder import H264Encoder, _neighbor_nc


@pytest.mark.parametrize("max_coeff", [16, 15, 4])
def test_cavlc_blocks_match_host(max_coeff):
    rng = np.random.default_rng(max_coeff)
    n = 1500
    lv = (rng.integers(-40, 41, (n, max_coeff))
          * (rng.random((n, max_coeff)) < 0.3))
    lv[:40] = rng.integers(-3000, 3000, (40, max_coeff))  # escape regime
    nc = rng.integers(0, 20, n)
    if max_coeff == 4:
        nc[:] = -1
    v0, l0, t0 = cavlc.encode_blocks(lv.astype(np.int64), nc, max_coeff)
    v1, l1, t1 = encode_blocks_jax(jnp.asarray(lv), jnp.asarray(nc),
                                   max_coeff)
    assert np.array_equal(v0, np.asarray(v1))
    assert np.array_equal(l0, np.asarray(l1))
    assert np.array_equal(t0, np.asarray(t1))


def test_neighbor_nc_matches_host():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 17, (24, 36))
    for rpm in (4, 2):
        a = _neighbor_nc(g, rpm, True)
        b = np.asarray(neighbor_nc_jax(jnp.asarray(g), rpm))
        assert np.array_equal(a, b)


def _random_symbols(rng, r, t, density):
    lens = (rng.integers(0, 33, (r, t))
            * (rng.random((r, t)) < density)).astype(np.int32)
    lens[:, -1] = 0                     # stop slot
    vals = np.zeros((r, t), np.uint32)
    mask = lens > 0
    widths = np.where(mask, lens, 1)
    vals[mask] = (rng.integers(0, 1 << 62, mask.sum())
                  % (1 << widths[mask].astype(np.int64))).astype(np.uint32)
    return vals, lens


def test_pack_rows_matches_pack_bits():
    # density mirrors real CAVLC slot streams (~99% zero-width); dense
    # streams overflow the pack window by design (see test below)
    rng = np.random.default_rng(1)
    r, t = 5, 12000
    vals, lens = _random_symbols(rng, r, t, 0.02)
    vj, lj = finalize_rows(jnp.asarray(vals), jnp.asarray(lens))
    words, total = pack_rows(vj, lj, 4096)
    vn, ln = np.asarray(vj), np.asarray(lj)
    words, total = np.asarray(words), np.asarray(total)
    for i in range(r):
        ref = pack_bits(vn[i], ln[i])
        tb = int(total[i])
        assert tb % 8 == 0
        assert words[i].astype(">u4").tobytes()[:tb // 8] == ref


def test_pack_rows_flags_window_overflow():
    """A chunk denser than the merge window must inflate the row's bit
    count past any capacity so the caller falls back (exactly)."""
    rng = np.random.default_rng(2)
    r, t = 3, 4000
    vals, lens = _random_symbols(rng, r, t, 0.9)
    vj, lj = finalize_rows(jnp.asarray(vals), jnp.asarray(lens))
    capw = 4096
    _, total = pack_rows(vj, lj, capw)
    assert (np.asarray(total) > capw * 32).all()


def _test_frames(w, h, n):
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        y = ((xx * 2 + yy + t * 7) % 200 + 20).astype(np.uint8)
        y[8 + t * 2:40 + t * 2, 4 + t * 3:36 + t * 3] = 230
        frames.append((y, np.full((h // 2, w // 2), 110, np.uint8),
                       np.full((h // 2, w // 2), 140, np.uint8)))
    return frames


@pytest.mark.parametrize("qp", [20, 27, 35])
def test_device_path_bitstream_identical(qp):
    """Full GOP through the device entropy path == host entropy path."""
    w, h = 128, 96
    frames = _test_frames(w, h, 5)

    def run(dev):
        enc = H264Encoder(w, h, qp=qp, gop=3, device_entropy=dev, cabac=False)
        data = enc.headers()
        for y, u, v in frames:
            data += enc.encode_frame(y, u, v).data
        return data

    assert run(True) == run(False)


def test_overflow_falls_back_exactly():
    """Tiny capacities overflow every frame; the fallback must still
    produce the identical stream."""
    w, h = 96, 64
    frames = _test_frames(w, h, 4)
    enc = H264Encoder(w, h, qp=26, gop=2, row_capacity_bytes=16, cabac=False)
    data = enc.headers()
    for y, u, v in frames:
        data += enc.encode_frame(y, u, v).data
    ref_enc = H264Encoder(w, h, qp=26, gop=2, device_entropy=False, cabac=False)
    ref = ref_enc.headers()
    for y, u, v in frames:
        ref += ref_enc.encode_frame(y, u, v).data
    assert data == ref


def test_async_pipeline_matches_sync():
    """Several frames in flight must produce the same stream as one at
    a time (reference feedback is device-side, so depth can't change
    the bits)."""
    w, h = 96, 64
    frames = _test_frames(w, h, 6)
    enc = H264Encoder(w, h, qp=28, gop=3, cabac=False)
    pending = [enc.encode_frame_async(*f) for f in frames]
    a = enc.headers() + b"".join(p.result().data for p in pending)
    enc2 = H264Encoder(w, h, qp=28, gop=3, cabac=False)
    b = enc2.headers() + b"".join(
        enc2.encode_frame(*f).data for f in frames)
    assert a == b


def test_run_dispatch_matches_per_frame():
    """encode_run_async (whole GOP segment in one lax.scan dispatch)
    must produce the identical stream to per-frame encoding, including
    across the run boundary (reference carried in/out) and with
    per-frame QP changes mid-run."""
    w, h = 96, 64
    frames = _test_frames(w, h, 6)
    qps = [28, 28, 30, 30, 27, 27]

    enc = H264Encoder(w, h, qp=28, gop=4, cabac=False)
    pend = enc.encode_run_async(frames[:3], qps=qps[:3])
    pend += enc.encode_run_async(frames[3:], qps=qps[3:])
    a = enc.headers() + b"".join(p.result().data for p in pend)

    enc2 = H264Encoder(w, h, qp=28, gop=4, cabac=False)
    b = enc2.headers() + b"".join(
        enc2.encode_frame(*f, qp=q).data for f, q in zip(frames, qps))
    assert a == b


def test_run_dispatch_overflow_falls_back():
    """Rows that overflow the packed capacity inside a run must be
    redone exactly on the host path, referencing the in-run recon."""
    w, h = 96, 64
    frames = _test_frames(w, h, 4)
    enc = H264Encoder(w, h, qp=26, gop=2, row_capacity_bytes=16, cabac=False)
    pend = enc.encode_run_async(frames)
    a = enc.headers() + b"".join(p.result().data for p in pend)
    ref_enc = H264Encoder(w, h, qp=26, gop=2, device_entropy=False, cabac=False)
    b = ref_enc.headers() + b"".join(
        ref_enc.encode_frame(*f).data for f in frames)
    assert a == b


def test_run_dispatch_device_source():
    """source=+indices variant: frames generated on device inside the
    dispatch must equal encoding the same generated planes by hand."""
    from ceracoder_tpu.app.source import DeviceTestPatternSource

    w, h = 96, 64
    src = DeviceTestPatternSource(w, h, texture=4)
    enc = H264Encoder(w, h, qp=29, gop=8, cabac=False)
    pend = enc.encode_run_async(source=src, indices=range(4))
    a = enc.headers() + b"".join(p.result().data for p in pend)

    enc2 = H264Encoder(w, h, qp=29, gop=8, cabac=False)
    b = enc2.headers()
    for i in range(4):
        y, u, v = (np.asarray(p) for p in src.frame(i))
        b += enc2.encode_frame(y, u, v).data
    assert a == b
