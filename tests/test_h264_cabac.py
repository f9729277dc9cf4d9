"""H.264 CABAC entropy: the validated single-MB-slice subset.

Pins the parts proven byte-exact against libx264 (see
docs/h264_cabac_status.md): context init tables, the arithmetic
engine, the I16x16 MB layer, and the H.264 flush. Multi-MB slices
are a known open bug — cabac=False stays the encoder default.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from ceracoder_tpu.codec.h264.cabac import (
    H264ArithEncoder,
    H264RowCabac,
    init_contexts,
)

ROOT = Path(__file__).resolve().parents[1]
X264_REF = ROOT / "tools" / "x264_ref"


def _x264_flat_16x16(tmp_path, qp):
    yuv = np.full(16 * 16 * 3 // 2, 128, np.uint8)
    yuv_p = tmp_path / "flat.yuv"
    out_p = tmp_path / "flat.264"
    yuv_p.write_bytes(yuv.tobytes())
    r = subprocess.run(
        [str(X264_REF), str(yuv_p), "16", "16", "30", str(out_p),
         "medium", f"qp:{qp}", "cabac=1:8x8dct=0:deblock=0"],
        capture_output=True)
    if r.returncode != 0:
        pytest.skip("libx264 unavailable")
    data = out_p.read_bytes()
    i = data.rfind(b"\x00\x00\x01\x65")
    sl = data[i + 4:]
    # header for this config is 3 bytes (see docs); slice QP follows
    # x264's cqp I-frame offset
    from ceracoder_tpu.codec.bitwriter import BitReader
    rd = BitReader(sl)
    rd.ue(); rd.ue(); rd.ue(); rd.u(4); rd.ue(); rd.u(1); rd.u(1)
    # pic_init_qp from the PPS
    j = data.find(b"\x00\x00\x01\x68")
    rp = BitReader(data[j + 4:j + 12])
    rp.ue(); rp.ue(); rp.u(1); rp.u(1); rp.ue(); rp.ue(); rp.ue()
    rp.u(1); rp.u(2)
    piq = rp.se() + 26
    sqp = piq + rd.se()
    didc = rd.ue()
    if didc != 1:
        rd.se(); rd.se()
    assert rd.pos % 8 == 0
    return sl[rd.pos // 8:], sqp


@pytest.mark.skipif(not X264_REF.exists(), reason="x264_ref not built")
@pytest.mark.parametrize("qp", [22, 30, 38, 46])
def test_single_mb_slice_byte_exact_vs_x264(tmp_path, qp):
    """Flat 16x16 one-MB CABAC slice: our payload must equal x264's
    bit-for-bit up to the stop bit (the tail after it is don't-care
    padding / x264's watermark)."""
    payload, sqp = _x264_flat_16x16(tmp_path, qp)
    dc = np.zeros(16, np.int64)
    acs = np.zeros((16, 15), np.int64)
    cdc = np.zeros((2, 4), np.int64)
    cacs = np.zeros((2, 4, 15), np.int64)
    cab = H264RowCabac(sqp, intra_slice=True)
    cab.mb_i16(2, 0, 0, 0, 0, dc, acs, cdc, cacs)
    cab.end_of_slice(True)
    mine = cab.finish()
    npre = len(cab.enc._bits)          # bits incl. the flush window
    tb = "".join(f"{b:08b}" for b in payload)
    mb = "".join(f"{b:08b}" for b in mine)
    assert tb[:npre] == mb[:npre]


def test_engine_matches_hm_engine_on_random_bins():
    """The spec-style H.264 engine and the (libavcodec-validated)
    HM-style HEVC engine implement the same arithmetic: identical
    pre-flush bit output on random sequences."""
    from ceracoder_tpu.codec.h265.cabac import CabacEncoder

    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(10, 300))
        ctxs = rng.integers(0, 1024, n)
        bins = rng.integers(0, 2, n)
        kinds = rng.integers(0, 10, n)
        c1 = init_contexts(int(rng.integers(0, 52)), True)
        c2 = c1.copy()
        e1, e2 = H264ArithEncoder(), CabacEncoder()
        for i in range(n):
            if kinds[i] == 0:
                e1.encode_terminate(0)
                e2.encode_terminate(0)
            elif kinds[i] == 1:
                e1.encode_bypass(int(bins[i]))
                e2.encode_bypass(int(bins[i]))
            else:
                e1.encode_bin(c1, int(ctxs[i]), int(bins[i]))
                e2.encode_bin(c2, int(ctxs[i]), int(bins[i]))
        b1 = "".join(str(b) for b in e1._bits)
        e2.finish()
        b2 = "".join(f"{v:0{nn}b}" for v, nn in e2._bits)
        assert b2.startswith(b1)
        assert (c1 == c2).all()


def test_cavlc_default_unchanged():
    """cabac=False (default) must keep the validated CAVLC pipeline
    byte-identical (PPS entropy flag 0, baseline profile)."""
    from ceracoder_tpu.codec.h264.encoder import H264Encoder

    enc = H264Encoder(64, 32, qp=30)
    assert not enc.pps.cabac
    assert enc.sps.profile_idc == 66
    enc_c = H264Encoder(64, 32, qp=30, cabac=True)
    assert enc_c.pps.cabac and enc_c.sps.profile_idc == 77
    assert not enc_c.device_entropy       # CABAC runs the host path
