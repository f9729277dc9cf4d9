"""H.264 CABAC entropy: engine, context model, and conformance.

Three validation axes (all against the reference toolchain the
reference app relied on via x264enc/GStreamer):
 1. byte-exactness of our encode vs libx264 on controlled content;
 2. our decode twin (H264SliceParser) walking real libx264 streams
    over the full MB repertoire to exact byte consumption;
 3. multi-MB / multi-frame streams from H264Encoder reconstructing
    bit-exact through the libavcodec oracle.

Also pins the round-4 root-cause regression: libavcodec's .rodata
orders the init tables [PB0][PB1][PB2][I], so the I table must carry
the Table 9-12 values with zeros at ctx 11..23 ("na" for I slices) and
PB0 must carry mb_skip ctx 11 = (23, 33).
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
from ceracoder_tpu.codec.h264.cabac_init_tables import (
    CABAC_INIT_I,
    CABAC_INIT_PB,
)

ROOT = Path(__file__).resolve().parents[1]
X264_REF = ROOT / "tools" / "x264_ref"
ORACLE = ROOT / "tools" / "decode_oracle"

# constrain libx264 to the parser/encoder MB repertoire (see
# tools/h264_cabac_trace.py)
X264_PARAMS = ("cabac=1:8x8dct=0:partitions=none:me=dia:subme=1:ref=1:"
               "weightp=0:trellis=0:aq-mode=0:sliced-threads=0:"
               "threads=1:scenecut=0:rc-lookahead=0:mixed-refs=0")


def test_init_table_roles():
    """The table-identity regression: PB0 is the cabac_init_idc=0
    column (mb_skip ctx 11 = (23,33), Table 9-13) and the I table has
    no entries for the P-only contexts 11..23."""
    assert tuple(CABAC_INIT_PB[0][11]) == (23, 33)
    assert tuple(CABAC_INIT_PB[1][11]) == (22, 25)
    assert tuple(CABAC_INIT_PB[2][11]) == (29, 16)
    assert all(tuple(CABAC_INIT_I[c]) == (0, 0) for c in range(11, 24))
    # Table 9-12 (shared by all four tables)
    assert tuple(CABAC_INIT_I[3]) == (20, -15)
    assert tuple(CABAC_INIT_PB[0][3]) == (20, -15)
    # I-slice residual contexts differ from the PB column (the round-3
    # bug made them equal)
    assert tuple(CABAC_INIT_I[85]) != tuple(CABAC_INIT_PB[0][85])


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


def _x264(tmp_path, yuv: np.ndarray, w: int, h: int, qp: int,
          name="clip"):
    yuv_p = tmp_path / f"{name}.yuv"
    out_p = tmp_path / f"{name}.264"
    yuv_p.write_bytes(yuv.tobytes())
    r = subprocess.run(
        [str(X264_REF), str(yuv_p), str(w), str(h), "30", str(out_p),
         "medium", f"qp:{qp}", X264_PARAMS], capture_output=True)
    if r.returncode != 0:
        pytest.skip("libx264 unavailable")
    return out_p.read_bytes()


@pytest.mark.skipif(not X264_REF.exists(), reason="x264_ref not built")
@pytest.mark.parametrize("qp", [22, 30, 38, 46])
def test_single_mb_slice_byte_exact_vs_x264(tmp_path, qp):
    """Flat 16x16 one-MB CABAC slice: our payload must equal x264's
    bit-for-bit up to the stop bit (the tail after it is don't-care
    padding / x264's watermark)."""
    from ceracoder_tpu.codec.h264.parse import walk_stream

    data = _x264(tmp_path, np.full(384, 128, np.uint8), 16, 16, qp)
    sh, payload, _ = next(walk_stream(data))
    dc = np.zeros(16, np.int64)
    acs = np.zeros((16, 15), np.int64)
    cdc = np.zeros((2, 4), np.int64)
    cacs = np.zeros((2, 4, 15), np.int64)
    cab = H264RowCabac(sh.qp, intra_slice=True)
    cab.mb_i16(2, 0, 0, 0, 0, dc, acs, cdc, cacs)
    cab.end_of_slice(True)
    mine = cab.finish()
    npre = len(cab.enc._bits)          # bits incl. the flush window
    tb = "".join(f"{b:08b}" for b in payload)
    mb = "".join(f"{b:08b}" for b in mine)
    assert tb[:npre] == mb[:npre]


@pytest.mark.skipif(not X264_REF.exists(), reason="x264_ref not built")
@pytest.mark.parametrize("kind", ["flat", "grad", "texture", "blocks"])
@pytest.mark.parametrize("qp", [22, 30, 38])
def test_parse_real_x264_streams(tmp_path, kind, qp):
    """The decode twin must walk every slice of a real libx264 stream
    (I + P, all MB types, residuals, mvds, per-MB dqp) to the exact
    final terminate and byte count."""
    import sys
    sys.path.insert(0, str(ROOT))
    from tools.h264_cabac_trace import gen_clip
    from ceracoder_tpu.codec.h264.cabac_dec import H264SliceParser
    from ceracoder_tpu.codec.h264.parse import walk_stream

    w, h = 96, 64
    data = _x264(tmp_path, gen_clip(w, h, 4, kind), w, h, qp, kind)
    mbw, mbh = w // 16, h // 16
    total = 0
    for sh, payload, _ in walk_stream(data):
        p = H264SliceParser(payload, sh.qp, sh.slice_type == 2,
                            mbw, mbh, first_mb=sh.first_mb,
                            cabac_init_idc=sh.cabac_init_idc)
        mbs = p.parse()
        assert 0 <= len(payload) - p.consumed_bytes() <= 2
        total += len(mbs)
    assert total == 4 * mbw * mbh


@pytest.fixture(scope="session")
def oracle():
    if not ORACLE.exists():
        pytest.skip("decode_oracle unavailable")
    return str(ORACLE)


def _oracle_roundtrip(oracle, tmp_path, frames, w, h, qp,
                      name="t") -> None:
    """Encode frames with the CABAC encoder; decode with libavcodec;
    require bit-exact recon for every frame."""
    from ceracoder_tpu.codec.h264.encoder import H264Encoder

    enc = H264Encoder(w, h, qp=qp, gop=len(frames), cabac=True)
    assert not enc.device_entropy
    data = enc.headers()
    recons = []
    for (y, u, v) in frames:
        f = enc.encode_frame(y, u, v)
        data += f.data
        recons.append(f.recon)
    src = tmp_path / f"{name}.264"
    dst = tmp_path / f"{name}.yuv"
    src.write_bytes(data)
    r = subprocess.run([oracle, str(src), str(dst)],
                       capture_output=True, text=True)
    assert r.returncode == 0, f"oracle rejected:\n{r.stderr[-600:]}"
    raw = np.fromfile(dst, np.uint8)
    fsz = w * h * 3 // 2
    assert raw.size == fsz * len(frames)
    for i, (ry, ru, rv) in enumerate(recons):
        fo = raw[i * fsz:(i + 1) * fsz]
        assert np.array_equal(fo[:w * h].reshape(h, w), ry), i
        assert np.array_equal(
            fo[w * h:w * h + w * h // 4].reshape(h // 2, w // 2), ru), i
        assert np.array_equal(
            fo[w * h + w * h // 4:].reshape(h // 2, w // 2), rv), i


@pytest.mark.parametrize("qp", [20, 27, 35, 43])
def test_cabac_multi_mb_oracle_bit_exact(oracle, tmp_path, qp):
    """Multi-MB CABAC I slices (the round-3 open bug) decode through
    libavcodec with bit-exact recon across a QP sweep."""
    yy, xx = np.mgrid[0:64, 0:96]
    y = ((np.sin(xx / 7) * 80 + np.cos(yy / 9) * 60 + 128)
         .clip(0, 255)).astype(np.uint8)
    u = ((np.sin(xx[::2, ::2] / 15) * 50 + 128).clip(0, 255)
         ).astype(np.uint8)
    v = ((np.cos(yy[::2, ::2] / 13) * 50 + 128).clip(0, 255)
         ).astype(np.uint8)
    _oracle_roundtrip(oracle, tmp_path, [(y, u, v)], 96, 64, qp)


def test_cabac_gop_with_motion_oracle_bit_exact(oracle, tmp_path):
    """I + P + skip + mvd CABAC coding across a 6-frame GOP."""
    yy, xx = np.mgrid[0:64, 0:96]
    base = ((np.sin(xx / 5) * 70 + np.cos(yy / 8) * 50 + 128)
            .clip(0, 255)).astype(np.uint8)
    u = np.full((32, 48), 118, np.uint8)
    v = np.full((32, 48), 134, np.uint8)
    frames = [(np.roll(base, 2 * t, axis=1), u, v) for t in range(6)]
    _oracle_roundtrip(oracle, tmp_path, frames, 96, 64, 30)


def test_cabac_noise_oracle_bit_exact(oracle, tmp_path):
    """Worst-case residual density (uniform noise, low QP)."""
    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    _oracle_roundtrip(oracle, tmp_path, [(y, u, v)], 48, 32, 18)


def test_cabac_default_and_cavlc_option():
    """CABAC (Main profile) is the default, matching x264enc's output
    mode in the reference's software pipelines; cabac=False keeps the
    validated baseline CAVLC device path."""
    from ceracoder_tpu.codec.h264.encoder import H264Encoder

    enc = H264Encoder(64, 32, qp=30)
    assert enc.pps.cabac and enc.sps.profile_idc == 77
    assert not enc.device_entropy       # CABAC runs the host path
    enc_c = H264Encoder(64, 32, qp=30, cabac=False)
    assert not enc_c.pps.cabac
    assert enc_c.sps.profile_idc == 66
    assert enc_c.device_entropy
