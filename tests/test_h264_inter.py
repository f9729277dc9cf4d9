"""P-frame (inter) conformance tests: ME + MC + P-slice CAVLC must
decode bit-exact through libavcodec across GOP structures."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from ceracoder_tpu.codec.h264.encoder import H264Encoder
from ceracoder_tpu.ops.inter import mc_chroma, motion_search_fullpel

TOOLS = Path(__file__).resolve().parent.parent / "tools"
ORACLE = TOOLS / "decode_oracle"

pytestmark = pytest.mark.skipif(not ORACLE.exists(),
                                reason="decode_oracle not built")


def decode_and_compare(data, recons, w, h, tmp):
    src = tmp / "t.264"
    src.write_bytes(data)
    r = subprocess.run([str(ORACLE), str(src), str(tmp / "t.yuv")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]
    raw = np.fromfile(tmp / "t.yuv", np.uint8)
    fsz = w * h * 3 // 2
    assert raw.size == fsz * len(recons)
    for i, rc in enumerate(recons):
        fr = raw[i * fsz:(i + 1) * fsz]
        assert np.array_equal(fr[:w * h].reshape(h, w), rc[0]), f"frame {i} Y"
        assert np.array_equal(
            fr[w * h:w * h + w * h // 4].reshape(h // 2, w // 2), rc[1]), \
            f"frame {i} U"
        assert np.array_equal(
            fr[w * h + w * h // 4:].reshape(h // 2, w // 2), rc[2]), \
            f"frame {i} V"


def encode_seq(frames, w, h, qp, gop):
    enc = H264Encoder(w, h, qp=qp, gop=gop)
    data = enc.headers()
    recons = []
    kinds = []
    for y, u, v in frames:
        f = enc.encode_frame(y, u, v)
        data += f.data
        recons.append(f.recon)
        kinds.append("I" if f.keyframe else "P")
    return data, recons, kinds


def moving_square(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    yy, xx = np.mgrid[0:h, 0:w]
    bg = ((xx * 2 + yy) % 200 + 20).astype(np.uint8)
    for i in range(n):
        y = bg.copy()
        bx, by = 4 + i * 3, 8 + i * 2
        y[by:by + 24, bx:bx + 24] = 230
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        out.append((y, u, v))
    return out


def test_p_frames_bit_exact(tmp_path):
    w, h = 128, 96
    data, recons, kinds = encode_seq(moving_square(6, w, h), w, h, 26, 10)
    assert kinds == ["I"] + ["P"] * 5
    decode_and_compare(data, recons, w, h, tmp_path)


def test_p_noise_dense_residuals(tmp_path):
    rng = np.random.default_rng(1)
    w, h = 96, 64
    frames = [(rng.integers(0, 256, (h, w)).astype(np.uint8),
               rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
               rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
              for _ in range(4)]
    data, recons, _ = encode_seq(frames, w, h, 16, 8)
    decode_and_compare(data, recons, w, h, tmp_path)


def test_p_static_all_skip(tmp_path):
    """Static content: P frames collapse to skip runs."""
    rng = np.random.default_rng(2)
    w, h = 96, 64
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    data, recons, kinds = encode_seq([(y, u, v)] * 4, w, h, 28, 8)
    decode_and_compare(data, recons, w, h, tmp_path)
    # P frames of static content should be tiny (header + skip runs)
    assert kinds[1] == "P"


def test_gop_boundary_reIDR(tmp_path):
    w, h = 128, 96
    data, recons, kinds = encode_seq(moving_square(5, w, h), w, h, 30, 2)
    assert kinds == ["I", "P", "I", "P", "I"]
    decode_and_compare(data, recons, w, h, tmp_path)


def test_p_compression_beats_intra():
    """Inter coding of a pan must cost far fewer bits than intra."""
    w, h = 128, 96
    frames = moving_square(5, w, h)
    inter, _, _ = encode_seq(frames, w, h, 26, 100)
    intra, _, _ = encode_seq(frames, w, h, 26, 1)
    assert len(inter) < 0.6 * len(intra)


def test_motion_search_finds_shift():
    """Hierarchical search must lock onto a global pan of spatially
    correlated texture (iid noise is untrackable by design — the coarse
    pyramid level needs real image structure)."""
    rng = np.random.default_rng(3)
    noise = rng.normal(0, 1, (96 + 32, 128 + 32))
    # correlate: separable box blur
    k = np.ones(9) / 9
    sm = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, noise)
    sm = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, sm)
    base = ((sm - sm.min()) / (np.ptp(sm) + 1e-9) * 255).astype(np.uint8)
    ref = base[16:16 + 96, 16:16 + 128]
    cur = base[16 + 5:16 + 96 + 5, 16 - 7:16 + 128 - 7]  # moved (5, -7)
    mv, sad = motion_search_fullpel(np.asarray(cur), np.asarray(ref))
    mv = np.asarray(mv)
    # interior MBs must find the exact global displacement
    assert np.all(mv[1:-1, 1:-1, 0] == 5)
    assert np.all(mv[1:-1, 1:-1, 1] == -7)
    assert np.asarray(sad)[1:-1, 1:-1].max() == 0


def test_chroma_mc_halfpel_bilinear():
    """Odd luma MVs hit the half-pel chroma path (spec 8.4.2.2.2)."""
    ref = np.arange(64, dtype=np.uint8).reshape(8, 8)
    ref = np.tile(ref, (2, 2))  # 16x16 chroma plane = 2x2 MBs? use 1 MB
    ref = ref[:8, :8]
    import jax.numpy as jnp
    mv = jnp.array([[[4, 4]]], jnp.int32)  # quarter-pel units: half-pel luma
    out = np.asarray(mc_chroma(jnp.asarray(ref), mv))[0, 0]
    # manual bilinear at (0.5, 0.5) with spec rounding
    pad = np.pad(ref.astype(int), ((0, 1), (0, 1)), mode="edge")
    a = pad[:8, :8]
    b = pad[:8, 1:9]
    c = pad[1:9, :8]
    d = pad[1:9, 1:9]
    expect = (16 * a + 16 * b + 16 * c + 16 * d + 32) >> 6
    assert np.array_equal(out, expect)


def test_halfpel_subpixel_motion_bit_exact(tmp_path):
    """Content drifting 0.5 px/frame: the half-pel path must engage and
    still decode bit-exact (proves the 6-tap planes match spec
    8.4.2.2.1)."""
    w, h = 128, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def frame_at(t):
        y = 128 + 60 * np.sin((xx - 0.5 * t) / 5.0) \
            * np.cos((yy - 0.5 * t) / 7.0)
        return (y.clip(0, 255).astype(np.uint8),
                np.full((h // 2, w // 2), 120, np.uint8),
                np.full((h // 2, w // 2), 135, np.uint8))

    frames = [frame_at(i) for i in range(5)]
    data, recons, _ = encode_seq(frames, w, h, 24, 10)
    decode_and_compare(data, recons, w, h, tmp_path)

    # the chosen MVs must actually be fractional
    import jax.numpy as jnp
    from ceracoder_tpu.ops.inter import encode_frame_p
    from ceracoder_tpu.ops.transform import chroma_qp
    outs = encode_frame_p(jnp.asarray(frames[1][0]), jnp.asarray(frames[1][1]),
                          jnp.asarray(frames[1][2]), jnp.asarray(frames[0][0]),
                          jnp.asarray(frames[0][1]), jnp.asarray(frames[0][2]),
                          24, chroma_qp(24))
    mv = np.asarray(outs["mv"])
    assert (mv % 4 != 0).mean() > 0.5


@pytest.mark.parametrize("qp", [18, 21, 23, 27, 30, 33, 37, 41, 45, 49])
def test_deblock_qp_sweep_bit_exact(tmp_path, qp):
    """Pin the alpha/beta/tc0 tables: I+P GOPs across the QP range must
    stay bit-exact through the oracle with the in-loop filter on."""
    w, h = 64, 48
    data, recons, _ = encode_seq(moving_square(3, w, h, seed=qp), w, h,
                                 qp, 3)
    decode_and_compare(data, recons, w, h, tmp_path)
