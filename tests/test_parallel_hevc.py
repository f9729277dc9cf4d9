"""Sharded HEVC step: streams x row-bands over an 8-device CPU mesh
must be bit-identical to the single-chip ops (halo exchange for motion
search/MC and the deblock seam pass included), and its arrays must
feed the same entropy stage (SURVEY.md §2.7, §4 multi-chip testing).
"""

import numpy as np

import jax

from ceracoder_tpu.ops.h265 import (
    deblock_frame_dev,
    encode_frame_i_rows,
    encode_frame_p_rows,
)
from ceracoder_tpu.parallel.hevc import hevc_sharded_step
from ceracoder_tpu.parallel.mesh import make_mesh

KEYS = ("is_intra", "mode", "mv", "luma_lv", "cb_lv", "cr_lv")


def _content(s, h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (s, 2 * h, 2 * w)).astype(np.uint8)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    smooth = (128 + 80 * np.sin(xx / 13.0) * np.cos(yy / 19.0)) \
        .astype(np.uint8)

    def frame(i):
        ys = []
        for st in range(s):
            y = base[st, 3 * i:h + 3 * i, 2 * i:w + 2 * i].copy()
            if st % 2:
                y = ((y.astype(np.int32) + smooth) // 2).astype(np.uint8)
            ys.append(y)
        y = np.stack(ys)
        return (y, (y[:, ::2, ::2] // 2 + 50).astype(np.uint8),
                (y[:, 1::2, 1::2] // 3 + 80).astype(np.uint8))
    return frame


def _single_chip(y, u, v, ref, qp, qp_c, idr):
    outs = []
    for st in range(y.shape[0]):
        if idr:
            o = encode_frame_i_rows(y[st], u[st], v[st], qp, qp_c)
        else:
            o = encode_frame_p_rows(y[st], u[st], v[st],
                                    *(r[st] for r in ref), qp, qp_c)
        o = dict(o)
        cbf = np.asarray(o["luma_lv"]).reshape(
            *np.asarray(o["luma_lv"]).shape[:2], -1).any(-1)
        o["recon"] = deblock_frame_dev(*o["recon"], o["is_intra"],
                                       cbf, o["mv"], qp)
        outs.append(jax.tree_util.tree_map(np.asarray, o))
    return outs


def test_sharded_matches_single_chip():
    s, h, w = 2, 64, 96          # 4 bands of 16 rows on a 2x4 mesh
    qp, qp_c = 30, 29
    mesh = make_mesh(n_streams=2, n_rows=4)
    frame = _content(s, h, w)

    # IDR step
    y0, u0, v0 = frame(0)
    zeros = (np.zeros_like(y0), np.zeros_like(u0), np.zeros_like(v0))
    fn_i = hevc_sharded_step(mesh, qp, qp_c, idr=True)
    outs_i, nz = fn_i(y0, u0, v0, *zeros)
    ref_i = _single_chip(y0, u0, v0, None, qp, qp_c, idr=True)
    for st in range(s):
        for k in KEYS:
            assert np.array_equal(np.asarray(outs_i[k])[st],
                                  ref_i[st][k]), f"I s{st} {k}"
        for i in range(3):
            assert np.array_equal(np.asarray(outs_i["recon"][i])[st],
                                  ref_i[st]["recon"][i]), f"I rec {i}"

    # P step referencing the deblocked recon (halo paths exercised by
    # real motion: panning + mixed content)
    y1, u1, v1 = frame(1)
    fn_p = hevc_sharded_step(mesh, qp, qp_c, idr=False)
    outs_p, nz_p = fn_p(y1, u1, v1, *outs_i["recon"])
    ref_rec = tuple(np.stack([ref_i[st]["recon"][i] for st in range(s)])
                    for i in range(3))
    ref_p = _single_chip(y1, u1, v1, ref_rec, qp, qp_c, idr=False)
    for st in range(s):
        for k in KEYS:
            assert np.array_equal(np.asarray(outs_p[k])[st],
                                  ref_p[st][k]), f"P s{st} {k}"
        for i in range(3):
            assert np.array_equal(np.asarray(outs_p["recon"][i])[st],
                                  ref_p[st]["recon"][i]), f"P rec {i}"

    # rate-control feed: psum'd nonzero counts match the arrays
    for st in range(s):
        expect = sum(int((ref_p[st][k] != 0).sum())
                     for k in ("luma_lv", "cb_lv", "cr_lv"))
        assert int(np.asarray(nz_p)[st]) == expect


def test_gop_parallel_matches_single_device():
    """Closed-GOP round-robin across devices must emit the identical
    stream to a single-device encode (and decode via the oracle)."""
    import subprocess
    import tempfile
    from pathlib import Path

    from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
    from ceracoder_tpu.parallel.gop import GopParallelEncoder

    w, h, n, gop = 96, 64, 8, 4
    frame = _content(1, h, w, seed=3)
    frames = [tuple(p[0] for p in frame(i)) for i in range(n)]

    ge = GopParallelEncoder(w, h, qp=31, gop=gop,
                            devices=jax.devices()[:4])
    parts = ge.encode_clip(frames)
    a = ge.headers() + b"".join(parts)

    se = H265DeviceEncoder(w, h, qp=31, gop=gop)
    b = se.headers() + b"".join(
        se.encode_frame(*f).data for f in frames)
    assert a == b

    tmp = Path(tempfile.mkdtemp(prefix="gop_"))
    p = tmp / "g.265"
    p.write_bytes(a)
    out = str(p) + ".yuv"
    r = subprocess.run([str(Path("tools/decode_oracle").resolve()),
                        str(p), out], capture_output=True, text=True)
    assert r.returncode == 0 and f"frames={n}" in r.stderr, r.stderr


def test_sharded_cross_band_motion():
    """Vertical panning moves content across band boundaries: MVs must
    reach into neighbor halos and still match single-chip."""
    s, h, w = 1, 64, 64
    qp, qp_c = 32, 31
    mesh = make_mesh(n_streams=1, n_rows=4)
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (2 * h, w)).astype(np.uint8)
    f0y = base[:h].copy()[None]
    f1y = base[6:h + 6].copy()[None]       # pure vertical motion dy=6

    def chroma(y):
        return ((y[:, ::2, ::2] // 2 + 60).astype(np.uint8),
                (y[:, 1::2, 1::2] // 3 + 70).astype(np.uint8))

    u0, v0 = chroma(f0y)
    u1, v1 = chroma(f1y)
    fn_i = hevc_sharded_step(mesh, qp, qp_c, idr=True)
    outs_i, _ = fn_i(f0y, u0, v0, np.zeros_like(f0y),
                     np.zeros_like(u0), np.zeros_like(v0))
    fn_p = hevc_sharded_step(mesh, qp, qp_c, idr=False)
    outs_p, _ = fn_p(f1y, u1, v1, *outs_i["recon"])
    mvs = np.asarray(outs_p["mv"])[0]
    # dominant MV is dy=+6 full-pel (+24 qpel): reaches 6 rows past
    # the band boundary, through the exchanged halo
    vals, counts = np.unique(mvs.reshape(-1, 2), axis=0,
                             return_counts=True)
    assert (vals[counts.argmax()] == [24, 0]).all()

    ref_i = _single_chip(f0y, u0, v0, None, qp, qp_c, idr=True)
    ref_rec = tuple(r[None] if r.ndim == 2 else r
                    for r in (np.stack([ref_i[0]["recon"][i]])
                              for i in range(3)))
    ref_p = _single_chip(f1y, u1, v1, ref_rec, qp, qp_c, idr=False)
    for k in KEYS:
        assert np.array_equal(np.asarray(outs_p[k])[0], ref_p[0][k]), k
    for i in range(3):
        assert np.array_equal(np.asarray(outs_p["recon"][i])[0],
                              ref_p[0]["recon"][i]), i


def _vert_pan_content(h, w, shift, seed=2):
    """Textured content panning VERTICALLY by `shift` px/frame — MVs at
    the halo limit cross band boundaries on every band seam."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (2 * h, w)).astype(np.uint8)
    xx, yy = np.meshgrid(np.arange(w), np.arange(2 * h))
    tex = (128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
    mix = ((base.astype(np.int32) + tex) // 2).astype(np.uint8)

    def frame(i):
        y = mix[shift * i:shift * i + h].copy()[None]
        return (y, (y[:, ::2, ::2] // 2 + 40).astype(np.uint8),
                (y[:, 1::2, 1::2] // 3 + 70).astype(np.uint8))
    return frame


def _run_geometry(n_rows, h, w, shift):
    """IDR + P over an n_rows-band mesh vs single chip, bit-identical."""
    qp, qp_c = 30, 29
    mesh = make_mesh(n_streams=1, n_rows=n_rows)
    frame = _vert_pan_content(h, w, shift)
    y0, u0, v0 = frame(0)
    zeros = (np.zeros_like(y0), np.zeros_like(u0), np.zeros_like(v0))
    fn_i = hevc_sharded_step(mesh, qp, qp_c, idr=True)
    outs_i, _ = fn_i(y0, u0, v0, *zeros)
    ref_i = _single_chip(y0, u0, v0, None, qp, qp_c, idr=True)
    y1, u1, v1 = frame(1)
    fn_p = hevc_sharded_step(mesh, qp, qp_c, idr=False)
    outs_p, _ = fn_p(y1, u1, v1, *outs_i["recon"])
    ref_rec = tuple(np.stack([ref_i[0]["recon"][i]]) for i in range(3))
    ref_p = _single_chip(y1, u1, v1, ref_rec, qp, qp_c, idr=False)
    for tag, outs, ref in (("I", outs_i, ref_i), ("P", outs_p, ref_p)):
        for k in KEYS:
            assert np.array_equal(np.asarray(outs[k])[0], ref[0][k]), \
                f"{tag} {k} (rows={n_rows}, h={h})"
        for i in range(3):
            assert np.array_equal(np.asarray(outs["recon"][i])[0],
                                  ref[0]["recon"][i]), \
                f"{tag} recon {i} (rows={n_rows}, h={h})"


def test_odd_band_count_near_halo_motion():
    """5 bands (odd count) x 32-row bands with vertical pan at the
    full-pel search limit: band-crossing MVs on every seam."""
    _run_geometry(n_rows=5, h=160, w=128, shift=7)


def test_tall_bands_full_height_ratio():
    """8 bands x 48 rows (the 1080p-class rows-per-device ratio at
    reduced width; width does not change the seam/halo logic, only
    compile time) with near-halo vertical motion."""
    _run_geometry(n_rows=8, h=384, w=96, shift=6)


def test_config3_row_geometry_2160():
    """The config[3] BAND GEOMETRY at 4K HEIGHT: 2176 rows split 8
    ways (17 CTB rows per device — the real 4K60 band shape) at
    narrow width (~1 min on the CPU mesh)."""
    _run_geometry(n_rows=8, h=2176, w=64, shift=7)
