#!/usr/bin/env python
"""Rate-distortion comparison: ceracoder_tpu encoders vs libx264.

Encodes the same clip with our H.264 (and optionally HEVC intra)
encoder across a QP sweep and with x264 (via tools/x264_ref) at the
matched bitrates, decodes everything with the libavcodec oracle, and
reports bitrate/PSNR pairs plus the interpolated PSNR delta at matched
bitrate — the BASELINE.md "PSNR vs x264 at matched bitrate" metric.

Usage: python tools/rd_compare.py [--frames N] [--size WxH] [--gop G]
Runs on CPU (forces JAX cpu platform) so it is TPU-independent.
"""

import argparse
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

if "--device" in sys.argv:
    # chip path: leave the platform alone (axon TPU when available)
    from ceracoder_tpu.utils.jaxenv import setup_jax
    setup_jax()
else:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


TOOLS = ROOT / "tools"


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def decode(path, w, h):
    out = str(path) + ".yuv"
    subprocess.run([str(TOOLS / "decode_oracle"), str(path), out],
                   check=True, capture_output=True)
    raw = np.fromfile(out, np.uint8)
    fsz = w * h * 3 // 2
    n = raw.size // fsz
    return [raw[i * fsz:i * fsz + w * h].reshape(h, w) for i in range(n)]


RUN = 10     # frames per fused dispatch — matches bench.py so the
             # compiled executables are shared across tools


def ours_h264(frames, w, h, qp, gop, intra_in_p=None):
    """Product-path H.264 encode: fused CABAC runs + the app's
    scene-cut detector forcing IDRs (app/main.py _scene_cut — x264
    does the same, so the anchor comparison is like for like)."""
    import os
    from ceracoder_tpu.codec.h264.encoder import H264Encoder
    from ceracoder_tpu.control.lookahead import CutDetector
    if intra_in_p is None:
        intra_in_p = os.environ.get("CERACODER_RD_NO_IIP") != "1"
    from ceracoder_tpu.app.source import pad_to_mb
    wp, hp = -(-w // 16) * 16, -(-h // 16) * 16
    enc = H264Encoder(wp, hp, qp=qp, gop=gop, intra_in_p=intra_in_p)
    enc.sps.width, enc.sps.height = w, h       # conformance crop
    if (wp, hp) != (w, h):
        frames = [pad_to_mb(*f) for f in frames]
    det = CutDetector()
    cuts = {i for i, f in enumerate(frames) if det.feed(f[0])[1]}
    bs = enc.headers()
    batch = []

    def flush(force):
        nonlocal bs, batch
        if batch:
            for p in enc.encode_run_async(frames=batch,
                                          force_idr=force):
                bs += p.result().data
            batch = []

    force = False
    for i, f in enumerate(frames):
        if i in cuts or len(batch) >= RUN:
            flush(force)
            force = i in cuts
        batch.append(f)
    flush(force)
    return bs


def ours_hevc(frames, w, h, qp, gop, device=False,
              lookahead=False, **opts):
    """Full HEVC path: row-slice I+P GOPs, quarter-pel motion,
    deblocking, native entropy (the production device pipeline's
    executable spec). device=True drives H265DeviceEncoder instead
    (same bitstream; the fast path for 1080p sweeps on the chip)."""
    if device:
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        enc = H265DeviceEncoder(w, h, qp=qp, gop=gop,
                                bframes=opts.get("bframes", 0),
                                sao=opts.get("sao", False),
                                tu_split=opts.get("tu_split", False))
        bs = enc.headers()
        plans = _plan(frames, lookahead, opts.get("bframes", 0))
        if opts.get("bframes"):
            for f, p in zip(frames, plans):
                for data, _, _, _ in enc.push_frame(
                        *f, force_idr=p.force_idr, allow_b=p.allow_b):
                    bs += data
            for data, _, _, _ in enc.flush():
                bs += data
        else:
            # per-frame dispatch, several frames in flight: the RD
            # sweep cares about bytes, not throughput, and the
            # frames-path run executables compile pathologically over
            # the dev relay (>10 min per scan length) while the
            # single-frame op compiles in seconds
            cuts = {i for i, p in enumerate(plans) if p.force_idr}
            pend = []
            for i, f in enumerate(frames):
                pend.append(enc.encode_frame_async(
                    *f, force_idr=(i in cuts)))
                if len(pend) > 4:
                    bs += pend.pop(0).result().data
            for p in pend:
                bs += p.result().data
        return bs
    from ceracoder_tpu.codec.h265.rowslice import H265RowEncoder
    enc = H265RowEncoder(w, h, qp=qp, gop=gop, **opts)
    bs = enc.headers()
    plans = _plan(frames, lookahead, opts.get("bframes", 0))
    if opts.get("bframes"):
        for f, p in zip(frames, plans):
            for data, _, _, _ in enc.push_frame(
                    *f, force_idr=p.force_idr, allow_b=p.allow_b):
                bs += data
        for data, _, _, _ in enc.flush():
            bs += data
    else:
        for f, p in zip(frames, plans):
            data, _ = enc.encode_frame(*f, force_idr=p.force_idr)
            bs += data
    return bs


def _plan(frames, lookahead, bframes):
    """Per-frame lookahead plans (no-op plans when disabled)."""
    from ceracoder_tpu.control.lookahead import Lookahead, Plan
    if not lookahead:
        return [Plan(frame=f, allow_b=bool(bframes)) for f in frames]
    la = Lookahead(depth=3, bframes=bframes)
    plans = []
    for f in frames:
        plans.extend(la.push(f))
    plans.extend(la.flush())
    return plans


def x264(yuv_path, w, h, fps, out, preset, rate):
    subprocess.run([str(TOOLS / "x264_ref"), str(yuv_path), str(w),
                    str(h), str(fps), str(out), preset, rate],
                   check=True, capture_output=True)


def measure(tag, bs, frames, w, h, tmp, seconds):
    p = tmp / f"{tag}.264"
    p.write_bytes(bs)
    dec = decode(p, w, h)
    ps = np.mean([psnr(d, f[0]) for d, f in zip(dec, frames)])
    kbps = len(bs) * 8 / seconds / 1000
    return kbps, ps


def interp_psnr(curve, kbps):
    """PSNR at the given bitrate by linear interpolation in log-rate."""
    curve = sorted(curve)
    xs = np.log([c[0] for c in curve])
    ys = [c[1] for c in curve]
    return float(np.interp(np.log(kbps), xs, ys))


def _bandlimited(w, h, seed, sigma=2.5, lo=48, span=160):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, (h, w))
    k = np.exp(-0.5 * (np.arange(-7, 8) / sigma) ** 2)
    k /= k.sum()
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), ax, base)
    base = (base - base.min()) / (base.max() - base.min())
    return base * span + lo


def synth_detail_clip(w, h, n_frames, seed=13):
    """High-spatial-detail scene under a slow pan: fine texture
    (sigma 1.2 band-limit) + a grid overlay, 0.5 px/frame pan. The
    intra-tool / residual-coding stress case."""
    big_h, big_w = h + 64, w + 64
    tex = _bandlimited(big_w, big_h, seed, sigma=1.2)
    yy, xx = np.mgrid[0:big_h, 0:big_w]
    tex = np.where((xx % 24 < 2) | (yy % 24 < 2), tex * 0.5 + 96, tex)
    frames = []
    for i in range(n_frames):
        x0 = int(0.5 * i)
        y_p = tex[8:8 + h, x0:x0 + w].clip(0, 255).astype(np.uint8)
        u_p = (tex[4:4 + h // 2, x0 // 2:x0 // 2 + w // 2] * 0.25
               + 96).clip(0, 255).astype(np.uint8)
        v_p = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y_p, u_p, v_p))
    return frames


def synth_cuts_clip(w, h, n_frames, seed=17):
    """Two scenes with a hard cut at the midpoint and faster object
    motion: exercises IDR placement / scene-cut handling and larger
    motion vectors."""
    big_h, big_w = h + 128, w + 128
    sc1 = _bandlimited(big_w, big_h, seed)
    sc2 = _bandlimited(big_w, big_h, seed + 1, sigma=1.8, lo=32)
    frames = []
    for i in range(n_frames):
        scene = sc1 if i < n_frames // 2 else sc2
        j = i if i < n_frames // 2 else i - n_frames // 2
        x0, y0 = int(3 * j), int(1 * j)
        y_f = scene[y0:y0 + h, x0:x0 + w].copy()
        bx = (10 + 7 * j) % (w - 48)
        by = (h // 4 + 3 * j) % (h - 40)
        y_f[by:by + 32, bx:bx + 40] = 20 if i < n_frames // 2 else 230
        y_p = y_f.clip(0, 255).astype(np.uint8)
        u_p = (scene[y0 // 2:y0 // 2 + h // 2,
                     x0 // 2:x0 // 2 + w // 2] * 0.3
               + 90).clip(0, 255).astype(np.uint8)
        v_p = np.full((h // 2, w // 2), 132, np.uint8)
        frames.append((y_p, u_p, v_p))
    return frames


def _sample_bilinear(img, yy, xx):
    """Bilinear sample img at float coords (yy, xx), edge-clamped."""
    h, w = img.shape
    yy = np.clip(yy, 0, h - 1.001)
    xx = np.clip(xx, 0, w - 1.001)
    y0 = yy.astype(np.int64)
    x0 = xx.astype(np.int64)
    fy = yy - y0
    fx = xx - x0
    return ((1 - fy) * (1 - fx) * img[y0, x0]
            + (1 - fy) * fx * img[y0, x0 + 1]
            + fy * (1 - fx) * img[y0 + 1, x0]
            + fy * fx * img[y0 + 1, x0 + 1])


def synth_film_clip(w, h, n_frames, seed=23, pan=(1.8, 0.5),
                    zoom=0.0, jitter=0.0, cut_at=None,
                    grain=2.5, shutter=3, cadence=True):
    """Film-like content (VERDICT r4 item 3: grain + texture + motion
    blur + cadence, synthesized because the sandbox ships no natural
    y4m): a band-limited scene with mid-frequency structure, camera
    pan/zoom/hand-held jitter, SHUTTER-integrated motion blur (the
    frame averages `shutter` sample instants along the motion path),
    additive film grain, and 24-in-30 cadence (every 5th frame
    repeats the previous source instant, like sloppy pulldown)."""
    rng = np.random.default_rng(seed)
    margin = 256
    big_w, big_h = w + 2 * margin, h + 2 * margin
    # two spectral layers read more like a photographed scene than a
    # single band-limit: coarse forms + fine texture
    tex = (_bandlimited(big_w, big_h, seed, sigma=6.0, lo=40, span=120)
           + _bandlimited(big_w, big_h, seed + 7, sigma=1.3, lo=0,
                          span=70))
    tex2 = None
    if cut_at is not None:
        tex2 = (_bandlimited(big_w, big_h, seed + 13, sigma=4.0,
                             lo=28, span=130)
                + _bandlimited(big_w, big_h, seed + 19, sigma=1.1,
                               lo=0, span=60))

    gy, gx = np.mgrid[0:h, 0:w].astype(np.float64)
    frames = []
    for i in range(n_frames):
        # 24p source instants shown at 30: 0,1,2,3,3,4,5,6,7,7,...
        t = (i - (i + 1) // 5) if cadence else i
        scene = tex if cut_at is None or i < cut_at else tex2
        jx = jitter * rng.normal()
        jy = jitter * rng.normal()
        acc = np.zeros((h, w))
        for s in range(shutter):
            ts = t + s / (2.0 * shutter)     # 180-degree shutter
            scale = 1.0 + zoom * ts
            cx, cy = big_w / 2 + pan[0] * ts + jx, \
                big_h / 2 + pan[1] * ts + jy
            xx = (gx - w / 2) * scale + cx
            yy = (gy - h / 2) * scale + cy
            acc += _sample_bilinear(scene, yy, xx)
        y_f = acc / shutter + rng.normal(0, grain, (h, w))
        y_p = y_f.clip(0, 255).astype(np.uint8)
        u_p = (y_f[::2, ::2] * 0.20 + 98
               + rng.normal(0, grain * 0.5, (h // 2, w // 2))) \
            .clip(0, 255).astype(np.uint8)
        v_p = (y_f[::2, ::2] * -0.12 + 140) \
            .clip(0, 255).astype(np.uint8)
        frames.append((y_p, u_p, v_p))
    return frames


# bump when any clip synthesis (parameters or code) changes, so
# cached planes in the tempdir are invalidated
CLIP_CACHE_VERSION = 1

CLIPS = {"pan": lambda w, h, n: synth_motion_clip(w, h, n),
         "detail": synth_detail_clip,
         "cuts": synth_cuts_clip,
         # film-like set (grain/blur/cadence); see synth_film_clip
         "film_pan": lambda w, h, n: synth_film_clip(w, h, n),
         "film_zoom": lambda w, h, n: synth_film_clip(
             w, h, n, seed=29, pan=(0.4, 0.1), zoom=0.0015,
             jitter=0.35, grain=3.0),
         "film_action": lambda w, h, n: synth_film_clip(
             w, h, n, seed=31, pan=(4.5, 1.2), jitter=0.8,
             cut_at=n // 2, grain=2.0, shutter=4, cadence=False)}


def bd_rate(ref_curve, test_curve) -> float:
    """Bjontegaard rate delta (%): average bitrate change of `test`
    vs `ref` at equal PSNR over the overlapping quality interval
    (cubic fit of log-rate as a function of PSNR). Negative = test
    needs fewer bits."""
    def fit(curve):
        c = sorted(curve)
        r = np.log([p[0] for p in c])
        q = [p[1] for p in c]
        return np.polyfit(q, r, min(3, len(c) - 1)), min(q), max(q)

    pr, lo_r, hi_r = fit(ref_curve)
    pt, lo_t, hi_t = fit(test_curve)
    lo, hi = max(lo_r, lo_t), min(hi_r, hi_t)
    if hi <= lo:
        return float("nan")
    ir = np.polyint(pr)
    it = np.polyint(pt)
    avg = ((np.polyval(it, hi) - np.polyval(it, lo))
           - (np.polyval(ir, hi) - np.polyval(ir, lo))) / (hi - lo)
    return float((np.exp(avg) - 1) * 100)


def synth_motion_clip(w, h, n_frames, seed=11):
    """Natural-ish clip with coherent motion: a fixed band-limited
    texture field panning with subpixel velocity plus a moving
    high-contrast object — motion-compensable (unlike per-frame noise)
    but not trivially skippable (unlike a static pattern)."""
    rng = np.random.default_rng(seed)
    big_h, big_w = h + 128, w + 128
    base = rng.normal(0, 1, (big_h, big_w))
    # band-limit with a separable blur to get image-like spectra
    k = np.exp(-0.5 * (np.arange(-7, 8) / 2.5) ** 2)
    k /= k.sum()
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), ax, base)
    base = (base - base.min()) / (base.max() - base.min())
    tex = (base * 160 + 48)

    frames = []
    for i in range(n_frames):
        # pan at 1.5 px/frame horizontally, 0.5 vertically
        ox, oy = 1.5 * i, 0.5 * i
        x0, y0 = int(ox), int(oy)
        fx, fy = ox - x0, oy - y0
        win = tex[y0:y0 + h + 1, x0:x0 + w + 1]
        y_f = ((1 - fx) * (1 - fy) * win[:h, :w]
               + fx * (1 - fy) * win[:h, 1:w + 1]
               + (1 - fx) * fy * win[1:h + 1, :w]
               + fx * fy * win[1:h + 1, 1:w + 1])
        # moving object
        bx = (20 + 3 * i) % (w - 40)
        by = (h // 3 + i) % (h - 30)
        y_f[by:by + 24, bx:bx + 32] = 225
        y_plane = y_f.clip(0, 255).astype(np.uint8)
        u_plane = (tex[y0 // 2:y0 // 2 + h // 2, x0 // 2:x0 // 2 + w // 2]
                   * 0.3 + 100).clip(0, 255).astype(np.uint8)
        v_plane = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append((y_plane, u_plane, v_plane))
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--size", default="320x192")
    ap.add_argument("--gop", type=int, default=30)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--hevc", action="store_true")
    ap.add_argument("--no-h264", action="store_true",
                    help="skip the H.264 sweep (x264 anchored at the "
                    "HEVC rates instead)")
    ap.add_argument("--tu-split", action="store_true")
    ap.add_argument("--bframes", type=int, default=0)
    ap.add_argument("--sao", action="store_true")
    ap.add_argument("--clip", default="pan", choices=sorted(CLIPS),
                    help="synthetic content profile")
    ap.add_argument("--device", action="store_true",
                    help="drive H265DeviceEncoder (chip path) for the "
                    "HEVC sweep — required for 1080p-scale runs")
    ap.add_argument("--lookahead", action="store_true",
                    help="scene-cut IDRs + adaptive B from the "
                    "lookahead window")
    args = ap.parse_args()
    w, h = map(int, args.size.split("x"))
    seconds = args.frames / args.fps

    import tempfile
    tmp = Path(tempfile.mkdtemp(prefix="rd_"))
    # clip cache: 1080p film-clip synthesis costs ~1.3 s/frame in
    # numpy; repeat invocations (per-tool sweeps) reuse the planes.
    # The key carries CLIP_CACHE_VERSION (bump on any synthesis
    # change) and the uid so stale or foreign caches never poison a
    # measurement.
    cache = Path(tempfile.gettempdir()) / (
        f"rdclip_v{CLIP_CACHE_VERSION}_{os.getuid()}_"
        f"{args.clip}_{w}x{h}_{args.frames}.npz")
    if cache.exists():
        z = np.load(cache)
        frames = [(z[f"y{i}"], z[f"u{i}"], z[f"v{i}"])
                  for i in range(args.frames)]
    else:
        frames = CLIPS[args.clip](w, h, args.frames)
        np.savez(cache, **{f"{p}{i}": frames[i][j]
                           for i in range(args.frames)
                           for j, p in enumerate("yuv")})
    yuv = tmp / "src.yuv"
    with open(yuv, "wb") as f:
        for (y, u, v) in frames:
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())

    print(f"clip: {args.clip} {w}x{h}p{args.fps}, {args.frames} "
          f"frames, gop {args.gop}")
    hevc_opts = dict(tu_split=args.tu_split, bframes=args.bframes,
                     sao=args.sao, device=args.device,
                     lookahead=args.lookahead)
    anchor_rates = None
    if not args.no_h264:
        ours_curve = []
        for qp in (22, 27, 32, 37):
            bs = ours_h264(frames, w, h, qp, args.gop)
            kbps, ps = measure(f"ours_q{qp}", bs, frames, w, h, tmp,
                               seconds)
            ours_curve.append((kbps, ps))
            print(f"  ours-h264 qp={qp}: {kbps:8.1f} kbps  {ps:5.2f} dB")
        anchor_rates = [k for k, _ in ours_curve]

    hevc_curve = []
    if args.hevc:
        for qp in (22, 27, 32, 37):
            bs = ours_hevc(frames, w, h, qp, args.gop, **hevc_opts)
            kbps, ps = measure(f"hevc_q{qp}", bs, frames, w, h, tmp,
                               seconds)
            hevc_curve.append((kbps, ps))
            print(f"  ours-hevc qp={qp}: {kbps:8.1f} kbps  "
                  f"{ps:5.2f} dB")
        if anchor_rates is None:
            anchor_rates = [k for k, _ in hevc_curve]

    x264_curve = []
    for kbps in anchor_rates:
        out = tmp / f"x264_{int(kbps)}.264"
        x264(yuv, w, h, args.fps, out, "medium", str(int(kbps * 1000)))
        k2, ps = measure_x264(out, frames, w, h, seconds)
        x264_curve.append((k2, ps))
        print(f"  x264-medium @{kbps:.0f}k: {k2:8.1f} kbps  {ps:5.2f} dB")

    if not args.no_h264:
        deltas = []
        for kbps, ps in ours_curve:
            ref = interp_psnr(x264_curve, kbps)
            deltas.append(ps - ref)
            print(f"  at {kbps:8.1f} kbps: ours {ps:5.2f} vs x264 "
                  f"{ref:5.2f} -> delta {ps - ref:+.2f} dB")
        print(f"mean PSNR delta vs x264-medium: "
              f"{np.mean(deltas):+.2f} dB")
        bd = bd_rate(x264_curve, ours_curve)
        print(f"H.264 BD-rate vs x264-medium: {bd:+.1f}% "
              f"(negative = we need fewer bits at equal PSNR)")

    if args.hevc:
        deltas = []
        for kbps, ps in hevc_curve:
            ref = interp_psnr(x264_curve, kbps)
            deltas.append(ps - ref)
            print(f"  at {kbps:8.1f} kbps: hevc {ps:5.2f} vs x264 "
                  f"{ref:5.2f} -> delta {ps - ref:+.2f} dB")
        print(f"mean HEVC PSNR delta vs x264-medium: "
              f"{np.mean(deltas):+.2f} dB")
        bd = bd_rate(x264_curve, hevc_curve)
        print(f"BD-rate vs x264-medium: {bd:+.1f}% "
              f"(negative = we need fewer bits at equal PSNR)")
    return 0


def measure_x264(path, frames, w, h, seconds):
    dec = decode(path, w, h)
    ps = np.mean([psnr(d, f[0]) for d, f in zip(dec, frames)])
    kbps = path.stat().st_size * 8 / seconds / 1000
    return kbps, ps


if __name__ == "__main__":
    sys.exit(main())
