"""On-device conformance sweep: encode on the REAL TPU, decode with
libavcodec, require bit-exact recon.

The pytest suite runs on CPU (tests/conftest.py), so it cannot catch
axon-backend miscompiles — the class of bug where XLA compiles the
same program differently on TPU and produces non-spec arithmetic
(seen twice: fused int16 filter chains in the HEVC and H.264
interpolation). This sweep is the TPU-side counterpart of
tests/test_h264_conformance.py / test_h265.py and should run on real
hardware after any compute-path change (the .claude/skills/verify
flow) and before benching.

Usage: python tools/verify_tpu.py [--quick]
Exit 0 = every stream decoded bit-exact.
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
ORACLE = ROOT / "tools" / "decode_oracle"


def synth(w, h, kind, t=0):
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "sin":
        y = ((np.sin(xx / 6) * 70 + np.cos(yy / 11) * 65 + 128)
             .clip(0, 255)).astype(np.uint8)
    elif kind == "noise":
        y = np.random.default_rng(5).integers(
            0, 256, (h, w)).astype(np.uint8)
    else:
        y = ((xx * 0.7 + yy * 0.4 + 4 * t) % 256).astype(np.uint8)
    u = ((np.sin(xx[::2, ::2] / 9) * 40 + 120).clip(0, 255)
         ).astype(np.uint8)
    v = ((np.cos(yy[::2, ::2] / 7) * 40 + 136).clip(0, 255)
         ).astype(np.uint8)
    return np.roll(y, 2 * t, axis=1), u, v


def oracle_exact(data: bytes, w: int, h: int, recons) -> int:
    """Returns count of mismatching pixels across all frames."""
    with tempfile.TemporaryDirectory() as td:
        src, dst = Path(td) / "t.bin", Path(td) / "t.yuv"
        src.write_bytes(data)
        r = subprocess.run([str(ORACLE), str(src), str(dst)],
                           capture_output=True)
        if r.returncode != 0:
            return 1 << 30
        out = np.fromfile(dst, np.uint8)
    fsz = w * h * 3 // 2
    if out.size != fsz * len(recons):
        return 1 << 30
    bad = 0
    for i, (ry, ru, rv) in enumerate(recons):
        fo = out[i * fsz:(i + 1) * fsz]
        bad += np.count_nonzero(
            fo[:w * h].reshape(h, w).astype(int) - ry.astype(int))
        bad += np.count_nonzero(
            fo[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
            .astype(int) - ru.astype(int))
        bad += np.count_nonzero(
            fo[w * h + w * h // 4:].reshape(h // 2, w // 2)
            .astype(int) - rv.astype(int))
    return bad


def run_h264(w, h, qp, kind, frames, cabac, deblock) -> int:
    from ceracoder_tpu.codec.h264.encoder import H264Encoder
    enc = H264Encoder(w, h, qp=qp, gop=frames, cabac=cabac,
                      deblock=deblock)
    data = enc.headers()
    recons = []
    for t in range(frames):
        f = enc.encode_frame(*synth(w, h, kind, t))
        data += f.data
        recons.append(f.recon)
    return oracle_exact(data, w, h, recons)


def run_h265(w, h, qp, kind, frames) -> int:
    from ceracoder_tpu.codec.h265.encoder import H265AppEncoder
    enc = H265AppEncoder(w, h, qp=qp, gop=frames)
    data = enc.headers()
    recons = []
    for t in range(frames):
        f = enc.encode_frame(*synth(w, h, kind, t))
        data += f.data
        ry, ru, rv = (np.asarray(p) for p in f.recon)
        recons.append((ry[:h, :w], ru[:h // 2, :w // 2],
                       rv[:h // 2, :w // 2]))
    return oracle_exact(data, w, h, recons)


def main() -> int:
    quick = "--quick" in sys.argv
    cases = [
        ("h264", 192, 128, 26, "sin", 4, True, True),
        ("h264", 192, 128, 26, "sin", 4, False, False),
        ("h264", 128, 96, 32, "grad", 6, True, True),
    ]
    if not quick:
        cases += [
            ("h264", 320, 192, 22, "sin", 5, True, True),
            ("h265", 192, 128, 26, "sin", 4, None, None),
            ("h265", 320, 192, 30, "grad", 5, None, None),
        ]
    fails = 0
    for case in cases:
        codec, w, h, qp, kind, frames, cabac, deblock = case
        try:
            if codec == "h264":
                bad = run_h264(w, h, qp, kind, frames, cabac, deblock)
            else:
                bad = run_h265(w, h, qp, kind, frames)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"{case}: EXCEPTION {e}")
            fails += 1
            continue
        status = "OK" if bad == 0 else f"FAIL ({bad} px)"
        print(f"{codec} {w}x{h} qp{qp} {kind} x{frames}"
              f"{' cabac' if cabac else ''}: {status}")
        fails += bad != 0
    print("verify_tpu:", "PASS" if fails == 0 else f"{fails} FAILURES")
    return 0 if fails == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
