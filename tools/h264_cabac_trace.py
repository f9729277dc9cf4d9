"""Parse real libx264 CABAC streams with our context model.

The divergence hunter for the H.264 CABAC entropy stage: encodes
synthetic content with libx264 (constrained to the encoder's MB
repertoire), then walks every slice with H264SliceParser. A model
error virtually always derails the parse within a few MBs (bad
values, terminate misfires, bitstream overrun), so "parses every MB
of every slice and lands on the final terminate" is strong evidence
the context model matches libavcodec/libx264.

Usage: python tools/h264_cabac_trace.py [WxH] [qp ...]
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from collections import Counter
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from ceracoder_tpu.codec.h264.cabac_dec import (  # noqa: E402
    H264SliceParser,
    ParseError,
)
from ceracoder_tpu.codec.h264.parse import walk_stream  # noqa: E402

X264_REF = ROOT / "tools" / "x264_ref"

# Constrain libx264 to the repertoire the parser/encoder model:
# 4x4 transform, 16x16 partitions only (plus I4x4/I16x16), one ref,
# one slice per frame, no MBAFF/interlace, no lossless tricks.
PARAMS = ("cabac=1:8x8dct=0:partitions=none:me=dia:subme=1:ref=1:"
          "weightp=0:trellis=0:aq-mode=0:sliced-threads=0:threads=1:"
          "scenecut=0:rc-lookahead=0:mixed-refs=0:fast-pskip=1:"
          "interlaced=0")


def gen_clip(w: int, h: int, n: int, kind: str) -> np.ndarray:
    rng = np.random.default_rng(11)
    ys, xs = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        if kind == "flat":
            y = np.full((h, w), 128, np.float64)
        elif kind == "grad":
            y = (xs * 0.8 + ys * 0.5 + t * 4) % 256
        elif kind == "texture":
            y = (96 + 60 * np.sin(xs / 7 + t * 0.5)
                 * np.cos(ys / 5) + rng.normal(0, 6, (h, w)))
        else:  # moving blocks
            y = np.full((h, w), 110.0)
            bx, by = (t * 3) % max(1, w - 24), (t * 2) % max(1, h - 24)
            y[by:by + 24, bx:bx + 24] = 200
            y += rng.normal(0, 2, (h, w))
        u = np.full((h // 2, w // 2), 120.0) + (ys[::2, ::2] * 0.1
                                                if kind != "flat"
                                                else 0)
        v = np.full((h // 2, w // 2), 130.0)
        for p in (y, u, v):
            frames.append(np.clip(p, 0, 255).astype(np.uint8))
    return np.concatenate([f.ravel() for f in frames])


def run_one(w: int, h: int, qp: int, kind: str, nframes: int = 5,
            verbose: bool = True) -> tuple[int, Counter]:
    with tempfile.TemporaryDirectory() as td:
        yuv = Path(td) / "in.yuv"
        out = Path(td) / "out.264"
        yuv.write_bytes(gen_clip(w, h, nframes, kind).tobytes())
        r = subprocess.run(
            [str(X264_REF), str(yuv), str(w), str(h), "30", str(out),
             "medium", f"qp:{qp}", PARAMS], capture_output=True)
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode()[-500:])
        data = out.read_bytes()
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    total = 0
    hist: Counter = Counter()
    for si, (sh, payload, pps) in enumerate(walk_stream(data)):
        trace: list = []
        p = H264SliceParser(
            payload, sh.qp, sh.slice_type == 2, mbw, mbh,
            first_mb=sh.first_mb, cabac_init_idc=sh.cabac_init_idc,
            trace=trace)
        try:
            mbs = p.parse()
        except ParseError as e:
            print(f"slice {si} ({'I' if sh.slice_type == 2 else 'P'}"
                  f" qp={sh.qp}): PARSE FAIL at mb "
                  f"{len(p.mbs)}: {e}")
            print("  last 40 bins:", trace[-40:])
            return -1, hist
        used = p.consumed_bytes()
        slack = len(payload) - used
        if not (0 <= slack <= 2):
            print(f"slice {si}: consumed {used}/{len(payload)} B — "
                  f"misaligned end")
            return -1, hist
        total += len(mbs)
        hist.update(m["mb_type"] for m in mbs)
        if verbose:
            qps = [m["dqp"] for m in mbs if not m["skip"]]
            print(f"  slice {si} {'I' if sh.slice_type == 2 else 'P'}"
                  f" qp={sh.qp} mbs={len(mbs)} bytes={used}/"
                  f"{len(payload)} dqp∈[{min(qps) if qps else 0},"
                  f"{max(qps) if qps else 0}]")
    return total, hist


def main() -> int:
    size = sys.argv[1] if len(sys.argv) > 1 else "96x64"
    w, h = (int(x) for x in size.split("x"))
    qps = [int(q) for q in sys.argv[2:]] or [22, 30, 38]
    ok = True
    for kind in ("flat", "grad", "texture", "blocks"):
        for qp in qps:
            print(f"== {kind} {w}x{h} qp={qp}")
            total, hist = run_one(w, h, qp, kind)
            if total < 0:
                ok = False
            else:
                print(f"   OK: {total} MBs  {dict(hist)}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
