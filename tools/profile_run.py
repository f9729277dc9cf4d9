#!/usr/bin/env python
"""Where does the encode_run pipeline time go at 1080p?

Times three things over the same fused-run path bench.py uses:
  device  — dispatch encode_run_async and only materialize nnz
            (device compute + minimal transfer)
  entropy — host entropy stage alone on captured arrays
  full    — dispatch + overlap-collect, the bench loop

Run: python tools/profile_run.py [WxH] [nframes_per_run]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ceracoder_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()

import numpy as np  # noqa: E402

SIZE = sys.argv[1] if len(sys.argv) > 1 else "1920x1088"
RUN = int(sys.argv[2]) if len(sys.argv) > 2 else 15
W, H = map(int, SIZE.split("x"))
QP = 30
GOP = 60
N = 120


def main():
    from ceracoder_tpu.app.source import DeviceTestPatternSource
    from ceracoder_tpu.codec.h265.device import H265DeviceEncoder

    src = DeviceTestPatternSource(W, H, texture=6)

    def warm(enc):
        for p in enc.encode_run_async(source=src, indices=range(RUN)):
            p.result()
        for p in enc.encode_run_async(source=src,
                                      indices=range(RUN, 2 * RUN)):
            p.result()

    # --- full pipeline (the bench loop) ---
    enc = H265DeviceEncoder(W, H, qp=QP, gop=GOP)
    warm(enc)
    enc2 = H265DeviceEncoder(W, H, qp=QP, gop=GOP)
    pend = []
    t0 = time.time()
    for s in range(N // RUN):
        new = enc2.encode_run_async(
            source=src, indices=range(s * RUN, (s + 1) * RUN))
        for p in pend:
            p.result()
        pend = new
    for p in pend:
        p.result()
    t_full = (time.time() - t0) / N * 1e3

    # --- device only: dispatch, materialize nnz only ---
    enc3 = H265DeviceEncoder(W, H, qp=QP, gop=GOP)
    warm(enc3)
    t0 = time.time()
    for s in range(N // RUN):
        pend = enc3.encode_run_async(
            source=src, indices=range(s * RUN, (s + 1) * RUN))
        # force device completion via the nnz array of the last frame
        pend[-1].result()
    t_dev = (time.time() - t0) / N * 1e3

    # --- entropy only: run once, re-encode entropy on host arrays ---
    enc4 = H265DeviceEncoder(W, H, qp=QP, gop=GOP)
    warm(enc4)
    pend = enc4.encode_run_async(source=src,
                                 indices=range(2 * RUN, 3 * RUN))
    frames = [p.result() for p in pend]  # materializes arrays
    # capture the entropy inputs by monkeypatching

    captured = []
    orig = enc4._entropy

    def capture(arrays, **kw):
        captured.append((dict(arrays), dict(kw)))
        return orig(arrays, **kw)

    enc4._entropy = capture
    pend = enc4.encode_run_async(source=src,
                                 indices=range(3 * RUN, 4 * RUN))
    for p in pend:
        p.result()
    enc4._entropy = orig
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        for arrays, kw in captured:
            enc4._entropy(arrays, **kw)
    t_ent = (time.time() - t0) / (reps * len(captured)) * 1e3

    nbytes = sum(len(f.data) for f in frames)
    print(f"full pipeline : {t_full:7.2f} ms/frame "
          f"({1e3 / t_full:.1f} fps)")
    print(f"device only   : {t_dev:7.2f} ms/frame "
          f"({1e3 / t_dev:.1f} fps)")
    print(f"entropy only  : {t_ent:7.2f} ms/frame "
          f"({1e3 / t_ent:.1f} fps)  [{len(captured)} frames]")
    print(f"bytes/frame   : {nbytes // len(frames)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
