#!/usr/bin/env python
"""Benchmark: full-pipeline H.264 intra encode throughput at 1080p.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline target (BASELINE.md) is real-time 1080p60; vs_baseline is
the fraction of 60 fps achieved by the full pipeline (device transform +
host entropy + bitstream assembly) on one chip.
"""

import json
import sys
import time

import numpy as np

from ceracoder_tpu.utils.jaxenv import setup_jax

setup_jax()


def synth_1080p(seed=0):
    rng = np.random.default_rng(seed)
    h, w = 1088, 1920
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((np.sin(xx / 17) * 60 + np.cos(yy / 23) * 50 + 128)
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
    u = (np.sin(xx[::2, ::2] / 25) * 40 + 128).clip(0, 255).astype(np.uint8)
    v = (np.cos(yy[::2, ::2] / 21) * 40 + 128).clip(0, 255).astype(np.uint8)
    return y, u, v


def main():
    from ceracoder_tpu.codec.h264.encoder import H264Encoder

    y, u, v = synth_1080p()
    enc = H264Encoder(1920, 1088, qp=28)
    enc.encode_frame(y, u, v)  # warmup + compile

    n = 4
    t0 = time.time()
    nbytes = 0
    for i in range(n):
        f = enc.encode_frame(y, u, v)
        nbytes += len(f.data)
    dt = (time.time() - t0) / n
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "1080p_h264_intra_full_pipeline",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
