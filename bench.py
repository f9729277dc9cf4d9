#!/usr/bin/env python
"""Benchmark: full-pipeline H.264 encode throughput at 1080p.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline target (BASELINE.md) is real-time 1080p60; vs_baseline is
the fraction of 60 fps achieved by the full pipeline (device predict/
transform/entropy-pack + host NAL framing) on one chip. The source is
the device-side test-pattern generator (the analog of the reference's
test-pattern pipelines), so the measurement is encoder throughput, not
the dev-harness host<->device tunnel bandwidth (~55 MB/s here vs GB/s
PCIe on a real TPU host — raw 1080p ingest saturates the former).
"""

import json
import sys
import time

from ceracoder_tpu.utils.jaxenv import setup_jax

setup_jax()


def main():
    from ceracoder_tpu.app.source import DeviceTestPatternSource
    from ceracoder_tpu.codec.h264.encoder import H264Encoder

    src = DeviceTestPatternSource(1920, 1088, texture=6)
    enc = H264Encoder(1920, 1088, qp=28, gop=60)
    enc.encode_frame(*src.frame(0))              # warmup + compile (I)
    enc.encode_frame(*src.frame(1))              # warmup + compile (P)

    # pipelined streaming path: several frames in flight so device
    # compute, entropy packing, and the device->host transfer overlap
    # (matches how the app loop drives the encoder)
    depth = 8
    n = 60
    pend = []
    nbytes = 0
    t0 = time.time()
    for i in range(n):
        pend.append(enc.encode_frame_async(*src.frame(i + 2)))
        if len(pend) >= depth:
            nbytes += len(pend.pop(0).result().data)
    while pend:
        nbytes += len(pend.pop(0).result().data)
    dt = (time.time() - t0) / n
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "1080p60_h264_stream_pipeline",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
