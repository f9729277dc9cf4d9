#!/usr/bin/env python
"""Benchmark: full-pipeline encode throughput at 1080p.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline target (BASELINE.md) is real-time 1080p60 HEVC;
vs_baseline is the fraction of 60 fps achieved by the full pipeline
on one chip (device compute + entropy + host NAL framing). The source
is the device-side test-pattern generator (the analog of the
reference's test-pattern pipelines), so the measurement is encoder
throughput, not the dev-harness host<->device tunnel bandwidth
(~55 MB/s here vs GB/s PCIe on a real TPU host — raw 1080p ingest
saturates the former).

Frames are dispatched in fused multi-frame runs (one lax.scan
executable per GOP segment), which amortizes the per-launch
host->device round trip — the dominant cost over the dev-harness
tunnel (~35-40 ms/launch vs a few ms/frame compute).

Codec selection: CERACODER_BENCH=hevc|h264 (default hevc — the
flagship pipeline); size override CERACODER_BENCH_SIZE=WxH for CPU
smoke runs.
"""

import json
import os
import sys
import time

from ceracoder_tpu.utils.jaxenv import setup_jax

setup_jax()

RUN = 10          # frames per fused dispatch (167 ms at 60 fps)
GOP = 60
N = 240           # timed frames
DEPTH = 5         # runs in flight at 1080p (measured sweep: 10/5
                  # beats 15/2 — smaller runs overlap dispatch+
                  # transfer+entropy with device compute; 64.8 vs
                  # 61.0 fps). At 4K the same depth quadruples the
                  # in-flight HBM footprint and collapses throughput
                  # (2 fps vs 10+ sequential), so depth scales down
                  # with frame area; override: CERACODER_BENCH_DEPTH.


def bench_encoder(make_encoder, w, h):
    from ceracoder_tpu.app.source import DeviceTestPatternSource

    depth = int(os.environ.get(
        "CERACODER_BENCH_DEPTH",
        max(1, (DEPTH * 1920 * 1088) // (w * h))))
    src = DeviceTestPatternSource(w, h, texture=6)
    enc = make_encoder()

    # warmup: compiles the IDR-run and P-run executables
    for p in enc.encode_run_async(source=src, indices=range(RUN)):
        p.result()
    for p in enc.encode_run_async(source=src,
                                  indices=range(RUN, 2 * RUN)):
        p.result()

    from collections import deque

    enc2 = make_encoder()
    nbytes = 0
    q = deque()
    t0 = time.time()
    for s in range(N // RUN):
        idx = range(s * RUN, (s + 1) * RUN)
        q.append(enc2.encode_run_async(source=src, indices=idx))
        # keep DEPTH runs in flight (hides the dispatch+sync round
        # trip), collect the oldest while the newer ones compute
        if len(q) > depth:
            nbytes += sum(len(p.result().data) for p in q.popleft())
    while q:
        nbytes += sum(len(p.result().data) for p in q.popleft())
    dt = (time.time() - t0) / N
    return 1.0 / dt, nbytes


def main():
    codec = os.environ.get("CERACODER_BENCH", "hevc")
    size = os.environ.get("CERACODER_BENCH_SIZE", "1920x1088")
    w, h = map(int, size.split("x"))

    label = {(1920, 1088): "1080p60", (3840, 2160): "4k60",
             (1280, 720): "720p60"}.get((w, h), f"{w}x{h}")
    if codec == "hevc":
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder

        def make():
            return H265DeviceEncoder(w, h, qp=30, gop=GOP)
        metric = f"{label}_hevc_stream_pipeline"
    else:
        from ceracoder_tpu.codec.h264.encoder import H264Encoder

        def make():
            return H264Encoder(w, h, qp=28, gop=GOP)
        metric = f"{label}_h264_stream_pipeline"

    fps, _ = bench_encoder(make, w, h)
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
