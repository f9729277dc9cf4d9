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

CERACODER_BENCH=full measures the PRODUCT loop instead of the bare
encoder: the CeracoderApp pipeline (device-source encode -> TS mux +
AAC audio -> 1316 B packing -> loopback SRT send, housekeeping ticks
interleaved — app/main.py), i.e. everything the reference's process
does per frame (reference: src/ceracoder.c:297-339 + 237-295).
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


def bench_full_loop(w, h, codec: str):
    """Drive the real app end to end (device-source encode -> mux ->
    audio -> packing -> loopback SRT/UDP send) unpaced; returns
    steady-state frames/s over N frames after a warmup pass that
    compiles the executables."""
    import tempfile

    from ceracoder_tpu.app.cli import CliOptions
    from ceracoder_tpu.app.main import CeracoderApp
    from ceracoder_tpu.transport.srt import srt_available

    job = (f"[source]\nkind = devtest\nwidth = {w}\nheight = {h}\n"
           f"fps = 60\n\n[encode]\ncodec = {codec}\ngop = {GOP}\n"
           f"run = {RUN}\n\n[audio]\nkind = tone\nbitrate = 128\n")
    jf = tempfile.NamedTemporaryFile("w", suffix=".job", delete=False)
    jf.write(job)
    jf.close()

    listener = None
    if srt_available():
        import threading

        from ceracoder_tpu.transport.srt import (
            SRTO_RCVLATENCY,
            SrtError,
            SrtSocket,
        )

        class _Listener:
            def __init__(self, port):
                self.sock = SrtSocket()
                self.sock.set_int(SRTO_RCVLATENCY, 120)
                self.sock.bind("127.0.0.1", port)
                self.sock.listen()
                self.nbytes = 0
                self.naccept = 0
                self.thread = threading.Thread(target=self._serve,
                                               daemon=True)
                self.thread.start()

            def _serve(self):
                # warmup and measured runs each open a connection;
                # serve them sequentially. Delivery lags the 2000 ms
                # TSBPD latency, so short runs may legitimately close
                # before bytes surface here — the check below is on
                # accepted connections, with received bytes tracked
                # best-effort.
                while True:
                    try:
                        peer = self.sock.accept()
                    except SrtError:
                        return
                    self.naccept += 1
                    try:
                        while True:
                            data = peer.recv(2000)
                            if not data:
                                break
                            self.nbytes += len(data)
                    except SrtError:
                        pass

        port = 42700 + (os.getpid() % 200)
        listener = _Listener(port)
        addr = "127.0.0.1"
    else:
        addr, port = "udp", 42700 + (os.getpid() % 200)

    # realtime pacing is load-bearing: libsrt with SRTO_MAXBW=0 paces
    # output to the input rate, so an unpaced bulk send throttles at
    # the link's token rate and the balancer (correctly) reads that as
    # congestion. The product question is "does the full loop hold the
    # frame rate", so measure achieved fps against the 60 fps pacer.
    # fixed balancer: libsrt's input-rate pacing (SRTO_MAXBW=0)
    # ramps slower on loopback than the adaptive ladder's decrease
    # cooldowns, so the adaptive loop spirals to min bitrate on
    # startup bursts here — a transport-estimation artifact, not a
    # pipeline cost. The throughput question needs a constant
    # offered rate; adaptive dynamics are covered by the control
    # suites (tests/test_balancer.py, test_multistream.py).
    opts = CliOptions(job_file=jf.name, addr=addr, port=port,
                      latency=2000, balancer="fixed")
    warm = 4 * RUN
    app = CeracoderApp(opts, max_frames=N + warm, realtime=True)
    # first-dispatch XLA compiles stall the pipeline for minutes on a
    # cold cache; the product watchdog would (correctly) treat that
    # as a wedge — not meaningful under the bench
    app._start_stall_watchdog = lambda: None
    # steady state measured INSIDE one run: the first `warm` frames
    # absorb compile/trace and connection ramp, then fps = paced
    # emit-to-emit rate of the remaining N
    times = []
    orig_emit = app._emit_frame

    def timed_emit(frame, fpts, pacer):
        orig_emit(frame, fpts, pacer)
        times.append(time.time())

    app._emit_frame = timed_emit
    try:
        app.run()
        if len(times) < warm + 2:
            raise RuntimeError(f"only {len(times)} frames emitted")
        fps = (len(times) - warm) / (times[-1] - times[warm - 1])
        if listener is not None and listener.naccept == 0:
            raise RuntimeError(
                "loopback SRT listener saw no connection")
    finally:
        os.unlink(jf.name)
    return fps


def main():
    codec = os.environ.get("CERACODER_BENCH", "hevc")
    size = os.environ.get("CERACODER_BENCH_SIZE", "1920x1088")
    w, h = map(int, size.split("x"))

    label = {(1920, 1088): "1080p60", (3840, 2160): "4k60",
             (1280, 720): "720p60"}.get((w, h), f"{w}x{h}")
    if codec == "full":
        vcodec = os.environ.get("CERACODER_BENCH_CODEC", "hevc")
        fps = bench_full_loop(w, h, vcodec)
        print(json.dumps({
            "metric": f"{label}_{vcodec}_full_product_loop",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / 60.0, 3),
        }))
        return 0
    if codec == "hevc":
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder

        sao = os.environ.get("CERACODER_BENCH_SAO") == "1"

        def make():
            return H265DeviceEncoder(w, h, qp=30, gop=GOP, sao=sao)
        metric = f"{label}_hevc_stream_pipeline" + ("_sao" if sao
                                                   else "")
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
