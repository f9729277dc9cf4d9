"""GOP-parallel encoding: closed GOPs across devices (PP analog).

The temporal parallelism axis of SURVEY.md §2.7: every GOP starts with
an IDR, so GOPs share no state — a host-level scheduler round-robins
whole GOPs onto devices, each running the fused run dispatch
(ops/h265.encode_run_rows) against its own per-device reference chain.
No collectives: inter-GOP dependencies are nil by construction
("resume = restart at next IDR", SURVEY.md §5 checkpoint note).

This is the throughput schedule (offline / faster-than-real-time
transcode, or latency = one GOP): N devices encode N GOPs
concurrently; output is re-serialized in display order. The
stream-parallel and row-sharded schedules (parallel/hevc.py) are the
latency-oriented alternatives; all three compose.
"""

from __future__ import annotations

import numpy as np

from ceracoder_tpu.codec.h265.device import H265DeviceEncoder


class GopParallelEncoder:
    """Encode a clip with whole GOPs distributed across devices.

    Each device owns an independent H265DeviceEncoder (per-device jit
    executables + reference chain). GOP g goes to device g % D; all
    dispatches are issued before any result is collected, so devices
    run concurrently. The emitted bitstream is byte-identical to a
    single-device encode with the same GOP length (verified by
    tests/test_parallel_hevc.py) because every GOP is closed.
    """

    def __init__(self, width: int, height: int, qp: int = 32,
                 gop: int = 60, devices=None, **enc_kwargs):
        import jax

        self.devices = list(devices if devices is not None
                            else jax.devices())
        self.gop = max(1, gop)
        self.encoders = [
            H265DeviceEncoder(width, height, qp=qp, gop=self.gop,
                              **enc_kwargs)
            for _ in self.devices
        ]
        self.qp = qp

    def headers(self) -> bytes:
        return self.encoders[0].headers()

    def encode_clip(self, frames=None, source=None, n_frames=None,
                    qp: int | None = None) -> list[bytes]:
        """Encode display-order frames; returns per-frame bitstreams
        in display order. Frames are grouped into closed GOPs and the
        groups dispatched round-robin across devices."""
        import jax

        nf = len(frames) if frames is not None else n_frames
        d = len(self.devices)
        jobs = []                       # (gop_idx, pending list)
        for g0 in range(0, nf, self.gop):
            g = g0 // self.gop
            enc = self.encoders[g % d]
            dev = self.devices[g % d]
            idx = range(g0, min(g0 + self.gop, nf))
            enc._ref = None             # closed GOP: fresh chain
            enc._poc = 0
            with jax.default_device(dev):
                if frames is not None:
                    batch = [frames[i] for i in idx]
                    pend = enc.encode_run_async(batch, qp=qp,
                                                force_idr=True)
                else:
                    pend = enc.encode_run_async(source=source,
                                                indices=idx, qp=qp,
                                                force_idr=True)
            jobs.append(pend)
        out = []
        for pend in jobs:
            out.extend(p.result().data for p in pend)
        return out


def gop_throughput_scaling(width, height, frames, gop, qp=32):
    """Measure frames/s for 1 vs all devices (the >=80% scaling
    efficiency target of BASELINE.md). Returns (fps_1, fps_n, n)."""
    import time

    import jax

    devs = jax.devices()
    for nd in (1, len(devs)):
        enc = GopParallelEncoder(width, height, qp=qp, gop=gop,
                                 devices=devs[:nd])
        enc.encode_clip(frames)        # warm compile
        t0 = time.time()
        enc.encode_clip(frames)
        dt = time.time() - t0
        if nd == 1:
            fps_1 = len(frames) / dt
        else:
            fps_n = len(frames) / dt
    return fps_1, fps_n, len(devs)
