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
        groups dispatched round-robin across devices; at most one GOP
        per device is in flight (bounded device memory: the pending
        recon/level stacks are O(devices x gop), not O(clip))."""
        import jax

        if frames is None and n_frames is None:
            raise ValueError("source input requires n_frames")
        from collections import deque

        nf = len(frames) if frames is not None else n_frames
        d = len(self.devices)
        in_flight: deque = deque()      # (GOP order) pending lists
        out = []
        for g0 in range(0, nf, self.gop):
            slot = (g0 // self.gop) % d
            if len(in_flight) >= d:     # this slot's previous job
                out.extend(p.result().data
                           for p in in_flight.popleft())
            enc = self.encoders[slot]
            dev = self.devices[slot]
            idx = range(g0, min(g0 + self.gop, nf))
            enc.resume()                # closed GOP: fresh chain
            with jax.default_device(dev):
                if frames is not None:
                    batch = [frames[i] for i in idx]
                    pend = enc.encode_run_async(batch, qp=qp,
                                                force_idr=True)
                else:
                    pend = enc.encode_run_async(source=source,
                                                indices=idx, qp=qp,
                                                force_idr=True)
            in_flight.append(pend)
        while in_flight:
            out.extend(p.result().data for p in in_flight.popleft())
        return out


def gop_throughput_scaling(width, height, frames, gop, qp=32):
    """Measure frames/s for 1 vs all devices (the >=80% scaling
    efficiency target of BASELINE.md). Returns (fps_1, fps_n, n)."""
    import time

    import jax

    devs = jax.devices()
    fps = {}
    for nd in sorted({1, len(devs)}):
        enc = GopParallelEncoder(width, height, qp=qp, gop=gop,
                                 devices=devs[:nd])
        enc.encode_clip(frames)        # warm compile
        t0 = time.time()
        enc.encode_clip(frames)
        fps[nd] = len(frames) / (time.time() - t0)
    return fps[1], fps[len(devs)], len(devs)
