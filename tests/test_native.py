"""Native (C++) host-runtime parity tests.

The Python implementations are the executable spec; the C++ library
(native/src/*.cc) must agree exactly: the balancer core tick for tick
(both use IEEE-754 doubles, so EMA state matches bit for bit), the
MPEG-TS muxer byte for byte, and the SRT payload packer payload for
payload. Mirrors the reference's approach of testing the real
production objects (reference: Makefile:31 links production objects
minus main into the test binaries)."""

import threading
import time

import numpy as np
import pytest

from ceracoder_tpu.control.adaptive import AdaptiveBalancer
from ceracoder_tpu.control.aimd import AimdBalancer
from ceracoder_tpu.control.fixed import FixedBalancer
from ceracoder_tpu.control.types import BalancerConfig, BalancerInput
from ceracoder_tpu.native import (
    NativeBalancer,
    NativeTsMuxer,
    NativeTsPacker,
    load,
)
from ceracoder_tpu.transport.mpegts import TsMuxer, TsPacker

pytestmark = pytest.mark.skipif(load() is None,
                                reason="native toolchain unavailable")

PY_ALGOS = {"adaptive": AdaptiveBalancer, "aimd": AimdBalancer,
            "fixed": FixedBalancer}


def synthetic_trace(n=600, seed=7):
    """A 12 s @ 20 ms trace: stable -> congested -> emergency -> recovery,
    with loss bursts and RTT jitter."""
    rng = np.random.default_rng(seed)
    inputs = []
    loss = retrans = 0
    for i in range(n):
        ts = i * 20
        if i < 150:            # stable
            rtt, bs, rate = 45 + rng.normal(0, 3), 4 + rng.integers(0, 4), 5.6
        elif i < 250:          # congestion building
            rtt = 90 + (i - 150) * 2 + rng.normal(0, 10)
            bs = 30 + (i - 150)
            rate = 4.0
            if i % 7 == 0:
                loss += int(rng.integers(1, 4))
            retrans += int(rng.integers(0, 2))
        elif i < 300:          # emergency territory
            rtt, bs, rate = 700 + rng.normal(0, 30), 400, 1.0
            loss += int(rng.integers(0, 6))
        else:                  # recovery
            rtt, bs, rate = 48 + rng.normal(0, 2), 3, 3.0
        inputs.append(BalancerInput(
            buffer_size=int(bs), rtt=float(max(1.0, rtt)),
            send_rate_mbps=float(rate), timestamp=ts,
            pkt_loss_total=loss, pkt_retrans_total=retrans))
    return inputs


@pytest.mark.parametrize("name", ["adaptive", "aimd", "fixed"])
def test_balancer_parity(name):
    cfg = BalancerConfig(min_bitrate=500_000, max_bitrate=6_000_000,
                         srt_latency=2000)
    py = PY_ALGOS[name](cfg)
    nat = NativeBalancer(name, cfg)
    for inp in synthetic_trace():
        a = py.step(inp)
        b = nat.step(inp)
        assert a == b, f"{name} diverged at ts={inp.timestamp}: {a} vs {b}"


def test_balancer_update_bounds_matches_reinit():
    """SIGHUP bounds update re-inits the algorithm, losing state
    (reference: balancer_runner.c:80-89)."""
    cfg = BalancerConfig(min_bitrate=500_000, max_bitrate=6_000_000)
    nat = NativeBalancer("adaptive", cfg)
    trace = synthetic_trace(200)
    for inp in trace[:100]:
        nat.step(inp)
    nat.update_bounds(1_000_000, 4_000_000)
    cfg2 = BalancerConfig(min_bitrate=1_000_000, max_bitrate=4_000_000)
    py2 = AdaptiveBalancer(cfg2)
    for inp in trace[100:]:
        assert py2.step(inp) == nat.step(inp)


def test_balancer_list():
    lib = load()
    assert lib.cc_balancer_list().decode() == "adaptive,aimd,fixed"


def _mux_pair(**kw):
    return TsMuxer(**kw), NativeTsMuxer(**kw)


def test_mux_psi_parity():
    py, nat = _mux_pair(with_audio=True)
    assert py.psi() == nat.psi()
    assert py.psi() == nat.psi()          # continuity counters advance


def test_mux_video_parity():
    rng = np.random.default_rng(3)
    py, nat = _mux_pair()
    sizes = [5000, 183, 184, 170, 14, 200000, 1, 171, 368, 175]
    pts = 90_000
    for i, size in enumerate(sizes):
        au = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        key = i % 4 == 0
        dts = pts - 3000 if i % 3 == 0 else None
        a = py.mux_video(au, pts, dts, keyframe=key)
        b = nat.mux_video(au, pts, dts, keyframe=key)
        assert a == b, f"video mux diverged at AU {i} (size {size})"
        pts += 3003


def test_mux_audio_parity():
    rng = np.random.default_rng(4)
    py, nat = _mux_pair(with_audio=True)
    pts = 45_000
    for size in [371, 12, 184, 1000]:
        adts = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert py.mux_audio(adts, pts) == nat.mux_audio(adts, pts)
        pts += 1920


def test_packer_parity():
    rng = np.random.default_rng(5)
    py, nat = TsPacker(1316), NativeTsPacker(1316)
    for _ in range(50):
        chunk = rng.integers(0, 256,
                             int(rng.integers(1, 4000)),
                             dtype=np.uint8).tobytes()
        assert py.feed(chunk) == nat.feed(chunk)
        assert py.residue == nat.residue
    assert py.flush() == nat.flush()


def test_native_srt_loopback():
    """C++ SRT client against the in-process Python listener (the
    reference's test_srt_integration.c strategy)."""
    from ceracoder_tpu.native import NativeSrtClient
    from ceracoder_tpu.transport.srt import (
        SRTO_RCVLATENCY, SrtError, SrtSocket, srt_available)
    if not srt_available():
        pytest.skip("libsrt not available")

    port = 42411
    sock = SrtSocket()
    sock.set_int(SRTO_RCVLATENCY, 120)
    sock.bind("127.0.0.1", port)
    sock.listen()
    received = []
    stop = threading.Event()

    def serve():
        try:
            peer = sock.accept()
            while not stop.is_set():
                data = peer.recv(2000)
                if not data:
                    return
                received.append(data)
        except SrtError:
            pass

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    time.sleep(0.1)

    cli = NativeSrtClient()
    try:
        cli.connect("127.0.0.1", port, latency_ms=300, streamid="nat-test")
        assert cli.negotiated_latency >= 300
        payload = bytes([0x47]) + bytes(1315)
        for _ in range(10):
            assert cli.send(payload) == len(payload)
        deadline = time.time() + 3
        while len(received) < 10 and time.time() < deadline:
            time.sleep(0.02)
        assert len(received) == 10
        assert all(p == payload for p in received)
        stats = cli.get_stats()
        assert stats.msRTT >= 0.0
        assert stats.pktRecvACKTotal >= 0
        assert cli.get_snddata() >= 0
    finally:
        cli.close()
        stop.set()
        sock.close()
        th.join(timeout=2)
