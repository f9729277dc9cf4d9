"""Third-party SRT endpoint interop (reference:
tests/test_srt_live_transmit.c:73-117 — fork a real srt-live-transmit
listener, skip gracefully when the binary is absent).

srt-live-transmit bridges srt://:PORT -> udp://127.0.0.1:UDP_PORT; we
connect with the in-repo SrtClient, stream MPEG-TS payloads, and
verify the bytes emerge on the UDP side with 0x47 sync intact."""

import shutil
import socket
import subprocess
import time

import pytest

from ceracoder_tpu.transport.srt import srt_available

SLT = shutil.which("srt-live-transmit")

pytestmark = pytest.mark.skipif(
    SLT is None or not srt_available(),
    reason="srt-live-transmit or libsrt not installed")


def _free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture()
def bridge():
    srt_port = _free_port()
    udp_port = _free_port()
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", udp_port))
    rx.settimeout(10.0)
    proc = subprocess.Popen(
        [SLT, f"srt://:{srt_port}?mode=listener",
         f"udp://127.0.0.1:{udp_port}"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    time.sleep(0.5)
    if proc.poll() is not None:
        rx.close()
        pytest.skip("srt-live-transmit failed to start")
    yield srt_port, rx
    proc.terminate()
    proc.wait(timeout=5)
    rx.close()


def test_ts_delivery_through_srt_live_transmit(bridge):
    from ceracoder_tpu.transport.srt import SrtClient

    srt_port, rx = bridge
    client = SrtClient(latency_ms=200, payload_size=1316)
    client.connect("127.0.0.1", srt_port)
    try:
        payload = bytes([0x47]) + bytes(187)         # one TS packet
        burst = payload * 7                           # 1316 B
        total = 0
        for _ in range(100):
            assert client.send(burst) == len(burst)
            total += len(burst)
        got = b""
        deadline = time.time() + 10
        while len(got) < total and time.time() < deadline:
            try:
                got += rx.recv(65536)
            except socket.timeout:
                break
        assert len(got) >= total // 2, (len(got), total)
        assert got[0] == 0x47
        assert got[188] == 0x47
    finally:
        client.close()


def test_stats_during_transmission(bridge):
    from ceracoder_tpu.transport.srt import SrtClient

    srt_port, rx = bridge
    client = SrtClient(latency_ms=200, payload_size=1316)
    client.connect("127.0.0.1", srt_port)
    try:
        burst = (bytes([0x47]) + bytes(187)) * 7
        for _ in range(50):
            client.send(burst)
        stats = client.get_stats()
        assert stats.ms_rtt >= 0
        assert stats.pkt_recv_ack_total >= 0
    finally:
        client.close()
