"""SRT transport tests over a loopback link — the reference's
test_srt_integration.c strategy: an in-process listener thread plays the
remote peer; everything skips if libsrt is absent."""

import threading
import time

import pytest

from ceracoder_tpu.transport.srt import (
    SRTO_RCVLATENCY,
    SrtClient,
    SrtError,
    SrtSocket,
    srt_available,
)

pytestmark = pytest.mark.skipif(not srt_available(),
                                reason="libsrt not available")

PORT = 42300


class Listener:
    def __init__(self, port, latency=120):
        self.sock = SrtSocket()
        self.sock.set_int(SRTO_RCVLATENCY, latency)
        self.sock.bind("127.0.0.1", port)
        self.sock.listen()
        self.received = []
        self.peer = None
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        try:
            self.peer = self.sock.accept()
            while not self._stop.is_set():
                data = self.peer.recv(2000)
                if not data:
                    return
                self.received.append(data)
        except SrtError:
            pass

    def close(self):
        self._stop.set()
        if self.peer:
            self.peer.close()
        self.sock.close()
        self.thread.join(timeout=2)


@pytest.fixture
def listener():
    lst = Listener(PORT)
    time.sleep(0.1)
    yield lst
    lst.close()


def test_connect_and_negotiated_latency(listener):
    c = SrtClient(latency_ms=300)
    c.connect("127.0.0.1", PORT)
    # negotiated = max(client, listener) = max(300, 120)
    assert c.negotiated_latency == 300
    c.close()


def test_verified_delivery(listener):
    c = SrtClient(latency_ms=120)
    c.connect("127.0.0.1", PORT)
    payload = bytes(range(256)) * 5 + b"z" * 36
    for _ in range(10):
        assert c.send(payload) == len(payload)
    deadline = time.time() + 3
    while len(listener.received) < 10 and time.time() < deadline:
        time.sleep(0.05)
    assert len(listener.received) == 10
    assert all(p == payload for p in listener.received)
    c.close()


def test_stats_after_send(listener):
    c = SrtClient(latency_ms=120)
    c.connect("127.0.0.1", PORT)
    for _ in range(20):
        c.send(b"x" * 1316)
    time.sleep(0.3)
    st = c.get_stats()
    assert st.byte_sent_total >= 20 * 1316
    assert st.pkt_snd_loss_total == 0
    assert st.ms_rtt >= 0
    assert c.get_snd_buffer() >= 0
    c.close()


def test_connect_failure_no_listener():
    c = SrtClient(latency_ms=120)
    with pytest.raises(SrtError):
        c.connect("127.0.0.1", 45999)
    c.close()


def test_streamid_roundtrip(listener):
    c = SrtClient(latency_ms=120, stream_id="abc/stream-1")
    c.connect("127.0.0.1", PORT)
    # reaching connect proves STREAMID sockopt was accepted
    c.close()
