"""Delivered-bits accuracy of the bitrate->QP actuator through the
FULL encoder (SURVEY.md §7.3 #6; VERDICT round-1 item 7): encode N
GOPs at fixed target bitrates and assert the delivered average is
within +-10%. Also pins the infeasible-target behavior (rails at
max QP) and the I/P allocation keeping IDR frames from reading as
overshoot."""

import numpy as np
import pytest

from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
from ceracoder_tpu.control.qp_rate import QpRateController

W, H, FPS, GOP = 192, 128, 30.0, 30


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H + 128, W + 128)).astype(np.uint8)

    def frame(i):
        dy, dx = (i * 2) % 100, (i * 3) % 100
        return (base[dy:dy + H, dx:dx + W],
                base[dy // 2:dy // 2 + H // 2,
                     dx // 2:dx // 2 + W // 2],
                base[dy // 2 + 16:dy // 2 + 16 + H // 2,
                     dx // 2 + 8:dx // 2 + 8 + W // 2])

    return [frame(i) for i in range(66)]


def _encode_at(frames, kbps, n):
    enc = H265DeviceEncoder(W, H, qp=32, gop=GOP)
    rc = QpRateController(fps=FPS, gop=GOP)
    bits = 0
    for i in range(n):
        fr = enc.encode_frame(*frames[i], qp=rc.current_qp)
        bits += len(fr.data) * 8
        rc.update(kbps * 1000, len(fr.data) * 8, keyframe=fr.keyframe)
    return bits * FPS / n / 1000.0, rc


@pytest.mark.parametrize("kbps", [1000, 2000, 4000])
def test_delivered_bits_within_10_percent(frames, kbps):
    delivered, _ = _encode_at(frames, kbps, 66)
    assert abs(delivered / kbps - 1.0) < 0.10, (kbps, delivered)


def test_infeasible_target_rails_at_max_qp(frames):
    # far below the content's QP-51 floor: the controller must rail
    # (and stay railed) rather than oscillate
    _, rc = _encode_at(frames, 100, 40)
    assert rc.current_qp == rc.max_qp


def test_ip_allocation_absorbs_idr_size():
    # an IDR is allowed ratio x the P target without creating a
    # correction; a same-size P frame must push QP up instead
    rc = QpRateController(fps=30.0, gop=30, qp=30.0)
    t_p = rc.target_bits(1_000_000)
    t_i = rc.target_bits(1_000_000, keyframe=True)
    assert t_i / t_p == pytest.approx(rc.ratio)
    qp0 = rc.current_qp
    rc.update(1_000_000, int(t_i), keyframe=True)
    assert abs(rc.current_qp - qp0) <= 1        # on-target IDR: no jolt
    rc2 = QpRateController(fps=30.0, gop=30, qp=30.0)
    rc2.update(1_000_000, int(t_i), keyframe=False)
    assert rc2.current_qp > qp0                 # same bits as P: jolt
