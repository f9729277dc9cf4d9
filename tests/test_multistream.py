"""BASELINE.md config[4]: concurrent streams with per-stream adaptive
control over emulated srtla bonded links with modem dropouts.

Each stream owns a BalancerRunner (the reference's 20 ms control loop)
fed by its own BondedLink emulator; the encode side runs the mesh
stream axis (parallel/hevc.py) so the test exercises the full
multi-stream story: N independent control loops + one sharded encode
step. The control assertions mirror the reference's behavioral tests
(tests/test_balancer.c via SURVEY.md §4): throttle on dropout, recover
after the modem returns, never exceed bounds.
"""

import numpy as np

from ceracoder_tpu.control.config import CeracoderConfig
from ceracoder_tpu.control.runner import BalancerRunner
from ceracoder_tpu.transport.linksim import (
    BondedLink,
    Modem,
    two_modem_dropout,
)

TICK_MS = 20


def drive(link, runner, seconds, record_every=50):
    """Run the 20 ms control loop against the emulated link; the
    offered rate follows the balancer's bitrate (the encoder obeys)."""
    bitrate = runner.config.max_bitrate
    traj = []
    for i in range(int(seconds * 1000 / TICK_MS)):
        stats = link.tick(bitrate)
        out = runner.step(stats)
        bitrate = out.new_bitrate
        if i % record_every == 0:
            traj.append(bitrate)
    return traj


def make_runner(max_kbps=10000, min_kbps=500, latency=2000):
    cfg = CeracoderConfig()
    cfg.min_bitrate = min_kbps
    cfg.max_bitrate = max_kbps
    return BalancerRunner(cfg, "adaptive", srt_latency=latency,
                          quiet=True)


class TestBondedLinkControl:
    def test_dropout_throttles_and_recovers(self):
        link = two_modem_dropout(cap_each_mbps=6.0, drop_at_ms=20000,
                                 back_at_ms=40000)
        runner = make_runner(max_kbps=10000)
        traj = drive(link, runner, seconds=60)
        # phase averages (1 s samples): full capacity, dropout, return
        full = np.mean(traj[10:19])
        dropped = np.mean(traj[25:39])
        recovered = np.mean(traj[50:])
        assert full > 8e6            # rides near max on 12 Mbps agg
        assert dropped < full * 0.75  # throttles on 6 Mbps
        assert recovered > dropped * 1.2   # climbs back
        lo = runner.config.min_bitrate
        hi = runner.config.max_bitrate
        assert all(lo <= b <= hi for b in traj)

    def test_total_loss_blackout_drops_to_min(self):
        link = BondedLink(modems=[
            Modem(6e6, schedule=[(10000, False), (12000, True)]),
        ])
        runner = make_runner(max_kbps=8000)
        traj = drive(link, runner, seconds=20, record_every=10)
        # during the 2 s blackout the emergency path reaches min
        black = traj[len(traj) * 10 // 20: len(traj) * 13 // 20]
        assert min(black) <= runner.config.min_bitrate * 2

    def test_four_streams_independent_control(self):
        """4 concurrent streams, staggered dropouts: each stream's
        controller reacts to its own link only."""
        links = [two_modem_dropout(6.0, drop_at_ms=10000 + 8000 * s,
                                   back_at_ms=14000 + 8000 * s)
                 for s in range(4)]
        runners = [make_runner(max_kbps=10000) for _ in range(4)]
        bitrates = [r.config.max_bitrate for r in runners]
        minima = [[] for _ in range(4)]
        for i in range(int(50 * 1000 / TICK_MS)):
            t = (i + 1) * TICK_MS
            for s in range(4):
                stats = links[s].tick(bitrates[s])
                bitrates[s] = runners[s].step(stats).new_bitrate
                minima[s].append((t, bitrates[s]))
        for s in range(4):
            during = [b for t, b in minima[s]
                      if 10000 + 8000 * s + 2000 < t < 14000 + 8000 * s]
            outside_other = [b for t, b in minima[s]
                             if t < 10000 + 8000 * s - 1000]
            assert min(during) < np.mean(outside_other) * 0.8, s


class TestMultiStreamEncodeWithControl:
    def test_per_stream_qp_follows_link_quality(self):
        """Two streams with independent encoders, links, balancers,
        and QP rate controllers (the app's control stack end to end):
        the stream on the weak link must settle at a higher QP
        (coarser) and a lower bitrate than the healthy one, and both
        streams' bytes must track their balancer targets."""
        from ceracoder_tpu.codec.h265.device import H265DeviceEncoder
        from ceracoder_tpu.control.qp_rate import QpRateController

        w, h = 96, 64
        rng = np.random.default_rng(5)
        base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.uint8)

        links = [BondedLink(modems=[Modem(3e6)]),
                 BondedLink(modems=[Modem(0.4e6)])]
        runners = [make_runner(max_kbps=3000, min_kbps=300,
                               latency=2000) for _ in range(2)]
        encs = [H265DeviceEncoder(w, h, qp=32, gop=30)
                for _ in range(2)]
        rates = [QpRateController(fps=30.0, qp=32.0) for _ in range(2)]
        bitrate = [r.config.max_bitrate for r in runners]
        qp = [32, 32]
        qps_hist = [[], []]

        for i in range(45):
            y = base[i % 16:i % 16 + h, (2 * i) % 16:(2 * i) % 16 + w]
            u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
            v = (y[1::2, 1::2] // 3 + 70).astype(np.uint8)
            for k in range(2):
                fr = encs[k].encode_frame(y, u, v, qp=int(qp[k]))
                produced = len(fr.data) * 8
                for _ in range(2):   # ~two 20 ms ticks per frame
                    stats = links[k].tick(bitrate[k])
                    bitrate[k] = runners[k].step(stats).new_bitrate
                qp[k] = rates[k].update(bitrate[k], produced)
                qps_hist[k].append(qp[k])
        # steady state: weak-link stream coarser and slower
        q0 = np.mean(qps_hist[0][-10:])
        q1 = np.mean(qps_hist[1][-10:])
        assert q1 > q0 + 2, (q0, q1)
        assert bitrate[1] < bitrate[0]
