"""Balancer behavior tests.

Drives the real balancers through BalancerRunner with synthetic
BalancerInput sequences and hand-advanced timestamps — no transport, no
encoder, no clock (test strategy cloned from reference
tests/test_balancer.c; scenario list at :421-434).
"""

import pytest

from ceracoder_tpu.control import (
    BalancerInput,
    BalancerRunner,
    CeracoderConfig,
)
from ceracoder_tpu.control.runner import UnknownBalancerError


def make_runner(balancer="adaptive", min_kbps=500, max_kbps=6000,
                latency=2000, **tuning):
    cfg = CeracoderConfig(min_bitrate=min_kbps, max_bitrate=max_kbps,
                          balancer=balancer)
    for k, v in tuning.items():
        # e.g. adaptive_incr_step -> cfg.adaptive.incr_step
        group, _, key = k.partition("_")
        setattr(getattr(cfg, group), key, v)
    # prefer_native=False: these tests white-box the Python spec
    # implementation's state; native parity is tests/test_native.py
    return BalancerRunner(cfg, srt_latency=latency, quiet=True,
                          prefer_native=False)


def good_input(ts, rtt=50.0, bs=5, rate=5.0):
    return BalancerInput(buffer_size=bs, rtt=rtt, send_rate_mbps=rate,
                         timestamp=ts)


def congested_input(ts, rtt=450.0, bs=200, rate=2.0):
    return BalancerInput(buffer_size=bs, rtt=rtt, send_rate_mbps=rate,
                         timestamp=ts)


def run_trace(runner, inputs):
    out = None
    for inp in inputs:
        out = runner.step(inp)
    return out


class TestAdaptive:
    def test_recovers_on_good_network(self):
        # congestion first, then sustained good conditions -> bitrate climbs
        r = make_runner()
        ts = 1000
        reduced = None
        for _ in range(10):
            reduced = r.step(congested_input(ts)).new_bitrate
            ts += 250
        recovered = reduced
        for _ in range(30):
            recovered = r.step(good_input(ts)).new_bitrate
            ts += 600
        assert recovered > reduced
        assert recovered <= 6000 * 1000

    def test_decreases_on_congestion(self):
        r = make_runner()
        ts = 1000
        high = None
        for _ in range(10):
            high = r.step(good_input(ts)).new_bitrate
            ts += 600
        out = None
        for _ in range(10):
            out = r.step(congested_input(ts))
            ts += 300
        assert out.new_bitrate < high
        assert out.new_bitrate >= 500 * 1000

    def test_emergency_drops_to_min(self):
        # RTT >= latency/3 is the emergency trigger
        # (reference: bitrate_control.c:176-179)
        r = make_runner(latency=2000)
        out = r.step(BalancerInput(buffer_size=5, rtt=700.0,
                                   send_rate_mbps=5.0, timestamp=1000))
        assert out.new_bitrate == 500 * 1000

    def test_increase_respects_cooldown(self):
        # two good ticks 20 ms apart: only the first may increase
        r = make_runner()
        o1 = r.step(good_input(1000))
        o2 = r.step(good_input(1020))
        assert o2.new_bitrate == o1.new_bitrate

    def test_output_carries_thresholds(self):
        r = make_runner()
        out = r.step(good_input(1000))
        assert out.bs_th3 >= 0 and out.rtt_th_max > 0
        assert out.rtt == 50 and out.bs == 5

    def test_packet_loss_triggers_reduction(self):
        r = make_runner()
        ts = 1000
        stable = None
        for _ in range(15):
            stable = r.step(good_input(ts)).new_bitrate
            ts += 600
        out = None
        loss = 0
        for _ in range(10):
            loss += 20
            out = r.step(BalancerInput(buffer_size=5, rtt=50.0,
                                       send_rate_mbps=5.0, timestamp=ts,
                                       pkt_loss_total=loss,
                                       pkt_retrans_total=loss // 2))
            ts += 300
        assert out.new_bitrate < stable

    def test_loss_decays_without_new_loss(self):
        r = make_runner()
        ts = 1000
        # build up loss congestion
        for i in range(5):
            r.step(BalancerInput(buffer_size=5, rtt=50.0, send_rate_mbps=5.0,
                                 timestamp=ts, pkt_loss_total=100 * (i + 1)))
            ts += 300
        assert r.state.loss_rate > 0.5
        # loss stops: rate decays by 0.9 per tick
        for _ in range(50):
            r.step(BalancerInput(buffer_size=5, rtt=50.0, send_rate_mbps=5.0,
                                 timestamp=ts, pkt_loss_total=500))
            ts += 300
        assert r.state.loss_rate < 0.5


class TestFixed:
    def test_maintains_constant_bitrate(self):
        r = make_runner("fixed", max_kbps=4000)
        expected = 4000 * 1000
        assert r.step(good_input(1000)).new_bitrate == expected
        assert r.step(congested_input(2000)).new_bitrate == expected
        assert r.step(BalancerInput(buffer_size=999, rtt=999.0,
                                    timestamp=3000)).new_bitrate == expected

    def test_rounds_to_100k(self):
        r = make_runner("fixed", max_kbps=4567)
        assert r.step(good_input(1000)).new_bitrate == 4500 * 1000


class TestAimd:
    def test_additive_increase(self):
        r = make_runner("aimd", max_kbps=6000)
        ts = 1000
        prev = None
        for _ in range(5):
            out = r.step(good_input(ts, rtt=50.0, bs=5))
            if prev is not None and out.new_bitrate != prev:
                assert 50_000 <= out.new_bitrate - prev <= 150_000
            prev = out.new_bitrate
            ts += 600

    def test_multiplicative_decrease(self):
        r = make_runner("aimd", max_kbps=6000)
        ts = 1000
        # establish baseline RTT
        for _ in range(10):
            r.step(good_input(ts, rtt=50.0))
            ts += 600
        before = r.state.cur_bitrate
        out = r.step(BalancerInput(buffer_size=200, rtt=120.0,
                                   send_rate_mbps=2.0, timestamp=ts))
        ratio = out.new_bitrate / before
        assert 0.60 <= ratio <= 0.85

    def test_emergency_drop(self):
        r = make_runner("aimd", min_kbps=500, latency=2000)
        out = r.step(BalancerInput(buffer_size=5, rtt=700.0, timestamp=1000))
        assert out.new_bitrate == 500 * 1000


class TestBounds:
    def test_respects_bounds_under_stress(self):
        r = make_runner(min_kbps=1000, max_kbps=5000)
        ts = 1000
        for _ in range(20):
            out = r.step(BalancerInput(buffer_size=500, rtt=800.0,
                                       send_rate_mbps=1.0, timestamp=ts))
            assert out.new_bitrate >= 1000 * 1000
            ts += 300
        for _ in range(50):
            out = r.step(good_input(ts))
            assert out.new_bitrate <= 5000 * 1000
            ts += 600

    def test_min_equals_max_pins_bitrate(self):
        r = make_runner(min_kbps=3000, max_kbps=3000)
        ts = 1000
        for inp in [good_input, congested_input] * 5:
            out = r.step(inp(ts))
            assert out.new_bitrate == 3_000_000
            ts += 300


class TestRunner:
    def test_unknown_override_raises(self):
        cfg = CeracoderConfig()
        with pytest.raises(UnknownBalancerError):
            BalancerRunner(cfg, algo_name_override="bogus", quiet=True)

    def test_unknown_config_name_falls_back_to_default(self):
        cfg = CeracoderConfig(balancer="nonsense")
        r = BalancerRunner(cfg, quiet=True)
        assert r.name == "adaptive"

    def test_cli_override_wins(self):
        cfg = CeracoderConfig(balancer="adaptive")
        r = BalancerRunner(cfg, algo_name_override="aimd", quiet=True)
        assert r.name == "aimd"

    def test_update_bounds_resets_state(self):
        r = make_runner()
        ts = 1000
        for _ in range(10):
            r.step(congested_input(ts))
            ts += 300
        r.update_bounds(1_000_000, 8_000_000)
        # re-init: bitrate back at (new) max
        assert r.state.cur_bitrate == 8_000_000
