"""Config + runner integration tests (modeled on the reference's
tests/test_integration.c scenarios: defaults, init-from-config, override,
bounds update mid-run, 3-phase flow, Kbps conversion, algorithm switching,
rapid alternation)."""

from ceracoder_tpu.control import (
    BalancerInput,
    BalancerRunner,
    CeracoderConfig,
)
from ceracoder_tpu.control.config import (
    bitrate_bps,
    config_load,
    config_serialize,
)


def test_config_defaults():
    cfg = CeracoderConfig()
    assert cfg.min_bitrate == 300
    assert cfg.max_bitrate == 6000
    assert cfg.balancer == "adaptive"
    assert cfg.srt_latency == 2000
    assert cfg.adaptive.incr_step == 30
    assert cfg.adaptive.decr_step == 100
    assert cfg.aimd.incr_step == 50
    assert cfg.aimd.decr_mult == 0.75


def test_config_load(tmp_path):
    p = tmp_path / "ceracoder.conf"
    p.write_text("""
# comment
[general]
min_bitrate = 500
max_bitrate = 12000
balancer = aimd

[srt]
latency = 1500

[aimd]
incr_step = 80
decr_mult = 0.5
""")
    cfg = config_load(p)
    assert cfg.min_bitrate == 500
    assert cfg.max_bitrate == 12000
    assert cfg.balancer == "aimd"
    assert cfg.srt_latency == 1500
    assert cfg.aimd.incr_step == 80
    assert cfg.aimd.decr_mult == 0.5
    # untouched keys keep defaults
    assert cfg.aimd.incr_interval == 500


def test_config_keys_before_section_are_general(tmp_path):
    p = tmp_path / "c.conf"
    p.write_text("min_bitrate = 700\n[srt]\nlatency = 900\n")
    cfg = config_load(p)
    assert cfg.min_bitrate == 700
    assert cfg.srt_latency == 900


def test_config_serialize_roundtrip(tmp_path):
    cfg = CeracoderConfig(min_bitrate=400, max_bitrate=9000, balancer="aimd",
                          srt_latency=1200)
    cfg.aimd.decr_mult = 0.6
    text = config_serialize(cfg)
    assert "[aimd]" in text and "[adaptive]" not in text
    p = tmp_path / "out.conf"
    p.write_text(text)
    back = config_load(p)
    assert back.min_bitrate == 400
    assert back.max_bitrate == 9000
    assert back.balancer == "aimd"
    assert back.srt_latency == 1200
    assert back.aimd.decr_mult == 0.6


def test_kbps_to_bps():
    assert bitrate_bps(6000) == 6_000_000
    assert bitrate_bps(300) == 300_000


def test_init_from_config():
    cfg = CeracoderConfig(min_bitrate=800, max_bitrate=4000)
    r = BalancerRunner(cfg, srt_latency=1500, quiet=True)
    assert r.config.min_bitrate == 800_000
    assert r.config.max_bitrate == 4_000_000
    assert r.config.srt_latency == 1500


def test_three_phase_flow():
    """good -> congested -> recovery, end to end through the runner."""
    cfg = CeracoderConfig(min_bitrate=500, max_bitrate=6000)
    r = BalancerRunner(cfg, quiet=True)
    ts = 1000

    def tick(rtt, bs, n, dt):
        nonlocal ts
        out = None
        for _ in range(n):
            out = r.step(BalancerInput(buffer_size=bs, rtt=rtt,
                                       send_rate_mbps=5.0, timestamp=ts))
            ts += dt
        return out.new_bitrate

    good = tick(50.0, 5, 20, 600)
    congested = tick(450.0, 250, 10, 300)
    recovered = tick(50.0, 5, 40, 600)
    assert congested < good
    assert recovered > congested


def test_switching_all_algorithms():
    for name in ("adaptive", "fixed", "aimd"):
        cfg = CeracoderConfig(balancer=name)
        r = BalancerRunner(cfg, quiet=True)
        assert r.name == name
        out = r.step(BalancerInput(buffer_size=5, rtt=50.0,
                                   send_rate_mbps=5.0, timestamp=1000))
        assert 300_000 <= out.new_bitrate <= 6_000_000


def test_rapid_alternation_respects_bounds():
    cfg = CeracoderConfig(min_bitrate=1000, max_bitrate=5000)
    r = BalancerRunner(cfg, quiet=True)
    ts = 1000
    for i in range(100):
        rtt, bs = (50.0, 5) if i % 2 == 0 else (450.0, 250)
        out = r.step(BalancerInput(buffer_size=bs, rtt=rtt,
                                   send_rate_mbps=3.0, timestamp=ts))
        assert 1_000_000 <= out.new_bitrate <= 5_000_000
        ts += 100


def test_sighup_style_bounds_update_mid_run():
    cfg = CeracoderConfig(min_bitrate=500, max_bitrate=6000)
    r = BalancerRunner(cfg, quiet=True)
    ts = 1000
    for _ in range(10):
        r.step(BalancerInput(buffer_size=5, rtt=50.0, send_rate_mbps=5.0,
                             timestamp=ts))
        ts += 600
    r.update_bounds(2_000_000, 10_000_000)
    out = r.step(BalancerInput(buffer_size=5, rtt=50.0, send_rate_mbps=5.0,
                               timestamp=ts))
    assert 2_000_000 <= out.new_bitrate <= 10_000_000
