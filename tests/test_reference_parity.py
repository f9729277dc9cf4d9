"""Behavioral parity: our adaptive controller vs the reference C core.

Compiles the reference's pure-C bitrate controller
(/root/reference/src/core/bitrate_control.c — no GStreamer/SRT deps,
only glib's MIN/MAX macros, shimmed here) into a shared library at test
time and replays identical random stat traces through both
implementations, asserting tick-for-tick identical bitrates and
thresholds. Skips when the reference mount or a C compiler is absent
(the reference's own skip-if-unavailable pattern,
tests/test_srt_live_transmit.c:56-59).
"""

import ctypes
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from ceracoder_tpu.control.adaptive import AdaptiveBalancer
from ceracoder_tpu.control.types import BalancerConfig, BalancerInput

REF = Path("/root/reference/src/core/bitrate_control.c")

GLIB_SHIM = """
#ifndef GLIB_SHIM_H
#define GLIB_SHIM_H
#include <stddef.h>
#define MIN(a, b) (((a) < (b)) ? (a) : (b))
#define MAX(a, b) (((a) > (b)) ? (a) : (b))
#endif
"""


@pytest.fixture(scope="module")
def ref_lib(tmp_path_factory):
    if not REF.exists():
        pytest.skip("reference mount not available")
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler")
    tmp = tmp_path_factory.mktemp("refparity")
    (tmp / "glib.h").write_text(GLIB_SHIM)
    so = tmp / "libref_bitrate.so"
    r = subprocess.run(
        [cc, "-shared", "-fPIC", "-O2", "-I", str(tmp),
         "-I", str(REF.parent), str(REF), "-o", str(so)],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"reference compile failed: {r.stderr[:400]}")
    lib = ctypes.CDLL(str(so))
    lib.bitrate_update.restype = ctypes.c_int
    lib.bitrate_update.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    return lib


class RefResult(ctypes.Structure):
    _fields_ = [("new_bitrate", ctypes.c_int),
                ("throughput", ctypes.c_double),
                ("rtt", ctypes.c_int),
                ("rtt_th_min", ctypes.c_int),
                ("rtt_th_max", ctypes.c_int),
                ("bs", ctypes.c_int),
                ("bs_th1", ctypes.c_int),
                ("bs_th2", ctypes.c_int),
                ("bs_th3", ctypes.c_int)]


def make_ref_ctx(lib, min_br, max_br, latency, pkt_size):
    ctx = ctypes.create_string_buffer(512)  # > sizeof(BitrateContext)
    lib.bitrate_context_init(ctx, min_br, max_br, latency, pkt_size,
                             0, 0, 0, 0)
    return ctx


def trace(rng, n):
    """A random but realistic stat trace with regime switches."""
    rows = []
    ts = 1000
    loss = retrans = 0
    regime = "good"
    for i in range(n):
        if rng.random() < 0.02:
            regime = rng.choice(["good", "loaded", "congested", "outage"])
        if regime == "good":
            rtt = rng.uniform(35, 60)
            bs = int(rng.integers(0, 12))
            rate = rng.uniform(4, 7)
        elif regime == "loaded":
            rtt = rng.uniform(80, 200)
            bs = int(rng.integers(10, 80))
            rate = rng.uniform(2, 5)
            loss += int(rng.random() < 0.1)
        elif regime == "congested":
            rtt = rng.uniform(250, 500)
            bs = int(rng.integers(80, 400))
            rate = rng.uniform(0.5, 2)
            loss += int(rng.integers(0, 3))
            retrans += int(rng.integers(0, 4))
        else:
            rtt = rng.uniform(600, 900)
            bs = int(rng.integers(400, 900))
            rate = rng.uniform(0.0, 0.5)
            retrans += int(rng.integers(0, 6))
        # occasional sentinel "no measurement"
        if rng.random() < 0.03:
            rtt = 100.0
        rows.append((bs, rtt, rate, ts, loss, retrans))
        ts += 20
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_adaptive_matches_reference_tick_for_tick(ref_lib, seed):
    min_br, max_br, latency, pkt = 500_000, 8_000_000, 2000, 1316
    ctx = make_ref_ctx(ref_lib, min_br, max_br, latency, pkt)
    ours = AdaptiveBalancer(BalancerConfig(
        min_bitrate=min_br, max_bitrate=max_br, srt_latency=latency,
        srt_pkt_size=pkt))

    rng = np.random.default_rng(seed)
    res = RefResult()
    for i, (bs, rtt, rate, ts, loss, retrans) in enumerate(trace(rng, 3000)):
        ref_br = ref_lib.bitrate_update(
            ctx, bs, rtt, rate, ts, loss, retrans, ctypes.byref(res))
        out = ours.step(BalancerInput(
            buffer_size=bs, rtt=rtt, send_rate_mbps=rate, timestamp=ts,
            pkt_loss_total=loss, pkt_retrans_total=retrans))
        assert out.new_bitrate == ref_br, f"tick {i}: {out.new_bitrate} != {ref_br}"
        assert out.rtt_th_min == res.rtt_th_min, f"tick {i}"
        assert out.rtt_th_max == res.rtt_th_max, f"tick {i}"
        assert out.bs_th1 == res.bs_th1, f"tick {i}"
        assert out.bs_th2 == res.bs_th2, f"tick {i}"
        assert out.bs_th3 == res.bs_th3, f"tick {i}"
        assert abs(out.throughput - res.throughput) < 1e-6


def test_parity_with_tuned_steps(ref_lib):
    """Non-default incr/decr tuning follows the same path."""
    ctx = ctypes.create_string_buffer(512)
    ref_lib.bitrate_context_init(ctx, 300_000, 6_000_000, 1500, 1316,
                                 50_000, 200_000, 400, 150)
    ours = AdaptiveBalancer(BalancerConfig(
        min_bitrate=300_000, max_bitrate=6_000_000, srt_latency=1500,
        srt_pkt_size=1316, adaptive_incr_step=50_000,
        adaptive_decr_step=200_000, adaptive_incr_interval=400,
        adaptive_decr_interval=150))
    rng = np.random.default_rng(42)
    res = RefResult()
    for i, (bs, rtt, rate, ts, loss, retrans) in enumerate(trace(rng, 1500)):
        ref_br = ref_lib.bitrate_update(
            ctx, bs, rtt, rate, ts, loss, retrans, ctypes.byref(res))
        out = ours.step(BalancerInput(
            buffer_size=bs, rtt=rtt, send_rate_mbps=rate, timestamp=ts,
            pkt_loss_total=loss, pkt_retrans_total=retrans))
        assert out.new_bitrate == ref_br, f"tick {i}"
