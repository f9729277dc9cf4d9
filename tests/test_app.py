"""App-level tests: CLI parsing, jobspec, sources, QP rate control, and
the end-to-end file pipeline."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from ceracoder_tpu.app.cli import parse_args
from ceracoder_tpu.app.jobspec import open_source, parse_jobspec
from ceracoder_tpu.app.main import CeracoderApp
from ceracoder_tpu.app.source import TestPatternSource, Y4MFileSource, pad_to_mb
from ceracoder_tpu.control.qp_rate import QpRateController

ORACLE = Path(__file__).resolve().parent.parent / "tools" / "decode_oracle"


def test_cli_positional_and_flags():
    o = parse_args(["job.ini", "example.com", "5000", "-l", "1500",
                    "-s", "sid", "-r", "-a", "aimd", "-c", "cfg.ini"])
    assert o.job_file == "job.ini"
    assert o.addr == "example.com"
    assert o.port == 5000
    assert o.latency == 1500
    assert o.stream_id == "sid"
    assert o.reduced_pkt_size
    assert o.balancer == "aimd"
    assert o.config_file == "cfg.ini"


@pytest.mark.parametrize("argv", [
    [],
    ["only_two", "args"],
    ["a", "b", "not_a_port"],
    ["a", "b", "5000", "-l", "50"],       # latency below 100
    ["a", "b", "5000", "-x"],
])
def test_cli_rejects_bad_args(argv):
    with pytest.raises(SystemExit):
        parse_args(argv)


def test_jobspec_parse(tmp_path):
    p = tmp_path / "job.ini"
    p.write_text("""
[source]
kind = test
width = 640
height = 360
fps = 30000:1001

[encode]
codec = h264
gop = 30
""")
    spec = parse_jobspec(p)
    assert spec.kind == "test"
    assert (spec.width, spec.height) == (640, 360)
    assert (spec.fps_num, spec.fps_den) == (30000, 1001)
    assert spec.gop_frames == 30
    src = open_source(spec)
    y, u, v = next(iter(src.frames()))
    assert y.shape == (360, 640)
    assert u.shape == (180, 320)


def test_jobspec_default_gop_is_2s():
    spec = parse_jobspec.__wrapped__ if hasattr(parse_jobspec, "__wrapped__") \
        else None
    from ceracoder_tpu.app.jobspec import JobSpec
    assert JobSpec(fps_num=30).gop_frames == 60
    assert JobSpec(fps_num=25).gop_frames == 50


def test_test_pattern_moves():
    src = TestPatternSource(width=128, height=96, num_frames=3)
    frames = [f for f in src.frames()]
    assert len(frames) == 3
    assert not np.array_equal(frames[0][0], frames[1][0])


def test_y4m_roundtrip(tmp_path):
    w, h = 64, 48
    rng = np.random.default_rng(0)
    planes = [rng.integers(0, 256, w * h * 3 // 2).astype(np.uint8)
              for _ in range(2)]
    p = tmp_path / "t.y4m"
    with open(p, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F25:1 Ip A1:1 C420jpeg\n")
        for pl in planes:
            f.write(b"FRAME\n" + pl.tobytes())
    src = Y4MFileSource(p)
    assert (src.width, src.height) == (64, 48)
    assert (src.fps_num, src.fps_den) == (25, 1)
    frames = list(src.frames())
    assert len(frames) == 2
    assert np.array_equal(frames[0][0].reshape(-1), planes[0][:w * h])


def test_pad_to_mb():
    y = np.zeros((180, 320), np.uint8)
    u = np.zeros((90, 160), np.uint8)
    v = np.zeros((90, 160), np.uint8)
    py, pu, pv = pad_to_mb(y, u, v)
    assert py.shape == (192, 320)
    assert pu.shape == (96, 160)


def test_qp_rate_controller_converges():
    """Feed a synthetic R(qp) model; QP should settle near the value
    that hits the target bits."""
    ctl = QpRateController(fps=30.0, qp=40.0)
    bitrate = 4_000_000

    def produced(qp):  # model: 8 Mbps at qp 30, halving every 6 qp
        return 8_000_000 / 30 * 2 ** (-(qp - 30) / 6)

    for _ in range(60):
        qp = ctl.update(bitrate, int(produced(ctl.qp)))
    # exact solution: qp = 30 + 6*log2(8/4) = 36
    assert 34 <= qp <= 38
    target = bitrate / 30
    assert abs(produced(ctl.qp) - target) / target < 0.3


def test_qp_rate_slew_limited():
    ctl = QpRateController(fps=30.0, qp=30.0)
    ctl.update(1_000_000, 100_000_000 * 8)  # absurd overshoot
    assert ctl.qp <= 33.0  # clamped by max_step


@pytest.mark.skipif(not ORACLE.exists(), reason="oracle not built")
def test_app_end_to_end_file(tmp_path):
    job = tmp_path / "job.ini"
    job.write_text("[source]\nkind = test\nwidth = 192\nheight = 108\n"
                   "fps = 30\n")
    out = tmp_path / "out.ts"
    opts = parse_args([str(job), str(out), "0"])
    app = CeracoderApp(opts, max_frames=5, realtime=False)
    assert app.run() == 0
    assert app.frames_sent == 5
    r = subprocess.run([str(ORACLE), str(out), str(tmp_path / "o.yuv")],
                       capture_output=True, text=True)
    assert r.returncode == 0
    assert "width=192 height=108" in r.stderr
    raw = np.fromfile(tmp_path / "o.yuv", np.uint8)
    assert raw.size >= 5 * 192 * 108 * 3 // 2


def test_scene_cut_forces_idr(tmp_path):
    """A hard cut mid-GOP must produce a fresh IDR (adaptive GOP)."""
    import numpy as np

    from ceracoder_tpu.app.main import CeracoderApp
    from ceracoder_tpu.app.cli import CliOptions

    # y4m with a hard cut at frame 3
    w, h, n = 64, 48, 6
    rng = np.random.default_rng(2)
    a = rng.integers(0, 100, (h, w)).astype(np.uint8)
    b = rng.integers(150, 255, (h, w)).astype(np.uint8)
    path = tmp_path / "cut.y4m"
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F30:1 Ip A1:1 C420\n")
        for i in range(n):
            f.write(b"FRAME\n")
            y = a if i < 3 else b
            f.write(y.tobytes())
            f.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes())
    job = tmp_path / "job"
    job.write_text(f"[source]\nkind = y4m\npath = {path}\n"
                   "width = 64\nheight = 48\nfps = 30\n"
                   "\n[encode]\ncodec = h264\ngop = 60\n")
    out = tmp_path / "out.ts"
    opts = CliOptions(job_file=str(job), addr=str(out), port=0)
    app = CeracoderApp(opts, keep_ticks=False, max_frames=n,
                       realtime=False)
    keyframes = []
    orig = app.encoder.encode_frame
    orig_run = app.encoder.encode_run_async

    def spy(y, u, v, qp=None, force_idr=False):
        fr = orig(y, u, v, qp=qp, force_idr=force_idr)
        keyframes.append(fr.keyframe)
        return fr

    def spy_run(*a, **kw):
        pfs = orig_run(*a, **kw)
        keyframes.extend(pf.keyframe for pf in pfs)
        return pfs

    app.encoder.encode_frame = spy
    app.encoder.encode_run_async = spy_run
    app.run()
    assert keyframes[0] is True
    assert keyframes[3] is True          # the cut
    assert keyframes[1] is False and keyframes[4] is False


def test_pts_fixup_grid_lock_and_droppable():
    # reference semantics: src/ceracoder.c:371-423
    from ceracoder_tpu.app.ptsfix import PtsFixup

    import numpy as np
    rng = np.random.default_rng(0)
    fx = PtsFixup(30, 1)
    period = 3000
    outs = []
    t = 0
    for i in range(200):
        t += period + int(rng.integers(-300, 301))
        outs.append(fx.feed(t))
    kept = [o for o in outs if not o.droppable]
    # every output lands on the grid spanned by whole periods from the
    # first pts (periods may drift as the rolling average trains, so
    # check consecutive deltas are whole multiples of the then-period)
    assert all(o.dts90 is None for o in outs)
    # rolling average stays near the true period
    assert abs(fx.period - period) < 60
    # deltas between consecutive outputs are positive whole periods
    for a, b in zip(kept, kept[1:]):
        assert b.pts90 > a.pts90
    # a duplicate (same pts) is droppable and does not advance
    last = kept[-1].pts90
    dup = fx.feed(t)
    assert dup.droppable and dup.pts90 == last
    # a backwards step is droppable too
    back = fx.feed(t - 2 * period)
    assert back.droppable and back.pts90 == last


def test_pts_fixup_skips_grid_slots_on_gaps():
    from ceracoder_tpu.app.ptsfix import PtsFixup

    fx = PtsFixup(30, 1)
    period = 3000
    p0 = fx.feed(0).pts90
    p1 = fx.feed(period).pts90
    assert p1 - p0 == period
    # a dropped capture frame (2-period gap) advances two grid slots
    p2 = fx.feed(3 * period).pts90
    assert p2 - p1 == 2 * period


def test_stall_detector_reference_semantics():
    # reference: src/ceracoder.c:147-199 — position unchanged across
    # two consecutive checks => stall; arms only after first progress
    from ceracoder_tpu.app.main import StallDetector

    pos = {"v": 0}
    stalls = []
    det = StallDetector(lambda: pos["v"], lambda: stalls.append(1))
    # not armed while no progress (startup)
    assert det.check() is False
    assert det.check() is False
    assert not stalls
    pos["v"] = 1
    assert det.check() is False          # arms
    pos["v"] = 2
    assert det.check() is False          # progressing
    assert det.check() is True           # unchanged => stall
    assert stalls == [1]


def test_app_stall_watchdog_exits_wedged_process(tmp_path):
    # integration: a source that wedges after 3 frames must not hang
    # the app forever — the watchdog thread force-exits the process
    import os
    import sys as _sys

    repo = str(Path(__file__).resolve().parents[1])
    code = r"""
import sys, time
sys.path.insert(0, %r)
from ceracoder_tpu.app.cli import CliOptions
from ceracoder_tpu.app.main import CeracoderApp
import ceracoder_tpu.app.main as m
m.STALL_CHECK_S = 0.2

class WedgeSource:
    width, height, fps_num, fps_den = 64, 48, 30, 1
    def frames(self):
        import numpy as np
        f = (np.zeros((48, 64), np.uint8), np.zeros((24, 32), np.uint8),
             np.zeros((24, 32), np.uint8))
        for _ in range(3):
            yield f
        time.sleep(60)       # wedged source

opts = CliOptions(job_file=%r, addr="-", port=0)
app = CeracoderApp(opts, realtime=True)
app.source = WedgeSource()
sys.exit(app.run())
"""
    spec = tmp_path / "job.ini"
    spec.write_text("[source]\nkind = test\nwidth = 64\nheight = 48\n"
                    "fps = 30\n\n[encode]\ncodec = h264\ngop = 30\n")
    p = subprocess.run(
        [_sys.executable, "-c", code % (repo, str(spec))],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        timeout=90, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert b"stall detected" in p.stderr.lower()


def test_overlay_burn_in():
    # the reference burns the telemetry line into the video
    # (src/gst/overlay_ui.c); glyphs must land as white-on-dim pixels
    import numpy as np

    from ceracoder_tpu.app.textoverlay import burn_overlay, render_line

    y = np.full((64, 512), 100, np.uint8)
    line = "  b:  5000/ 4800 rtt:  35/ 30/ 60 bs:   5/ 50/ 99/200"
    out = burn_overlay(y, line)
    assert out.shape == y.shape
    assert (y == 100).all()                    # input untouched
    bm = render_line(line)
    region = out[8:8 + bm.shape[0], 8:8 + min(bm.shape[1], 504)]
    assert (region[bm[:, :region.shape[1]]] == 235).all()
    box = region[~bm[:, :region.shape[1]]]
    assert (box == 100 // 2 + 16).all()
    # unknown glyphs fall back to blank, never crash
    assert burn_overlay(y, "~~unknown~~").shape == y.shape


@pytest.mark.skipif(not ORACLE.exists(), reason="oracle not built")
def test_app_device_source_run_loop(tmp_path):
    """The devtest jobspec routes through the device-side run loop
    (_loop_pipelined_dev: frames generated on chip inside the encode
    dispatch, several runs in flight) and the emitted TS decodes."""
    job = tmp_path / "job.ini"
    job.write_text("[source]\nkind = devtest\nwidth = 128\n"
                   "height = 96\nfps = 30\n\n[encode]\n"
                   "codec = h264\ngop = 8\nrun = 4\n")
    out = tmp_path / "out.ts"
    opts = parse_args([str(job), str(out), "0"])
    app = CeracoderApp(opts, max_frames=10, realtime=False)
    assert hasattr(app.source, "gen_fn")
    assert app.run() == 0
    assert app.frames_sent == 10
    r = subprocess.run([str(ORACLE), str(out), str(tmp_path / "o.yuv")],
                       capture_output=True, text=True)
    assert r.returncode == 0
    raw = np.fromfile(tmp_path / "o.yuv", np.uint8)
    assert raw.size >= 10 * 128 * 96 * 3 // 2
