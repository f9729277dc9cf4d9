"""Bindings tests (modeled on the reference's TS test coverage:
pipeline/index.test.ts structure/override/validation tests and
run.test.ts artifact building)."""

import sys
import time

import pytest

from ceracoder_tpu.bindings import (
    JobBuilder,
    RESOLUTIONS,
    build_args,
    build_run_artifacts,
    find_executable,
    is_running,
    send_hup,
    send_term,
    write_config,
)
from ceracoder_tpu.bindings.cli import RunOptions
from ceracoder_tpu.bindings.jobs import JobRequest, JobValidationError
from ceracoder_tpu.bindings.run import RunValidationError


def test_build_args_minimal():
    args = build_args(RunOptions("job.ini", "host", 5000))
    assert args == ["job.ini", "host", "5000", "-c", "/tmp/ceracoder.conf"]


def test_build_args_full():
    args = build_args(RunOptions("j", "h", 1, config_path="c.conf",
                                 av_delay=-100, stream_id="sid", latency=1500,
                                 reduced_pkt_size=True, balancer="aimd"))
    assert args == ["j", "h", "1", "-c", "c.conf", "-d", "-100", "-s", "sid",
                    "-l", "1500", "-r", "-a", "aimd"]


def test_job_builder_structure():
    text = JobBuilder().build(JobRequest(resolution="1080p", fps=60))
    assert "[source]" in text and "[encode]" in text
    assert "width = 1920" in text and "height = 1080" in text
    assert "gop = 120" in text  # 2 s at 60 fps


def test_job_builder_gop_override():
    text = JobBuilder().build(JobRequest(fps=30, gop=30))
    assert "gop = 30" in text


@pytest.mark.parametrize("bad", [
    JobRequest(source="v4l2"),
    JobRequest(resolution="123p"),
    JobRequest(codec="av1"),
    JobRequest(source="y4m"),          # path required
    JobRequest(fps=0),
])
def test_job_builder_validation(bad):
    with pytest.raises(JobValidationError):
        JobBuilder().build(bad)


def test_resolution_map_matches_reference():
    assert RESOLUTIONS["720p"] == (1280, 720)
    assert RESOLUTIONS["4k"] == (3840, 2160)


def test_run_artifacts_merge_and_validate(tmp_path):
    cfgp = tmp_path / "c.conf"
    write_config(cfgp, "[general]\nmin_bitrate = 800\nmax_bitrate = 5000\n")
    opts = RunOptions("job.ini", "host", 9000, config_path=str(cfgp))
    art = build_run_artifacts(opts, overrides={"max_bitrate": 7000,
                                               "aimd.decr_mult": 0.6})
    assert art.config.min_bitrate == 800       # from file
    assert art.config.max_bitrate == 7000      # override wins
    assert art.config.aimd.decr_mult == 0.6
    assert "max_bitrate = 7000" in art.ini
    assert art.args[0] == "job.ini"


@pytest.mark.parametrize("overrides", [
    {"min_bitrate": 1},                 # below abs min
    {"max_bitrate": 99999},             # above abs max
    {"min_bitrate": 5000, "max_bitrate": 1000},
    {"balancer": "bogus"},
    {"nonsense": 1},
])
def test_run_artifacts_rejects_invalid(tmp_path, overrides):
    opts = RunOptions("j", "h", 1, config_path=str(tmp_path / "none.conf"))
    with pytest.raises(RunValidationError):
        build_run_artifacts(opts, overrides=overrides)


def test_find_executable_falls_back_to_module():
    argv = find_executable()
    assert argv[-2:] == ["-m", "ceracoder_tpu"] or len(argv) == 1


def test_process_lifecycle():
    """spawn/is_running/send_hup/send_term against a real child process
    (a stand-in sleeper, to keep the test hermetic and fast)."""
    import subprocess
    proc2 = subprocess.Popen(
        [sys.executable, "-u", "-c",
         "import signal, time, sys;"
         "signal.signal(signal.SIGHUP, lambda *a: None);"
         "print('ready', flush=True);"
         "time.sleep(30)"],
        stdout=subprocess.PIPE)
    try:
        assert proc2.stdout.readline().strip() == b"ready"
        assert is_running(proc2)
        assert send_hup(proc2)
        time.sleep(0.3)
        assert is_running(proc2)       # HUP did not kill it
        assert send_term(proc2)
        assert not is_running(proc2)
    finally:
        if proc2.poll() is None:
            proc2.kill()


class TestJobCorpus:
    """The jobs/ template corpus (the analog of the reference's
    pipeline/ directory, reference README.md:236-244) must parse
    through the app's jobspec loader with consistent fields."""

    def test_corpus_parses(self, tmp_path):
        from pathlib import Path

        from ceracoder_tpu.app.jobspec import parse_jobspec
        from ceracoder_tpu.bindings.jobs import RESOLUTIONS

        jobs = Path(__file__).resolve().parents[1] / "jobs"
        files = sorted(jobs.iterdir())
        assert len(files) >= 60
        for f in files:
            spec = parse_jobspec(str(f))
            if f.name == "audio_only":
                continue
            codec, src, point = f.name.split("_")
            assert spec.codec == codec
            assert spec.kind == src
            res = point.rstrip("0123456789")
            fps = int(point[len(res):])
            w, h = RESOLUTIONS[res]
            assert (spec.width, spec.height) == (w, h)
            assert spec.fps_num == fps
            # GOP policy: 2 s of frames (reference common.ts:104-107)
            assert spec.gop_frames == 2 * fps
