"""The parallel axes as PRODUCT knobs: a jobspec with [parallel]
bands / gop_parallel must route the app through the sharded /
GOP-parallel schedulers and produce oracle-decodable output identical
(for gop_parallel) to the single-device stream (VERDICT round-1
item 3; SURVEY.md §2.7)."""

import subprocess
from pathlib import Path

from ceracoder_tpu.app.cli import CliOptions
from ceracoder_tpu.app.main import CeracoderApp

ROOT = Path(__file__).resolve().parents[1]
ORACLE = ROOT / "tools" / "decode_oracle"


def _write_job(tmp_path, extra: str, codec="hevc", gop=4,
               run=4, name="job.ini") -> str:
    job = tmp_path / name
    job.write_text("[source]\nkind = test\nwidth = 96\nheight = 64\n"
                   f"fps = 30\n\n[encode]\ncodec = {codec}\n"
                   f"gop = {gop}\nrun = {run}\n\n[audio]\nkind = none\n"
                   + extra)
    return str(job)


def _run_app(tmp_path, job, name, n=8):
    out = tmp_path / name
    opts = CliOptions(job_file=job, addr=str(out), port=0)
    app = CeracoderApp(opts, max_frames=n, realtime=False)
    assert app.run() == 0
    assert app.frames_sent == n
    return out


def _oracle_frames(ts_path) -> int:
    yuv = str(ts_path) + ".yuv"
    r = subprocess.run([str(ORACLE), str(ts_path), yuv, "hevc"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    import re
    m = re.search(r"frames=(\d+)", r.stderr)
    return int(m.group(1))


def test_bands_knob_routes_sharded_and_decodes(tmp_path):
    from ceracoder_tpu.parallel.hevc import ShardedH265Encoder

    job = _write_job(tmp_path, "\n[parallel]\nbands = 2\n")
    out = tmp_path / "b.ts"
    opts = CliOptions(job_file=job, addr=str(out), port=0)
    app = CeracoderApp(opts, max_frames=8, realtime=False)
    assert isinstance(app.encoder, ShardedH265Encoder)
    assert app.run() == 0
    assert _oracle_frames(out) == 8


def test_bands_stream_matches_single_device(tmp_path):
    # same source and per-frame QP schedule (run=1: the banded encoder
    # takes the per-frame loop, so the single-device run must too for
    # identical rate-control evolution): banded == single-chip bytes
    job_b = _write_job(tmp_path, "\n[parallel]\nbands = 4\n",
                       name="jb.ini")
    job_s = _write_job(tmp_path, "", run=1, name="js.ini")
    a = _run_app(tmp_path, job_b, "banded.ts").read_bytes()
    b = _run_app(tmp_path, job_s, "single.ts").read_bytes()
    assert a == b


def test_gop_parallel_knob_matches_single_device(tmp_path):
    from ceracoder_tpu.parallel.hevc import GopParallelStreamEncoder

    job_g = _write_job(tmp_path, "\n[parallel]\ngop_parallel = 2\n")
    out = tmp_path / "g.ts"
    opts = CliOptions(job_file=job_g, addr=str(out), port=0)
    app = CeracoderApp(opts, max_frames=8, realtime=False)
    assert isinstance(app.encoder, GopParallelStreamEncoder)
    assert app.run() == 0

    # run == gop == 4 so single-device dispatch boundaries line up
    # with the GOP-parallel closed-GOP batches
    job_s = _write_job(tmp_path, "", name="js2.ini")
    b = _run_app(tmp_path, job_s, "single.ts")
    assert out.read_bytes() == b.read_bytes()
    assert _oracle_frames(out) == 8
