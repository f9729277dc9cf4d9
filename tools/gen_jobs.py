#!/usr/bin/env python
"""Generate the jobspec template corpus under jobs/.

The analog of the reference's pipeline/ directory (126 GStreamer
launch files named CODEC_CAPTUREDEV_[RES[FPS]], reference
README.md:236-244): one INI jobspec per codec x source x operating
point, produced by the bindings JobBuilder so every file is validated
at generation time. tests/test_bindings.py checks the corpus parses
through the app loader.

Run: python tools/gen_jobs.py  (idempotent; writes jobs/)
"""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from ceracoder_tpu.bindings.jobs import JobBuilder, JobRequest  # noqa: E402

# operating points mirroring the reference corpus envelope
# (pipeline corpus: up to 4K30 HEVC, 1080p60; SURVEY.md §2.6/§6) plus
# the BASELINE.json north-star 4K60 point the reference's Jetson HW
# could not reach (README.md:247 caps it at 4K30)
POINTS = [
    ("480p", 30), ("540p", 30), ("720p", 25), ("720p", 30),
    ("720p", 50), ("720p", 60), ("1080p", 25), ("1080p", 30),
    ("1080p", 50), ("1080p", 60), ("1440p", 30), ("4k", 30),
    ("4k", 60),
]
SOURCES = [("test", ""), ("y4m", "input.y4m"), ("raw", "input.yuv")]
CODECS = ["h264", "hevc"]


def main():
    out_dir = ROOT / "jobs"
    out_dir.mkdir(exist_ok=True)
    builder = JobBuilder()
    n = 0
    for codec in CODECS:
        for src, path in SOURCES:
            for res, fps in POINTS:
                # the reference caps HW 4K at p30 and 1440p+ is
                # HEVC-only territory in its corpus
                if res in ("1440p", "4k") and codec == "h264":
                    continue
                name = f"{codec}_{src}_{res}{fps}"
                text = builder.build(JobRequest(
                    source=src, path=path, resolution=res, fps=fps,
                    codec=codec))
                (out_dir / name).write_text(text)
                n += 1
    # audio-only analog (reference pipeline/generic/audio_only)
    (out_dir / "audio_only").write_text(
        "[source]\nkind = test\nwidth = 320\nheight = 192\nfps = 30\n"
        "\n[encode]\ncodec = h264\ngop = 60\n"
        "\n[audio]\nkind = tone\nbitrate = 128\n")
    n += 1
    print(f"wrote {n} jobspecs to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
