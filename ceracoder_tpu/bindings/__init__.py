"""Host-application bindings — the analog of the reference's
`@ceralive/ceracoder` TypeScript package (reference: bindings/typescript/,
SURVEY.md §2.5): validated config building, CLI argument construction,
run-artifact assembly, process management, and job (pipeline) building.
"""

from ceracoder_tpu.bindings.cli import build_args
from ceracoder_tpu.bindings.jobs import JobBuilder, RESOLUTIONS
from ceracoder_tpu.bindings.process import (
    find_executable,
    is_running,
    send_hup,
    send_term,
    spawn,
    write_config,
    write_jobspec,
)
from ceracoder_tpu.bindings.run import build_run_artifacts

__all__ = [
    "build_args", "JobBuilder", "RESOLUTIONS", "find_executable",
    "is_running", "send_hup", "send_term", "spawn", "write_config",
    "write_jobspec", "build_run_artifacts",
]
