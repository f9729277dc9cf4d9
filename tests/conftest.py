"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's "test multi-node without a cluster" approach
(reference tests/test_srt_integration.c spawns an in-process peer): we
test multi-chip sharding on host CPU devices via
--xla_force_host_platform_device_count (see SURVEY.md §4).

Note: this image's sitecustomize registers the axon TPU PJRT plugin and
sets JAX_PLATFORMS=axon for every process, so jax is already imported by
the time pytest loads us — we must override through jax.config, not just
the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
