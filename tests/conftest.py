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
# No persistent compilation cache under test: XLA:CPU executable
# deserialization has segfaulted the test process on cache reads (see
# utils/jaxenv.py); app code that calls setup_jax() honors this flag.
os.environ["CERACODER_JAX_CACHE_DISABLE"] = "1"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", None)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module. A process
    that accumulates the whole suite's XLA:CPU executables eventually
    segfaults/aborts inside backend_compile_and_load (jaxlib 0.9.0);
    per-module cache clearing keeps live-executable count bounded.
    Costs recompiles across modules, which share little anyway."""
    yield
    jax.clear_caches()
