"""JAX environment setup shared by every entry point.

Enables the persistent compilation cache: the axon TPU backend in this
image compiles through a remote relay where a fresh compile of the frame
program can take minutes, so caching compiled executables across
processes is essential for app startup and bench runs.
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    if os.environ.get("CERACODER_JAX_CACHE_DISABLE") == "1":
        # Tests run with the cache off: XLA:CPU executable
        # deserialization has segfaulted reading valid-looking entries
        # (observed under pytest; crash in backend.deserialize_executable
        # via compilation_cache.get_executable_and_time), and CPU
        # compiles are cheap enough to redo. The cache stays on for the
        # TPU backend, where a cold compile takes minutes.
        return

    cache = cache_dir or os.environ.get(
        "CERACODER_JAX_CACHE", os.path.expanduser("~/.cache/ceracoder_jax"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # caching is an optimization; never fail startup over it
