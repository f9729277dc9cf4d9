#!/bin/sh
# Run the test suite without touching the TPU tunnel: the axon PJRT
# plugin registers in sitecustomize only when PALLAS_AXON_POOL_IPS is
# set, and tests run on a virtual CPU mesh anyway (tests/conftest.py).
# Keeping test processes off the tunnel avoids serializing against a
# live TPU benchmark/app process.
# default to tests/ unless the caller named a path (bare flags like
# "-x -q" must not fall through to whole-repo collection)
has_path=0
for a in "$@"; do
    [ -e "${a%%::*}" ] && has_path=1
done
[ "$has_path" -eq 0 ] && set -- "$@" tests/

# quality gate (the reference's `make lint` / clang-tidy analog):
# ast-based Python checks + g++ -Wall -Wextra -Werror on native/
python tools/lint.py || exit 1
# -n 4 --dist loadfile: per-file worker processes. Besides the 3-4x
# wall-clock win, process sharding sidesteps an XLA:CPU SIGABRT seen
# when one process accumulates the whole suite's compiled executables
# (abort inside backend_compile_and_load at ~test 136 of 254; every
# file passes standalone).
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    CERACODER_JAX_CACHE_DISABLE=1 \
    python -m pytest -n 4 --dist loadfile "$@"
