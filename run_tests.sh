#!/bin/sh
# Run the test suite without touching the TPU tunnel: the axon PJRT
# plugin registers in sitecustomize only when PALLAS_AXON_POOL_IPS is
# set, and tests run on a virtual CPU mesh anyway (tests/conftest.py).
# Keeping test processes off the tunnel avoids serializing against a
# live TPU benchmark/app process.
[ $# -eq 0 ] && set -- tests/
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pytest "$@"
