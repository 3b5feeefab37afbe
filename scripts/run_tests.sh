#!/bin/bash
# Test runner that survives a dead axon tunnel.
#
# The axon sitecustomize registers the TPU platform at interpreter
# start; when the tunnel is dead-HANGING (not failing fast), any jax
# backend init blocks forever — conftest.py's in-process platform pins
# cannot help because the env must be clean BEFORE python starts.
# PALLAS_AXON_POOL_IPS= makes sitecustomize skip axon registration
# entirely; JAX_PLATFORMS=cpu keeps backend discovery on CPU.
#
# Tiers:
#   scripts/run_tests.sh            fast tier (-m "not slow"), target <2 min
#   scripts/run_tests.sh --all      everything, including compile-heavy
#   scripts/run_tests.sh --slow     only the slow tier
#   scripts/run_tests.sh <args...>  passed straight to pytest
if [ $# -eq 0 ]; then
    set -- tests/ -q -m "not slow"
elif [ "$1" = "--all" ]; then
    shift; set -- tests/ -q "$@"
elif [ "$1" = "--slow" ]; then
    shift; set -- tests/ -q -m slow "$@"
fi
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest "$@"
