#!/bin/bash
# Canonical test entry: CPU-only JAX with an 8-device virtual mesh.
#
# - PALLAS_AXON_POOL_IPS must be unset BEFORE python starts, otherwise the
#   axon sitecustomize hook registers the TPU plugin and forces
#   JAX_PLATFORMS=axon (minutes of tunnel wait per process).
# - With no arguments, each test file runs in its OWN pytest process: on this
#   single-core host, accumulated XLA client state across many heavy tests
#   can trip the 40s cross-device rendezvous termination (hard abort
#   mid-suite). Per-file isolation makes the suite deterministic.
# - With arguments, behaves like plain pytest (single process).
cd "$(dirname "$0")/.."

ENV=(env -u PALLAS_AXON_POOL_IPS
     JAX_PLATFORMS=cpu
     XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_cpu_multi_thread_eigen=false"
     OMP_NUM_THREADS=1)

if [ "$#" -gt 0 ] && [[ "$1" != -* ]]; then
    exec "${ENV[@]}" python -m pytest "$@"
fi

fail=0
total_passed=0
for f in tests/test_*.py; do
    out=$("${ENV[@]}" python -m pytest "$f" -q -m "slow or not slow" "$@" 2>&1 | tail -2)
    echo "== $f: $out" | tr '\n' ' '
    echo
    if ! echo "$out" | grep -qE "^[0-9]+ passed"; then
        if echo "$out" | grep -qE "failed|error|Fatal"; then
            fail=1
        fi
    fi
done
if [ "$fail" -eq 0 ]; then
    echo "ALL FILES PASSED"
else
    echo "FAILURES PRESENT"
    exit 1
fi

# packaging gate (VERDICT r3 item 7): fresh-venv pip install -e . + CLI smoke
if [ "${SKIP_INSTALL_SMOKE:-0}" != "1" ]; then
    if "${ENV[@]}" bash scripts/install_smoke.sh /tmp/ucd_tpu_ci_venv \
            > /tmp/ucd_install_smoke.log 2>&1; then
        echo "INSTALL SMOKE PASSED"
    else
        echo "INSTALL SMOKE FAILED (see /tmp/ucd_install_smoke.log)"
        exit 1
    fi
fi
