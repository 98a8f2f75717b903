#!/bin/bash
# Canonical test entry: CPU-only JAX with an 8-device virtual mesh.
# PALLAS_AXON_POOL_IPS must be unset BEFORE python starts, otherwise the
# axon sitecustomize hook registers the TPU plugin and forces
# JAX_PLATFORMS=axon (minutes of tunnel wait per process).
cd "$(dirname "$0")/.."
exec env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ "$@"
