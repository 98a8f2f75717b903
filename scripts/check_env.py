#!/usr/bin/env python
"""Verify the running environment against environment/requirements.lock.

The bench numbers in BENCH_r*.json are only comparable on the pinned stack
(environment/MANIFEST.md): jax/jaxlib/libtpu move kernel codegen, flax moves
param-tree layout, orbax moves the checkpoint schema. Those five are
CRITICAL — a mismatch exits 1. Everything else prints a drift warning only.

Usage: python scripts/check_env.py [--quiet]
"""

from __future__ import annotations

import importlib.metadata as md
import os
import sys

CRITICAL = {"jax", "jaxlib", "libtpu", "flax", "orbax-checkpoint"}


def load_lock(path: str) -> dict[str, str]:
    pins = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            name, _, ver = line.partition("==")
            pins[name.strip()] = ver.strip()
    return pins


def main() -> int:
    quiet = "--quiet" in sys.argv
    lock = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "environment", "requirements.lock")
    pins = load_lock(lock)
    failures, drift = [], []
    for name, want in pins.items():
        try:
            have = md.version(name)
        except md.PackageNotFoundError:
            have = None
        if have == want:
            continue
        row = f"{name}: locked {want}, installed {have or 'MISSING'}"
        (failures if name in CRITICAL else drift).append(row)
    if not quiet:
        for row in drift:
            print(f"[check_env] drift: {row}")
        for row in failures:
            print(f"[check_env] CRITICAL mismatch: {row}")
        if not failures and not drift:
            print("[check_env] environment matches requirements.lock")
        elif not failures:
            print("[check_env] non-critical drift only: bench numbers may "
                  "shift slightly; re-pin after re-benching")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
