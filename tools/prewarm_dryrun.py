#!/usr/bin/env python
"""Prewarm the persistent XLA compile cache for the driver's
dryrun_multichip path (full recon backend on N virtual CPU devices).

The driver runs __graft_entry__.dryrun_multichip with
XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu
and a wall budget too small for a cold XLA-CPU compile of the full
85-node CTU recon graph (~10+ min). This script runs the exact same
path once so the cache (/tmp/hevc_tpu_jax_cache) carries the entries.

Usage: python tools/prewarm_dryrun.py [n_devices]
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count="
                      + (sys.argv[1] if len(sys.argv) > 1 else "8"))
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402

__graft_entry__.dryrun_multichip(
    int(sys.argv[1]) if len(sys.argv) > 1 else 8)
print("prewarm complete")
