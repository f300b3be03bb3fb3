"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Sharding/collective code paths are validated without TPU hardware
(the driver separately dry-runs the multi-chip path; bench runs on the
real chip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: repeated pytest runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/hevc_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
