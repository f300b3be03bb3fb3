"""Test harness config: 8 virtual CPU devices regardless of ambient TPU.

The axon TPU plugin registers itself even when JAX_PLATFORMS=cpu, so we
configure an 8-device CPU backend explicitly and pin the default device
to CPU. Sharding/collective paths run on the virtual mesh; real-TPU
validation happens via bench.py and the driver's dryrun. (The full
parity/E2E suite has also been run against the real TPU chip, confirming
int32 exactness on hardware.)
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hevc_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")
