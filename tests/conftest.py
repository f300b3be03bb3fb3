"""Test harness config: 8 virtual CPU devices regardless of ambient TPU.

The axon TPU plugin registers itself even when JAX_PLATFORMS=cpu, so we
configure an 8-device CPU backend explicitly and pin the default device
to CPU. Sharding/collective paths run on the virtual mesh; real-TPU
validation happens via bench.py and the driver's dryrun. (The full
parity/E2E suite has also been run against the real TPU chip, confirming
int32 exactness on hardware.)
"""

import jax

# persistent compilation cache (jax>=0.9 ignores the JAX_COMPILATION_*
# env vars; the config API is the supported path)
jax.config.update("jax_compilation_cache_dir", "/tmp/hevc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")
