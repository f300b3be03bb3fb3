"""Test harness config: 8 virtual CPU devices regardless of ambient TPU.

The axon TPU plugin registers itself even when JAX_PLATFORMS=cpu, so we
configure an 8-device CPU backend explicitly and pin the default device
to CPU. Sharding/collective paths run on the virtual mesh; real-TPU
validation happens via bench.py and the driver's dryrun. (The full
parity/E2E suite has also been run against the real TPU chip, confirming
int32 exactness on hardware.)
"""

import os

import jax

# persistent compilation cache (jax>=0.9 ignores the JAX_COMPILATION_*
# env vars; the config API is the supported path).
#
# Cache WRITES are disabled during pytest runs by default: XLA's
# executable serializer intermittently segfaults/aborts inside
# put_executable_and_time when a long multi-test process writes a large
# fresh recon executable (reproducible at the same test, never in
# standalone processes compiling the same graph — accumulated in-process
# state). Reads still hit entries written by standalone drives/bench.
# Re-enable with HEVC_TPU_CACHE_WRITES=1.
jax.config.update("jax_compilation_cache_dir", "/tmp/hevc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
if os.environ.get("HEVC_TPU_CACHE_WRITES", "0") == "1":
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")
