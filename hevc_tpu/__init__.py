"""hevc_tpu — a TPU-native HEVC (H.265) encoder framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
tianyili2017/HEVC-Complexity-Reduction: an HM-16.5-class All-Intra and
Low-Delay-P encoder whose CU-partition RDO is pruned by the ETH-CNN /
ETH-CNN+ETH-LSTM hierarchical split predictors, fused into the batched
per-CTU pipeline as on-device tensors (no file/pipe handoff).

Subpackages
-----------
core      : YUV frames, CTU tiling, fixed-point helpers
ops       : compute kernels (integer DCT/DST, quant, intra prediction, SATD)
entropy   : CABAC engine, context models, syntax coding, NAL/Annex-B
models    : ETH-CNN, ETH-LSTM, HCPM gating
rdo       : CU quadtree rate-distortion search
pipeline  : frame/GOP encoders (AI, LDP)
parallel  : device meshes, shardings, collectives
train     : label extraction, dataset builders, trainers
evaltools : PSNR/BD-rate harness, HM interop oracles
"""

__version__ = "0.1.0"


def enable_compilation_cache(path="/tmp/hevc_tpu_jax_cache"):
    """Persistent XLA compilation cache (jax>=0.9: config API only; the
    JAX_COMPILATION_* env vars are silently ignored)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
