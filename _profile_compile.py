import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/hevc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from hevc_tpu.entropy import headers
from hevc_tpu.models import eth_cnn
from hevc_tpu.parallel import frames as pframes
from hevc_tpu.parallel.mesh import make_mesh

cfg = headers.EncoderConfig(width=1920, height=1080, qp=32)
params = eth_cnn.init_params(jax.random.PRNGKey(0))
mesh = make_mesh(1, model_axis=1)
enc = pframes.FrameParallelAI(cfg, mesh, cnn_params=params)

ys = jnp.zeros((4, cfg.pad_height, cfg.pad_width), jnp.uint8)
cbs = jnp.zeros((4, cfg.pad_height//2, cfg.pad_width//2), jnp.uint8)
crs = jnp.zeros((4, cfg.pad_height//2, cfg.pad_width//2), jnp.uint8)

t0 = time.perf_counter()
lowered = enc._full.lower(ys, cbs, crs, params)
t1 = time.perf_counter()
print(f"trace+lower: {t1-t0:.1f}s", flush=True)
compiled = lowered.compile()
t2 = time.perf_counter()
print(f"backend compile: {t2-t1:.1f}s", flush=True)
