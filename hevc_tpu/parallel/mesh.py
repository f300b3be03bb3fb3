"""Device meshes and sharding specs.

The reference has no parallelism (single-threaded HM + file IPC; SURVEY.md
section 2.4). Here parallelism is first-class:

  axis 'data'  — CTU/frame batches (data parallel; AI frames are independent)
  axis 'model' — FC-head feature dimension (tensor parallel for the tiny
                 predictor this is demonstrative; for batched encoder kernels
                 it shards the per-CTU lanes)

Frame/GOP pipelining across hosts and LSTM-state residency are layered on
top of these axes by hevc_tpu.pipeline.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices.

    Falls back to the (virtual) CPU backend when the default platform has
    fewer devices than requested — keeps multi-chip code paths testable
    on single-chip hosts.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            devices = jax.devices("cpu")
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % model_axis:
        raise ValueError(f"{n_devices} devices not divisible by model axis "
                         f"{model_axis}")
    grid = devices.reshape(n_devices // model_axis, model_axis)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_eth_cnn_params(mesh: Mesh, params):
    """Sharding pytree for ETH-CNN params: FC heads tensor-parallel.

    fc1 weights [2688, d1] are sharded over 'model' on the output dim and
    fc1 biases over 'model' (d1 in {64,128,256} divides any sane axis).
    fc2/fc3 carry the odd +1 QP-concat dim and the tiny convs are noise —
    replicated; XLA inserts the all-gather after fc1 on ICI.
    """
    def spec_for(name, value):
        if "_fc1_w" in name:
            return P(None, "model")
        if "_fc1_b" in name:
            return P("model")
        return P()

    return {k: NamedSharding(mesh, spec_for(k, v)) for k, v in params.items()}
