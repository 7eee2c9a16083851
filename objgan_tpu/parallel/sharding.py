"""Device mesh + sharding helpers — the entire "distributed backend".

The reference has no distributed runtime at all (single-process PyTorch, at
most in-process ``nn.DataParallel`` — SURVEY.md §2.6). The TPU-native
equivalent is not a comm layer but a *sharding discipline*: build one
``jax.sharding.Mesh``, annotate batch arrays as sharded over the ``data``
axis and parameters as replicated, and let XLA insert the ICI all-reduces
for gradients under ``jit``. Multi-host extends this unchanged via
``jax.distributed.initialize`` (DCN for control, ICI for collectives).

A ``model`` axis is plumbed through as the escape hatch for tensor
parallelism (unused at parity: Obj-GAN models are tens of M params).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallelism: int = 1,
) -> Mesh:
    """A (data, model) mesh over all local devices.

    The data axis is laid out over the fastest-varying device order so DP
    all-reduces ride ICI neighbors (jax device order follows slice topology).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallelism:
        raise ValueError(f"{n} devices not divisible by model={model_parallelism}")
    arr = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place every array in a batch pytree with its leading dim split over the
    data axis. Host->device transfer happens here, once per step."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {n_data}"
        )
    return global_batch // n_data
