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


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up (SURVEY.md §2.6): if the explicit JAX cluster env
    is present (JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES, plus
    JAX_PROCESS_ID), initialize the distributed runtime over DCN.
    Collectives still ride ICI via the mesh; this only wires cross-host
    control. Returns True if initialized. The env contract is deliberately
    EXPLICIT — no bare ``jax.distributed.initialize()`` auto-detection —
    so single-host runs (the common case on this image) can never stall
    waiting for a coordinator that does not exist; on a real pod, export
    the three variables (or call ``jax.distributed.initialize()`` yourself
    before building the feed).

    Idempotent and safe to call single-host (no env -> no-op). MUST run
    before anything touches the backend — even ``jax.process_count()``
    initializes XLA, after which ``jax.distributed.initialize`` raises (the
    round-2 version had exactly that bug, so its initialize branch could
    never execute; tests/test_multihost.py now runs it for real).
    """
    import os

    if jax.distributed.is_initialized():
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if not addr or not nproc:
        # a multi-host Cloud-TPU environment without the explicit contract
        # would otherwise train each host INDEPENDENTLY on duplicated data
        # with no gradient sync — loud warning instead of silent wrongness
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if "," in hosts:
            print("WARNING: multi-host TPU environment detected "
                  f"(TPU_WORKER_HOSTNAMES={hosts!r}) but JAX_COORDINATOR_"
                  "ADDRESS/JAX_NUM_PROCESSES are unset — skipping "
                  "jax.distributed.initialize; each host will train "
                  "independently. Export the cluster env (see this "
                  "docstring) for real multi-host data parallelism.")
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def process_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's slice of the global batch — each host's
    feed produces only its shard; :func:`put_global` assembles the global
    array from the per-host shards."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    return jax.process_index() * per, per


def process_local_records(records: Sequence[Any]) -> Sequence[Any]:
    """This host's strided partition of the dataset (the lineage
    DistributedSampler contract): host p serves records[p::n_hosts], so
    hosts never duplicate each other's examples. No-op single-host."""
    n = jax.process_count()
    if n == 1:
        return records
    return list(records)[jax.process_index()::n]


def put_global(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place one host-local array under a (possibly multi-host) sharding.

    Single-process: plain ``device_put`` (x is the full array). Multi-host:
    x is this process's SHARD of the global batch — assembled with
    ``jax.make_array_from_process_local_data``, the supported API for
    building a global jax.Array from per-host data (device_put cannot
    address other hosts' devices)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallelism: int = 1,
) -> Mesh:
    """A (data, model) mesh over all local devices.

    The MODEL axis is the fastest-varying (innermost) one: with
    ``model_parallelism > 1`` each model group is a block of adjacent
    devices in ``jax.devices()`` order (which follows slice topology), so
    the latency-sensitive TP collectives ride neighboring ICI links; the
    data axis strides across groups, which bandwidth-bound DP all-reduces
    tolerate. At ``model_parallelism == 1`` (the parity configuration) the
    data axis degenerates to plain device order.
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
    data axis. Host->device transfer happens here, once per step. Multi-host:
    ``batch`` is this process's shard (see :func:`put_global`)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: put_global(x, sharding), batch)


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
