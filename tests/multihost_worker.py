"""Worker process for the 2-host distributed-DP test (not a pytest module).

Launched twice by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the env — exactly the cluster-env
contract ``maybe_initialize_distributed`` implements (SURVEY.md §2.6). Each
process owns 4 virtual CPU devices (8 global), serves only ITS shard of a
deterministic global batch, and runs one real BoxTrainer train step over
the global mesh. Resulting params + metrics go to an .npz the test compares
against a single-process reference step.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    out_path = sys.argv[1]

    import numpy as np

    from objgan_tpu.core.config import tiny_test_config
    from objgan_tpu.parallel.sharding import (
        make_mesh,
        maybe_initialize_distributed,
        process_local_batch_slice,
        replicate,
        shard_batch,
    )
    from objgan_tpu.train.box import BoxTrainer
    from tests.multihost_util import global_box_batch

    assert maybe_initialize_distributed(), "cluster env not picked up"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    cfg = tiny_test_config().replace(DTYPE="float32").merged(
        {"TRAIN": {"BATCH_SIZE": 8}})
    batch = global_box_batch(cfg)  # same deterministic batch on every host
    start, size = process_local_batch_slice(cfg.TRAIN.BATCH_SIZE)
    local = {k: v[start:start + size] for k, v in batch.items()}

    trainer = BoxTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    state = replicate(mesh, state)
    sharded = shard_batch(mesh, local)  # per-host shard -> global array
    assert next(iter(sharded.values())).shape[0] == cfg.TRAIN.BATCH_SIZE

    step = jax.jit(trainer.train_step)
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics)

    # params are replicated: each host reads its local copy of the leaves
    leaves = jax.tree.leaves(new_state.params)
    first = np.asarray(leaves[0].addressable_data(0))
    np.savez(out_path, leaf0=first,
             **{k: float(v) for k, v in metrics.items()})
    print("worker ok", jax.process_index(), flush=True)


if __name__ == "__main__":
    main()
