"""Multi-chip data-parallel tests on the 8-device virtual CPU mesh
(SURVEY.md §4 tier 4; BASELINE.json config #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objgan_tpu.data.synthetic import synthetic_batch
from objgan_tpu.parallel.sharding import (
    DATA_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    replicate,
    shard_batch,
)
from objgan_tpu.train.gan import GanTrainer


def test_mesh_shape():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    assert local_batch_size(mesh, 16) == 2
    with pytest.raises(ValueError):
        local_batch_size(mesh, 9)


def test_dp_train_step_runs_and_matches_single_device(tiny_cfg):
    """The sharded step must produce the same metrics as unsharded (same
    math, different partitioning)."""
    cfg = tiny_cfg.replace(DTYPE="float32")
    trainer = GanTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, 8)
    state = trainer.init_state(rng, batch)

    step = trainer.jitted_train_step(donate=False)
    _, metrics_single = step(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh()
    state_r = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch)
    new_state, metrics_dp = step(state_r, batch_s, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics_dp)

    for k in metrics_single:
        a, b = float(metrics_single[k]), float(metrics_dp[k])
        assert np.isfinite(b), k
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4, err_msg=k)
    # updated params stay replicated (no per-device divergence)
    leaf = jax.tree.leaves(new_state.g_params)[0]
    assert bool(jnp.all(jnp.isfinite(leaf)))


def test_model_axis_mesh_trains_identically(tiny_cfg):
    """The TP escape hatch (MESH.MODEL_PARALLELISM, SURVEY §2.5): a
    (4 data x 2 model) mesh must produce the same train-step metrics as
    pure DP — no pspec uses the model axis yet, so arrays replicate over
    it and only the data-axis partitioning changes."""
    cfg = tiny_cfg.replace(DTYPE="float32")
    trainer = GanTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, 8)
    state = trainer.init_state(rng, batch)
    step = trainer.jitted_train_step(donate=False)

    mesh_tp = make_mesh(model_parallelism=2)
    assert mesh_tp.shape[DATA_AXIS] == 4
    assert mesh_tp.shape["model"] == 2
    _, m_tp = step(replicate(mesh_tp, state), shard_batch(mesh_tp, batch),
                   jax.random.PRNGKey(1))

    mesh_dp = make_mesh()
    _, m_dp = step(replicate(mesh_dp, state), shard_batch(mesh_dp, batch),
                   jax.random.PRNGKey(1))

    for k in m_dp:
        np.testing.assert_allclose(float(m_dp[k]), float(m_tp[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)
    with pytest.raises(ValueError):
        make_mesh(model_parallelism=3)  # 8 devices not divisible


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
