"""Runner-loop behaviors: resume step continuity, partial-stack flush,
checkpoint collision guard (the cli plumbing around the trainers)."""

import itertools

import jax
import numpy as np
import pytest

from objgan_tpu.core import checkpoint as ckpt
from objgan_tpu.core.metrics import MetricsWriter
from objgan_tpu.data.synthetic import synthetic_batch
from objgan_tpu.parallel.sharding import process_local_batch_slice
from objgan_tpu.train.box import BoxTrainer
from objgan_tpu.utils.profiling import StepTimer


def _feed_n(cfg, n):
    rng = jax.random.PRNGKey(0)
    for i in range(n):
        yield synthetic_batch(cfg, jax.random.fold_in(rng, i),
                              with_images=False)


def test_run_loop_resume_and_flush(tmp_path, tiny_cfg):
    from objgan_tpu import cli

    cfg = tiny_cfg.replace(DTYPE="float32").merged(
        {"TRAIN": {"STEPS_PER_EXECUTION": 2, "SNAPSHOT_INTERVAL": 1,
                   "BATCH_SIZE": 8},
         "OUTPUT_DIR": str(tmp_path)}
    )
    tr = BoxTrainer(cfg)
    first = next(_feed_n(cfg, 1))
    state = tr.init_state(jax.random.PRNGKey(0), first)
    mgr = ckpt.make_manager(str(tmp_path / "ck"))
    writer = MetricsWriter(str(tmp_path), "t", print_every=10**9)

    # bounded feed of 5 batches with K=2: 2 multi execs + 1 flushed tail
    end = cli._run_loop(cfg, "box", state, tr.jitted_train_step(),
                        _feed_n(cfg, 5), writer, mgr, max_steps=10**9,
                        multi_step_fn=tr.jitted_multi_step(donate=False))
    assert int(jax.device_get(end.step)) == 5  # tail batch not dropped
    assert mgr.latest_step() == 5  # saved at ACTUAL step, not max_steps

    # resume: counter continues; re-saving step 5 must not collide
    end2 = cli._run_loop(cfg, "box", end, tr.jitted_train_step(),
                         _feed_n(cfg, 3), writer, mgr, max_steps=10**9,
                         multi_step_fn=tr.jitted_multi_step(donate=False))
    assert int(jax.device_get(end2.step)) == 8
    assert mgr.latest_step() == 8

    # resuming with an already-saved step and an empty feed: no crash
    restored = ckpt.restore_latest(mgr, end2)
    cli._run_loop(cfg, "box", restored, tr.jitted_train_step(),
                  iter(()), writer, mgr, max_steps=10**9)
    assert mgr.latest_step() == 8


def test_process_local_batch_slice():
    start, size = process_local_batch_slice(16)
    assert (start, size) == (0, 16)  # single host
    with pytest.raises(ValueError):
        process_local_batch_slice(7) if jax.process_count() > 1 else (
            (_ for _ in ()).throw(ValueError()))


def test_step_timer_summary():
    t = StepTimer()
    out = t.timed(jax.jit(lambda x: x * 2), jax.numpy.ones(4), warmup=1,
                  iters=3)
    s = t.summary()
    assert set(s) == {"mean_ms", "p50_ms", "p95_ms", "min_ms"}
    assert s["min_ms"] <= s["p95_ms"]
    np.testing.assert_array_equal(np.asarray(out), 2.0)
