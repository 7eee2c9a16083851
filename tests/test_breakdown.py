"""Smoke tests for the per-stage bench breakdown (utils/breakdown.py).

The numbers are only meaningful on real hardware (bench.py --breakdown);
here we assert the harness traces/compiles/loops every production stage at
tiny dims and returns sane, positive timings with the expected keys.
"""

import jax
import jax.numpy as jnp
import pytest

from objgan_tpu.data.synthetic import synthetic_batch
from objgan_tpu.train.gan import GanTrainer
from objgan_tpu.utils.breakdown import sampling_breakdown, train_breakdown


@pytest.fixture(scope="module")
def trainer_state(tiny_cfg):
    rng = jax.random.PRNGKey(0)
    trainer = GanTrainer(tiny_cfg)
    batch = synthetic_batch(tiny_cfg, rng, tiny_cfg.TRAIN.BATCH_SIZE)
    return trainer, trainer.init_state(rng, batch), batch


def test_sampling_breakdown_keys_and_consistency(tiny_cfg, trainer_state):
    trainer, state, batch = trainer_state
    out = sampling_breakdown(tiny_cfg, trainer, state, batch,
                             jax.random.PRNGKey(1), n_loop=2)
    expected = {
        "text_encoder_ms", "ca_net_ms", "layout_paste_ms",
        "layout_encoder_ms", "init_stage_16_ms", "image_heads_ms",
        "attn_stage1_16to32_ms", "attn_stage2_32to64_ms", "stage_sum_ms",
    }
    assert expected == set(out)
    # overhead subtraction can clamp a sub-noise stage to 0, never below
    assert all(v >= 0 for v in out.values())
    assert out["stage_sum_ms"] > 0
    parts = sum(v for k, v in out.items() if k != "stage_sum_ms")
    # parts are individually rounded to 3 decimals; absolute tolerance
    # covers the accumulated rounding however fast the stages run
    assert out["stage_sum_ms"] == pytest.approx(parts, abs=0.001 * len(out))


def test_sampling_breakdown_analyze_costs(tiny_cfg, trainer_state):
    trainer, state, batch = trainer_state
    out = sampling_breakdown(tiny_cfg, trainer, state, batch,
                             jax.random.PRNGKey(3), n_loop=2, analyze=True)
    # every timed stage reports its per-iteration cost analysis; achieved
    # GB/s appears whenever ms and bytes are both nonzero
    for stage in ("text_encoder", "ca_net", "image_heads"):
        assert out[f"{stage}_gflops"] >= 0
        assert out[f"{stage}_mbytes"] > 0
        if out[f"{stage}_ms"] > 0:
            # gbps is derived from the same rounded ms the table reports
            # (breakdown._measure), so the only slack needed is gbps's own
            # 0.1-decimal rounding — deterministic even for the near-zero
            # CPU timings of tiny dims under suite load
            assert out[f"{stage}_gbps"] == pytest.approx(
                out[f"{stage}_mbytes"] / out[f"{stage}_ms"], abs=0.051)
    # the sum row must aggregate ONLY timing keys, not costs
    parts = sum(v for k, v in out.items()
                if k.endswith("_ms") and k != "stage_sum_ms")
    assert out["stage_sum_ms"] == pytest.approx(parts, abs=0.001 * len(out))


def test_train_breakdown_keys_and_arithmetic(tiny_cfg, trainer_state):
    trainer, state, batch = trainer_state
    out = train_breakdown(tiny_cfg, trainer, state, batch,
                          jax.random.PRNGKey(2), n_loop=2)
    assert {"loss_fwd_ms", "g_grad_ms", "d_grad_ms", "g_bwd_only_ms",
            "d_bwd_only_ms", "decomposed_step_ms"} == set(out)
    assert out["loss_fwd_ms"] > 0
    assert out["decomposed_step_ms"] == pytest.approx(
        out["g_grad_ms"] + out["d_grad_ms"] - out["loss_fwd_ms"], abs=0.005)


def test_dep_perturbation_is_numerically_invisible():
    from objgan_tpu.utils.breakdown import _dep

    x = jnp.ones((4, 4), jnp.bfloat16)
    acc = jnp.float32(123.0)
    assert jnp.array_equal(_dep(x, acc), x)
    xf = jnp.full((3,), 0.5, jnp.float32)
    assert jnp.array_equal(_dep(xf, jnp.float32(1e6)), xf)


def test_time_loop_hoists_all_closure_consts_out_of_the_hlo():
    """Closed-over arrays — float AND int/bool — must become program
    ARGUMENTS, never HLO literals: embedded literals made whole-network
    train-stage compile requests exceed the TPU relay's request-body limit
    (HTTP 413). jax.closure_convert specifically does NOT do this for
    concrete arrays (nothing concrete is 'maybe perturbed'), which is how
    the first 413 shipped; guard the make_jaxpr-based hoisting."""
    from objgan_tpu.utils import breakdown as bd

    big_f = jnp.arange(4096, dtype=jnp.float32).reshape(64, 64) * 1.5
    big_i = jnp.arange(4096, dtype=jnp.int32).reshape(64, 64)
    big_b = (big_i % 3 == 0)

    def fn(i, acc):
        return (jnp.sum(big_f) + jnp.sum(big_i.astype(jnp.float32))
                + jnp.sum(big_b.astype(jnp.float32)) + acc)

    closed = jax.make_jaxpr(lambda i, acc: fn(i, acc))(
        jnp.int32(0), jnp.float32(0.0))
    # all three captured arrays surface as consts (would-be literals)
    assert len(closed.consts) == 3
    # and the measured loop still computes the right thing with them as args
    ms = bd._time_loop(fn, n_loop=2)
    assert ms >= 0.0
