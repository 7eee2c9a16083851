"""2-step training smoke tests per stage on synthetic data (SURVEY.md §4
tier 3) plus Stage-A decode behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objgan_tpu.data.synthetic import synthetic_batch
from objgan_tpu.train.box import BoxTrainer
from objgan_tpu.train.damsm import DamsmTrainer
from objgan_tpu.train.gan import GanTrainer
from objgan_tpu.train.shape import ShapeTrainer


def _finite_tree(tree):
    return all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    )


@pytest.fixture(scope="module")
def cfg(tiny_cfg):
    return tiny_cfg.replace(DTYPE="float32")


@pytest.fixture(scope="module")
def batch(cfg):
    return synthetic_batch(cfg, jax.random.PRNGKey(11))


class TestBoxTrainer:
    def test_two_steps_reduce_loss_and_sample(self, cfg, batch):
        tr = BoxTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        step = tr.jitted_train_step()
        losses = []
        for i in range(8):
            state, aux = step(state, batch)
            losses.append(float(aux["box_total"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # memorizing one tiny batch
        out = tr.jitted_sample()(
            state, batch["captions"], batch["cap_lens"], jax.random.PRNGKey(1)
        )
        o = cfg.BOX.MAX_SEQ_LENGTH
        b = batch["captions"].shape[0]
        assert out["labels"].shape == (b, o)
        assert out["boxes"].shape == (b, o, 4)
        # boxes in [0,1]; invalid steps zeroed; labels 0 where invalid
        assert float(out["boxes"].min()) >= 0.0
        assert float(out["boxes"].max()) <= 1.0
        inv = 1.0 - out["obj_valid"]
        assert float(jnp.abs(out["boxes"] * inv[..., None]).max()) == 0.0

    def test_stop_monotone(self, cfg, batch):
        """Once STOP is emitted, every later step is invalid."""
        tr = BoxTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        out = tr.jitted_sample()(
            state, batch["captions"], batch["cap_lens"], jax.random.PRNGKey(2)
        )
        v = np.asarray(out["obj_valid"])
        for row in v:
            seen_zero = False
            for x in row:
                if x == 0:
                    seen_zero = True
                assert not (seen_zero and x == 1)


class TestShapeTrainer:
    def test_two_steps(self, cfg, batch):
        tr = ShapeTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        step = tr.jitted_train_step()
        for i in range(2):
            state, aux = step(state, batch, jax.random.PRNGKey(i))
        assert _finite_tree(aux)
        assert _finite_tree(state.g_params)
        masks = tr.jitted_sample()(
            state, batch["boxes"], batch["labels"], batch["obj_valid"],
            jax.random.PRNGKey(3),
        )
        s = cfg.OBJ.SHAPE_SIZE
        assert masks.shape == batch["shapes"].shape
        assert float(masks.min()) >= 0.0 and float(masks.max()) <= 1.0


class TestDamsmTrainer:
    def test_two_steps(self, cfg, batch):
        tr = DamsmTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        step = tr.jitted_train_step()
        for i in range(2):
            state, aux = step(state, batch, jax.random.PRNGKey(i))
        assert _finite_tree(aux)
        assert _finite_tree(state.text_params)


class TestGanTrainer:
    def test_two_steps_and_sampling(self, cfg, batch):
        tr = GanTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        step = tr.jitted_train_step()
        p0 = jax.tree.leaves(state.g_params)[0].copy()
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert _finite_tree(metrics)
        assert _finite_tree(state.g_params)
        # params actually moved
        p1 = jax.tree.leaves(state.g_params)[0]
        assert float(jnp.abs(p1 - p0).max()) > 0.0
        # frozen encoders untouched by donation/update
        out = tr.jitted_sample()(state, batch, jax.random.PRNGKey(9))
        for img, size in zip(out["images"], cfg.branch_sizes):
            assert img.shape == (batch["captions"].shape[0], size, size, 3)
            assert bool(jnp.all(jnp.isfinite(img)))


class TestRemat:
    def test_remat_matches_baseline_numerics(self, cfg, batch):
        """GAN.REMAT='stages' is a pure scheduling change (recompute instead
        of store): one train step from identical init must produce the same
        params/metrics as REMAT='none' to fp32 tolerance."""
        tr0 = GanTrainer(cfg)
        tr1 = GanTrainer(cfg.merged({"GAN": {"REMAT": "stages"}}))
        s0 = tr0.init_state(jax.random.PRNGKey(0), batch)
        s1 = tr1.init_state(jax.random.PRNGKey(0), batch)
        a0 = np.asarray(jax.tree.leaves(s0.g_params)[0])
        a1 = np.asarray(jax.tree.leaves(s1.g_params)[0])
        np.testing.assert_array_equal(a0, a1)  # nn.remat keeps param naming
        n0, m0 = tr0.jitted_train_step(donate=False)(
            s0, batch, jax.random.PRNGKey(3))
        n1, m1 = tr1.jitted_train_step(donate=False)(
            s1, batch, jax.random.PRNGKey(3))
        np.testing.assert_allclose(
            float(m0["d_loss"]), float(m1["d_loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(m0["g_loss"]), float(m1["g_loss"]), rtol=1e-5)
        for p0, p1 in zip(jax.tree.leaves(n0.g_params)[:8],
                          jax.tree.leaves(n1.g_params)[:8]):
            np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                       rtol=1e-4, atol=1e-6)
        for p0, p1 in zip(jax.tree.leaves(n0.d_params)[:8],
                          jax.tree.leaves(n1.d_params)[:8]):
            np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                       rtol=1e-4, atol=1e-6)


class TestEma:
    def test_ema_tracks_generator(self, cfg, batch):
        """EMA params follow the lineage's copy_G_params moving average."""
        tr = GanTrainer(cfg, ema_decay=0.5)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        step = tr.jitted_train_step(donate=False)
        leaf = lambda p: np.asarray(jax.tree.leaves(p)[0])
        e0, g0 = leaf(state.ema_g_params), leaf(state.g_params)
        np.testing.assert_array_equal(e0, g0)  # init: identical copies
        new_state, _ = step(state, batch, jax.random.PRNGKey(1))
        e1 = leaf(new_state.ema_g_params)
        g1 = leaf(new_state.g_params)
        np.testing.assert_allclose(e1, 0.5 * e0 + 0.5 * g1, rtol=1e-5,
                                   atol=1e-7)


class TestMultiStep:
    def test_multi_step_equals_sequential(self, cfg, batch):
        """K scanned steps must match K sequential steps exactly."""
        tr = GanTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        rng = jax.random.PRNGKey(5)

        # sequential with the same key schedule as the scan body
        seq_state = state
        key = rng
        seq_d_losses = []
        for _ in range(3):
            key, sub = jax.random.split(key)
            seq_state, seq_m = tr.train_step(seq_state, batch, sub)
            seq_d_losses.append(float(seq_m["d_loss"]))

        stacked = jax.tree.map(
            lambda x: jnp.stack([x, x, x]) if hasattr(x, "ndim") else x, batch
        )
        multi_state, multi_m = tr.jitted_multi_step(donate=False)(
            state, stacked, rng
        )
        a = np.asarray(jax.tree.leaves(seq_state.g_params)[0])
        b = np.asarray(jax.tree.leaves(multi_state.g_params)[0])
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=1e-4)
        # multi-step metrics are the K-axis MEAN (no datapoint discarded)
        np.testing.assert_allclose(
            float(np.mean(seq_d_losses)), float(multi_m["d_loss"]), rtol=3e-3
        )
