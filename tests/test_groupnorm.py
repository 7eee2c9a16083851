"""Fused GroupNorm(+GLU) kernel: flax parity, Pallas-vs-reference equivalence
(interpret mode on CPU), gradients, and module wiring."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objgan_tpu.ops import groupnorm as gnops


def _rand(shape, dtype=jnp.float32, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape).astype(dtype)


class TestReferenceMatchesFlax:
    @pytest.mark.parametrize("shape,groups", [
        ((2, 8, 8, 64), 32), ((2, 4, 4, 96), 32), ((1, 8, 8, 6), 2),
    ])
    def test_matches_nn_groupnorm(self, shape, groups):
        x = _rand(shape)
        c = shape[-1]
        mod = nn.GroupNorm(num_groups=groups)
        params = mod.init(jax.random.PRNGKey(1), x)
        scale = jax.random.uniform(jax.random.PRNGKey(2), (c,), minval=0.5,
                                   maxval=1.5)
        bias = _rand((c,), seed=3) * 0.1
        params = {"params": {"scale": scale, "bias": bias}}
        want = mod.apply(params, x)
        got = gnops.group_norm_reference(x, scale, bias, groups, 1e-6, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_glu_composition(self):
        x = _rand((2, 8, 8, 64))
        scale = jnp.ones(64)
        bias = jnp.zeros(64)
        y = gnops.group_norm_reference(x, scale, bias, 32, 1e-6, False)
        a, g = jnp.split(y, 2, axis=-1)
        want = a * jax.nn.sigmoid(g)
        got = gnops.group_norm_reference(x, scale, bias, 32, 1e-6, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-7)


class TestPallasKernel:
    @pytest.fixture(autouse=True)
    def interpret(self, monkeypatch):
        monkeypatch.setattr(gnops, "INTERPRET", True)

    # shapes chosen to hit every structural case: narrow-channel folds
    # (C=64 -> fold 2/4, C=32 -> fold 8), GLU-output folds with C >= 128
    # (C=128 GLU -> fold 2: the case Mosaic hard-rejects unfolded), and
    # non-power-of-two channels (C=96 -> fold 4, C=192 GLU -> fold 4)
    @pytest.mark.parametrize("shape,groups,use_glu", [
        ((2, 64, 64, 64), 32, True),
        ((2, 64, 64, 64), 32, False),
        ((2, 64, 64, 128), 32, True),
        ((1, 128, 128, 32), 32, True),
        ((2, 64, 64, 96), 32, False),
        ((1, 64, 64, 192), 32, True),
    ])
    def test_matches_reference(self, shape, groups, use_glu):
        # kernel correctness is independent of the dispatch policy
        # (_pallas_eligible restricts to the measured-win regime; the
        # kernel itself must stay right for every structural case)
        c = shape[-1]
        x = _rand(shape, seed=7)
        scale = jax.random.uniform(jax.random.PRNGKey(8), (c,), minval=0.5,
                                   maxval=1.5)
        bias = _rand((c,), seed=9) * 0.2
        want = gnops.group_norm_reference(x, scale, bias, groups, 1e-6,
                                          use_glu)
        got = gnops._pallas_group_norm(
            x.reshape(shape[0], -1, c), scale, bias, groups, 1e-6, use_glu
        ).reshape(want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_bfloat16(self):
        shape, groups = (2, 64, 64, 64), 32
        x = _rand(shape, jnp.bfloat16, seed=11)
        scale, bias = jnp.ones(64), jnp.zeros(64)
        want = gnops.group_norm_reference(x, scale, bias, groups, 1e-6, True)
        got = gnops._pallas_group_norm(
            x.reshape(2, -1, 64), scale, bias, groups, 1e-6, True
        ).reshape(want.shape)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2)

    # use_glu=True exercises the ineligible/plain-autodiff path,
    # use_glu=False the kernel-eligible custom_vjp (recompute-bwd) path
    @pytest.mark.parametrize("use_glu", [True, False])
    def test_op_dispatch_and_grads(self, use_glu):
        """group_norm_op output + grads equal reference everywhere."""
        shape, groups = (1, 64, 64, 64), 32
        x = _rand(shape, seed=13)
        scale = jnp.ones(64) * 1.1
        bias = jnp.zeros(64) + 0.05
        assert gnops._pallas_eligible(x, groups, use_glu) == (not use_glu)

        def loss_op(x, s, b):
            return jnp.sum(gnops.group_norm_op(x, s, b, groups, 1e-6,
                                               use_glu) ** 2)

        def loss_ref(x, s, b):
            return jnp.sum(gnops.group_norm_reference(x, s, b, groups, 1e-6,
                                                      use_glu) ** 2)

        np.testing.assert_allclose(float(loss_op(x, scale, bias)),
                                   float(loss_ref(x, scale, bias)), rtol=1e-5)
        g_op = jax.grad(loss_op, argnums=(0, 1, 2))(x, scale, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g_op, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-4)


class TestEligibility:
    def test_small_and_odd_inputs_fall_back(self):
        assert not gnops._pallas_eligible(_rand((2, 8, 8, 64)), 32, False)
        assert not gnops._pallas_eligible(_rand((2, 64, 64)), 32, False)
        assert gnops._pallas_eligible(_rand((2, 64, 64, 64)), 32, False)
        # oversize slice: 512*512*256 fp32 > budget
        assert not gnops._pallas_eligible(_rand((1, 512, 512, 256)), 32,
                                          False)
        # outside the measured-win regime (see _pallas_eligible): GLU
        # always falls back, as does fold > 2 (96 channels -> fold 4)
        assert not gnops._pallas_eligible(_rand((2, 64, 64, 128)), 32, True)
        assert not gnops._pallas_eligible(_rand((2, 64, 64, 96)), 32, False)

    def test_reference_used_when_ineligible(self):
        x = _rand((2, 4, 4, 16))
        scale, bias = jnp.ones(16), jnp.zeros(16)
        got = gnops.group_norm_op(x, scale, bias, 16, 1e-6, False)
        want = gnops.group_norm_reference(x, scale, bias, 16, 1e-6, False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestModuleWiring:
    def test_param_names_match_nn_groupnorm(self):
        from objgan_tpu.models.common import gn, gn_glu

        x = _rand((2, 8, 8, 64))
        p = gn(64).init(jax.random.PRNGKey(0), x)
        assert set(p["params"]) == {"scale", "bias"}
        assert p["params"]["scale"].shape == (64,)
        y = gn_glu(64).apply(
            gn_glu(64).init(jax.random.PRNGKey(0), x), x)
        assert y.shape == (2, 8, 8, 32)
