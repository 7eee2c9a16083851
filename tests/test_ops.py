"""Unit tests for the numerical ops layer (SURVEY.md §4 tier 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objgan_tpu.ops import attention, gmm, rasterize
from objgan_tpu.ops import roi_align as ra


class TestGMM:
    K = 3

    def _params(self, rng, shape=()):
        return jax.random.normal(rng, (*shape, gmm.param_size(self.K)))

    def test_log_prob_matches_scipy_style_reference(self, rng):
        params = self._params(rng)
        box = jnp.array([0.3, 0.2, 0.4, 0.5])
        logits, mu, log_sigma = gmm.split_params(params, self.K)
        # hand-rolled dense reference
        w = np.exp(np.asarray(logits))
        w = w / w.sum()
        mu_n, sig_n = np.asarray(mu), np.exp(np.asarray(log_sigma))
        dens = 0.0
        for k in range(self.K):
            d = np.prod(
                np.exp(-0.5 * ((np.asarray(box) - mu_n[k]) / sig_n[k]) ** 2)
                / (sig_n[k] * np.sqrt(2 * np.pi))
            )
            dens += w[k] * d
        np.testing.assert_allclose(
            gmm.log_prob(params, box, self.K), np.log(dens), rtol=1e-5
        )

    def test_nll_masking(self, rng):
        params = self._params(rng, (2, 4))
        boxes = jax.random.uniform(rng, (2, 4, 4))
        valid = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
        full = gmm.nll(params, boxes, self.K, valid)
        # changing a masked box must not change the loss
        boxes2 = boxes.at[0, 3].set(99.0)
        np.testing.assert_allclose(full, gmm.nll(params, boxes2, self.K, valid))

    def test_sample_shape_and_temperature(self, rng):
        params = self._params(rng, (5,))
        s = gmm.sample(params, rng, self.K, temperature=0.5)
        assert s.shape == (5, 4)
        assert bool(jnp.all(jnp.isfinite(s)))
        # T -> 0 collapses to the argmax component's mean
        s0 = gmm.sample(params, rng, self.K, temperature=1e-6)
        logits, mu, _ = gmm.split_params(params, self.K)
        expect = jnp.take_along_axis(
            mu, jnp.argmax(logits, -1)[:, None, None], axis=1
        )[:, 0]
        np.testing.assert_allclose(s0, expect, atol=1e-2)


class TestCorrGMM:
    """Sketch-RNN-style correlated (x,y)/(w,h) bivariate mixture
    (cfg.OBJ.GMM_MODE='corr' — VERDICT r2 missing #1)."""

    K = 3

    def _params(self, rng, shape=()):
        return jax.random.normal(rng, (*shape, gmm.param_size(self.K,
                                                              "corr")))

    def test_param_size(self):
        assert gmm.param_size(self.K, "corr") == self.K * 11
        assert gmm.param_size(self.K) == self.K * 9

    def test_unknown_mode_rejected_everywhere(self, rng):
        """Every mode switch is `corr else diag`: an unvalidated typo
        ('Corr', 'full') would silently disable the ablation-backed corr
        default, so all entry points must reject unknown modes loudly."""
        p = jax.random.normal(rng, (2, gmm.param_size(3)))
        box = jnp.zeros((2, 4))
        for bad in ("Corr", "full", ""):
            with pytest.raises(ValueError, match="unknown GMM mode"):
                gmm.param_size(3, bad)
            with pytest.raises(ValueError, match="unknown GMM mode"):
                gmm.log_prob(p, box, 3, mode=bad)
            with pytest.raises(ValueError, match="unknown GMM mode"):
                gmm.sample(p, rng, 3, mode=bad)
            with pytest.raises(ValueError, match="unknown GMM mode"):
                gmm.mean(p, 3, mode=bad)

    def test_log_prob_matches_scipy_oracle(self, rng):
        from scipy.stats import multivariate_normal

        params = self._params(rng)
        box = np.array([0.3, 0.2, 0.4, 0.5])
        logits, mu, log_sigma, rho = gmm.split_params_corr(params, self.K)
        w = np.exp(np.asarray(logits))
        w = w / w.sum()
        mu_n = np.asarray(mu)
        sig = np.exp(np.asarray(log_sigma))
        rho_n = np.asarray(rho)
        dens = 0.0
        for k in range(self.K):
            cov = np.zeros((4, 4))
            for p, (i, j) in enumerate(((0, 1), (2, 3))):
                cov[i, i] = sig[k, i] ** 2
                cov[j, j] = sig[k, j] ** 2
                cov[i, j] = cov[j, i] = rho_n[k, p] * sig[k, i] * sig[k, j]
            dens += w[k] * multivariate_normal(mu_n[k], cov).pdf(box)
        np.testing.assert_allclose(
            gmm.log_prob(params, jnp.asarray(box), self.K, mode="corr"),
            np.log(dens), rtol=1e-5,
        )

    def test_hand_computed_single_component(self):
        """NLL against a hand-computed bivariate normal value."""
        # one component, mu=0, sigma=1, rho=(0.5, 0): density at origin is
        # 1/(2*pi*sqrt(1-0.25)) * 1/(2*pi) -> ll = -2 log(2pi) - 0.5 log .75
        rho_raw = np.arctanh(0.5 / 0.99)
        params = jnp.asarray(
            np.concatenate([[0.0], np.zeros(4), np.zeros(4),
                            [rho_raw, 0.0]]), jnp.float32)
        ll = gmm.log_prob(params, jnp.zeros(4), 1, mode="corr")
        expect = -2 * np.log(2 * np.pi) - 0.5 * np.log(1 - 0.25)
        np.testing.assert_allclose(float(ll), expect, rtol=1e-5)

    def test_zero_rho_equals_diag(self, rng):
        """With rho_raw=0 the corr density must equal the diag density for
        the same logits/mu/sigma."""
        diag_params = jax.random.normal(rng, (6, gmm.param_size(self.K)))
        corr_params = jnp.concatenate(
            [diag_params, jnp.zeros((6, self.K * 2))], axis=-1)
        boxes = jax.random.uniform(jax.random.PRNGKey(1), (6, 4))
        np.testing.assert_allclose(
            np.asarray(gmm.log_prob(corr_params, boxes, self.K,
                                    mode="corr")),
            np.asarray(gmm.log_prob(diag_params, boxes, self.K)),
            rtol=1e-5,
        )

    def test_sample_correlation_and_shape(self, rng):
        """Empirical correlation of samples must track the component rho."""
        rho = 0.8
        rho_raw = np.arctanh(rho / 0.99)
        params = jnp.asarray(np.concatenate(
            [[0.0], np.zeros(4), np.zeros(4), [rho_raw, -rho_raw]]),
            jnp.float32)
        big = jnp.broadcast_to(params, (20000, params.shape[0]))
        s = np.asarray(gmm.sample(big, rng, 1, temperature=1.0, mode="corr"))
        assert s.shape == (20000, 4)
        cxy = np.corrcoef(s[:, 0], s[:, 1])[0, 1]
        cwh = np.corrcoef(s[:, 2], s[:, 3])[0, 1]
        assert abs(cxy - rho) < 0.03
        assert abs(cwh + rho) < 0.03

    def test_grad_finite_at_extreme_rho(self, rng):
        params = self._params(rng, (4,)) * 50.0  # saturated tanh region
        boxes = jax.random.uniform(rng, (4, 4))
        g = jax.grad(lambda p: gmm.nll(p, boxes, self.K, mode="corr"))(params)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_trains_end_to_end(self, tiny_cfg):
        """A corr-mode BoxTrainer step runs and improves its own loss."""
        from objgan_tpu.data.synthetic import synthetic_batch
        from objgan_tpu.train.box import BoxTrainer

        cfg = tiny_cfg.replace(DTYPE="float32").merged(
            {"OBJ": {"GMM_MODE": "corr"}})
        tr = BoxTrainer(cfg)
        batch = synthetic_batch(cfg, jax.random.PRNGKey(3),
                                with_images=False)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        step = tr.jitted_train_step()
        state, m0 = step(state, batch, jax.random.PRNGKey(1))
        for i in range(30):
            state, m = step(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(2), i))
        assert float(m["box_nll"]) < float(m0["box_nll"])
        # sampling path in corr mode stays well-formed
        out = tr.model.apply(
            state.params, batch["captions"], batch["cap_lens"],
            jax.random.PRNGKey(4), method="sample")
        assert bool(jnp.all(jnp.isfinite(out["boxes"])))


class TestAttention:
    def test_grid_attention_rows_sum_to_one_and_mask(self, rng):
        q = jax.random.normal(rng, (2, 6, 8))
        s = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
        mask = jnp.array([[False] * 3 + [True] * 2, [False] * 5])
        ctx, attn = attention.grid_attention(q, s, mask)
        assert ctx.shape == (2, 6, 8) and attn.shape == (2, 6, 5)
        np.testing.assert_allclose(attn.sum(-1), 1.0, rtol=1e-5)
        assert float(attn[0, :, 3:].max()) == 0.0
        # attention maps must be fp32 regardless of input dtype
        _, attn16 = attention.grid_attention(
            q.astype(jnp.bfloat16), s.astype(jnp.bfloat16), mask
        )
        assert attn16.dtype == jnp.float32

    def test_damsm_attention_normalization(self, rng):
        q = jax.random.normal(rng, (2, 4, 8))
        c = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 8))
        w, attn = attention.damsm_attention(q, c, gamma1=4.0)
        assert w.shape == (2, 4, 8) and attn.shape == (2, 4, 9)
        np.testing.assert_allclose(attn.sum(-1), 1.0, rtol=1e-5)

    def test_object_attention_invalid_objects_zero(self, rng):
        q = jax.random.normal(rng, (2, 3, 8))
        w = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 8))
        valid = jnp.array([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
        ctx, attn = attention.object_attention(q, w, None, valid)
        assert float(jnp.abs(ctx[0, 2]).max()) == 0.0
        assert float(jnp.abs(attn[1, 1:]).max()) == 0.0

    def test_paste_object_context_average_on_overlap(self):
        # two objects fully covering one location with contexts 2 and 4 -> 3
        ctx = jnp.array([[[2.0], [4.0]]])  # (1, 2, 1)
        maps = jnp.ones((1, 2, 1))  # both cover location 0
        valid = jnp.ones((1, 2))
        out = attention.paste_object_context(ctx, maps, valid)
        np.testing.assert_allclose(out, [[[3.0]]])

    def test_context_dtype_keeps_maps_fp32_exact(self, rng):
        # GAN.OBJ_PASTE_DTYPE='compute': the map->context contraction runs
        # in compute dtype, but the attention MAPS must be bitwise
        # identical to the fp32 path (the parity invariant lives on the
        # maps, not the paste — VERDICT r4 next #2).
        q = jax.random.normal(rng, (2, 12, 16), jnp.bfloat16)
        s = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16), jnp.bfloat16)
        ctx32, attn32 = attention.grid_attention(q, s, None)
        ctx16, attn16 = attention.grid_attention(
            q, s, None, context_dtype=jnp.bfloat16)
        assert attn16.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(attn32), np.asarray(attn16))
        assert ctx16.dtype == q.dtype
        np.testing.assert_allclose(np.asarray(ctx32, np.float32),
                                   np.asarray(ctx16, np.float32),
                                   rtol=0.06, atol=0.06)

        octx = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16))
        maps = jax.random.uniform(jax.random.PRNGKey(3), (2, 3, 12))
        valid = jnp.ones((2, 3))
        p32 = attention.paste_object_context(octx, maps, valid)
        p16 = attention.paste_object_context(
            octx, maps, valid, context_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(p32), np.asarray(p16, np.float32),
                                   rtol=0.06, atol=0.06)


class TestRasterize:
    def test_box_maps_area(self):
        boxes = jnp.array([[[0.25, 0.5, 0.5, 0.25]]])  # (1,1,4)
        m = rasterize.box_maps(boxes, 16, 16)
        assert m.shape == (1, 1, 16, 16)
        # covers x pixels [4,12), y pixels [8,12) -> 8*4 = 32
        assert float(m.sum()) == 32.0
        assert float(m[0, 0, 9, 6]) == 1.0 and float(m[0, 0, 7, 6]) == 0.0

    def test_paste_masks_identity_when_box_is_full_canvas(self, rng):
        s = 8
        mask = jax.random.uniform(rng, (1, 1, s, s))
        boxes = jnp.array([[[0.0, 0.0, 1.0, 1.0]]])
        out = rasterize.paste_masks(mask, boxes, s, s)
        np.testing.assert_allclose(out[0, 0], mask[0, 0], atol=1e-5)

    def test_paste_masks_translation(self):
        s = 4
        mask = jnp.ones((1, 1, s, s))
        boxes = jnp.array([[[0.5, 0.5, 0.5, 0.5]]])  # bottom-right quadrant
        out = rasterize.paste_masks(mask, boxes, 8, 8)
        assert float(out[0, 0, :4, :4].sum()) == 0.0
        assert float(out[0, 0, 5:, 5:].min()) > 0.9


class TestRoiAlign:
    @staticmethod
    def _bilinear(img, y, x):
        """torchvision ``bilinear_interpolate`` semantics (aligned=True path):
        zero outside [-1, size]; clamp negatives to 0; clamp high index."""
        h, w, _ = img.shape
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(img.shape[-1], img.dtype)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            img[y0, x0] * (1 - ly) * (1 - lx)
            + img[y0, x1] * (1 - ly) * lx
            + img[y1, x0] * ly * (1 - lx)
            + img[y1, x1] * ly * lx
        )

    def _numpy_reference(self, feats_nhwc, boxes_norm, out_size, q):
        """Direct (slow) numpy ROI-align, aligned=True, fixed sampling_ratio —
        the Fast R-CNN semantics the reference's CUDA op implements."""
        f = np.asarray(feats_nhwc, np.float64)
        bxs = np.asarray(boxes_norm, np.float64)
        b, h, w, c = f.shape
        o = bxs.shape[1]
        out = np.zeros((b, o, out_size, out_size, c))
        for bi in range(b):
            for oi in range(o):
                x0, y0, bw, bh = bxs[bi, oi]
                sx, sy = x0 * w - 0.5, y0 * h - 0.5
                binw, binh = bw * w / out_size, bh * h / out_size
                for i in range(out_size):
                    for j in range(out_size):
                        acc = np.zeros(c)
                        for ky in range(q):
                            for kx in range(q):
                                yy = sy + (i + (ky + 0.5) / q) * binh
                                xx = sx + (j + (kx + 0.5) / q) * binw
                                acc += self._bilinear(f[bi], yy, xx)
                        out[bi, oi, i, j] = acc / (q * q)
        return out

    @pytest.mark.parametrize("out_size,q", [(7, 2), (4, 1), (3, 3)])
    def test_xla_matches_numpy_oracle(self, rng, out_size, q):
        b, h, w, c, o = 2, 16, 12, 5, 4
        feats = jax.random.normal(rng, (b, h, w, c))
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        xy = jax.random.uniform(k1, (b, o, 2), minval=0.0, maxval=0.6)
        wh = jax.random.uniform(k2, (b, o, 2), minval=0.05, maxval=0.4)
        boxes = jnp.concatenate([xy, wh], axis=-1)
        ours = ra.roi_align_xla(feats, boxes, out_size, q)
        ref = self._numpy_reference(feats, boxes, out_size, q)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)

    def test_pallas_interpret_matches_xla(self, rng):
        ra.INTERPRET = True
        try:
            b, h, w, c, o = 2, 8, 8, 4, 3
            feats = jax.random.normal(rng, (b, h, w, c))
            boxes = jnp.tile(jnp.array([0.1, 0.2, 0.5, 0.6]), (b, o, 1))
            out_p = ra.roi_align_pallas(feats, boxes, 4, 2)
            out_x = ra.roi_align_xla(feats, boxes, 4, 2)
            np.testing.assert_allclose(
                np.asarray(out_p), np.asarray(out_x), atol=1e-5
            )
        finally:
            ra.INTERPRET = False

    def test_pallas_gradient_matches_xla_gradient(self, rng):
        ra.INTERPRET = True
        try:
            b, h, w, c, o = 1, 8, 8, 4, 2
            feats = jax.random.normal(rng, (b, h, w, c))
            boxes = jnp.array([[[0.0, 0.0, 0.7, 0.7], [0.2, 0.3, 0.5, 0.5]]])

            def loss_p(f):
                return jnp.sum(ra.roi_align_pallas(f, boxes, 4, 2) ** 2)

            def loss_x(f):
                return jnp.sum(ra.roi_align_xla(f, boxes, 4, 2) ** 2)

            gp = jax.grad(loss_p)(feats)
            gx = jax.grad(loss_x)(feats)
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)
        finally:
            ra.INTERPRET = False

    def test_pallas_bf16_grad_accumulates_fp32(self, rng):
        """Heavily-overlapping bf16 boxes: the backward sums per-object
        contributions into the same feature block, and the kernel must
        accumulate in fp32 (a bf16 running sum rounds at every add). With
        fp32 accumulation the Pallas grad matches the XLA backward to
        bf16 cotangent resolution even at MAX_OBJECTS overlaps."""
        ra.INTERPRET = True
        try:
            b, h, w, c, o = 1, 8, 8, 8, 10
            feats = jax.random.normal(rng, (b, h, w, c)).astype(jnp.bfloat16)
            # all boxes cover the same region -> o-way accumulation
            boxes = jnp.tile(jnp.array([[[0.1, 0.1, 0.8, 0.8]]]), (1, o, 1))

            def loss_p(f):
                return jnp.sum(
                    ra.roi_align_pallas(f, boxes, 4, 2).astype(jnp.float32))

            def loss_x(f):
                return jnp.sum(
                    ra.roi_align_xla(f, boxes, 4, 2).astype(jnp.float32))

            gp = np.asarray(jax.grad(loss_p)(feats), np.float32)
            gx = np.asarray(jax.grad(loss_x)(feats), np.float32)
            # one final bf16 rounding each — not o accumulated roundings
            np.testing.assert_allclose(gp, gx, rtol=0.01, atol=0.05)
        finally:
            ra.INTERPRET = False

    def test_zero_box_gives_top_left_sample(self, rng):
        feats = jnp.ones((1, 8, 8, 2))
        boxes = jnp.zeros((1, 1, 4))
        out = ra.roi_align_xla(feats, boxes, 4, 2)
        assert out.shape == (1, 1, 4, 4, 2)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestLSTMCellDtype:
    def test_bf16_cell_scans_with_fp32_carry(self, rng):
        """A non-default cell dtype must stay lax.scan-compatible with the
        fp32 carries every caller builds (LSTMCell.init_carry default,
        BoxDecoder.init_state): the cell computes in self.dtype but returns
        the carry in the dtype it came in — otherwise every scanned decode
        path raises a carry-type mismatch at trace time."""
        from objgan_tpu.ops.lstm import LSTMCell

        cell = LSTMCell(8, dtype=jnp.bfloat16)
        xs = jax.random.normal(rng, (5, 2, 4))
        carry0 = LSTMCell.init_carry(2, 8)  # fp32, the repo-wide default
        params = cell.init(rng, carry0, xs[0])

        def body(carry, x):
            return cell.apply(params, carry, x)

        (h, c), ys = jax.lax.scan(body, carry0, xs)
        assert h.dtype == jnp.float32 and c.dtype == jnp.float32
        assert ys.dtype == jnp.bfloat16  # compute dtype still honored
        assert np.isfinite(np.asarray(ys, np.float32)).all()
