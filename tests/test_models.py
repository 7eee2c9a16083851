"""Model-level shape/dtype/finite smoke tests (SURVEY.md §4 tier 1/3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objgan_tpu.data.synthetic import synthetic_batch
from objgan_tpu.losses.damsm_loss import damsm_loss, sent_loss, words_loss
from objgan_tpu.models.damsm import build_image_encoder, build_text_encoder
from objgan_tpu.models.discriminator import ObjectDNet, build_discriminators
from objgan_tpu.models.generator import GNet, kl_loss


def _fp32(cfg):
    return cfg.replace(DTYPE="float32")


@pytest.fixture(scope="module")
def batch(tiny_cfg):
    return synthetic_batch(tiny_cfg, jax.random.PRNGKey(42))


@pytest.fixture(scope="module")
def text_feats(tiny_cfg, batch):
    enc = build_text_encoder(tiny_cfg)
    params = enc.init(jax.random.PRNGKey(0), batch["captions"],
                      batch["cap_lens"])
    words, sent = enc.apply(params, batch["captions"], batch["cap_lens"])
    return words, sent


class TestTextEncoder:
    def test_shapes_and_padding_invariance(self, tiny_cfg, batch, text_feats):
        words, sent = text_feats
        b, t = batch["captions"].shape
        d = tiny_cfg.TEXT.EMBEDDING_DIM
        assert words.shape == (b, t, d) and sent.shape == (b, d)
        # changing tokens beyond cap_len must not change sent_emb
        enc = build_text_encoder(tiny_cfg)
        params = enc.init(jax.random.PRNGKey(0), batch["captions"],
                          batch["cap_lens"])
        caps2 = batch["captions"].at[:, -1].set(7)
        short = batch["cap_lens"] < batch["captions"].shape[1]
        _, sent2 = enc.apply(params, caps2, batch["cap_lens"])
        w1, s1 = enc.apply(params, batch["captions"], batch["cap_lens"])
        np.testing.assert_allclose(
            np.asarray(s1)[np.asarray(short)], np.asarray(sent2)[np.asarray(short)],
            atol=1e-6,
        )


class TestGenerator:
    def test_forward_shapes(self, tiny_cfg, batch, text_feats):
        cfg = _fp32(tiny_cfg)
        words, sent = text_feats
        g = GNet(cfg)
        b = batch["captions"].shape[0]
        z = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.GAN.Z_DIM))
        labels_emb = jax.random.normal(
            jax.random.PRNGKey(2), (b, cfg.OBJ.MAX_OBJECTS, cfg.OBJ.LABEL_DIM)
        )
        word_mask = jnp.arange(words.shape[1])[None] >= batch["cap_lens"][:, None]
        variables = g.init(
            {"params": jax.random.PRNGKey(3)},
            z, sent, words, word_mask, labels_emb, batch["boxes"],
            batch["shapes"], batch["obj_valid"], jax.random.PRNGKey(4),
        )
        out = g.apply(
            variables, z, sent, words, word_mask, labels_emb, batch["boxes"],
            batch["shapes"], batch["obj_valid"], jax.random.PRNGKey(4),
        )
        sizes = cfg.branch_sizes
        assert len(out["images"]) == len(sizes)
        for img, s in zip(out["images"], sizes):
            assert img.shape == (b, s, s, 3)
            assert bool(jnp.all(jnp.isfinite(img)))
            assert float(jnp.abs(img).max()) <= 1.0
        # attention maps fp32 and normalized over words
        for ga in out["grid_attn"]:
            assert ga.dtype == jnp.float32
        kl = kl_loss(out["mu"], out["logvar"])
        assert bool(jnp.isfinite(kl))

    def test_obj_paste_dtype_compute_finite_and_first_maps_exact(
            self, tiny_cfg, batch, text_feats):
        # OBJ_PASTE_DTYPE='compute' moves only the map->context matmuls to
        # compute dtype; the FIRST attention stage sees identical inputs in
        # both modes, so its fp32 maps must be bitwise identical (the
        # parity invariant). Later stages legitimately drift (contexts feed
        # the features the next maps are computed from).
        words, sent = text_feats
        b = batch["captions"].shape[0]
        z = jax.random.normal(jax.random.PRNGKey(1), (b, tiny_cfg.GAN.Z_DIM))
        labels_emb = jax.random.normal(
            jax.random.PRNGKey(2),
            (b, tiny_cfg.OBJ.MAX_OBJECTS, tiny_cfg.OBJ.LABEL_DIM))
        word_mask = (jnp.arange(words.shape[1])[None]
                     >= batch["cap_lens"][:, None])
        args = (z, sent, words, word_mask, labels_emb, batch["boxes"],
                batch["shapes"], batch["obj_valid"], jax.random.PRNGKey(4))
        outs = {}
        for mode in ("float32", "compute"):
            cfg = tiny_cfg.merged({"GAN": {"OBJ_PASTE_DTYPE": mode}})
            g = GNet(cfg)
            variables = g.init({"params": jax.random.PRNGKey(3)}, *args)
            outs[mode] = g.apply(variables, *args)
        for img in outs["compute"]["images"]:
            assert bool(jnp.all(jnp.isfinite(img)))
        np.testing.assert_array_equal(
            np.asarray(outs["float32"]["grid_attn"][0]),
            np.asarray(outs["compute"]["grid_attn"][0]))
        for ga in outs["compute"]["grid_attn"]:
            assert ga.dtype == jnp.float32


class TestDiscriminators:
    def test_patch_d_shapes(self, tiny_cfg, batch, text_feats):
        cfg = _fp32(tiny_cfg)
        _, sent = text_feats
        for dnet, img in zip(build_discriminators(cfg), batch["images"]):
            params = dnet.init(jax.random.PRNGKey(0), img, sent)
            out = dnet.apply(params, img, sent)
            assert out["uncond"].shape[0] == img.shape[0]
            assert out["uncond"].shape[1:] == (4, 4)
            assert out["cond"].shape[1:] == (4, 4)
            assert bool(jnp.all(jnp.isfinite(out["uncond"])))

    def test_object_d(self, tiny_cfg, batch):
        cfg = _fp32(tiny_cfg)
        d = ObjectDNet(cfg)
        img = batch["images"][0]
        b = img.shape[0]
        labels_emb = jax.random.normal(
            jax.random.PRNGKey(2), (b, cfg.OBJ.MAX_OBJECTS, cfg.OBJ.LABEL_DIM)
        )
        params = d.init(jax.random.PRNGKey(0), img, batch["boxes"], labels_emb)
        out = d.apply(params, img, batch["boxes"], labels_emb)
        assert out["obj"].shape == (b, cfg.OBJ.MAX_OBJECTS)
        assert out["cls"].shape == (b, cfg.OBJ.MAX_OBJECTS, cfg.OBJ.NUM_CLASSES)
        # class head must be a function of ROI pixels ONLY: if it saw the
        # label embedding it could decode its CE target from its own input
        # and the generator would lose the class-fidelity gradient
        labels_emb2 = jax.random.normal(
            jax.random.PRNGKey(7), labels_emb.shape)
        out2 = d.apply(params, img, batch["boxes"], labels_emb2)
        assert jnp.array_equal(out["cls"], out2["cls"])
        # ...while the real/fake head IS label-conditioned
        assert not jnp.array_equal(out["obj"], out2["obj"])


class TestDamsmLoss:
    def test_perfect_match_beats_random(self, tiny_cfg):
        d = tiny_cfg.TEXT.EMBEDDING_DIM
        b, t, l = 4, 5, 9
        rng = jax.random.PRNGKey(0)
        sent = jax.random.normal(rng, (b, d))
        # identical embeddings -> the diagonal is the best match
        s0, s1 = sent_loss(sent, sent, None, gamma3=10.0)
        sent_rand = jax.random.normal(jax.random.PRNGKey(1), (b, d))
        r0, r1 = sent_loss(sent, sent_rand, None, gamma3=10.0)
        assert float(s0 + s1) < float(r0 + r1)

    def test_words_loss_finite_and_masked(self, tiny_cfg):
        d = tiny_cfg.TEXT.EMBEDDING_DIM
        b, t, l = 3, 6, 8
        regions = jax.random.normal(jax.random.PRNGKey(0), (b, l, d))
        words = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
        lens = jnp.array([3, 6, 2])
        w0, w1, attn = words_loss(regions, words, lens, jnp.arange(b),
                                  4.0, 5.0, 10.0)
        assert bool(jnp.isfinite(w0)) and bool(jnp.isfinite(w1))
        assert attn.shape == (b, b, t, l)
        # words beyond cap_len must not affect the loss
        words2 = words.at[2, 3:].set(55.0)
        w0b, w1b, _ = words_loss(regions, words2, lens, jnp.arange(b),
                                 4.0, 5.0, 10.0)
        np.testing.assert_allclose(float(w0), float(w0b), rtol=1e-5)

    def test_full_damsm_loss(self, tiny_cfg, batch, text_feats):
        cfg = _fp32(tiny_cfg)
        words, sent = text_feats
        enc = build_image_encoder(cfg, base_width=8)
        img = batch["images"][0]
        params = enc.init(jax.random.PRNGKey(0), img)
        regions, global_f = enc.apply(params, img)
        total, aux = damsm_loss(regions, global_f, words, sent,
                                batch["cap_lens"], batch["class_ids"],
                                cfg.TRAIN.SMOOTH)
        assert bool(jnp.isfinite(total))
        assert set(aux) == {"w_loss0", "w_loss1", "s_loss0", "s_loss1"}


class TestGeneratorVariants:
    def _run(self, cfg, batch, words, sent):
        g = GNet(cfg)
        b = batch["captions"].shape[0]
        z = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.GAN.Z_DIM))
        labels_emb = jax.random.normal(
            jax.random.PRNGKey(2), (b, cfg.OBJ.MAX_OBJECTS, cfg.OBJ.LABEL_DIM)
        )
        word_mask = jnp.arange(words.shape[1])[None] >= batch["cap_lens"][:, None]
        variables = g.init(
            {"params": jax.random.PRNGKey(3)}, z, sent, words, word_mask,
            labels_emb, batch["boxes"], batch["shapes"], batch["obj_valid"],
            jax.random.PRNGKey(4),
        )
        return g.apply(
            variables, z, sent, words, word_mask, labels_emb, batch["boxes"],
            batch["shapes"], batch["obj_valid"], jax.random.PRNGKey(4),
        )

    def test_subpixel_upsampling(self, tiny_cfg, batch, text_feats):
        cfg = _fp32(tiny_cfg).merged({"GAN": {"UP_MODE": "subpixel"}})
        words, sent = text_feats
        out = self._run(cfg, batch, words, sent)
        for img, s in zip(out["images"], cfg.branch_sizes):
            assert img.shape == (batch["captions"].shape[0], s, s, 3)
            assert bool(jnp.all(jnp.isfinite(img)))

    def test_two_branch_pyramid(self, tiny_cfg, text_feats):
        from objgan_tpu.data.synthetic import synthetic_batch

        cfg = _fp32(tiny_cfg).merged({"TREE": {"BRANCH_NUM": 2}})
        batch = synthetic_batch(cfg, jax.random.PRNGKey(21))
        words, sent = text_feats
        out = self._run(cfg, batch, words, sent)
        assert len(out["images"]) == 2
        assert out["images"][-1].shape[1] == cfg.branch_sizes[-1]
