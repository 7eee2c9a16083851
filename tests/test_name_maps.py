"""Lineage ``.pth`` → flax name-map tests against synthetic torch state
dicts built with the installed CPU torch (SURVEY.md §5 "Checkpoint/resume":
checkpoint-compatible layouts; §7 hard part #5 gate ordering/transposes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objgan_tpu.core.checkpoint import (
    apply_converted,
    convert_torch_state_dict,
)
from objgan_tpu.core.name_maps import (
    bilstm_name_map,
    cnn_encoder_name_map,
    load_cnn_encoder_checkpoint,
    load_rnn_encoder_checkpoint,
    rnn_encoder_name_map,
)


class TestConverterRules:
    def test_lstm_weights_transposed_bias_pair_summed(self):
        import torch

        h, d = 4, 6
        sd = {
            "rnn.weight_ih_l0": torch.randn(4 * h, d),
            "rnn.weight_hh_l0": torch.randn(4 * h, h),
            "rnn.bias_ih_l0": torch.arange(4 * h, dtype=torch.float32),
            "rnn.bias_hh_l0": torch.ones(4 * h),
        }
        m = {k: v for k, v in bilstm_name_map("rnn.", "").items()
             if not k.endswith("_reverse")}
        out = convert_torch_state_dict(sd, m)
        assert out["fwd_w_ih"].shape == (d, 4 * h)
        assert out["fwd_w_hh"].shape == (h, 4 * h)
        np.testing.assert_allclose(
            out["fwd_b"], np.arange(4 * h, dtype=np.float32) + 1.0)

    def test_non_bias_duplicate_target_raises(self):
        sd = {"a.weight": np.zeros((2, 2)), "b.weight": np.zeros((2, 2))}
        with pytest.raises(ValueError, match="map to flax path"):
            convert_torch_state_dict(sd, {"a.weight": "x", "b.weight": "x"})

    def test_embedding_not_transposed(self):
        sd = {"encoder.weight": np.zeros((30, 8), np.float32)}
        out = convert_torch_state_dict(
            sd, {"encoder.weight": "embedding/embedding"})
        assert out["embedding/embedding"].shape == (30, 8)


class TestRNNEncoder:
    def test_lineage_checkpoint_numerical_equivalence(self):
        """text_encoder.pth-shaped state dict → RNNEncoder must reproduce
        torch Embedding+bi-LSTM (pack_padded semantics) bit-nearly."""
        import torch

        from objgan_tpu.models.damsm import RNNEncoder

        torch.manual_seed(0)
        vocab, d, h, b, t = 30, 8, 4, 3, 5
        emb = torch.nn.Embedding(vocab, d)
        lstm = torch.nn.LSTM(d, h, batch_first=True, bidirectional=True)
        sd = {"encoder." + k: v for k, v in emb.state_dict().items()}
        sd.update({"rnn." + k: v for k, v in lstm.state_dict().items()})

        caps = np.array([[3, 5, 7, 2, 9], [4, 4, 1, 0, 0], [8, 0, 0, 0, 0]],
                        np.int32)
        lens = np.array([5, 3, 1], np.int32)

        with torch.no_grad():
            x = emb(torch.from_numpy(caps).long())
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                x, torch.from_numpy(lens).long(), batch_first=True,
                enforce_sorted=False)
            out, (hn, _) = lstm(packed)
            out, _ = torch.nn.utils.rnn.pad_packed_sequence(
                out, batch_first=True, total_length=t)
            t_words = out.numpy()                       # (B, T, 2H)
            t_sent = torch.cat([hn[0], hn[1]], -1).numpy()  # (B, 2H)

        model = RNNEncoder(vocab_size=vocab, embed_dim=d, hidden_dim=h)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(caps),
                            jnp.asarray(lens))
        restored = load_rnn_encoder_checkpoint(params, sd)
        words, sent = model.apply(restored, jnp.asarray(caps),
                                  jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(words), t_words, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sent), t_sent, atol=1e-5)

    def test_map_covers_exact_torch_inventory(self):
        import torch

        emb = torch.nn.Embedding(5, 4)
        lstm = torch.nn.LSTM(4, 2, batch_first=True, bidirectional=True)
        sd = {"encoder." + k: v for k, v in emb.state_dict().items()}
        sd.update({"rnn." + k: v for k, v in lstm.state_dict().items()})
        assert set(sd) == set(rnn_encoder_name_map())


def _flat_paths(params):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        out["/".join(k for k in keys if k != "params")] = leaf
    return out


def _lineage_tensor(tname, flax_shape):
    """Torch-layout tensor for a lineage param, inverted from the flax
    target shape (values = arange so loads are checkable)."""
    import torch

    if tname.endswith("conv_context.weight"):  # 1x1 conv onto Dense target
        d, c = flax_shape
        return torch.arange(d * c, dtype=torch.float32).reshape(c, d, 1, 1)
    if len(flax_shape) == 4:
        h, w, i, o = flax_shape
        t = torch.arange(h * w * i * o, dtype=torch.float32)
        return t.reshape(h, w, i, o).permute(3, 2, 0, 1).contiguous()
    if len(flax_shape) == 2:
        i, o = flax_shape
        return torch.arange(i * o, dtype=torch.float32).reshape(i, o).T \
            .contiguous()
    return torch.arange(int(np.prod(flax_shape)), dtype=torch.float32) \
        .reshape(flax_shape)


class TestGDNetPartialLoad:
    def test_g_net_partial_load(self, tiny_cfg, rng):
        import torch

        from objgan_tpu.core.name_maps import (
            g_net_name_map, load_lineage_partial,
        )
        from objgan_tpu.data.synthetic import synthetic_batch
        from objgan_tpu.train.gan import GanTrainer

        cfg = tiny_cfg.replace(DTYPE="float32")
        batch = synthetic_batch(cfg, rng, 2)
        state = GanTrainer(cfg).init_state(rng, batch)
        params = state.g_params
        flat = _flat_paths(params)
        name_map = g_net_name_map(cfg)
        # every mapped target except the layout-widened first up-block must
        # exist in the tree
        missing = [t for t in name_map.values()
                   if t not in flat and "up0" not in t]
        assert missing == []

        sd = {}
        for tname, target in name_map.items():
            if target in flat:
                sd[tname] = _lineage_tensor(tname, flat[target].shape)
        # the lineage's first up-block has NO layout channels: 3 fewer
        # in-channels than ours -> must be skipped by shape, not crash
        k = flat["init_stage/up1/conv/kernel"].shape
        sd["h_net1.upsample1.1.weight"] = torch.zeros(k[3], 4, k[0], k[1])
        # BatchNorm entries skip silently; unknown names are reported
        sd["h_net1.upsample1.2.weight"] = torch.zeros(4)
        sd["h_net1.upsample1.2.running_mean"] = torch.zeros(4)
        sd["h_net1.upsample1.2.running_var"] = torch.ones(4)
        sd["some_objgan_extra.weight"] = torch.zeros(3, 3)

        loaded_params, report = load_lineage_partial(params, sd, name_map)
        assert "ca_net.fc.weight" in report["loaded"]
        assert any("conv_context" in n for n in report["loaded"])
        assert any("img_net1" in n for n in report["loaded"])
        assert "h_net1.upsample1.1.weight" in report["skipped_shape"]
        assert "h_net1.upsample1.2.running_mean" in report["skipped_bn"]
        assert "some_objgan_extra.weight" in report["unmapped"]
        got = _flat_paths(loaded_params)["ca_net/fc/kernel"]
        want = np.asarray(sd["ca_net.fc.weight"].numpy().T)
        np.testing.assert_array_equal(np.asarray(got), want)
        # 1x1 conv squeezed onto the Dense word projection
        wp = _flat_paths(loaded_params)["attn_stage1/word_proj/kernel"]
        np.testing.assert_array_equal(
            np.asarray(wp),
            sd["h_net2.att.conv_context.weight"].numpy()[:, :, 0, 0].T)

    def test_d_net_partial_load(self, tiny_cfg, rng):
        from objgan_tpu.core.name_maps import (
            d_net_name_map, load_lineage_partial,
        )
        from objgan_tpu.models.discriminator import DNet

        cfg = tiny_cfg.replace(DTYPE="float32")
        size = 64
        d = DNet(cfg.GAN.DF_DIM, size)
        img = jnp.zeros((2, size, size, 3))
        sent = jnp.zeros((2, cfg.TEXT.EMBEDDING_DIM))
        lay = jnp.zeros((2, size, size, 1))
        params = d.init(jax.random.PRNGKey(0), img, sent, lay)
        flat = _flat_paths(params)
        name_map = d_net_name_map(cfg, size)
        sd = {}
        for tname, target in name_map.items():
            if target in flat:
                sd[tname] = _lineage_tensor(tname, flat[target].shape)
        # lineage first conv has 3 input channels (no layout canvas)
        k = flat["down_blocks_0/Conv_0/kernel"].shape
        import torch

        sd["img_code_s16.0.weight"] = torch.zeros(k[3], 3, k[0], k[1])
        loaded, report = load_lineage_partial(params, sd, name_map)
        # the first trunk conv is deliberately NOT in the map (its input
        # gains the layout-canvas channels here): it must surface as
        # unmapped, not as permanent skipped_shape noise
        assert "img_code_s16.0.weight" in report["unmapped"]
        assert "img_code_s16.0.weight" not in report["skipped_shape"]
        assert "img_code_s16.2.weight" in report["loaded"]
        assert "COND_DNET.outlogits.0.bias" in report["loaded"]
        got = _flat_paths(loaded)["uncond_logits/kernel"]
        np.testing.assert_array_equal(
            np.asarray(got),
            sd["UNCOND_DNET.outlogits.0.weight"].numpy()
            .transpose(2, 3, 1, 0))


class TestCNNEncoder:
    def test_lineage_checkpoint_roundtrip(self):
        """image_encoder.pth-shaped state dict (inception submodules hoisted
        to top level + emb projections) loads into InceptionEncoder and
        reproduces the source params' outputs."""
        import torch

        from objgan_tpu.models.inception_v3 import InceptionEncoder

        model = InceptionEncoder(embed_dim=16)
        x0 = jnp.zeros((1, 299, 299, 3))
        params = model.init(jax.random.PRNGKey(0), x0)

        # invert the flax tree into the lineage's torch naming
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        sd = {}
        for path, leaf in flat:
            keys = [getattr(p, "key", getattr(p, "name", str(p)))
                    for p in path]
            keys = [k for k in keys if k != "params"]
            if keys[0] == "backbone":
                keys = keys[1:]
            arr = np.asarray(leaf)
            scope, leafname = keys[:-1], keys[-1]
            if leafname == "kernel" and arr.ndim == 4:
                # flax conv scope may itself be the module ("emb_features")
                tname = ".".join(scope) + ".weight"
                sd[tname] = torch.from_numpy(arr.transpose(3, 2, 0, 1).copy())
            elif leafname == "kernel":
                sd[".".join(scope) + ".weight"] = torch.from_numpy(
                    arr.T.copy())
            elif leafname == "bias":
                sd[".".join(scope) + ".bias"] = torch.from_numpy(arr.copy())
            elif leafname.startswith("bn_"):
                tleaf = {"bn_scale": "bn.weight", "bn_bias": "bn.bias",
                         "bn_mean": "bn.running_mean",
                         "bn_var": "bn.running_var"}[leafname]
                sd[".".join(scope) + "." + tleaf] = torch.from_numpy(
                    arr.copy())
            else:
                raise AssertionError(leafname)
        # name map covers the full inventory
        assert set(cnn_encoder_name_map(list(sd))) == set(sd)

        other = model.init(jax.random.PRNGKey(42), x0)
        restored = load_cnn_encoder_checkpoint(other, sd)
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, 299, 299, 3),
                               minval=-1, maxval=1)
        ra, ga = model.apply(params, x)
        rb, gb = model.apply(restored, x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb), atol=1e-4)


class TestConvertDamsmCli:
    def test_text_encoder_pth_to_net_e_checkpoint(self, tiny_cfg, tmp_path):
        """tools/convert_damsm: a lineage text_encoder.pth becomes an Orbax
        DamsmTrainState checkpoint whose text params equal the torch ones."""
        import torch

        from objgan_tpu.core import checkpoint as ckpt
        from objgan_tpu.tools.convert_damsm import convert
        from objgan_tpu.train.damsm import DamsmTrainer

        torch.manual_seed(1)
        emb = torch.nn.Embedding(30, 8)
        lstm = torch.nn.LSTM(8, 4, batch_first=True, bidirectional=True)
        sd = {"encoder." + k: v for k, v in emb.state_dict().items()}
        sd.update({"rnn." + k: v for k, v in lstm.state_dict().items()})
        pth = str(tmp_path / "text_encoder.pth")
        torch.save(sd, pth)

        out = str(tmp_path / "net_e")
        state = convert(tiny_cfg, pth, None, out)

        # dims were taken from the checkpoint, not the cfg
        got = np.asarray(
            state.text_params["params"]["embedding"]["embedding"])
        np.testing.assert_allclose(got, emb.weight.detach().numpy(),
                                   atol=1e-6)
        # and the saved checkpoint restores onto a fresh state
        cfg2 = tiny_cfg.merged({"TEXT": {
            "VOCAB_SIZE": 30, "GLOVE_DIM": 8, "HIDDEN_DIM": 4,
            "EMBEDDING_DIM": 8}})
        from objgan_tpu.data.synthetic import synthetic_batch

        batch = synthetic_batch(cfg2, jax.random.PRNGKey(0), 2)
        batch["images"] = [batch["images"][-1]]
        fresh = DamsmTrainer(cfg2).init_state(jax.random.PRNGKey(1), batch)
        restored = ckpt.restore_latest(ckpt.make_manager(out), fresh)
        assert restored is not None
        got2 = np.asarray(
            restored.text_params["params"]["embedding"]["embedding"])
        np.testing.assert_allclose(got2, emb.weight.detach().numpy(),
                                   atol=1e-6)

    def test_g_net_pth_to_net_g_checkpoint(self, tiny_cfg, tmp_path):
        """tools/convert_gan: a lineage netG .pth loads into a GanTrainState
        checkpoint (partial, report printed), EMA seeded with the weights."""
        import torch

        from objgan_tpu.core.name_maps import g_net_name_map
        from objgan_tpu.tools.convert_gan import convert
        from objgan_tpu.train.gan import GanTrainer

        cfg = tiny_cfg
        trainer = GanTrainer(cfg)
        from objgan_tpu.data.synthetic import synthetic_batch

        base = trainer.init_state(
            jax.random.PRNGKey(0), synthetic_batch(cfg, jax.random.PRNGKey(0), 2))
        flat = _flat_paths(base.g_params)
        nm = g_net_name_map(cfg)
        sd = {t: _lineage_tensor(t, tuple(flat[f].shape))
              for t, f in nm.items() if f in flat}
        assert sd, "name map covered nothing in the tiny config"
        pth = str(tmp_path / "netG.pth")
        torch.save(sd, pth)

        out = str(tmp_path / "net_g")
        state = convert(cfg, pth, [], out)
        got = _flat_paths(state.g_params)
        ema = _flat_paths(state.ema_g_params)
        t0, f0 = next((t, f) for t, f in nm.items() if f in flat)
        from objgan_tpu.core.checkpoint import _to_flax_array

        want = _to_flax_array(t0, sd[t0].numpy(), target=f0)
        if want.ndim == 4 and want.shape[:2] == (1, 1):
            want = want.reshape(want.shape[2:])
        np.testing.assert_allclose(np.asarray(got[f0]), want, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ema[f0]), want, atol=1e-6)

    def test_d_net_pths_to_checkpoint(self, tiny_cfg, tmp_path):
        """tools/convert_gan --d_pth per scale loads each DNet partially."""
        import torch

        from objgan_tpu.core.name_maps import d_net_name_map
        from objgan_tpu.data.synthetic import synthetic_batch
        from objgan_tpu.tools.convert_gan import convert
        from objgan_tpu.train.gan import GanTrainer

        cfg = tiny_cfg
        trainer = GanTrainer(cfg)
        base = trainer.init_state(
            jax.random.PRNGKey(0),
            synthetic_batch(cfg, jax.random.PRNGKey(0), 2))
        pths = []
        sizes = cfg.branch_sizes
        for params, size in zip(base.d_params, sizes):
            flat = _flat_paths(params)
            nm = d_net_name_map(cfg, size)
            sd = {t: _lineage_tensor(t, tuple(flat[f].shape))
                  for t, f in nm.items() if f in flat}
            assert sd
            p = str(tmp_path / f"netD{size}.pth")
            torch.save(sd, p)
            pths.append(p)

        state = convert(cfg, None, pths, str(tmp_path / "net_g"))
        for params, size, pth in zip(state.d_params, sizes, pths):
            flat = _flat_paths(params)
            nm = d_net_name_map(cfg, size)
            t0, f0 = next((t, f) for t, f in nm.items() if f in flat)
            sd = torch.load(pth, weights_only=False)
            from objgan_tpu.core.checkpoint import _to_flax_array

            want = _to_flax_array(t0, sd[t0].numpy(), target=f0)
            if want.ndim == 4 and want.shape[:2] == (1, 1):
                want = want.reshape(want.shape[2:])
            np.testing.assert_allclose(np.asarray(flat[f0]), want, atol=1e-6)
