"""Checkpoint EXPORT direction (core/checkpoint.py:export_torch_state_dict,
tools/export_damsm.py): trained flax encoders → lineage ``.pth`` state
dicts consumable by reference/PyTorch tooling. The import direction is
covered by tests/test_name_maps.py; here we prove the inverse — including
the strongest form, loading an export into real torch modules with
``strict=True`` and matching forward numerics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objgan_tpu.core.name_maps import (
    cnn_encoder_export_name_map, export_cnn_encoder, export_rnn_encoder,
    load_cnn_encoder_checkpoint, load_rnn_encoder_checkpoint,
)


def _tree_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestRNNEncoderExport:
    def _params(self, vocab=30, d=8, h=4):
        from objgan_tpu.models.damsm import RNNEncoder

        model = RNNEncoder(vocab_size=vocab, embed_dim=d, hidden_dim=h)
        caps = jnp.zeros((2, 5), jnp.int32)
        lens = jnp.ones((2,), jnp.int32)
        return model, model.init(jax.random.PRNGKey(1), caps, lens)

    def test_torch_strict_load_and_forward_equivalence(self):
        """An exported text_encoder.pth must load into torch
        Embedding+bi-LSTM with strict=True and reproduce our forward."""
        import torch

        vocab, d, h, t = 30, 8, 4, 5
        model, params = self._params(vocab, d, h)
        sd = {k: torch.from_numpy(np.asarray(v))
              for k, v in export_rnn_encoder(params).items()}

        emb = torch.nn.Embedding(vocab, d)
        lstm = torch.nn.LSTM(d, h, batch_first=True, bidirectional=True)
        emb.load_state_dict({"weight": sd["encoder.weight"]}, strict=True)
        lstm.load_state_dict(
            {k[len("rnn."):]: v for k, v in sd.items()
             if k.startswith("rnn.")}, strict=True)

        caps = np.array([[3, 5, 7, 2, 9], [4, 4, 1, 0, 0]], np.int32)
        lens = np.array([5, 3], np.int32)
        with torch.no_grad():
            x = emb(torch.from_numpy(caps).long())
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                x, torch.from_numpy(lens).long(), batch_first=True,
                enforce_sorted=False)
            out, (hn, _) = lstm(packed)
            out, _ = torch.nn.utils.rnn.pad_packed_sequence(
                out, batch_first=True, total_length=t)
            t_words = out.numpy()
            t_sent = torch.cat([hn[0], hn[1]], -1).numpy()

        words, sent = model.apply(params, jnp.asarray(caps),
                                  jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(words), t_words, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sent), t_sent, atol=1e-5)

    def test_roundtrip_through_import(self):
        """export → load_rnn_encoder_checkpoint restores the exact tree
        (the bias_ih=b / bias_hh=0 split re-sums to b)."""
        _, params = self._params()
        _, other = self._params()  # different init values

        # different init shares the structure but not the values
        restored = load_rnn_encoder_checkpoint(
            jax.tree.map(lambda x: x, other), export_rnn_encoder(params))
        _tree_equal(restored, params)


class TestCNNEncoderExport:
    @pytest.fixture(scope="class")
    def enc_params(self):
        from objgan_tpu.models.inception_v3 import InceptionEncoder

        model = InceptionEncoder(embed_dim=16)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 299, 299, 3)))
        return model, params

    def test_inventory_matches_lineage_layout(self, enc_params):
        _, params = enc_params
        sd = export_cnn_encoder(params)
        # lineage CNN_ENCODER: torchvision feature modules + 2 projections,
        # no classifier head, no aux tower
        assert not any(k.startswith("fc.") or ".fc." in k for k in sd)
        assert not any(k.startswith("AuxLogits") for k in sd)
        assert {"emb_features.weight", "emb_cnn_code.weight",
                "emb_cnn_code.bias"} <= set(sd)
        # 94 backbone convs (torchvision inception_v3 inventory, matching
        # tests/test_inception.py) + the 1x1 emb_features projection
        n_convs = sum(1 for k, v in sd.items()
                      if k.endswith(".weight") and v.ndim == 4)
        assert n_convs == 95
        # every BN carries re-emitted num_batches_tracked for strict loads
        means = [k for k in sd if k.endswith(".running_mean")]
        assert means
        for k in means:
            tracked = k[: -len("running_mean")] + "num_batches_tracked"
            assert sd[tracked].dtype == np.int64

    def test_roundtrip_through_import(self, enc_params):
        model, params = enc_params
        sd = export_cnn_encoder(params)
        # torch-layout shapes: conv OIHW, Linear (out, in)
        assert sd["Conv2d_1a_3x3.conv.weight"].shape == (32, 3, 3, 3)
        assert sd["emb_cnn_code.weight"].shape == (16, 2048)
        other = model.init(jax.random.PRNGKey(9),
                           jnp.zeros((1, 299, 299, 3)))
        restored = load_cnn_encoder_checkpoint(other, sd)
        # everything except the backbone fc (not part of the lineage state
        # dict) must round-trip exactly
        exported_paths = set(cnn_encoder_export_name_map(params).values())
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = {tuple(p): l
                  for p, l in jax.tree_util.tree_flatten_with_path(
                      restored)[0]}
        checked = 0
        for path, leaf in flat_a:
            keys = [str(getattr(p, "key", getattr(p, "name", p)))
                    for p in path]
            fpath = "/".join(k for k in keys if k != "params")
            if fpath in exported_paths:
                np.testing.assert_array_equal(
                    np.asarray(flat_b[tuple(path)]), np.asarray(leaf))
                checked += 1
        assert checked == len(exported_paths)


class TestExportDamsmCli:
    def test_text_export_and_full_circle(self, tiny_cfg, tmp_path):
        """pretrained-state → export_damsm → convert_damsm → identical
        text params: the interop loop closes."""
        import torch

        from objgan_tpu.core import checkpoint as ckpt
        from objgan_tpu.data.synthetic import synthetic_batch
        from objgan_tpu.tools import convert_damsm, export_damsm
        from objgan_tpu.train.damsm import DamsmTrainer

        rng = jax.random.PRNGKey(3)
        trainer = DamsmTrainer(tiny_cfg)
        batch = synthetic_batch(tiny_cfg, rng, 2)
        batch["images"] = [batch["images"][-1]]
        # production loops keep the in-state step synced with the Orbax
        # step label; mirror that
        state = trainer.init_state(rng, batch)
        state = state.replace(step=state.step + 7)
        ckpt_dir = str(tmp_path / "ckpt")
        manager = ckpt.make_manager(ckpt_dir)
        ckpt.save(manager, 7, state)
        manager.wait_until_finished()

        text_pth = str(tmp_path / "text_encoder.pth")
        restored = export_damsm.export(tiny_cfg, ckpt_dir, text_pth)
        assert int(restored.step) == 7

        # plain-tensor state dict: loads under the safe loader
        sd = torch.load(text_pth, map_location="cpu", weights_only=True)
        assert "encoder.weight" in sd and "rnn.weight_ih_l0_reverse" in sd

        # full circle: the lineage .pth converts back into a NET_E
        # checkpoint whose text params equal the exported state's
        out2 = str(tmp_path / "net_e")
        state2 = convert_damsm.convert(tiny_cfg, text_pth, None, out2)
        _tree_equal(state2.text_params, restored.text_params)

    def test_image_export_refused_for_lite_backbone(self, tiny_cfg,
                                                    tmp_path):
        from objgan_tpu.tools import export_damsm

        with pytest.raises(SystemExit, match="InceptionLite"):
            export_damsm.export(tiny_cfg, str(tmp_path / "none"),
                                str(tmp_path / "t.pth"),
                                str(tmp_path / "i.pth"))
