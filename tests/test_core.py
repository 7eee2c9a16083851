"""Config / checkpoint / metrics / data-layer unit tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objgan_tpu.core.config import Config, cfg_from_dict, cfg_from_file
from objgan_tpu.data.glove import coco_label_table, vocab_table
from objgan_tpu.data.pipeline import CocoFeed, _numpy_polygon_fill
from objgan_tpu.data.tokenizer import Vocab, tokenize


class TestConfig:
    def test_defaults_and_branch_sizes(self):
        cfg = Config()
        assert cfg.branch_sizes == (64, 128, 256)

    def test_merge_reference_keys(self):
        cfg = cfg_from_dict(
            {"TRAIN": {"BATCH_SIZE": 24, "FLAG": False},
             "GAN": {"DF_DIM": 96}, "TREE": {"BRANCH_NUM": 2}}
        )
        assert cfg.TRAIN.BATCH_SIZE == 24
        assert not cfg.TRAIN.FLAG
        assert cfg.GAN.DF_DIM == 96
        assert cfg.branch_sizes == (64, 128)

    def test_unknown_key_rejected(self):
        with pytest.raises(KeyError):
            cfg_from_dict({"TRAIN": {"NOT_A_KEY": 1}})

    def test_yml_roundtrip(self, tmp_path):
        p = tmp_path / "cfg.yml"
        p.write_text(
            "CONFIG_NAME: 'coco_objgan'\n"
            "TRAIN:\n  BATCH_SIZE: 14\n  SMOOTH:\n    GAMMA1: 4.0\n"
            "TEXT:\n  WORDS_NUM: 12\n"
        )
        cfg = cfg_from_file(str(p))
        assert cfg.CONFIG_NAME == "coco_objgan"
        assert cfg.TRAIN.BATCH_SIZE == 14
        assert cfg.TEXT.WORDS_NUM == 12

    def test_hashable_for_jit(self):
        hash(Config())  # frozen dataclass tree must be hashable


class TestTokenizer:
    def test_tokenize_matches_lineage_regex(self):
        assert tokenize("A man, riding; a horse!") == [
            "a", "man", "riding", "a", "horse"]

    def test_vocab_roundtrip(self):
        v = Vocab.build(["a man rides", "a horse runs"])
        ids, n = v.encode("a horse rides", 6)
        assert n == 3 and ids.shape == (6,)
        assert v.decode(ids) == "a horse rides"
        assert ids[3:].sum() == 0  # padding

    def test_batch_encode(self):
        v = Vocab.build(["one two three"])
        caps, lens = v.encode_batch(["one", "two three"], 4)
        assert caps.shape == (2, 4)
        assert list(lens) == [1, 2]

    def test_oov_maps_to_unk(self):
        v = Vocab.build(["a red ball"])
        assert v.unk == 1 and v.ixtoword[1] == "<unk>"
        ids, n = v.encode("a cerulean ball", 6)
        assert n == 3
        assert list(ids[:3]) == [v.wordtoix["a"], v.unk, v.wordtoix["ball"]]

    def test_mostly_oov_caption_warns(self):
        import warnings as _w

        v = Vocab.build(["a red ball"])
        with _w.catch_warnings(record=True) as got:
            _w.simplefilter("always")
            v.encode("zork quux flibber", 6)
        assert any("out-of-vocabulary" in str(w.message) for w in got)

    def test_no_unk_vocab_drops_with_warning(self):
        import warnings as _w

        # reference pickles predate <unk>: historical drop behavior
        v = Vocab({"<end>": 0, "a": 1, "ball": 2})
        assert v.unk is None
        with _w.catch_warnings(record=True) as got:
            _w.simplefilter("always")
            ids, n = v.encode("a cerulean ball", 6)
        assert n == 2 and list(ids[:2]) == [1, 2]
        assert any("DROPPED" in str(w.message) for w in got)


class TestGlove:
    def test_label_table_shape_and_background_zero(self):
        t = coco_label_table(16)
        assert t.shape == (81, 16)
        assert np.abs(t[0]).max() == 0.0
        assert np.abs(t[1]).max() > 0.0  # person row populated

    def test_deterministic(self):
        a = vocab_table(["pad", "cat", "dog"], 8)
        b = vocab_table(["pad", "cat", "dog"], 8)
        np.testing.assert_array_equal(a, b)


class TestNativeRasterizer:
    def test_matches_numpy_fill(self):
        from objgan_tpu.native import rasterize_polygon, rasterize_polygons

        rng = np.random.default_rng(0)
        for _ in range(5):
            k = rng.integers(3, 9)
            poly = rng.uniform(0.05, 0.95, (k, 2))
            a = rasterize_polygon(poly, 24)
            b = _numpy_polygon_fill(poly, 24)
            np.testing.assert_array_equal(a, b)
        polys = [rng.uniform(0, 1, (5, 2)) for _ in range(3)]
        batched = rasterize_polygons(polys, 16)
        for i, p in enumerate(polys):
            np.testing.assert_array_equal(batched[i], rasterize_polygon(p, 16))


class TestCocoFeed:
    def _records(self, n=4):
        rng = np.random.default_rng(1)
        recs = []
        for i in range(n):
            k = int(rng.integers(1, 4))
            recs.append({
                "captions": [f"a cat number {i}", f"another cat {i}"],
                # within the tiny config's NUM_CLASSES (the feed rejects
                # out-of-range class ids loudly)
                "labels": rng.integers(1, 7, k).tolist(),
                "boxes": rng.uniform(0.1, 0.4, (k, 4)).tolist(),
                "polygons": [rng.uniform(0, 1, (6, 2)) for _ in range(k)],
                "image": rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
            })
        return recs

    def test_batch_shapes(self, tiny_cfg):
        vocab = Vocab.build(["a cat number another"])
        feed = CocoFeed(tiny_cfg, self._records(), vocab)
        batch = next(iter(feed))
        b = tiny_cfg.TRAIN.BATCH_SIZE
        o = tiny_cfg.OBJ.MAX_OBJECTS
        s = tiny_cfg.OBJ.SHAPE_SIZE
        assert batch["captions"].shape == (b, tiny_cfg.TEXT.WORDS_NUM)
        assert batch["boxes"].shape == (b, o, 4)
        assert batch["shapes"].shape == (b, o, s, s)
        assert batch["obj_valid"].shape == (b, o)
        assert len(batch["images"]) == tiny_cfg.TREE.BRANCH_NUM
        assert batch["images"][0].dtype == np.float32
        assert batch["images"][0].min() >= -1.0
        # padded objects have empty masks
        inv = batch["obj_valid"] == 0
        assert batch["shapes"][inv].sum() == 0.0

    def test_negative_labels_rejected(self, tiny_cfg):
        recs = self._records()
        recs[0]["labels"][0] = -1
        vocab = Vocab.build(["a cat number another"])
        with pytest.raises(ValueError, match="-1"):
            CocoFeed(tiny_cfg, recs, vocab)

    def test_word_dropout_hits_unk(self, tiny_cfg):
        cfg = tiny_cfg.merged({"TEXT": {"WORD_DROPOUT": 1.0}})
        # digits appear in the record captions — include them so the only
        # <unk> source is dropout
        vocab = Vocab.build(["a cat number another 0 1 2 3"])
        feed = CocoFeed(cfg, self._records(), vocab, augment=True)
        batch = next(iter(feed))
        lens = batch["cap_lens"]
        for i in range(len(lens)):
            assert (batch["captions"][i, :lens[i]] == vocab.unk).all()
        # and augment=False never drops
        feed2 = CocoFeed(cfg, self._records(), vocab, augment=False)
        b2 = next(iter(feed2))
        assert not (b2["captions"] == vocab.unk).any()

    def test_inline_image_precedence_over_file(self, tiny_cfg, tmp_path):
        # a record carrying BOTH 'image' and 'image_file' must serve the
        # inline array (documented _load_image order) — the PIL fast path
        # must not silently win (ADVICE r2)
        from PIL import Image

        recs = self._records(2)
        # white on-disk file vs black inline image: output must be black
        Image.new("RGB", (64, 64), (255, 255, 255)).save(
            str(tmp_path / "w.png"))
        for r in recs:
            r["image"] = np.zeros((64, 64, 3), np.uint8)
            r["image_file"] = "w.png"
        vocab = Vocab.build(["a cat number another"])
        feed = CocoFeed(tiny_cfg, recs, vocab, image_root=str(tmp_path),
                        augment=False)
        batch = next(iter(feed))
        assert batch["images"][-1].max() <= -0.99  # black, i.e. inline won


class TestSyntheticFeed:
    def test_class_ids_globally_unique_via_id_offset(self, tiny_cfg):
        """Multi-host synthetic feeds must offset class_ids by their global
        batch-slice start (cli._feed): two hosts both emitting 0..b-1 would
        collide in DAMSM's duplicate mask and silently delete every
        cross-host negative from the contrastive losses."""
        from objgan_tpu.data.synthetic import synthetic_batch

        b0 = synthetic_batch(tiny_cfg, jax.random.PRNGKey(0), 4,
                             with_images=False)
        b1 = synthetic_batch(tiny_cfg, jax.random.PRNGKey(1), 4,
                             with_images=False, id_offset=4)
        ids = np.concatenate([np.asarray(b0["class_ids"]),
                              np.asarray(b1["class_ids"])])
        assert len(set(ids.tolist())) == 8


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path, tiny_cfg):
        from objgan_tpu.core import checkpoint as ckpt
        from objgan_tpu.data.synthetic import synthetic_batch
        from objgan_tpu.train.box import BoxTrainer

        tr = BoxTrainer(tiny_cfg)
        batch = synthetic_batch(tiny_cfg, jax.random.PRNGKey(0),
                                with_images=False)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        mgr = ckpt.make_manager(str(tmp_path / "ck"), max_to_keep=2)
        ckpt.save(mgr, 1, state)
        ckpt.wait(mgr)
        restored = ckpt.restore_latest(mgr, state)
        assert restored is not None
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_torch_conversion_layouts(self):
        import torch

        from objgan_tpu.core.checkpoint import convert_torch_state_dict

        sd = {
            "fc.weight": torch.arange(6.0).reshape(2, 3),
            "conv.weight": torch.arange(24.0).reshape(2, 3, 2, 2),
            "fc.bias": torch.zeros(2),
        }
        out = convert_torch_state_dict(sd, {
            "fc.weight": "dense/kernel",
            "conv.weight": "conv/kernel",
            "fc.bias": "dense/bias",
        })
        assert out["dense/kernel"].shape == (3, 2)
        assert out["conv/kernel"].shape == (2, 2, 3, 2)


class TestVisualize:
    def test_super_image_grid_and_png(self, tmp_path):
        from objgan_tpu.utils.visualize import build_super_images, save_png

        imgs = np.random.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        attn = np.random.uniform(0, 1, (2, 8, 8, 5)).astype(np.float32)
        grid = build_super_images(imgs, attn, cap_lens=np.array([3, 5]),
                                  max_words=4)
        assert grid.dtype == np.uint8
        assert grid.shape == (32, 16 * 5, 3)
        p = str(tmp_path / "grid.png")
        save_png(p, grid)
        assert os.path.getsize(p) > 100

    def test_caption_words_rendered(self):
        """With captions given, each row gains a text strip with the
        attended word rendered under its overlay (lineage behavior)."""
        from objgan_tpu.utils.visualize import (
            TEXT_STRIP_HEIGHT, build_super_images,
        )

        imgs = np.random.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
        attn = np.random.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        caps = np.array([[5, 9, 2]])
        grid = build_super_images(
            imgs, attn, captions=caps, cap_lens=np.array([2]), max_words=3,
            ixtoword={5: "cat", 9: "dog"},
        )
        assert grid.shape == (16 + TEXT_STRIP_HEIGHT, 16 * 4, 3)
        strip = grid[16:, 16:32]  # strip under the first word overlay
        assert strip.max() > 0  # "cat" actually drawn
        # padded word (index 2 >= cap_len) stays blank
        assert grid[16:, 48:].max() == 0

    def test_object_attention_grid(self):
        """Object-attention diagnostic: valid boxes drawn, invalid skipped,
        per-object strips labeled with class + top attended word."""
        from objgan_tpu.utils.visualize import (
            TEXT_STRIP_HEIGHT, build_object_images,
        )

        imgs = np.full((2, 32, 32, 3), -1.0, np.float32)  # black canvas
        boxes = np.zeros((2, 3, 4), np.float32)
        boxes[0, 0] = [0.25, 0.25, 0.5, 0.5]
        boxes[0, 1] = [0.0, 0.0, 0.25, 0.25]
        labels = np.array([[1, 2, 0], [0, 0, 0]])
        valid = np.array([[True, True, False], [False, False, False]])
        attn = np.random.uniform(0, 1, (2, 3, 4)).astype(np.float32)
        attn[0, 0] = [0.1, 0.8, 0.05, 0.05]  # top word = index 1
        caps = np.array([[7, 9, 3, 4], [7, 9, 3, 4]])
        grid = build_object_images(
            imgs, boxes, labels, valid, attn, captions=caps,
            cap_lens=np.array([4, 4]), ixtoword={9: "dog"},
            class_names=["bg", "person", "bicycle"],
        )
        assert grid.dtype == np.uint8
        # 2 rows side by side; tallest = image + 2 strips
        assert grid.shape == (32 + 2 * TEXT_STRIP_HEIGHT, 64, 3)
        # first image: box outline drawn at (8, 8)
        assert grid[8, 8].max() > 0
        # second image has no valid objects: canvas + padding stays black
        assert grid[:, 32:].max() == 0


class TestAugmentation:
    def test_flip_consistency(self, tiny_cfg):
        """Flip must move boxes, masks and image together."""
        from objgan_tpu.data.pipeline import CocoFeed
        from objgan_tpu.data.tokenizer import Vocab

        rng = np.random.default_rng(3)
        img = np.zeros((64, 64, 3), np.uint8)
        img[:, :32] = 255  # left half white
        rec = {
            "captions": ["a thing"],
            "labels": [1],
            "boxes": [[0.1, 0.2, 0.3, 0.4]],
            "image": img,
        }
        vocab = Vocab.build(["a thing"])
        feed = CocoFeed(tiny_cfg, [rec], vocab, seed=0, augment=True)
        saw_flip = saw_id = False
        for row in [feed._one(rec) for _ in range(20)]:
            x0 = float(row["boxes"][0, 0])
            left_bright = float(row["images"][0][:, :8].mean())
            if abs(x0 - 0.1) < 1e-6:
                saw_id = True
                assert left_bright > 0.9  # left half still bright
            else:
                # flipped: x0' = 1 - 0.1 - 0.3 = 0.6; bright side now right
                assert abs(x0 - 0.6) < 1e-6
                assert left_bright < -0.9
                saw_flip = True
        assert saw_flip and saw_id

    def test_augment_off_is_stable(self, tiny_cfg):
        from objgan_tpu.data.pipeline import CocoFeed
        from objgan_tpu.data.tokenizer import Vocab

        rec = {"captions": ["a thing"], "labels": [1],
               "boxes": [[0.1, 0.2, 0.3, 0.4]]}
        vocab = Vocab.build(["a thing"])
        feed = CocoFeed(tiny_cfg, [rec], vocab, seed=0, with_images=False,
                        augment=False)
        rows = [feed._one(rec) for _ in range(5)]
        for r in rows:
            np.testing.assert_allclose(r["boxes"][0], [0.1, 0.2, 0.3, 0.4])


def test_metrics_writer_resume_keeps_existing_schema(tmp_path, capsys):
    """Resume-append must adopt the existing CSV header: writing a changed
    key set under the old header would silently misalign columns."""
    import csv as _csv

    from objgan_tpu.core.metrics import MetricsWriter

    w1 = MetricsWriter(str(tmp_path), "t", print_every=10**9)
    w1.write(1, {"a": 1.0, "b": 2.0})
    w1.close()
    # resumed run adds a key 'c' and drops 'b'
    w2 = MetricsWriter(str(tmp_path), "t", print_every=10**9)
    w2.write(2, {"a": 3.0, "c": 9.0})
    w2.close()
    out = capsys.readouterr().out
    assert "existing CSV schema" in out and "'c'" in out
    with open(tmp_path / "t_metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    assert rows[0]["a"] == "1.0" and rows[0]["b"] == "2.0"
    assert rows[1]["a"] == "3.0" and rows[1]["b"] == ""  # aligned, not shifted
    assert "c" not in rows[1]


def test_vocab_table_explicit_glove_path_strict(tmp_path):
    """An explicitly-supplied GloVe file that is missing or dim-mismatched
    must raise, not silently fall back to random vectors."""
    import pytest

    with pytest.raises(FileNotFoundError):
        vocab_table(["dog"], 4, str(tmp_path / "nope.txt"))
    g = tmp_path / "glove.txt"
    g.write_text("dog 0.1 0.2 0.3\n")  # 3-d vectors
    with pytest.raises(ValueError, match="no 4-d vectors"):
        vocab_table(["dog"], 4, str(g))
    out = vocab_table(["<end>", "dog"], 3, str(g))  # matching dim works
    np.testing.assert_allclose(out[1], [0.1, 0.2, 0.3])


def test_config_yaml_type_coercion_and_validation():
    """PyYAML 1.1 parses '2e-4' as a STRING; typed fields must coerce
    parseable strings and reject garbage (the lineage cfg_from_file's
    type check)."""
    import pytest

    from objgan_tpu.core.config import cfg_from_dict

    c = cfg_from_dict({"TRAIN": {"DISCRIMINATOR_LR": "2e-4",
                                 "BATCH_SIZE": "16"}})
    assert isinstance(c.TRAIN.DISCRIMINATOR_LR, float)
    assert c.TRAIN.DISCRIMINATOR_LR == pytest.approx(2e-4)
    assert c.TRAIN.BATCH_SIZE == 16
    with pytest.raises(ValueError, match="expects an int"):
        cfg_from_dict({"TRAIN": {"BATCH_SIZE": "sixteen"}})
    with pytest.raises(ValueError, match="expects a bool"):
        cfg_from_dict({"B_VALIDATION": 1})
    with pytest.raises(ValueError, match="expects a float"):
        cfg_from_dict({"TRAIN": {"GENERATOR_LR": True}})


def test_config_semantic_validation():
    """Enum-string fields dispatch via `== "value"`; a typo must fail at
    load, not silently select the else-branch. Lineage flags whose
    alternate behavior was never built must fail loud when requested."""
    import pytest

    from objgan_tpu.core.config import cfg_from_dict

    # reference defaults pass
    cfg_from_dict({"GAN": {"B_DCGAN": False}, "TEXT": {"RNN_TYPE": "LSTM"}})
    for bad in [
        {"DTYPE": "float16"},
        {"GAN": {"D_DTYPE": "bfloat16"}},   # plausible typo for "compute"
        {"GAN": {"UP_MODE": "bilinear"}},
        {"GAN": {"REMAT": "all"}},
        {"TEXT": {"RNN_TYPE": "GRU"}},      # lineage option, not built
        {"GAN": {"B_ATTENTION": False}},
        {"GAN": {"B_DCGAN": True}},
    ]:
        with pytest.raises(ValueError):
            cfg_from_dict(bad)
