"""Grain host-feed tests: pytree contract identical to CocoFeed/synthetic."""

import numpy as np
import pytest

from objgan_tpu.data.grain_feed import grain_feed
from objgan_tpu.data.tokenizer import Vocab


def _records(n=6, seed=1):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        k = int(rng.integers(1, 4))
        recs.append({
            "captions": [f"a cat number {i}"],
            "labels": rng.integers(1, 6, k).tolist(),
            "boxes": rng.uniform(0.1, 0.4, (k, 4)).tolist(),
            "polygons": [rng.uniform(0, 1, (5, 2)) for _ in range(k)],
            "image": rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
        })
    return recs


def test_grain_feed_contract(tiny_cfg):
    vocab = Vocab.build(["a cat number one two three four five"])
    it = grain_feed(tiny_cfg, _records(), vocab, seed=3)
    b = next(it)
    bs = tiny_cfg.TRAIN.BATCH_SIZE
    o = tiny_cfg.OBJ.MAX_OBJECTS
    assert b["captions"].shape == (bs, tiny_cfg.TEXT.WORDS_NUM)
    assert b["boxes"].shape == (bs, o, 4)
    assert b["shapes"].shape == (bs, o, tiny_cfg.OBJ.SHAPE_SIZE,
                                 tiny_cfg.OBJ.SHAPE_SIZE)
    assert len(b["images"]) == tiny_cfg.TREE.BRANCH_NUM
    # successive batches differ (shuffle + caption choice)
    b2 = next(it)
    assert not np.array_equal(b["boxes"], b2["boxes"])


def test_grain_feed_deterministic_per_seed(tiny_cfg):
    vocab = Vocab.build(["a cat number one two"])
    a = next(grain_feed(tiny_cfg, _records(), vocab, seed=7))
    b = next(grain_feed(tiny_cfg, _records(), vocab, seed=7))
    np.testing.assert_array_equal(a["boxes"], b["boxes"])
    np.testing.assert_array_equal(a["captions"], b["captions"])


def test_grain_wire_cache_keys_are_stable_across_epochs(tiny_cfg,
                                                        monkeypatch):
    """Wire-mode cache must key by the record's dataset index, not grain's
    global output index (which grows forever across epochs and names a
    different record each epoch after reshuffle): after several epochs the
    cache holds exactly n_records entries — every epoch past the first is
    all hits, and RSS is bounded (round-3 review finding)."""
    import objgan_tpu.data.grain_feed as gf

    created = []
    orig = gf._RecordTransform

    class Spy(orig):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            created.append(self)

    monkeypatch.setattr(gf, "_RecordTransform", Spy)
    recs = _records(6)
    vocab = Vocab.build(["a cat number one two three four five"])
    cfg = tiny_cfg.merged({"TRAIN": {"BATCH_SIZE": 2}})
    for _ in gf.grain_feed(cfg, recs, vocab, seed=3, wire=True,
                           num_epochs=3):
        pass
    (spy,) = created
    cache = spy.feed._cache
    assert cache is not None, "small dataset must enable the wire cache"
    assert sorted(cache) == list(range(6)), (
        f"expected one entry per record, got keys {sorted(cache)}"
    )


def test_grain_feed_rejects_mixed_image_records(tiny_cfg):
    """grain_feed builds its CocoFeed via __new__, skipping __init__'s
    validation — the mixed image/image_file check must be re-run explicitly
    (same reason validate_vocab is), or shuffle order decides between a
    silently image-less batch and a KeyError steps later."""
    recs = _records()
    del recs[2]["image"]
    vocab = Vocab.build(["a cat number one two three four five"])
    with pytest.raises(ValueError, match="neither 'image' nor 'image_file'"):
        grain_feed(tiny_cfg, recs, vocab)
