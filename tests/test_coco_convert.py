"""COCO annotation converter + image_file lazy loading tests."""

import json
import os

import numpy as np

from objgan_tpu.data.coco_convert import COCO_ID_TO_CONTIGUOUS, convert
from objgan_tpu.data.pipeline import CocoFeed
from objgan_tpu.data.tokenizer import Vocab


def _fake_coco():
    instances = {
        "images": [
            {"id": 1, "width": 100, "height": 50, "file_name": "img1.png"},
            {"id": 2, "width": 200, "height": 200, "file_name": "img2.png"},
        ],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [10, 5, 40, 30],
             "area": 1200, "iscrowd": 0,
             "segmentation": [[10, 5, 50, 5, 50, 35, 10, 35]]},
            {"image_id": 1, "category_id": 18, "bbox": [60, 10, 20, 20],
             "area": 400, "iscrowd": 0},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 99, 49],
             "area": 4851, "iscrowd": 1},  # crowd: dropped
            {"image_id": 2, "category_id": 90, "bbox": [0, 0, 100, 100],
             "area": 10000, "iscrowd": 0},
        ],
    }
    captions = {
        "annotations": [
            {"image_id": 1, "caption": "a person and a dog"},
            {"image_id": 1, "caption": "someone walking a dog"},
            {"image_id": 2, "caption": "a toothbrush on a table"},
        ],
    }
    return instances, captions


def test_convert_basic():
    inst, caps = _fake_coco()
    recs = convert(inst, caps)
    assert len(recs) == 2
    r1 = next(r for r in recs if r["image_file"] == "img1.png")
    # crowd dropped, 2 objects, area-sorted (person box 1200 > dog 400)
    assert r1["labels"] == [1, 17]  # person, dog (COCO id 18 -> contiguous 17)
    np.testing.assert_allclose(r1["boxes"][0], [0.1, 0.1, 0.4, 0.6])
    # polygon normalized to image coords
    poly = np.asarray(r1["polygons"][0])
    assert poly.min() >= 0.0 and poly.max() <= 1.0
    # category 90 (toothbrush) -> contiguous 80
    r2 = next(r for r in recs if r["image_file"] == "img2.png")
    assert r2["labels"] == [80]
    assert COCO_ID_TO_CONTIGUOUS[90] == 80


def test_convert_min_area_filter():
    inst, caps = _fake_coco()
    recs = convert(inst, caps, min_area=0.2)
    r1 = next(r for r in recs if r["image_file"] == "img1.png")
    assert r1["labels"] == [1]  # dog (8% area) filtered


def test_feed_loads_image_file(tmp_path, tiny_cfg):
    from objgan_tpu.utils.visualize import save_png

    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(
        np.uint8)
    save_png(str(tmp_path / "img1.png"), img)
    rec = {"captions": ["a person"], "labels": [1],
           "boxes": [[0.1, 0.1, 0.5, 0.5]], "image_file": "img1.png"}
    vocab = Vocab.build(["a person"])
    feed = CocoFeed(tiny_cfg, [rec], vocab, image_root=str(tmp_path),
                    augment=False)
    row = feed._one(rec)
    assert "images" in row
    assert row["images"][0].shape[-1] == 3
    assert row["images"][-1].min() >= -1.0 and row["images"][-1].max() <= 1.0


def test_procedural_dataset_end_to_end(tmp_path, tiny_cfg):
    """Procedural COCO-format generator -> real converter -> CocoFeed batch
    (the zero-egress real-data path, VERDICT r1 #10)."""
    import json

    from objgan_tpu.data.procedural import build_manifest

    path = build_manifest(str(tmp_path), n_images=5, size=64, seed=3)
    recs = json.load(open(path))
    assert len(recs) == 5
    vocab = Vocab.build(c for r in recs for c in r["captions"])
    cfg = tiny_cfg.replace(DATA_DIR=str(tmp_path)).merged(
        {"TRAIN": {"BATCH_SIZE": 4},
         "TEXT": {"VOCAB_SIZE": max(50, len(vocab))},
         # real COCO class ids (1..80) — the tiny config's NUM_CLASSES=7
         # must be rejected loudly by the feed's label guard
         "OBJ": {"NUM_CLASSES": 81}})
    import pytest

    with pytest.raises(ValueError, match="NUM_CLASSES"):
        CocoFeed(cfg.merged({"OBJ": {"NUM_CLASSES": 7}}), recs, vocab)
    feed = CocoFeed(cfg, recs, vocab, seed=0)
    batch = next(iter(feed))
    imgs = batch["images"][-1]
    assert imgs.shape == (4, 64, 64, 3)
    assert float(imgs.std()) > 0.05  # real pixels, not constant
    assert batch["obj_valid"].sum() >= 4  # objects survived conversion
    # masks cover a plausible fraction of their box frame
    valid = batch["obj_valid"] > 0
    per_obj = batch["shapes"][valid].mean(axis=(-1, -2))
    assert per_obj.max() > 0.2
