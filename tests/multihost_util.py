"""Shared deterministic batch for the multi-host test (worker + reference
must construct bit-identical data without sharing a process)."""

import numpy as np


def global_box_batch(cfg):
    """COCO-shaped Stage-A batch (no images), pure-numpy deterministic."""
    b = cfg.TRAIN.BATCH_SIZE
    t = cfg.TEXT.WORDS_NUM
    o = cfg.OBJ.MAX_OBJECTS
    rng = np.random.default_rng(1234)
    captions = rng.integers(1, cfg.TEXT.VOCAB_SIZE, (b, t)).astype(np.int32)
    cap_lens = rng.integers(2, t + 1, (b,)).astype(np.int32)
    labels = rng.integers(1, cfg.OBJ.NUM_CLASSES, (b, o)).astype(np.int32)
    boxes = rng.uniform(0.05, 0.45, (b, o, 4)).astype(np.float32)
    n_obj = rng.integers(1, o + 1, (b,))
    obj_valid = (np.arange(o)[None] < n_obj[:, None]).astype(np.float32)
    labels = labels * obj_valid.astype(np.int32)
    return {
        "captions": captions,
        "cap_lens": cap_lens,
        "class_ids": np.arange(b, dtype=np.int32),
        "labels": labels,
        "boxes": boxes * obj_valid[..., None],
        "obj_valid": obj_valid,
    }
