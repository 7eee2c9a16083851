"""Synthetic COCO-shaped batches (SURVEY.md §4 tier 3: every layer must be
testable without downloading COCO).

Produces exactly the pytree the real Grain/tf.data pipeline emits, with the
same dtypes and static shapes, so model/trainer/bench code is agnostic to
which feed it gets.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from objgan_tpu.core.config import Config


def synthetic_batch(cfg: Config, rng: jax.Array, batch: int | None = None,
                    with_images: bool = True,
                    id_offset: int = 0) -> Dict[str, jnp.ndarray]:
    b = batch or cfg.TRAIN.BATCH_SIZE
    t = cfg.TEXT.WORDS_NUM
    o = cfg.OBJ.MAX_OBJECTS
    s = cfg.OBJ.SHAPE_SIZE
    ks = jax.random.split(rng, 10)

    cap_lens = jax.random.randint(ks[0], (b,), 3, t + 1)
    captions = jax.random.randint(ks[1], (b, t), 1, cfg.TEXT.VOCAB_SIZE)
    captions = jnp.where(jnp.arange(t)[None] < cap_lens[:, None], captions, 0)

    n_obj = jax.random.randint(ks[2], (b,), 1, o + 1)
    obj_valid = (jnp.arange(o)[None] < n_obj[:, None]).astype(jnp.float32)
    labels = jax.random.randint(ks[3], (b, o), 1, cfg.OBJ.NUM_CLASSES)
    labels = (labels * obj_valid).astype(jnp.int32)

    xy = jax.random.uniform(ks[4], (b, o, 2), minval=0.0, maxval=0.7)
    wh = jax.random.uniform(ks[5], (b, o, 2), minval=0.1, maxval=0.3)
    boxes = jnp.concatenate([xy, wh], -1)

    # blobby soft masks in each object's own frame
    yy = jnp.linspace(-1, 1, s)[None, None, :, None]
    xx = jnp.linspace(-1, 1, s)[None, None, None, :]
    cx = jax.random.uniform(ks[6], (b, o, 1, 1), minval=-0.3, maxval=0.3)
    cy = jax.random.uniform(ks[7], (b, o, 1, 1), minval=-0.3, maxval=0.3)
    shapes = (jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2) < 0.7).astype(
        jnp.float32
    )

    out = {
        "captions": captions,
        "cap_lens": cap_lens,
        # class_ids must be unique per image ACROSS the whole global batch
        # (DAMSM's class mask drops same-id pairs as duplicates): under
        # multi-host DP each host generates only its shard, so the caller
        # passes its global batch-slice start as id_offset — otherwise every
        # host would emit 0..b-1 and the contrastive losses would silently
        # mask all cross-host negatives (same contract as CocoFeed's
        # id_offset/id_stride).
        "class_ids": id_offset + jnp.arange(b, dtype=jnp.int32),
        "labels": labels,
        "boxes": boxes,
        "shapes": shapes,
        "obj_valid": obj_valid,
    }
    if with_images:
        out["images"] = [
            jax.random.uniform(ks[8], (b, size, size, 3), minval=-1.0,
                               maxval=1.0)
            for size in cfg.branch_sizes
        ]
    return out


def synthetic_layout_batch(cfg: Config, rng: jax.Array, batch: int = 8):
    """(captions, cap_lens, labels, boxes, obj_valid) for Stage-A training."""
    d = synthetic_batch(cfg, rng, batch, with_images=False)
    return {k: d[k] for k in
            ("captions", "cap_lens", "labels", "boxes", "obj_valid")}
