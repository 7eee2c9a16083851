"""Grain-based host feed (NORTH-STAR: "COCO caption preprocessing, glove
embedding lookup, and box/mask rasterization move into a host-side
tf.data/Grain feed").

Wraps the same per-record transform as :class:`data.pipeline.CocoFeed` in a
grain dataset: deterministic global shuffle, THREAD-pool transform +
prefetch (``ReadOptions(num_threads=...)`` — grain's multiprocess prefetch
is not used here, so the pure-Python share of the transform is
GIL-serialized; PIL decode and the C++ scanline rasterizer release the GIL,
and the uint8 wire cache makes the steady state cheap — BASELINE.md r3
feed tables), and batch assembly off the main thread. Output pytree is
identical to ``CocoFeed``/``synthetic_batch``.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from objgan_tpu.core.config import Config
from objgan_tpu.data.pipeline import CocoFeed
from objgan_tpu.data.tokenizer import Vocab


class _RecordTransform:
    """Picklable per-record map (runs in grain's read-thread pool)."""

    def __init__(self, cfg: Config, vocab: Vocab, with_images: bool,
                 augment: bool = True, image_root=None, wire: bool = False,
                 cacheable: bool = False, with_masks: bool = True):
        self.feed = CocoFeed.__new__(CocoFeed)
        self.feed.cfg = cfg
        self.feed.vocab = vocab
        self.feed.with_images = with_images
        self.feed.with_masks = with_masks
        self.feed.augment = augment
        self.feed.wire = wire
        # shared across grain worker threads: a plain dict cache is safe in
        # CPython (worst case both threads compute the same record once).
        # Only enabled when the whole dataset fits the CocoFeed cache policy
        # (all-or-nothing, bounded by the caller) — and it is only correct
        # when rec_id is a STABLE per-record key, not grain's global output
        # index, which grows forever across epochs (zero hits + unbounded
        # RSS) and names a different record each epoch after reshuffle.
        self.feed._cache = {} if (wire and cacheable) else None
        self.feed.image_root = image_root or cfg.DATA_DIR
        self.feed.records = []

    def __call__(self, item):
        record, seed, rec_id = item
        # pure w.r.t. shared state: a local rng per item (the transform
        # object is shared across grain worker threads)
        return self.feed._one(record, rng=np.random.default_rng(seed),
                              rec_id=rec_id)


def _collate(rows):
    batch: Dict = {}
    for k in rows[0]:
        if k == "images":
            batch[k] = [
                np.stack([r[k][j] for r in rows])
                for j in range(len(rows[0][k]))
            ]
        else:
            batch[k] = np.stack([r[k] for r in rows])
    return batch


def grain_feed(
    cfg: Config,
    records: Sequence[Dict],
    vocab: Vocab,
    seed: int = 0,
    with_images: bool = True,
    num_epochs: Optional[int] = None,
    worker_count: int = 0,
    augment: bool = True,
    wire: bool = False,
    with_masks: bool = True,
    id_offset: int = 0,
    id_stride: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite (or ``num_epochs``-bounded) batch iterator via Grain.

    ``id_offset``/``id_stride`` map local record indices back to GLOBAL
    ids under multi-host strided partitioning (records[p::n] -> offset=p,
    stride=n), same contract as CocoFeed — class_ids must be globally
    unique or DAMSM's duplicate mask silently deletes cross-host
    negatives."""
    import grain.python as gp

    from objgan_tpu.data.pipeline import (
        validate_image_records, validate_labels, validate_vocab,
        wire_cache_allowed,
    )

    records = list(records)  # materialize once: a one-shot iterator would be
    # exhausted by validate_labels and silently yield an empty dataset
    validate_labels(cfg, records)
    validate_vocab(cfg, vocab)  # CocoFeed.__new__ skips __init__'s check
    if with_images:
        validate_image_records(records)  # ditto: __new__ skips this too
    transform = _RecordTransform(
        cfg, vocab, with_images, augment, wire=wire, with_masks=with_masks,
        cacheable=wire_cache_allowed(cfg, len(records),
                                     with_images=with_images,
                                     with_masks=with_masks))
    # Source rows carry their stable dataset index: after shuffle+repeat,
    # grain's map index is a forever-growing GLOBAL position that names a
    # different record every epoch — useless (and wrong) as a cache key.
    # The per-item seed keeps the global index so augmentation still varies
    # across epochs while _wire_base caches by true record id.
    ds = (
        gp.MapDataset.source(list(enumerate(records)))
        .seed(seed)
        .shuffle()
        .map_with_index(
            lambda i, row: transform(
                (row[1], seed * 100003 + i,
                 id_offset + row[0] * id_stride))
        )
    )
    if num_epochs is None:
        ds = ds.repeat(None)
    else:
        ds = ds.repeat(num_epochs)
    # drop_remainder: a short trailing batch on a bounded (num_epochs) run
    # would break the static-shape contract downstream — a jitted consumer
    # retraces (minutes per remote TPU compile) or the mesh-divisibility
    # check fails mid-run
    ds = ds.batch(cfg.TRAIN.BATCH_SIZE, drop_remainder=True,
                  batch_fn=_collate)
    it = ds.to_iter_dataset(
        gp.ReadOptions(num_threads=max(1, worker_count or cfg.WORKERS),
                       prefetch_buffer_size=4)
    )
    return iter(it)
