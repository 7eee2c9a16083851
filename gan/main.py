#!/usr/bin/env python
"""Stage-C entry point, mirroring the reference's ``gan/main.py`` CLI:

    python gan/main.py --cfg cfg/coco_objgan.yml [--data_dir D] [--max_steps N]

``cfg.TRAIN.FLAG`` switches train vs sample, exactly as in the reference
(SURVEY.md §1 layer table). With no real dataset manifest the runners fall
back to the synthetic COCO-shaped feed so the full pipeline is exercisable
anywhere.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_feed(cfg, args, with_images=True, with_masks=True):
    """Host feed from a manifest. Returns
    ``(feed_or_None, n_records, vocab_or_None)``. ``with_images=False``
    skips PNG decode + pyramid build, ``with_masks=False`` also skips
    per-object mask rasterization, for consumers that only need
    captions/layouts (Stage-A training/eval).

    ``cfg.B_VALIDATION`` is the train/held-out split switch (the reference's
    behavior of pointing eval at the test split): with it set, training
    (``TRAIN.FLAG``) sees the train portion and sampling/eval the held-out
    portion; without it, all records are used either way.
    """
    if args.manifest:
        from objgan_tpu.data.pipeline import (
            CocoFeed, load_records_json, split_records,
        )
        from objgan_tpu.data.tokenizer import Vocab

        records = load_records_json(args.manifest)
        vocab = (
            Vocab.from_reference_pickle(args.captions_pickle)
            if args.captions_pickle
            else Vocab.build(c for r in records for c in r["captions"])
        )
        if cfg.B_VALIDATION:
            train_recs, val_recs = split_records(records, seed=cfg.RNG_SEED)
            records = train_recs if cfg.TRAIN.FLAG else val_recs
            print(f"B_VALIDATION split: {len(train_recs)} train / "
                  f"{len(val_recs)} held-out; using "
                  f"{'train' if cfg.TRAIN.FLAG else 'held-out'}")
        # multi-host: each process serves its strided dataset partition and
        # produces only its batch shard; parallel.shard_batch assembles the
        # global array (SURVEY.md §2.6). n_records stays GLOBAL so the epoch
        # schedule matches single-host. The distributed runtime MUST come up
        # before the jax.process_count() probe below — process_count()
        # initializes XLA, after which jax.distributed.initialize raises
        # (sharding.py docstring); this is the first backend touch on every
        # trainer CLI (they all feed through here).
        import jax

        from objgan_tpu.parallel.sharding import (
            maybe_initialize_distributed, process_local_batch_slice,
            process_local_records,
        )

        maybe_initialize_distributed()

        n_global = len(records)
        feed_cfg = cfg
        # class_ids must be GLOBAL record indices (DAMSM's duplicate mask):
        # a host serving records[p::n] maps local index i -> p + i*n
        id_offset, id_stride = 0, 1
        if jax.process_count() > 1:
            records = process_local_records(records)
            _, local_b = process_local_batch_slice(cfg.TRAIN.BATCH_SIZE)
            feed_cfg = cfg.merged({"TRAIN": {"BATCH_SIZE": local_b}})
            id_offset, id_stride = jax.process_index(), jax.process_count()
        wire = bool(getattr(args, "wire", False))
        # training-time augmentation (random flip, <unk> word dropout) must
        # never touch eval/sampling feeds: a flipped GT layout or dropped
        # caption word would silently bias every held-out metric.
        # args.aug_eval (gan/eval.py --aug_eval) deliberately re-enables it
        # on the eval split — the protocol-bisect knob for quantifying how
        # much the r3 augmentation-free fix itself moved the curve.
        augment = bool(cfg.TRAIN.FLAG) or bool(getattr(args, "aug_eval",
                                                       False))
        # gan/eval.py --eval_seed: vary ONLY the eval-time stochastic draws
        # (held-out batch order here; latents in eval.py). The train/val
        # SPLIT above stays pinned to cfg.RNG_SEED — an override must never
        # move records across the split (that would leak train records into
        # the held-out metrics, not measure protocol noise).
        feed_seed = getattr(args, "eval_seed", None)
        if feed_seed is None:
            feed_seed = cfg.RNG_SEED
        if getattr(args, "grain", False):
            from objgan_tpu.data.grain_feed import grain_feed

            return grain_feed(feed_cfg, records, vocab, seed=feed_seed,
                              with_images=with_images, with_masks=with_masks,
                              augment=augment, wire=wire, id_offset=id_offset,
                              id_stride=id_stride), n_global, vocab
        return iter(CocoFeed(feed_cfg, records, vocab, seed=feed_seed,
                             with_images=with_images, with_masks=with_masks,
                             augment=augment, wire=wire, id_offset=id_offset,
                             id_stride=id_stride)), n_global, vocab
    return None, 0, None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument("--data_dir", default=None)
    parser.add_argument("--manifest", default=None,
                        help="dataset manifest JSON (see data/pipeline.py)")
    parser.add_argument("--captions_pickle", default=None,
                        help="reference captions.pickle for vocab parity")
    parser.add_argument("--wire", action="store_true",
                        help="compact uint8 wire batches + device-side "
                             "pyramid (data/wire.py; ~5x fewer host->device "
                             "bytes, cached host transform)")
    parser.add_argument("--grain", action="store_true",
                        help="use the Grain multi-worker host feed")
    parser.add_argument("--max_steps", type=int, default=10**9)
    parser.add_argument("--num_batches", type=int, default=10,
                        help="sampling: batches to generate")
    args = parser.parse_args()

    from objgan_tpu import cli
    from objgan_tpu.core.config import Config, cfg_from_file

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    if args.data_dir:
        cfg = cfg.replace(DATA_DIR=args.data_dir)

    feed, n_records, vocab = build_feed(cfg, args)
    if cfg.TRAIN.FLAG:
        # epoch accounting is a training-loop concept; sample_gan uses
        # --num_batches and would only print a misleading schedule line
        cfg, max_steps = cli.apply_epoch_schedule(cfg, n_records,
                                                  args.max_steps)
        cli.train_gan(cfg, feed, max_steps=max_steps,
                      ixtoword=vocab.ixtoword if vocab else None)
    else:
        cli.sample_gan(cfg, feed, num_batches=args.num_batches)


if __name__ == "__main__":
    main()
