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


def build_feed(cfg, args):
    if args.manifest:
        from objgan_tpu.data.pipeline import CocoFeed, load_records_json
        from objgan_tpu.data.tokenizer import Vocab

        records = load_records_json(args.manifest)
        vocab = (
            Vocab.from_reference_pickle(args.captions_pickle)
            if args.captions_pickle
            else Vocab.build(c for r in records for c in r["captions"])
        )
        if getattr(args, "grain", False):
            from objgan_tpu.data.grain_feed import grain_feed

            return grain_feed(cfg, records, vocab, seed=cfg.RNG_SEED)
        return iter(CocoFeed(cfg, records, vocab, seed=cfg.RNG_SEED))
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument("--data_dir", default=None)
    parser.add_argument("--manifest", default=None,
                        help="dataset manifest JSON (see data/pipeline.py)")
    parser.add_argument("--captions_pickle", default=None,
                        help="reference captions.pickle for vocab parity")
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

    feed = build_feed(cfg, args)
    max_steps = args.max_steps
    if max_steps >= 10**9 and args.manifest:
        # reference semantics: train for TRAIN.MAX_EPOCH epochs
        import json

        with open(args.manifest) as f:
            n_records = len(json.load(f))
        steps_per_epoch = max(1, n_records // cfg.TRAIN.BATCH_SIZE)
        max_steps = cfg.TRAIN.MAX_EPOCH * steps_per_epoch
        print(f"training {cfg.TRAIN.MAX_EPOCH} epochs x {steps_per_epoch} "
              f"steps = {max_steps} steps")
    if cfg.TRAIN.FLAG:
        cli.train_gan(cfg, feed, max_steps=max_steps)
    else:
        cli.sample_gan(cfg, feed, num_batches=args.num_batches)


if __name__ == "__main__":
    main()
