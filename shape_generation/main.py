#!/usr/bin/env python
"""Stage-B entry point, mirroring the reference's ``shape_generation/main.py``
yml-config CLI (SURVEY.md §3.4)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument("--manifest", default=None)
    parser.add_argument("--wire", action="store_true",
                        help="compact uint8 wire batches (data/wire.py)")
    parser.add_argument("--captions_pickle", default=None)
    parser.add_argument("--max_steps", type=int, default=10**9)
    parser.add_argument("--eval", action="store_true",
                        help="held-out mask IoU/accuracy instead of training")
    parser.add_argument("--num_batches", type=int, default=10)
    args = parser.parse_args()

    from objgan_tpu import cli
    from objgan_tpu.core.config import Config, cfg_from_file

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    if args.eval:
        # eval = non-training path so B_VALIDATION serves the held-out split
        cfg = cfg.merged({"TRAIN": {"FLAG": False}})
        args.wire = False  # mask metrics read batch["shapes"] on host
        feed = None
        if args.manifest:
            from gan.main import build_feed

            feed, _, _ = build_feed(cfg, args, with_images=False)
        cli.eval_shape(cfg, feed, num_batches=args.num_batches)
        return
    feed, n_records = None, 0
    if args.manifest:
        from gan.main import build_feed

        # Stage-B consumes layouts + instance masks, never photos
        # (train/shape.py) — skip PNG decode + pyramid build
        feed, n_records, _ = build_feed(cfg, args, with_images=False)
    cfg, max_steps = cli.apply_epoch_schedule(cfg, n_records, args.max_steps)
    cli.train_shape(cfg, feed, max_steps=max_steps)


if __name__ == "__main__":
    main()
