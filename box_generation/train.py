#!/usr/bin/env python
"""Stage-A training, mirroring the reference's ``box_generation/train.py``."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from box_generation.opts import parse_opts, to_config
    from objgan_tpu import cli

    args = parse_opts()
    cfg = to_config(args)
    feed, n_records = None, 0
    if args.manifest:
        from gan.main import build_feed

        # Stage-A consumes captions + layouts only (train/box.py) — skip
        # PNG decode + pyramid build AND mask rasterization entirely
        # (BASELINE.md r3 layout-only feed row)
        feed, n_records, _ = build_feed(cfg, args, with_images=False,
                                        with_masks=False)
    cfg, max_steps = cli.apply_epoch_schedule(cfg, n_records, args.max_steps)
    cli.train_box(cfg, feed, max_steps=max_steps)


if __name__ == "__main__":
    main()
