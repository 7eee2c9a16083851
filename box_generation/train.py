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
    feed = None
    if args.manifest:
        from gan.main import build_feed

        feed = build_feed(cfg, args)
    cli.train_box(cfg, feed, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
