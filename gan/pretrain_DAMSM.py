#!/usr/bin/env python
"""DAMSM encoder pretraining, mirroring the reference's
``gan/pretrain_DAMSM.py`` CLI (SURVEY.md §3.5):

    python gan/pretrain_DAMSM.py --cfg cfg/damsm_coco.yml [--max_steps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument("--manifest", default=None)
    parser.add_argument("--captions_pickle", default=None)
    parser.add_argument("--wire", action="store_true",
                        help="compact uint8 wire batches + device-side "
                             "pyramid (data/wire.py; ~5x fewer host->device "
                             "bytes, cached host transform)")
    parser.add_argument("--grain", action="store_true",
                        help="use the Grain multi-worker host feed")
    parser.add_argument("--max_steps", type=int, default=10**9)
    args = parser.parse_args()

    from objgan_tpu import cli
    from objgan_tpu.core.config import Config, cfg_from_file

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    from gan.main import build_feed

    # with_masks=False: DAMSM reads only images/captions/cap_lens/class_ids
    # (train/damsm.py) — per-object masks would be ~17% extra host->device
    # bytes, first-epoch rasterization work, and wire-cache RAM, all dead
    feed, n_records, vocab = build_feed(cfg, args, with_masks=False)
    cfg, max_steps = cli.apply_epoch_schedule(cfg, n_records, args.max_steps)
    cli.pretrain_damsm(cfg, feed, max_steps=max_steps,
                       ixtoword=vocab.ixtoword if vocab else None)


if __name__ == "__main__":
    main()
