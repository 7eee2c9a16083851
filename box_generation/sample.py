#!/usr/bin/env python
"""Caption -> layout sampling, mirroring the reference's
``box_generation/sample.py`` (SURVEY.md §3.3; BASELINE.json config #1)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from box_generation.opts import parse_opts, to_config
    from objgan_tpu import cli
    from objgan_tpu.data.tokenizer import Vocab

    args = parse_opts()
    cfg = to_config(args)
    if args.eval:
        # eval path = TRAIN.FLAG False, so B_VALIDATION serves the held-out
        # split (gan/main.py:build_feed)
        cfg = cfg.merged({"TRAIN": {"FLAG": False}})
        feed = None
        if args.manifest:
            from gan.main import build_feed

            # layout eval never looks at pixels; skip decode + pyramid
            feed, _, _ = build_feed(cfg, args, with_images=False)
        cli.eval_box(cfg, feed, num_batches=args.num_batches)
        return
    captions = args.caption or ["a person riding a horse on a beach"]
    vocab = (
        Vocab.from_reference_pickle(args.captions_pickle)
        if args.captions_pickle
        else Vocab.build(captions)
    )
    caps, lens = vocab.encode_batch(captions, cfg.TEXT.WORDS_NUM)
    cfg = cfg.merged({"TEXT": {"VOCAB_SIZE": max(len(vocab),
                                                 cfg.TEXT.VOCAB_SIZE)}})
    layout = cli.sample_box(cfg, np.asarray(caps), np.asarray(lens),
                            out_path=args.output)
    for i, cap in enumerate(captions):
        kept = [
            (int(l), [round(x, 3) for x in b])
            for l, b, v in zip(layout["labels"][i], layout["boxes"][i],
                               layout["obj_valid"][i]) if v
        ]
        print(f"{cap!r} -> {kept}")


if __name__ == "__main__":
    main()
