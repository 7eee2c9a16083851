#!/usr/bin/env python
"""Composed end-to-end sampling CLI: caption -> layout -> masks -> 256px image
in one jitted program (the reference requires running the three stages
manually — SURVEY.md §1).

    python sample_pipeline.py --cfg cfg/eval_coco.yml \
        --caption "two dogs play in a park" --out out_dir
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", dest="cfg_file", default=None)
    ap.add_argument("--caption", action="append", default=None)
    ap.add_argument("--captions_file", default=None,
                    help="text file, one caption per line (the lineage's "
                         "gen_example input format)")
    ap.add_argument("--captions_pickle", default=None)
    ap.add_argument("--manifest", default=None,
                    help="training manifest: build the vocab from its "
                         "captions so token ids match the trained "
                         "checkpoints")
    ap.add_argument("--out", default="output/pipeline_samples")
    args = ap.parse_args()

    import jax

    from objgan_tpu.core.config import Config, cfg_from_file
    from objgan_tpu.data.synthetic import synthetic_batch
    from objgan_tpu.data.tokenizer import Vocab
    from objgan_tpu.pipeline_e2e import ObjGanPipeline
    from objgan_tpu.utils.visualize import _to_uint8, save_png

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    captions = list(args.caption or [])
    if args.captions_file:
        with open(args.captions_file) as f:
            captions += [ln.strip() for ln in f if ln.strip()]
    captions = captions or ["a person riding a horse on a beach"]
    if args.captions_pickle:
        vocab = Vocab.from_reference_pickle(args.captions_pickle)
    elif args.manifest:
        from objgan_tpu.data.pipeline import load_records_json

        records = load_records_json(args.manifest)
        vocab = Vocab.build(c for r in records for c in r["captions"])
    else:
        vocab = Vocab.build(captions)
        # a caption-local vocab assigns dense ids that CANNOT match any
        # trained checkpoint's training vocab — embeddings index the wrong
        # rows and the pipeline emits garbage with no other symptom
        print("WARNING: no --manifest / --captions_pickle given — built a "
              "vocab from the sample captions themselves. If trained "
              "checkpoints are restored below, their token ids will NOT "
              "match this vocab; pass the training manifest (or the "
              "reference captions.pickle) for correct embeddings.")
    if len(vocab) > cfg.TEXT.VOCAB_SIZE:
        raise SystemExit(
            f"vocabulary has {len(vocab)} words but cfg.TEXT.VOCAB_SIZE is "
            f"{cfg.TEXT.VOCAB_SIZE}; raise it (nn.Embed would silently "
            f"clamp out-of-range token ids) — same guard as CocoFeed")
    caps, lens = vocab.encode_batch(captions, cfg.TEXT.WORDS_NUM)

    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    pipe = ObjGanPipeline(cfg)
    init_batch = synthetic_batch(cfg, rng, max(2, len(captions)))
    states = pipe.load_states(rng, init_batch)
    gen = pipe.jitted_generate()
    out = gen(states, np.asarray(caps), np.asarray(lens), rng)

    os.makedirs(args.out, exist_ok=True)
    imgs = np.asarray(out["images"][-1])
    for i, cap in enumerate(captions):
        save_png(os.path.join(args.out, f"pipe_{i}.png"), _to_uint8(imgs[i]))
        kept = [
            (int(l), [round(float(x), 3) for x in b])
            for l, b, v in zip(
                np.asarray(out["labels"])[i], np.asarray(out["boxes"])[i],
                np.asarray(out["obj_valid"])[i]) if v
        ]
        print(f"{cap!r} -> {len(kept)} objects {kept}")
    print(f"wrote {len(captions)} images to {args.out}")


if __name__ == "__main__":
    main()
