#!/usr/bin/env python
"""Batch-serving CLI: stream captions in, get images + layouts out.

    python serve.py --cfg cfg/eval_coco.yml --manifest records.json \
        --input requests.jsonl --out served/

Reads one request per line from ``--input`` (``-`` = stdin): either a JSON
object ``{"id": ..., "caption": "..."}`` or a bare caption. Emits one JSON
response per request on stdout and writes ``serve_<id>.png`` images.
Requests are packed into a fixed batch so the fused three-stage program
(objgan_tpu/pipeline_e2e.py) compiles exactly once; see
objgan_tpu/serving.py for the execution model. The reference has no
serving surface — its stages are run manually per SURVEY.md §1.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", dest="cfg_file", default=None)
    ap.add_argument("--input", default="-",
                    help="request file, one caption/JSON per line ('-' = "
                         "stdin)")
    ap.add_argument("--out", default="output/served")
    ap.add_argument("--batch", type=int, default=None,
                    help="static serving batch (default TRAIN.BATCH_SIZE); "
                         "one compiled program serves every batch")
    ap.add_argument("--captions_pickle", default=None)
    ap.add_argument("--manifest", default=None,
                    help="training manifest: builds the vocab its "
                         "checkpoints were trained with")
    ap.add_argument("--vocab_from_input", action="store_true",
                    help="SMOKE-TEST ONLY: build the vocab from the request "
                         "captions themselves (reads the whole input up "
                         "front; token ids cannot match any trained "
                         "checkpoint)")
    args = ap.parse_args()

    from objgan_tpu.core.config import Config, cfg_from_file
    from objgan_tpu.data.tokenizer import Vocab
    from objgan_tpu.serving import parse_requests, run_serve

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()

    lines = (sys.stdin if args.input == "-"
             else open(args.input, encoding="utf-8"))
    if args.captions_pickle:
        vocab = Vocab.from_reference_pickle(args.captions_pickle)
    elif args.manifest:
        from objgan_tpu.data.pipeline import load_records_json

        records = load_records_json(args.manifest)
        vocab = Vocab.build(c for r in records for c in r["captions"])
    elif args.vocab_from_input:
        # a streaming server cannot build a vocab lazily — materialize the
        # whole request list first. Fine for smoke tests, wrong for trained
        # checkpoints (ids won't match), hence the loud flag name.
        reqs = list(parse_requests(lines))
        vocab = Vocab.build(r["caption"] for r in reqs)
        lines = None
        print("WARNING: --vocab_from_input builds token ids that cannot "
              "match any trained checkpoint; pass --manifest or "
              "--captions_pickle for real serving", file=sys.stderr)
    else:
        raise SystemExit(
            "serve.py needs the training vocabulary: pass --manifest or "
            "--captions_pickle (or --vocab_from_input for an untrained "
            "smoke test) — a mismatched vocab silently indexes wrong "
            "embedding rows")

    requests = reqs if lines is None else parse_requests(lines)

    def emit(resp):
        print(json.dumps(resp), flush=True)

    stats = run_serve(cfg, vocab, requests, args.out, batch_size=args.batch,
                      emit=emit)
    print(json.dumps({"served": stats}), file=sys.stderr)


if __name__ == "__main__":
    main()
