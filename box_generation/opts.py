"""Stage-A argparse flags, mirroring the reference's ``opts.py`` flag surface
(SURVEY.md §2.1 "CLI/flags") mapped onto the typed config tree."""

import argparse


def parse_opts(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", dest="cfg_file", default=None)
    p.add_argument("--rnn_size", type=int, default=None)
    p.add_argument("--input_encoding_size", type=int, default=None)
    p.add_argument("--att_hid_size", type=int, default=None)
    p.add_argument("--max_seq_length", type=int, default=None)
    p.add_argument("--beam_size", type=int, default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--grad_clip", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_steps", type=int, default=10**9)
    p.add_argument("--manifest", default=None)
    p.add_argument("--wire", action="store_true",
                   help="compact uint8 wire batches (data/wire.py)")
    p.add_argument("--captions_pickle", default=None)
    p.add_argument("--caption", action="append", default=None,
                   help="(sample.py) caption text; repeatable")
    p.add_argument("--output", default=None,
                   help="(sample.py) layout JSON output path")
    p.add_argument("--eval", action="store_true",
                   help="(sample.py) held-out NLL + layout statistics "
                        "instead of free sampling")
    p.add_argument("--num_batches", type=int, default=10,
                   help="(sample.py --eval) held-out batches to evaluate")
    return p.parse_args(argv)


def to_config(args):
    from objgan_tpu.core.config import Config, cfg_from_file

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    box = {}
    for flag, key in [
        ("rnn_size", "RNN_SIZE"),
        ("input_encoding_size", "INPUT_ENCODING_SIZE"),
        ("att_hid_size", "ATT_HID_SIZE"),
        ("max_seq_length", "MAX_SEQ_LENGTH"),
        ("beam_size", "BEAM_SIZE"),
        ("temperature", "TEMPERATURE"),
        ("learning_rate", "LEARNING_RATE"),
        ("grad_clip", "GRAD_CLIP"),
    ]:
        v = getattr(args, flag)
        if v is not None:
            box[key] = v
    over = {"BOX": box} if box else {}
    if args.batch_size is not None:
        over["TRAIN"] = {"BATCH_SIZE": args.batch_size}
    return cfg.merged(over) if over else cfg
