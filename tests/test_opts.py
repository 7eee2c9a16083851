"""Stage-A CLI flag surface (box_generation/opts.py) — the reference's
``opts.py`` lineage flags must parse and land on the typed config."""

import sys

sys.path.insert(0, ".")  # box_generation is a top-level script package

from box_generation.opts import parse_opts, to_config


def test_lineage_flags_map_onto_box_config():
    args = parse_opts([
        "--rnn_size", "64", "--input_encoding_size", "32",
        "--att_hid_size", "48", "--max_seq_length", "7",
        "--beam_size", "3", "--temperature", "0.7",
        "--learning_rate", "0.001", "--grad_clip", "5.0",
        "--batch_size", "4",
    ])
    cfg = to_config(args)
    assert cfg.BOX.RNN_SIZE == 64
    assert cfg.BOX.INPUT_ENCODING_SIZE == 32
    assert cfg.BOX.ATT_HID_SIZE == 48
    assert cfg.BOX.MAX_SEQ_LENGTH == 7
    assert cfg.BOX.BEAM_SIZE == 3
    assert cfg.BOX.TEMPERATURE == 0.7
    assert cfg.BOX.LEARNING_RATE == 0.001
    assert cfg.BOX.GRAD_CLIP == 5.0
    assert cfg.TRAIN.BATCH_SIZE == 4


def test_unset_flags_leave_config_defaults():
    from objgan_tpu.core.config import Config

    cfg = to_config(parse_opts([]))
    assert cfg.BOX.RNN_SIZE == Config().BOX.RNN_SIZE
    assert cfg.TRAIN.BATCH_SIZE == Config().TRAIN.BATCH_SIZE


def test_sample_flags_parse():
    args = parse_opts(["--caption", "two dogs", "--caption", "a cat",
                       "--eval", "--num_batches", "5", "--wire"])
    assert args.caption == ["two dogs", "a cat"]
    assert args.eval and args.wire and args.num_batches == 5
