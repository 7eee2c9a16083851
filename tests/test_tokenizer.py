"""Vocab contract tests: PAD-id ownership, py2 pickle fallback, decode."""

import numpy as np
import pytest

from objgan_tpu.data.tokenizer import PAD, PAD_TOKEN, Vocab


def test_pad_id_ownership_enforced():
    # valid: <end> owns index 0
    v = Vocab({PAD_TOKEN: 0, "dog": 1})
    assert len(v) == 2
    # <end> absent while a real word owns 0: the word would silently
    # vanish as padding everywhere downstream
    with pytest.raises(ValueError, match="padding id"):
        Vocab({"a": 0, "dog": 1})
    # <end> present but not at 0
    with pytest.raises(ValueError, match="must map"):
        Vocab({PAD_TOKEN: 1, "dog": 0})
    # another word sharing index 0
    with pytest.raises(ValueError, match="owned by"):
        Vocab({PAD_TOKEN: 0, "alias": 0, "dog": 1})


def test_decode_renders_unknown_ids_as_placeholders():
    v = Vocab({PAD_TOKEN: 0, "dog": 1})
    assert v.decode([1, 0, 999]) == "dog #999"  # PAD dropped, OOV tagged


def test_from_reference_pickle_py2_latin1_fallback(tmp_path):
    """The lineage captions.pickle is written by Python 2; its 8-bit str
    entries need encoding='latin1' under py3. Hand-crafted pickle-2
    opcodes: {'caf\\xe9': 1, '<end>': 0} with SHORT_BINSTRING payloads —
    the default ascii decode raises, the fallback must succeed."""
    raw = (b"\x80\x02}("                # PROTO 2, EMPTY_DICT, MARK
           b"U\x04caf\xe9K\x01"        # SHORT_BINSTRING 'caf\xe9', BININT1 1
           b"U\x05<end>K\x00"          # SHORT_BINSTRING '<end>',  BININT1 0
           b"u.")                      # SETITEMS, STOP
    p = tmp_path / "captions.pickle"
    p.write_bytes(raw)
    import pickle

    with pytest.raises(UnicodeDecodeError):  # the fallback's trigger
        with open(p, "rb") as f:
            pickle.load(f)
    v = Vocab.from_reference_pickle(str(p))
    assert v.wordtoix["caf\xe9"] == 1 and v.wordtoix[PAD_TOKEN] == PAD


def test_encode_roundtrip_and_padding():
    v = Vocab({PAD_TOKEN: 0, "a": 1, "dog": 2, "runs": 3})
    ids, n = v.encode("a dog runs", max_len=6)
    assert n == 3
    np.testing.assert_array_equal(ids, [1, 2, 3, 0, 0, 0])
    assert v.decode(ids) == "a dog runs"
