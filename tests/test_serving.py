"""Serving front-end tests: request parsing, fixed-batch packing with a
padded ragged tail, response ordering, and the serve.py CLI end to end.

The serving loop (objgan_tpu/serving.py) compiles ONE program for its
whole lifetime — these tests pin the contract that makes that true
(every batch reaches the jitted generate at exactly ``batch_size``)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from objgan_tpu.serving import parse_requests, run_serve

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestParseRequests:
    def test_json_bare_and_blank_lines(self):
        got = list(parse_requests([
            '{"id": "a", "caption": "two dogs"}',
            "",
            "a plain caption",
            '{"caption": "no id"}',
        ]))
        assert got == [
            {"id": "a", "caption": "two dogs"},
            {"id": 2, "caption": "a plain caption"},
            {"id": 3, "caption": "no id"},
        ]

    def test_json_without_caption_rejected(self):
        with pytest.raises(ValueError, match="without a 'caption'"):
            list(parse_requests(['{"id": 1}']))

    def test_malformed_json_is_a_bare_caption(self):
        (r,) = parse_requests(['{not json'])
        assert r["caption"] == "{not json"


class TestRunServe:
    def test_ragged_tail_packed_and_order_preserved(self, tiny_cfg,
                                                    tmp_path):
        """5 requests at batch 4 -> 2 batches (tail padded to 4), exactly
        5 responses in request order, one PNG per request."""
        from objgan_tpu.data.tokenizer import Vocab

        caps = [f"a cat number {w}" for w in
                ("one", "two", "three", "four", "five")]
        vocab = Vocab.build(caps)
        reqs = [{"id": i, "caption": c} for i, c in enumerate(caps)]
        got = []
        # output_dir -> tmp: no checkpoints there, stages run untrained
        # (the WARNING path); serving must not depend on trained weights
        stats = run_serve(tiny_cfg, vocab, reqs, str(tmp_path / "out"),
                          batch_size=4, emit=got.append,
                          output_dir=str(tmp_path))
        assert stats["requests"] == 5 and stats["batches"] == 2
        assert [r["id"] for r in got] == [0, 1, 2, 3, 4]
        for r in got:
            assert os.path.exists(r["image"])
            for label, box in r["objects"]:
                assert isinstance(label, int) and len(box) == 4
        assert stats["req_per_s"] > 0

    def test_reproducible_for_fixed_seed_and_order(self, tiny_cfg,
                                                   tmp_path):
        from PIL import Image

        from objgan_tpu.data.tokenizer import Vocab

        caps = ["a cat number one", "a cat number two"]
        vocab = Vocab.build(caps)
        imgs = []
        for run in range(2):
            d = tmp_path / f"o{run}"
            run_serve(tiny_cfg, vocab,
                      [{"id": 0, "caption": caps[0]},
                       {"id": 1, "caption": caps[1]}],
                      str(d), batch_size=2, output_dir=str(tmp_path))
            imgs.append(np.asarray(Image.open(d / "serve_0.png")))
        np.testing.assert_array_equal(imgs[0], imgs[1])

    def test_oversized_vocab_rejected(self, tiny_cfg, tmp_path):
        from objgan_tpu.data.tokenizer import Vocab

        vocab = Vocab.build(
            " ".join(f"w{i}" for i in range(tiny_cfg.TEXT.VOCAB_SIZE + 5))
            for _ in range(1))
        with pytest.raises(ValueError, match="VOCAB_SIZE"):
            run_serve(tiny_cfg, vocab, [{"id": 0, "caption": "w1"}],
                      str(tmp_path), batch_size=2,
                      output_dir=str(tmp_path))


def test_serve_cli_end_to_end(tmp_path):
    """serve.py over a JSONL file: one JSON response per request on stdout,
    PNGs on disk, stats line on stderr."""
    from tests.test_eval_cli import TINY_YML

    cfg = tmp_path / "tiny.yml"
    cfg.write_text(TINY_YML + f"OUTPUT_DIR: {tmp_path}\n")
    req_file = tmp_path / "reqs.jsonl"
    req_file.write_text(
        '{"id": "r0", "caption": "two dogs play"}\n'
        "a bird on a branch\n"
        '{"id": "r2", "caption": "two dogs run"}\n')
    out_dir = tmp_path / "served"
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import runpy,sys; sys.argv = sys.argv[1:];"
         "runpy.run_path(sys.argv[0], run_name='__main__')",
         os.path.join(REPO, "serve.py"),
         "--cfg", str(cfg), "--input", str(req_file),
         "--out", str(out_dir), "--batch", "2", "--vocab_from_input"],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    resps = [json.loads(ln) for ln in r.stdout.splitlines()
             if ln.startswith("{")]
    assert [x["id"] for x in resps] == ["r0", 1, "r2"]
    for x in resps:
        assert os.path.exists(x["image"])
    assert "cannot match any trained checkpoint" in r.stderr
    stats = json.loads(r.stderr.splitlines()[-1])["served"]
    assert stats["requests"] == 3 and stats["batches"] == 2
