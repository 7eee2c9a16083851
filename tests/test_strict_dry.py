"""Dry proof of the strict-eval and VGG-perceptual code paths (VERDICT r3
next #5): no pretrained weights exist in this zero-egress image, so these
tests pin the full load → convert → apply pipelines with RANDOMLY
INITIALIZED torchvision-format .pth files. The day a real weights file
appears, strict parity is a download, not a debugging session.

Numbers produced here are meaningless by construction; the assertions are
about the plumbing (CLI exit codes, converter strictness, mode banners).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from tests.test_eval_cli import TINY_YML

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CPU_BOOTSTRAP = (
    "import jax; jax.config.update('jax_platforms','cpu');"
    "import runpy,sys; sys.argv = sys.argv[1:];"
    "runpy.run_path(sys.argv[0], run_name='__main__')"
)


@pytest.mark.slow
def test_strict_eval_cli_runs_through_converted_inception(tmp_path):
    """gan/eval.py --strict --inception_pth <random torchvision-format
    inception_v3 .pth> must run the whole strict path end-to-end: torch
    load -> name-map conversion -> 299px feature extraction -> FID/IS."""
    import torch

    from objgan_tpu.models.inception_v3 import InceptionV3
    from tests.test_inception import _fake_torch_state_dict

    model = InceptionV3()
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 299, 299, 3)))
    pth = tmp_path / "inception_random.pth"
    torch.save(_fake_torch_state_dict(params), str(pth))

    cfg = tmp_path / "tiny.yml"
    cfg.write_text(TINY_YML + f"OUTPUT_DIR: {tmp_path}\n")
    r = subprocess.run(
        [sys.executable, "-c", CPU_BOOTSTRAP,
         os.path.join(REPO, "gan", "eval.py"),
         "--cfg", str(cfg), "--num_batches", "1",
         "--strict", "--inception_pth", str(pth)],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert f"strict-inception (weights: {pth})" in r.stdout
    assert "RANDOM WEIGHTS" not in r.stdout  # that's the --force banner
    for metric in ("FID:", "IS:", "R-precision:"):
        assert metric in r.stdout, r.stdout
    # strict IS carries no lite surrogate disclaimer
    assert "surrogate" not in r.stdout
    # random features are near-constant on tiny synthetic images — the
    # degeneracy guard should speak up rather than let a meaningless FID
    # pass silently (not asserted: depends on init statistics)


@pytest.mark.slow
def test_shape_trainer_loads_vgg_weights_from_pth(tmp_path):
    """shape_generation/main.py with SHAPE.PERCEPTUAL=vgg +
    SHAPE.VGG_WEIGHTS=<random torchvision-format vgg16 .pth> must load,
    convert, and train one step — the Stage-B strict perceptual path."""
    import torch

    from tests.test_vgg import _torch_vgg16

    torch.manual_seed(0)
    pth = tmp_path / "vgg16_random.pth"
    torch.save(_torch_vgg16().state_dict(), str(pth))

    cfg = tmp_path / "tiny.yml"
    # extend the tiny SHAPE section in place (a duplicate `SHAPE:` mapping
    # would be a YAML landmine)
    assert "SHAPE:\n  GF_DIM: 8\n" in TINY_YML
    yml = TINY_YML.replace(
        "SHAPE:\n  GF_DIM: 8\n",
        f"SHAPE:\n  PERCEPTUAL: vgg\n  VGG_WEIGHTS: {pth}\n  GF_DIM: 8\n")
    # trainers shard the batch over the (possibly 8-virtual-device) mesh
    # inherited via XLA_FLAGS — keep BATCH_SIZE divisible by it
    yml = yml.replace("BATCH_SIZE: 2\n", "BATCH_SIZE: 8\n")
    cfg.write_text(yml + f"OUTPUT_DIR: {tmp_path}\n")
    r = subprocess.run(
        [sys.executable, "-c", CPU_BOOTSTRAP,
         os.path.join(REPO, "shape_generation", "main.py"),
         "--cfg", str(cfg), "--max_steps", "1"],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert f"loaded VGG-16 weights from {pth}" in r.stdout
    assert "RANDOM (structural test only)" not in r.stdout
