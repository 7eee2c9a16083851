"""One-shot lineage DAMSM checkpoint conversion CLI.

The reference's ``condGANTrainer.build_models`` loads ``TRAIN.NET_E``
(``text_encoder.pth``) and its sibling ``image_encoder.pth`` before
adversarial training (SURVEY.md §3.1). This tool converts those PyTorch
state dicts into the Orbax ``DamsmTrainState`` checkpoint layout this
framework consumes (docs/CHECKPOINTS.md), so reference-pretrained encoders
drop straight into Stage-C training:

    python -m objgan_tpu.tools.convert_damsm --cfg cfg/damsm_coco.yml \\
        --text_pth text_encoder.pth --image_pth image_encoder.pth \\
        --out /ckpts/coco_damsm_converted

then set ``TRAIN.NET_E: /ckpts/coco_damsm_converted`` in the GAN yml.

Text-encoder dims (vocab size, GloVe dim, per-direction hidden) are read
from the state dict itself and override the cfg so the rebuilt
``RNNEncoder`` matches the checkpoint exactly; a lineage ``image_encoder``
requires the Inception-v3 backbone (``TEXT.CNN_BACKBONE: inception``),
which is switched on automatically when the state dict carries torchvision
Inception module names.
"""

from __future__ import annotations

import argparse
from typing import Dict

import jax
import numpy as np


def _load_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    import torch

    # plain state dicts load under weights_only=True (no arbitrary-pickle
    # code execution); downloaded lineage .pth files are untrusted, so only
    # fall back to the unsafe loader with a loud warning
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        print(f"WARNING: {path} is not a plain tensor state dict; falling "
              f"back to weights_only=False (executes pickle code — only do "
              f"this for files you trust)", flush=True)
        sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):  # common wrapper layouts
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return sd


def convert(cfg, text_pth: str, image_pth: str | None, out_dir: str):
    """Build a ``DamsmTrainState`` from lineage .pth files and save it as an
    Orbax step-0 checkpoint under ``out_dir``. Returns the state."""
    from objgan_tpu.core import checkpoint as ckpt
    from objgan_tpu.core.name_maps import (
        load_cnn_encoder_checkpoint, load_rnn_encoder_checkpoint,
    )
    from objgan_tpu.data.synthetic import synthetic_batch
    from objgan_tpu.train.damsm import DamsmTrainer

    text_sd = _load_state_dict(text_pth)
    vocab, glove_dim = text_sd["encoder.weight"].shape
    hidden = text_sd["rnn.weight_hh_l0"].shape[1]
    overrides = {"TEXT": {
        "VOCAB_SIZE": int(vocab),
        "GLOVE_DIM": int(glove_dim),
        "HIDDEN_DIM": int(hidden),
        "EMBEDDING_DIM": int(2 * hidden),
    }}
    img_sd = None
    if image_pth:
        img_sd = _load_state_dict(image_pth)
        if not any(k.startswith("Mixed_5b") for k in img_sd):
            raise SystemExit(
                "image_encoder state dict has no torchvision Inception-v3 "
                "module names — only the lineage CNN_ENCODER layout is "
                "convertible (its backbone IS Inception-v3)")
        overrides["TEXT"]["CNN_BACKBONE"] = "inception"
    cfg = cfg.merged(overrides)
    print(f"text encoder: vocab={vocab} glove_dim={glove_dim} "
          f"hidden={hidden} (cfg overridden to match)")

    rng = jax.random.PRNGKey(0)
    trainer = DamsmTrainer(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        batch = synthetic_batch(cfg, rng, 2)
        batch["images"] = [batch["images"][-1]]
        state = trainer.init_state(rng, batch)
        text_params = load_rnn_encoder_checkpoint(state.text_params, text_sd)
        state = state.replace(text_params=text_params)
        print(f"text_encoder: all {len(text_sd)} params transferred")
        if img_sd is not None:
            img_params = load_cnn_encoder_checkpoint(state.img_params, img_sd)
            state = state.replace(img_params=img_params)
            print("image_encoder: backbone + projections transferred")

    manager = ckpt.make_manager(out_dir)
    ckpt.save(manager, 0, state)
    manager.wait_until_finished()
    print(f"wrote Orbax DamsmTrainState checkpoint (step 0) to {out_dir}\n"
          f"point cfg.TRAIN.NET_E at this directory for Stage-C training")
    return state


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--cfg", dest="cfg_file", default=None)
    ap.add_argument("--text_pth", required=True,
                    help="lineage text_encoder.pth")
    ap.add_argument("--image_pth", default=None,
                    help="lineage image_encoder.pth (CNN_ENCODER over "
                         "torchvision Inception-v3)")
    ap.add_argument("--out", required=True,
                    help="output Orbax checkpoint directory (NET_E target)")
    args = ap.parse_args()

    from objgan_tpu.core.config import Config, cfg_from_file

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    convert(cfg, args.text_pth, args.image_pth, args.out)


if __name__ == "__main__":
    main()
