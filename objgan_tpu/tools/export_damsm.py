"""One-shot DAMSM checkpoint export CLI — the inverse of ``convert_damsm``.

``convert_damsm`` brings reference-pretrained encoders INTO this framework;
this tool takes encoders trained HERE back OUT as the lineage's
``text_encoder.pth`` / ``image_encoder.pth`` state dicts (SURVEY.md §3.5
artifact layout), so reference tooling — or any PyTorch AttnGAN/Obj-GAN
derivative — can consume checkpoints produced on TPU:

    python -m objgan_tpu.tools.export_damsm --cfg cfg/damsm_coco.yml \\
        --ckpt out/coco_damsm/ckpt \\
        --text_pth text_encoder.pth --image_pth image_encoder.pth

The text encoder exports exactly (every parameter transfers; torch's two
LSTM bias vectors import summed, so the export writes ``bias_ih = b``,
``bias_hh = 0`` — numerically identical in any torch forward). The image
encoder exports only when the checkpoint was trained with
``TEXT.CNN_BACKBONE: inception`` (the lineage CNN_ENCODER *is* torchvision
Inception-v3); the default "InceptionLite" encoder has no PyTorch
counterpart by documented divergence (models/damsm.py) and is refused with
this explanation. G_NET/D_NET export is impossible for the same reason the
import is best-effort: the GroupNorm-for-BatchNorm divergence
(core/name_maps.py) leaves no BN statistics to write.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import jax
import numpy as np


def _save_pth(sd: Dict[str, np.ndarray], path: str) -> None:
    import torch

    # np.array(copy=True): jax leaves export as non-writable views, which
    # torch.from_numpy (zero-copy) warns about
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               path)


def export(cfg, ckpt_dir: str, text_pth: str, image_pth: str | None = None):
    """Restore the latest ``DamsmTrainState`` under ``ckpt_dir`` and write
    lineage ``.pth`` state dicts. Returns the restored state."""
    from objgan_tpu.core import checkpoint as ckpt
    from objgan_tpu.core.name_maps import (
        export_cnn_encoder, export_rnn_encoder,
    )
    from objgan_tpu.data.synthetic import synthetic_batch
    from objgan_tpu.train.damsm import DamsmTrainer

    if image_pth and cfg.TEXT.CNN_BACKBONE != "inception":
        raise SystemExit(
            "--image_pth requires a checkpoint trained with "
            "TEXT.CNN_BACKBONE: inception — the default InceptionLite "
            "image encoder has no PyTorch counterpart (documented "
            "divergence, models/damsm.py), so there is no lineage "
            "image_encoder.pth layout to export it as")

    rng = jax.random.PRNGKey(0)
    trainer = DamsmTrainer(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        batch = synthetic_batch(cfg, rng, 2)
        batch["images"] = [batch["images"][-1]]
        state = trainer.init_state(rng, batch)
        manager = ckpt.make_manager(ckpt_dir)
        restored = ckpt.restore_latest(manager, state)
    if restored is None:
        raise SystemExit(f"no checkpoint found under {ckpt_dir}")
    print(f"restored DamsmTrainState (step {int(restored.step)}) "
          f"from {ckpt_dir}")

    text_sd = export_rnn_encoder(restored.text_params)
    _save_pth(text_sd, text_pth)
    print(f"wrote {text_pth} ({len(text_sd)} tensors — lineage "
          f"RNN_ENCODER layout, exact)")
    if image_pth:
        img_sd = export_cnn_encoder(restored.img_params)
        _save_pth(img_sd, image_pth)
        print(f"wrote {image_pth} ({len(img_sd)} tensors — lineage "
              f"CNN_ENCODER layout over torchvision Inception-v3)")
    return restored


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--cfg", dest="cfg_file", default=None,
                    help="the SAME cfg the checkpoint was trained with "
                         "(dims must match for the Orbax restore)")
    ap.add_argument("--ckpt", required=True,
                    help="Orbax DamsmTrainState checkpoint directory "
                         "(a pretrain_DAMSM output's ckpt/ dir)")
    ap.add_argument("--text_pth", required=True,
                    help="output lineage text_encoder.pth")
    ap.add_argument("--image_pth", default=None,
                    help="output lineage image_encoder.pth (only for "
                         "TEXT.CNN_BACKBONE: inception checkpoints)")
    args = ap.parse_args()

    from objgan_tpu.core.config import Config, cfg_from_file

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    for out in (args.text_pth, args.image_pth):
        if out and os.path.dirname(out):
            os.makedirs(os.path.dirname(out), exist_ok=True)
    export(cfg, args.ckpt, args.text_pth, args.image_pth)


if __name__ == "__main__":
    main()
