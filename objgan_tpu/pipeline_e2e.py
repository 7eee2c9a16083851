"""End-to-end composed inference: caption -> layout -> shapes -> image.

The reference runs its three stages as separate scripts with files on disk
between them (SURVEY.md §1: "Inter-stage composition is manual"). Here the
full chain compiles into ONE jitted XLA program: the Stage-A scan decode,
the Stage-B conv-LSTM mask synthesis, the DAMSM text encoder, and the
Stage-C cascaded generator — no host round-trips between stages.

States for the three stages are loaded from their per-stage Orbax
checkpoints (or freshly initialized), so training stays per-stage exactly
like the reference while inference is fused.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from objgan_tpu.core.config import Config


class ObjGanPipeline:
    """Composed three-stage sampler."""

    def __init__(self, cfg: Config):
        from objgan_tpu.train.box import BoxTrainer
        from objgan_tpu.train.gan import GanTrainer
        from objgan_tpu.train.shape import ShapeTrainer

        self.cfg = cfg
        self.box = BoxTrainer(cfg)
        self.shape = ShapeTrainer(cfg)
        self.gan = GanTrainer(cfg)

    def init_states(self, rng: jax.Array, batch: Dict) -> Dict:
        """Fresh states (use load_states for checkpointed ones). Init runs
        on the host CPU (the dozens of tiny eager init programs take
        minutes each through a remote-compile TPU path — bench.py's rule);
        callers get host arrays to device_put where they like."""
        k1, k2, k3 = jax.random.split(rng, 3)
        with jax.default_device(jax.devices("cpu")[0]):
            return {
                "box": self.box.init_state(k1, batch),
                "shape": self.shape.init_state(k2, batch),
                "gan": self.gan.init_state(k3, batch),
            }

    def load_states(self, rng: jax.Array, batch: Dict,
                    output_dir: Optional[str] = None,
                    device=None) -> Dict:
        """Restore each stage's latest checkpoint. The gan stage honors
        ``cfg.TRAIN.NET_G`` (the lineage sampling knob, same as
        cli.sample_gan); stages with no checkpoint warn LOUDLY and keep
        untrained weights. Restored states are device_put onto ``device``
        (default: the first default-backend device)."""
        import os

        from objgan_tpu.core import checkpoint as ckpt

        states = self.init_states(rng, batch)
        base = output_dir or self.cfg.OUTPUT_DIR
        with jax.default_device(jax.devices("cpu")[0]):
            for name in ("box", "shape", "gan"):
                d = os.path.join(base, f"{self.cfg.CONFIG_NAME}_{name}",
                                 "ckpt")
                if name == "gan" and self.cfg.TRAIN.NET_G:
                    d = self.cfg.TRAIN.NET_G
                restored = None
                if os.path.isdir(d):
                    mgr = ckpt.make_manager(d)
                    restored = ckpt.restore_latest(mgr, states[name])
                if restored is not None:
                    states[name] = restored
                else:
                    print(f"WARNING: no {name} checkpoint under {d} — the "
                          f"composed pipeline will run this stage with "
                          f"UNTRAINED random weights")
        dev = device or jax.devices()[0]
        return jax.device_put(states, dev)

    def generate(self, states: Dict, captions: jnp.ndarray,
                 cap_lens: jnp.ndarray, rng: jax.Array) -> Dict:
        """caption ids -> dict with layout, masks, and the image pyramid.

        Jit-able end to end; all shapes static.
        """
        cfg = self.cfg
        o = cfg.OBJ.MAX_OBJECTS
        k_box, k_shape, k_gan = jax.random.split(rng, 3)

        # Stage A: layout (the trainer's own sampler — temperature wiring
        # etc. stay defined in exactly one place)
        layout = self.box.sample(states["box"], captions, cap_lens, k_box)
        labels, boxes, valid = (
            layout["labels"], layout["boxes"], layout["obj_valid"]
        )
        # align object axis (BOX.MAX_SEQ_LENGTH) to OBJ.MAX_OBJECTS
        if labels.shape[1] < o:
            pad = o - labels.shape[1]
            labels = jnp.pad(labels, ((0, 0), (0, pad)))
            boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, pad)))
        else:
            labels, boxes, valid = (
                labels[:, :o], boxes[:, :o], valid[:, :o]
            )

        # Stage B: per-object masks (trainer sampler, same reasoning)
        masks = self.shape.sample(states["shape"], boxes, labels, valid,
                                  k_shape)

        # Stage C: image synthesis conditioned on the generated layout
        gan_state = states["gan"]
        batch = {
            "captions": captions,
            "cap_lens": cap_lens,
            "labels": labels,
            "boxes": boxes,
            "shapes": masks,
            "obj_valid": valid,
        }
        out = self.gan.sample(gan_state, batch, k_gan)
        return {
            "labels": labels,
            "boxes": boxes,
            "obj_valid": valid,
            "masks": masks,
            "images": out["images"],
            "grid_attn": out["grid_attn"],
            "obj_attn": out["obj_attn"],
        }

    def jitted_generate(self):
        return jax.jit(self.generate)
