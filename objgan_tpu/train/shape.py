"""Stage-B trainer (the reference's ``shape_generation/main.py`` trainer —
SURVEY.md §2.2/§3.4; reference tree unavailable).

Same single-backward stop-gradient partitioning as the Stage-C trainer:
D loss on (real GT masks, severed fakes) + G loss (adv through severed D +
feature matching + mask reconstruction) in one jitted step.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from objgan_tpu.core.config import Config
from objgan_tpu.train.common import make_multi_step
from objgan_tpu.losses.gan_loss import shape_d_loss, shape_g_loss
from objgan_tpu.models.shape_generator import ShapeDiscriminator, ShapeGenerator


class ShapeTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    label_table: jnp.ndarray  # frozen
    vgg_params: Any = None    # frozen; only with SHAPE.PERCEPTUAL == "vgg"


class ShapeTrainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.g = ShapeGenerator(cfg)
        self.d = ShapeDiscriminator(cfg)
        self.vgg = None
        if cfg.SHAPE.PERCEPTUAL == "vgg":
            from objgan_tpu.models.vgg import VGG16

            self.vgg = VGG16(stop_at="relu4_3")  # last perceptual tap
        elif cfg.SHAPE.PERCEPTUAL != "fm":
            raise ValueError(
                f"SHAPE.PERCEPTUAL must be 'fm' or 'vgg', got "
                f"{cfg.SHAPE.PERCEPTUAL!r}")
        self.g_tx = optax.adam(cfg.SHAPE.LEARNING_RATE, b1=0.5, b2=0.999)
        self.d_tx = optax.adam(cfg.SHAPE.LEARNING_RATE, b1=0.5, b2=0.999)

    def _init_vgg(self, rng):
        cfg = self.cfg
        s = cfg.OBJ.SHAPE_SIZE
        params = self.vgg.init(rng, jnp.zeros((1, s, s, 3)))
        if cfg.SHAPE.VGG_WEIGHTS:
            import torch

            from objgan_tpu.models.vgg import load_torchvision_vgg16

            sd = torch.load(cfg.SHAPE.VGG_WEIGHTS, map_location="cpu",
                            weights_only=True)
            params = load_torchvision_vgg16(params, sd)
            print(f"loaded VGG-16 weights from {cfg.SHAPE.VGG_WEIGHTS}")
        else:
            print("WARNING: SHAPE.PERCEPTUAL=vgg without SHAPE.VGG_WEIGHTS — "
                  "perceptual features are RANDOM (structural test only)")
        return params

    def init_state(self, rng: jax.Array, batch, label_table=None):
        from objgan_tpu.data.wire import from_wire

        batch = from_wire(self.cfg, batch)
        cfg = self.cfg
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        if label_table is None:
            from objgan_tpu.train.gan import _default_label_table

            label_table = _default_label_table(cfg, k3)
        labels_emb = label_table[batch["labels"]]
        g_params = self.g.init(k1, batch["boxes"], labels_emb,
                               batch["obj_valid"], k4)
        d_params = self.d.init(k2, batch["shapes"], batch["boxes"], labels_emb)
        return ShapeTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, d_params=d_params,
            g_opt=self.g_tx.init(g_params), d_opt=self.d_tx.init(d_params),
            label_table=label_table,
            vgg_params=self._init_vgg(k5) if self.vgg is not None else None,
        )

    def _losses(self, g_params, d_params, state, batch, rng):
        from objgan_tpu.data.wire import from_wire

        batch = from_wire(self.cfg, batch)
        cfg = self.cfg
        sg = jax.lax.stop_gradient
        labels_emb = sg(state.label_table[batch["labels"]])
        mask_logits = self.g.apply(
            g_params, batch["boxes"], labels_emb, batch["obj_valid"], rng
        )
        fake_masks = jax.nn.sigmoid(mask_logits)
        real_logits, real_feats = self.d.apply(
            d_params, batch["shapes"], batch["boxes"], labels_emb
        )
        fake_logits_d, _ = self.d.apply(
            d_params, sg(fake_masks), batch["boxes"], labels_emb
        )
        d_l = shape_d_loss(real_logits, fake_logits_d, batch["obj_valid"])

        fake_logits_g, fake_feats = self.d.apply(
            sg(d_params), fake_masks, batch["boxes"], labels_emb
        )
        # lineage perceptual term: VGG features when configured (paper §3.2),
        # else the D-feature-matching substitute (documented divergence)
        lambda_fm = 0.0 if self.vgg is not None else cfg.SHAPE.LAMBDA_FM
        g_l, aux = shape_g_loss(
            fake_logits_g, [sg(f) for f in real_feats], fake_feats,
            batch["shapes"], mask_logits, batch["obj_valid"],
            lambda_fm,
        )
        if self.vgg is not None:
            from objgan_tpu.models.vgg import vgg_perceptual_loss

            b, o, s, _ = fake_masks.shape
            per = vgg_perceptual_loss(
                self.vgg, state.vgg_params,
                fake_masks.reshape(b * o, s, s),
                batch["shapes"].reshape(b * o, s, s),
            )
            v = batch["obj_valid"].reshape(b * o).astype(jnp.float32)
            perceptual = jnp.sum(per * v) / jnp.maximum(jnp.sum(v), 1.0)
            g_l = g_l + cfg.SHAPE.LAMBDA_PERCEPTUAL * perceptual
            aux["shape_perceptual"] = perceptual
        aux.update(shape_d=d_l, shape_g=g_l)
        return d_l + g_l, aux

    def train_step(self, state: ShapeTrainState, batch, rng):
        grad_fn = jax.grad(
            lambda gp, dp: self._losses(gp, dp, state, batch, rng),
            argnums=(0, 1), has_aux=True,
        )
        (gg, dg), aux = grad_fn(state.g_params, state.d_params)
        g_upd, g_opt = self.g_tx.update(gg, state.g_opt, state.g_params)
        d_upd, d_opt = self.d_tx.update(dg, state.d_opt, state.d_params)
        new = state.replace(
            step=state.step + 1,
            g_params=optax.apply_updates(state.g_params, g_upd),
            d_params=optax.apply_updates(state.d_params, d_upd),
            g_opt=g_opt, d_opt=d_opt,
        )
        return new, aux

    def multi_train_step(self, state: ShapeTrainState, batches, rng):
        """K chained steps per device execution (dispatch amortization)."""
        return make_multi_step(self.train_step)(state, batches, rng)

    def jitted_multi_step(self, donate: bool = True):
        return jax.jit(self.multi_train_step,
                       donate_argnums=(0,) if donate else ())

    def sample(self, state: ShapeTrainState, boxes, labels, obj_valid, rng):
        """boxes -> masks forward (BASELINE.json config #2)."""
        labels_emb = state.label_table[labels]
        logits = self.g.apply(state.g_params, boxes, labels_emb, obj_valid, rng)
        return jax.nn.sigmoid(logits)

    def jitted_train_step(self):
        return jax.jit(self.train_step, donate_argnums=(0,))

    def jitted_sample(self):
        return jax.jit(self.sample)
