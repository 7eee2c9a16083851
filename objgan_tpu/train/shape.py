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


class ShapeTrainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.g = ShapeGenerator(cfg)
        self.d = ShapeDiscriminator(cfg)
        self.g_tx = optax.adam(cfg.SHAPE.LEARNING_RATE, b1=0.5, b2=0.999)
        self.d_tx = optax.adam(cfg.SHAPE.LEARNING_RATE, b1=0.5, b2=0.999)

    def init_state(self, rng: jax.Array, batch, label_table=None):
        cfg = self.cfg
        k1, k2, k3, k4 = jax.random.split(rng, 4)
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
        )

    def _losses(self, g_params, d_params, state, batch, rng):
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
        g_l, aux = shape_g_loss(
            fake_logits_g, [sg(f) for f in real_feats], fake_feats,
            batch["shapes"], mask_logits, batch["obj_valid"],
            cfg.SHAPE.LAMBDA_FM,
        )
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
