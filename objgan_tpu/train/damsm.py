"""DAMSM pretrainer (the reference's ``pretrain_DAMSM.py`` — SURVEY.md §3.5;
reference tree unavailable). Trains both encoders jointly with the
bidirectional matching losses; one jitted step, data-parallel ready.

The lineage clips the RNN encoder's gradients at ``RNN_GRAD_CLIP`` (0.25);
we apply per-branch clipping exactly there and leave the CNN unclipped.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from objgan_tpu.core.config import Config
from objgan_tpu.train.common import make_multi_step
from objgan_tpu.losses.damsm_loss import damsm_loss
from objgan_tpu.models.damsm import build_image_encoder, build_text_encoder


class DamsmTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    text_params: Any
    img_params: Any
    text_opt: Any
    img_opt: Any


class DamsmTrainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.text_enc = build_text_encoder(cfg)
        self.img_enc = build_image_encoder(cfg)
        self.text_tx = optax.chain(
            optax.clip_by_global_norm(cfg.TRAIN.RNN_GRAD_CLIP),
            optax.adam(cfg.TRAIN.ENCODER_LR, b1=0.5, b2=0.999),
        )
        img_adam = optax.adam(cfg.TRAIN.ENCODER_LR, b1=0.5, b2=0.999)
        if cfg.TEXT.CNN_BACKBONE == "inception":
            # the Inception backbone is frozen (stop_gradient in
            # InceptionEncoder): its grads are identically zero, so plain
            # Adam would allocate, update, and checkpoint ~190 MB of m/v
            # moments that can never change — mask the optimizer down to
            # the trainable emb_features/emb_cnn_code projections
            def _trainable(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: not any(
                        getattr(k, "key", None) == "backbone" for k in path
                    ), params)

            self.img_tx = optax.masked(img_adam, _trainable)
        else:
            self.img_tx = img_adam

    def init_state(self, rng: jax.Array, batch) -> DamsmTrainState:
        from objgan_tpu.data.wire import from_wire

        batch = from_wire(self.cfg, batch)
        k1, k2 = jax.random.split(rng)
        text_params = self.text_enc.init(
            k1, batch["captions"], batch["cap_lens"]
        )
        img_params = self.img_enc.init(k2, batch["images"][-1])
        return DamsmTrainState(
            step=jnp.zeros((), jnp.int32),
            text_params=text_params,
            img_params=img_params,
            text_opt=self.text_tx.init(text_params),
            img_opt=self.img_tx.init(img_params),
        )

    def loss(self, text_params, img_params, batch, rng):
        from objgan_tpu.data.wire import from_wire

        batch = from_wire(self.cfg, batch)
        words, sent = self.text_enc.apply(
            text_params, batch["captions"], batch["cap_lens"],
            deterministic=False, rngs={"dropout": rng},
        )
        regions, global_f = self.img_enc.apply(img_params, batch["images"][-1])
        total, aux = damsm_loss(
            regions, global_f, words, sent, batch["cap_lens"],
            batch["class_ids"], self.cfg.TRAIN.SMOOTH,
        )
        return total, aux

    def train_step(self, state: DamsmTrainState, batch, rng):
        (loss, aux), (tg, ig) = jax.value_and_grad(
            self.loss, argnums=(0, 1), has_aux=True
        )(state.text_params, state.img_params, batch, rng)
        t_upd, t_opt = self.text_tx.update(tg, state.text_opt,
                                           state.text_params)
        i_upd, i_opt = self.img_tx.update(ig, state.img_opt, state.img_params)
        new = state.replace(
            step=state.step + 1,
            text_params=optax.apply_updates(state.text_params, t_upd),
            img_params=optax.apply_updates(state.img_params, i_upd),
            text_opt=t_opt,
            img_opt=i_opt,
        )
        aux["damsm_total"] = loss
        return new, aux

    def multi_train_step(self, state: DamsmTrainState, batches, rng):
        """K chained steps per device execution (dispatch amortization)."""
        return make_multi_step(self.train_step)(state, batches, rng)

    def jitted_multi_step(self, donate: bool = True):
        return jax.jit(self.multi_train_step,
                       donate_argnums=(0,) if donate else ())

    def jitted_train_step(self):
        return jax.jit(self.train_step, donate_argnums=(0,))
