"""Stage-A trainer/sampler (the reference's ``box_generation/train.py`` /
``sample.py`` — SURVEY.md §2.1/§3.3; reference tree unavailable).

Teacher-forced MLE: cross-entropy over labels (with STOP) + GMM NLL over GT
boxes, with the lineage's gradient clipping. Sampling is the jitted
``lax.scan`` decode in the model (BASELINE.json config #1 measures this
single-caption on CPU — jit makes the per-step latency XLA-fused).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from objgan_tpu.core.config import Config
from objgan_tpu.train.common import make_multi_step
from objgan_tpu.models.box_generator import BoxGenerator, box_loss


class BoxTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt: Any


class BoxTrainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.model = BoxGenerator(cfg)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.BOX.GRAD_CLIP),
            optax.adam(cfg.BOX.LEARNING_RATE),
        )

    def init_state(self, rng: jax.Array, batch) -> BoxTrainState:
        params = self.model.init(
            rng, batch["captions"], batch["cap_lens"], batch["labels"],
            batch["boxes"], batch["obj_valid"],
        )
        return BoxTrainState(jnp.zeros((), jnp.int32), params,
                             self.tx.init(params))

    def loss(self, params, batch, rng=None):
        out = self.model.apply(
            params, batch["captions"], batch["cap_lens"], batch["labels"],
            batch["boxes"], batch["obj_valid"],
            ss_prob=self.cfg.BOX.SCHEDULED_SAMPLING_PROB, rng=rng,
        )
        return box_loss(out, batch["labels"], batch["boxes"],
                        batch["obj_valid"], self.cfg.OBJ.GMM_COMPONENTS,
                        gmm_mode=self.cfg.OBJ.GMM_MODE)

    def train_step(self, state: BoxTrainState, batch, rng=None):
        (loss, aux), grads = jax.value_and_grad(self.loss, has_aux=True)(
            state.params, batch, rng
        )
        upd, opt = self.tx.update(grads, state.opt, state.params)
        new = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, upd),
            opt=opt,
        )
        aux["box_total"] = loss
        return new, aux

    def sample(self, state: BoxTrainState, captions, cap_lens, rng):
        return self.model.apply(
            state.params, captions, cap_lens, rng, method=BoxGenerator.sample
        )

    def beam_sample(self, state: BoxTrainState, captions, cap_lens, rng):
        return self.model.apply(
            state.params, captions, cap_lens, rng,
            beam_size=self.cfg.BOX.BEAM_SIZE,
            method=BoxGenerator.beam_sample,
        )

    def multi_train_step(self, state: BoxTrainState, batches, rng):
        """K chained steps per device execution (dispatch amortization)."""
        return make_multi_step(self.train_step)(state, batches, rng)

    def jitted_multi_step(self, donate: bool = True):
        return jax.jit(self.multi_train_step,
                       donate_argnums=(0,) if donate else ())

    def jitted_train_step(self):
        return jax.jit(self.train_step, donate_argnums=(0,))

    def jitted_sample(self):
        return jax.jit(self.sample)

    def jitted_beam_sample(self):
        return jax.jit(self.beam_sample)
