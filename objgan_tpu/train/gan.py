"""Stage-C adversarial trainer (the reference's ``condGANTrainer`` — hot path
SURVEY.md §3.1; reference tree unavailable).

TPU-native redesign of the alternating-update loop: instead of three separate
D backward passes plus a G backward per step (the PyTorch structure), ONE
jitted step computes every gradient in a single backward with stop-gradient
partitioning (SURVEY.md §7.6):

    total = sum_i D_i_loss(d_params_i, real_i, sg(fake_i), wrong)   # D terms
          + objD_loss(objd_params, real, sg(fake))
          + G_loss(sg(d_params), fake) + DAMSM(fake) + KL            # G terms

``sg`` = ``jax.lax.stop_gradient``: D losses see fakes as constants, the G
loss sees D parameters as constants, so ∂total/∂θ_D are exactly the D
gradients and ∂total/∂θ_G exactly the G gradients of the alternating scheme
with simultaneous (same-iterate) updates. Divergence note: the lineage
updates D before computing G's loss (Gauss-Seidel order); we use the Jacobi
order, standard for jitted JAX GANs — one XLA program, no host round trips,
~25% less compute since the G forward is shared.

Data parallelism: params replicated, batch sharded over the ``data`` mesh
axis; XLA inserts the ICI all-reduce for gradients (BASELINE.json config #5).

The generator keeps the lineage's ``copy_G_params`` Polyak average (EMA
weights used for sampling/eval).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from objgan_tpu.core.config import Config, validate_config
from objgan_tpu.train.common import make_multi_step
from objgan_tpu.losses.damsm_loss import sent_loss, words_loss
from objgan_tpu.losses.gan_loss import (
    discriminator_loss,
    generator_adv_loss,
    object_d_loss,
    object_g_loss,
    roll_sent,
)
from objgan_tpu.models.damsm import build_image_encoder, build_text_encoder
from objgan_tpu.models.discriminator import ObjectDNet, build_discriminators
from objgan_tpu.models.generator import GNet, kl_loss


def _default_label_table(cfg: Config, rng) -> jnp.ndarray:
    """Frozen label-embedding table. For the COCO class inventory this is
    the GloVe class-name table (paper: object labels are GloVe embeddings;
    random fallback vectors stand in per-word when no glove file is on
    disk — data/glove.py). Non-COCO class counts get a random table."""
    if cfg.OBJ.NUM_CLASSES == 81:
        from objgan_tpu.data.glove import coco_label_table, resolve_glove_path

        return jnp.asarray(coco_label_table(
            cfg.OBJ.LABEL_DIM,
            glove_path=resolve_glove_path(cfg, cfg.OBJ.LABEL_DIM),
        ))
    return jax.random.normal(
        rng, (cfg.OBJ.NUM_CLASSES, cfg.OBJ.LABEL_DIM)
    ) * 0.02


class GanTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_opt: Any
    ema_g_params: Any
    d_params: Tuple[Any, ...]
    d_opt: Tuple[Any, ...]
    objd_params: Any
    objd_opt: Any
    text_params: Any = flax.struct.field(pytree_node=True)  # frozen
    img_params: Any = flax.struct.field(pytree_node=True)  # frozen
    label_table: jnp.ndarray = flax.struct.field(pytree_node=True)  # frozen


class GanTrainer:
    """Builds models/optimizers and exposes jitted train/sample steps."""

    def __init__(self, cfg: Config, ema_decay: float = 0.999):
        self.cfg = cfg
        self.ema_decay = ema_decay
        self.g_net = GNet(cfg)
        # cfg.merged() already validates; this covers replace()-built
        # configs (tests, programmatic callers) with the same single rule
        # set instead of a drift-prone inline copy of the D_DTYPE check
        validate_config(cfg)
        d_dt = (jnp.bfloat16 if (cfg.GAN.D_DTYPE == "compute"
                                 and cfg.DTYPE == "bfloat16")
                else jnp.float32)
        self.d_nets = build_discriminators(cfg, dtype=d_dt)
        self.obj_d = ObjectDNet(cfg, dtype=d_dt)
        self.text_enc = build_text_encoder(cfg)
        self.img_enc = build_image_encoder(cfg)
        self.g_tx = optax.adam(cfg.TRAIN.GENERATOR_LR, b1=0.5, b2=0.999)
        self.d_tx = optax.adam(cfg.TRAIN.DISCRIMINATOR_LR, b1=0.5, b2=0.999)

    # -- init ---------------------------------------------------------------

    def init_state(self, rng: jax.Array, batch: Dict[str, jnp.ndarray],
                   text_params=None, img_params=None,
                   label_table=None) -> GanTrainState:
        from objgan_tpu.data.wire import from_wire

        batch = from_wire(self.cfg, batch)
        cfg = self.cfg
        # 6 fixed consumers + one per D scale + the object D: sized off
        # BRANCH_NUM so a deeper pyramid can never silently reuse a key
        # (ks[6+i] collided with a fixed objd slot at BRANCH_NUM >= 5)
        ks = list(jax.random.split(rng, 7 + len(self.d_nets)))
        b = batch["captions"].shape[0]
        t = batch["captions"].shape[1]

        if text_params is None:
            text_params = self.text_enc.init(
                ks[0], batch["captions"], batch["cap_lens"]
            )
        if img_params is None:
            img_params = self.img_enc.init(ks[1], batch["images"][-1])
        if label_table is None:
            label_table = _default_label_table(cfg, ks[2])

        words, sent = self.text_enc.apply(
            text_params, batch["captions"], batch["cap_lens"]
        )
        word_mask = jnp.arange(t)[None] >= batch["cap_lens"][:, None]
        labels_emb = label_table[batch["labels"]]
        z = jax.random.normal(ks[3], (b, cfg.GAN.Z_DIM))

        g_params = self.g_net.init(
            {"params": ks[4]}, z, sent, words, word_mask, labels_emb,
            batch["boxes"], batch["shapes"], batch["obj_valid"], ks[5]
        )
        d_params = tuple(
            d.init(
                ks[6 + i], img, sent,
                jnp.zeros((*img.shape[:3], 1), img.dtype),  # layout canvas
            )
            for i, (d, img) in enumerate(zip(self.d_nets, batch["images"]))
        )
        objd_params = self.obj_d.init(
            ks[6 + len(self.d_nets)], batch["images"][-1], batch["boxes"],
            labels_emb
        )
        return GanTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_opt=self.g_tx.init(g_params),
            # fresh buffers: the EMA must not alias g_params or donation of
            # the state would donate the same buffer twice
            ema_g_params=jax.tree.map(jnp.copy, g_params),
            d_params=d_params,
            d_opt=tuple(self.d_tx.init(p) for p in d_params),
            objd_params=objd_params,
            objd_opt=self.d_tx.init(objd_params),
            text_params=text_params,
            img_params=img_params,
            label_table=label_table,
        )

    # -- the single fused step ---------------------------------------------

    def _losses(self, g_params, d_params, objd_params, state, batch, rng):
        cfg = self.cfg
        sg = jax.lax.stop_gradient
        b, t = batch["captions"].shape
        k_z, k_ca = jax.random.split(rng)

        words, sent = self.text_enc.apply(
            state.text_params, batch["captions"], batch["cap_lens"]
        )
        words, sent = sg(words), sg(sent)
        word_mask = jnp.arange(t)[None] >= batch["cap_lens"][:, None]
        labels_emb = sg(state.label_table[batch["labels"]])
        z = jax.random.normal(k_z, (b, cfg.GAN.Z_DIM))

        g_out = self.g_net.apply(
            g_params, z, sent, words, word_mask, labels_emb, batch["boxes"],
            batch["shapes"], batch["obj_valid"], k_ca
        )
        fakes = g_out["images"]
        metrics: Dict[str, jnp.ndarray] = {}

        # per-scale layout occupancy canvas: Obj-GAN's patch-level layout
        # conditioning for the D's (paper §3.4). Rasterized once at the
        # finest scale and average-pooled down.
        from objgan_tpu.ops import rasterize as _rast

        top = cfg.branch_sizes[-1]
        shape_maps = _rast.paste_masks(
            batch["shapes"], batch["boxes"], top, top
        )
        layouts = {}
        canvas = _rast.layout_map(shape_maps, batch["obj_valid"])  # (B,T,T,1)
        for size in reversed(cfg.branch_sizes):
            if size != top:
                f = layouts[size * 2].shape[1] // size
                canvas = jax.lax.reduce_window(
                    layouts[size * 2], 0.0, jax.lax.add,
                    (1, f, f, 1), (1, f, f, 1), "VALID",
                ) / (f * f)
            layouts[size] = canvas
        layouts = {k: sg(v) for k, v in layouts.items()}

        # cfg.GAN.REMAT == "stages": rematerialize every D/encoder forward —
        # only their (tiny) logits are saved for the backward; trunk
        # activations are recomputed. See GanConfig.REMAT for the roofline
        # motivation and BASELINE.md round-3 for the measurement.
        ck = jax.checkpoint if cfg.GAN.REMAT == "stages" else (lambda f: f)

        # ---- D terms (fakes severed) ----
        d_total = jnp.float32(0.0)
        wrong_sent = roll_sent(sent)
        for i, dnet in enumerate(self.d_nets):
            real, fake = batch["images"][i], sg(fakes[i])
            lay = layouts[cfg.branch_sizes[i]]

            def real_pair(p, real, lay, sent, wrong_sent, dnet=dnet):
                # one real trunk shared by the matched and mismatched pairs
                trunk = dnet.apply(p, real, lay, method="trunk")
                return (dnet.apply(p, trunk, sent, method="heads"),
                        dnet.apply(p, trunk, wrong_sent, method="heads"))

            out_real, out_wrong = ck(real_pair)(
                d_params[i], real, lay, sent, wrong_sent
            )
            out_fake = ck(dnet.apply)(d_params[i], fake, sent, lay)
            d_i, aux = discriminator_loss(out_real, out_fake, out_wrong)
            d_total = d_total + d_i
            metrics[f"d_loss{i}"] = d_i
            # per-term breakdown (real/fake/wrong x cond/uncond), suffixed
            # per scale: D-collapse diagnosis needs to see WHICH term
            # diverged, not just the blended d_loss{i}
            metrics.update({f"{k}{i}": v for k, v in aux.items()})
        objd_real = ck(self.obj_d.apply)(
            objd_params, batch["images"][-1], batch["boxes"], labels_emb
        )
        objd_fake = ck(self.obj_d.apply)(
            objd_params, sg(fakes[-1]), batch["boxes"], labels_emb
        )
        objd_l, objd_aux = object_d_loss(
            objd_real, objd_fake, batch["labels"], batch["obj_valid"]
        )
        d_total = d_total + objd_l
        metrics.update(objd_aux)

        # ---- G terms (D params severed) ----
        g_total = jnp.float32(0.0)
        for i, dnet in enumerate(self.d_nets):
            out_fake_g = ck(dnet.apply)(sg(d_params[i]), fakes[i], sent,
                                        layouts[cfg.branch_sizes[i]])
            g_adv = generator_adv_loss(out_fake_g)
            g_total = g_total + g_adv
            metrics[f"g_adv{i}"] = g_adv
        objd_fake_g = ck(self.obj_d.apply)(
            sg(objd_params), fakes[-1], batch["boxes"], labels_emb
        )
        g_obj = object_g_loss(objd_fake_g, batch["labels"], batch["obj_valid"])
        g_total = g_total + g_obj
        metrics["g_obj"] = g_obj

        # DAMSM on the finest fake (frozen image encoder)
        regions, global_f = ck(self.img_enc.apply)(state.img_params, fakes[-1])
        sm = cfg.TRAIN.SMOOTH
        w0, w1, _ = words_loss(
            regions, words, batch["cap_lens"], batch["class_ids"],
            sm.GAMMA1, sm.GAMMA2, sm.GAMMA3,
        )
        s0, s1 = sent_loss(global_f, sent, batch["class_ids"], sm.GAMMA3)
        damsm = sm.LAMBDA * (w0 + w1 + s0 + s1)
        kl = kl_loss(g_out["mu"], g_out["logvar"])
        g_total = g_total + damsm + kl
        metrics.update(g_loss=g_total, d_loss=d_total, damsm=damsm, kl=kl)

        return d_total + g_total, metrics

    def train_step(self, state: GanTrainState, batch, rng):
        from objgan_tpu.data.wire import from_wire

        batch = from_wire(self.cfg, batch)  # no-op for classic batches

        def loss_fn(g_params, d_params, objd_params):
            return self._losses(g_params, d_params, objd_params, state, batch,
                                rng)

        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (g_grads, d_grads, objd_grads), metrics = grad_fn(
            state.g_params, state.d_params, state.objd_params
        )

        g_upd, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_upd)
        new_d_params, new_d_opt = [], []
        for p, o, g in zip(state.d_params, state.d_opt, d_grads):
            upd, o2 = self.d_tx.update(g, o, p)
            new_d_params.append(optax.apply_updates(p, upd))
            new_d_opt.append(o2)
        od_upd, objd_opt = self.d_tx.update(
            objd_grads, state.objd_opt, state.objd_params
        )
        objd_params = optax.apply_updates(state.objd_params, od_upd)
        ema = jax.tree.map(
            lambda e, p: e * self.ema_decay + p * (1.0 - self.ema_decay),
            state.ema_g_params, g_params,
        )
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params, g_opt=g_opt, ema_g_params=ema,
            d_params=tuple(new_d_params), d_opt=tuple(new_d_opt),
            objd_params=objd_params, objd_opt=objd_opt,
        )
        return new_state, metrics

    def multi_train_step(self, state: GanTrainState, batches, rng):
        """K chained train steps in ONE device execution (host->device
        dispatch amortization; see train/common.py:make_multi_step)."""
        return make_multi_step(self.train_step)(state, batches, rng)

    def jitted_multi_step(self, donate: bool = True):
        return jax.jit(self.multi_train_step,
                       donate_argnums=(0,) if donate else ())

    # -- sampling (BASELINE configs #3/#4) ----------------------------------

    def sample(self, state: GanTrainState, batch, rng, use_ema: bool = True):
        """Full text->image sampling with the (EMA) generator."""
        from objgan_tpu.data.wire import from_wire

        batch = from_wire(self.cfg, batch)
        cfg = self.cfg
        b, t = batch["captions"].shape
        k_z, k_ca = jax.random.split(rng)
        words, sent = self.text_enc.apply(
            state.text_params, batch["captions"], batch["cap_lens"]
        )
        word_mask = jnp.arange(t)[None] >= batch["cap_lens"][:, None]
        labels_emb = state.label_table[batch["labels"]]
        z = jax.random.normal(k_z, (b, cfg.GAN.Z_DIM))
        params = state.ema_g_params if use_ema else state.g_params
        return self.g_net.apply(
            params, z, sent, words, word_mask, labels_emb, batch["boxes"],
            batch["shapes"], batch["obj_valid"], k_ca
        )

    def jitted_train_step(self, donate: bool = True):
        return jax.jit(self.train_step, donate_argnums=(0,) if donate else ())

    def jitted_sample(self):
        return jax.jit(self.sample, static_argnames=("use_ema",))
