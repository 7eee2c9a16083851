"""Adversarial losses for Stage-C training (lineage ``miscc/losses.py``
semantics — SURVEY.md §2.3 "Losses"; reference tree unavailable).

All functions are pure over discriminator *outputs* (the trainers wire the
model applications), fp32, with sigmoid-cross-entropy on logits rather than
BCE-on-probabilities — numerically safer and fusion-friendly.

Per scale, the discriminator sees three pairs (the lineage's triplet):
  real image + matching sentence   -> 1
  fake image + matching sentence   -> 0
  real image + mismatched sentence -> 0   (batch rolled by one)
plus unconditional real/fake terms, weighted (real+uncond_real)/2 and
(fake+wrong+uncond_fake)/3 as in the lineage.

The object-wise D adds per-object real/fake and class-prediction terms,
masked by object validity (padding never contributes).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def _bce(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Mean sigmoid cross-entropy against a constant target (patch-averaged)."""
    labels = jnp.full_like(logits, target)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


def discriminator_loss(
    out_real: Dict[str, jnp.ndarray],
    out_fake: Dict[str, jnp.ndarray],
    out_wrong: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One patch-D's loss from its outputs on (real, fake, wrong-caption)."""
    cond_real = _bce(out_real["cond"], 1.0)
    cond_fake = _bce(out_fake["cond"], 0.0)
    cond_wrong = _bce(out_wrong["cond"], 0.0)
    uncond_real = _bce(out_real["uncond"], 1.0)
    uncond_fake = _bce(out_fake["uncond"], 0.0)
    loss = (cond_real + uncond_real) / 2.0 + (
        cond_fake + cond_wrong + uncond_fake
    ) / 3.0
    return loss, {
        "d_cond_real": cond_real,
        "d_cond_fake": cond_fake,
        "d_cond_wrong": cond_wrong,
        "d_uncond_real": uncond_real,
        "d_uncond_fake": uncond_fake,
    }


def generator_adv_loss(out_fake: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Generator's adversarial term for one patch D."""
    return _bce(out_fake["cond"], 1.0) + _bce(out_fake["uncond"], 1.0)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def object_d_loss(
    out_real: Dict[str, jnp.ndarray],  # {"obj": (B,O), "cls": (B,O,C)}
    out_fake: Dict[str, jnp.ndarray],
    labels: jnp.ndarray,  # (B, O) int class ids
    obj_valid: jnp.ndarray,  # (B, O)
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Object-wise Fast R-CNN D loss: real/fake + class CE on real objects."""
    rf_real = optax.sigmoid_binary_cross_entropy(
        out_real["obj"], jnp.ones_like(out_real["obj"])
    )
    rf_fake = optax.sigmoid_binary_cross_entropy(
        out_fake["obj"], jnp.zeros_like(out_fake["obj"])
    )
    cls_ce = optax.softmax_cross_entropy_with_integer_labels(
        out_real["cls"], labels
    )
    # aux first, loss = its sum: one place to edit a term so the reported
    # objd_* metrics can never desynchronize from the optimized loss
    aux = {
        "objd_real": _masked_mean(rf_real, obj_valid),
        "objd_fake": _masked_mean(rf_fake, obj_valid),
        "objd_cls": _masked_mean(cls_ce, obj_valid),
    }
    return aux["objd_real"] + aux["objd_fake"] + aux["objd_cls"], aux


def object_g_loss(
    out_fake: Dict[str, jnp.ndarray],
    labels: jnp.ndarray,
    obj_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Generator's object terms: fool real/fake and match the class head."""
    rf = optax.sigmoid_binary_cross_entropy(
        out_fake["obj"], jnp.ones_like(out_fake["obj"])
    )
    cls_ce = optax.softmax_cross_entropy_with_integer_labels(
        out_fake["cls"], labels
    )
    return _masked_mean(rf, obj_valid) + _masked_mean(cls_ce, obj_valid)


def roll_sent(sent_emb: jnp.ndarray) -> jnp.ndarray:
    """Mismatched-caption pairing: roll the batch by one (lineage's wrong
    pairs use shifted indices)."""
    if sent_emb.shape[0] < 2:
        # a batch of 1 rolls onto itself: the "mismatched" sentence IS the
        # matched one, handing the D contradictory cond_real/cond_wrong
        # targets on identical logits every step. Static shape -> this
        # fires at trace time, not mid-training.
        raise ValueError(
            "wrong-pair loss needs batch size >= 2 (a batch of 1 would "
            "pair each image with its own caption as the 'mismatch')")
    return jnp.roll(sent_emb, shift=1, axis=0)


# -- Stage-B (shape GAN) losses --------------------------------------------


def shape_d_loss(real_logits, fake_logits, obj_valid):
    r = optax.sigmoid_binary_cross_entropy(real_logits,
                                           jnp.ones_like(real_logits))
    f = optax.sigmoid_binary_cross_entropy(fake_logits,
                                           jnp.zeros_like(fake_logits))
    return _masked_mean(r, obj_valid) + _masked_mean(f, obj_valid)


def shape_g_loss(fake_logits, real_feats, fake_feats, gt_masks, mask_logits,
                 obj_valid, lambda_fm: float, lambda_recon: float = 10.0):
    """Adversarial + D-feature-matching (perceptual substitute) + mask BCE."""
    adv = _masked_mean(
        optax.sigmoid_binary_cross_entropy(fake_logits,
                                           jnp.ones_like(fake_logits)),
        obj_valid,
    )
    fm = jnp.float32(0.0)
    for rf, ff in zip(real_feats, fake_feats):
        fm = fm + _masked_mean(
            jnp.mean(jnp.abs(rf.astype(jnp.float32) -
                             ff.astype(jnp.float32)), -1),
            obj_valid,
        )
    recon = _masked_mean(
        jnp.mean(
            optax.sigmoid_binary_cross_entropy(mask_logits, gt_masks),
            axis=(-1, -2),
        ),
        obj_valid,
    )
    return adv + lambda_fm * fm + lambda_recon * recon, {
        "shape_adv": adv, "shape_fm": fm, "shape_recon": recon,
    }
