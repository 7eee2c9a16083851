"""DAMSM bidirectional image-text matching losses (``words_loss`` /
``sent_loss`` of the AttnGAN lineage reused by Obj-GAN — SURVEY.md §3.5).

The lineage loops over the batch in Python, truncating each caption to its
length; here everything is one batched fp32 computation with validity masks
(static shapes for XLA), mathematically identical:

  * word-level: every (caption, image) pair gets a gamma2-weighted
    log-sum-exp over per-word cosine similarities to its attention-weighted
    region context; the (B, B) match matrix feeds a symmetric cross-entropy
    against the diagonal.
  * sentence-level: cosine similarity between sentence and global image
    embeddings, same symmetric cross-entropy.

Pairs whose COCO class ids collide are excluded as negatives (the lineage's
``masks`` trick), except the diagonal.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from objgan_tpu.ops.attention import damsm_attention

_NEG_INF = -1e9


def _safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = False):
    """sqrt(max(sum x^2, eps)): finite gradient at x == 0, unlike
    ``jnp.linalg.norm`` (whose 0/0 backward NaNs through masked-out padded
    words even when the forward value is discarded)."""
    return jnp.sqrt(
        jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=keepdims), 1e-12)
    )


def _cosine(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    num = jnp.sum(a * b, axis=axis)
    return num / (_safe_norm(a, axis) * _safe_norm(b, axis))


def _class_mask(class_ids: Optional[jnp.ndarray], batch: int) -> jnp.ndarray:
    """(B, B) True where the pair must be excluded as a negative."""
    if class_ids is None:
        return jnp.zeros((batch, batch), bool)
    same = class_ids[:, None] == class_ids[None, :]
    return same & ~jnp.eye(batch, dtype=bool)


def _symmetric_ce(scores: jnp.ndarray, mask: jnp.ndarray):
    """Cross-entropy of the (B_text, B_img) score matrix against the diagonal,
    both directions (text->image and image->text)."""
    scores = jnp.where(mask, _NEG_INF, scores)
    labels = jnp.arange(scores.shape[0])
    lp0 = jax.nn.log_softmax(scores, axis=1)  # caption i vs all images
    lp1 = jax.nn.log_softmax(scores, axis=0)  # image j vs all captions
    loss0 = -jnp.mean(jnp.take_along_axis(lp0, labels[:, None], 1))
    loss1 = -jnp.mean(jnp.take_along_axis(lp1, labels[None, :], 0))
    return loss0, loss1


def words_loss(
    region_feats: jnp.ndarray,  # (B, L, D) image region features
    words_embs: jnp.ndarray,  # (B, T, D) word features
    cap_lens: jnp.ndarray,  # (B,)
    class_ids: Optional[jnp.ndarray],  # (B,) or None
    gamma1: float,
    gamma2: float,
    gamma3: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (w_loss0, w_loss1, attn (B, B, T, L) fp32 for visualization)."""
    b, t, _ = words_embs.shape
    word_valid = (jnp.arange(t)[None, :] < cap_lens[:, None])  # (B, T)

    # all-pairs attention: caption i's words against image j's regions.
    def per_caption(words_i, valid_i):
        # words_i (T, D) vs all images (B, L, D)
        w = jnp.broadcast_to(words_i[None], (b, *words_i.shape))
        v = jnp.broadcast_to(valid_i[None], (b, valid_i.shape[0]))
        ctx, attn = damsm_attention(w, region_feats, gamma1, v)  # (B, T, D)
        cos = _cosine(w, ctx)  # (B, T)
        cos = jnp.where(valid_i[None, :], gamma2 * cos, _NEG_INF)
        # gamma2-weighted LSE over valid words == log sum exp(gamma2*cos)
        return jax.nn.logsumexp(cos, axis=-1) / gamma2, attn  # (B,), (B,T,L)

    sims, attns = jax.vmap(per_caption)(words_embs, word_valid)  # (B_text, B_img)
    scores = gamma3 * gamma2 * sims  # lineage: log-sum of exp(gamma2 cos) scaled
    mask = _class_mask(class_ids, b)
    loss0, loss1 = _symmetric_ce(scores, mask)
    return loss0, loss1, attns


def sent_loss(
    global_feats: jnp.ndarray,  # (B, D)
    sent_embs: jnp.ndarray,  # (B, D)
    class_ids: Optional[jnp.ndarray],
    gamma3: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    g = global_feats.astype(jnp.float32)
    s = sent_embs.astype(jnp.float32)
    g = g / _safe_norm(g, -1, keepdims=True)
    s = s / _safe_norm(s, -1, keepdims=True)
    scores = gamma3 * jnp.einsum("td,gd->tg", s, g,
                             precision=jax.lax.Precision.HIGHEST)
    mask = _class_mask(class_ids, scores.shape[0])
    return _symmetric_ce(scores, mask)


def damsm_loss(region_feats, global_feats, words_embs, sent_embs, cap_lens,
               class_ids, smooth) -> Tuple[jnp.ndarray, dict]:
    """Total DAMSM loss for the pretrainer; smooth = cfg.TRAIN.SMOOTH."""
    w0, w1, _ = words_loss(
        region_feats, words_embs, cap_lens, class_ids,
        smooth.GAMMA1, smooth.GAMMA2, smooth.GAMMA3,
    )
    s0, s1 = sent_loss(global_feats, sent_embs, class_ids, smooth.GAMMA3)
    total = w0 + w1 + s0 + s1
    return total, {"w_loss0": w0, "w_loss1": w1, "s_loss0": s0, "s_loss1": s1}
