"""Attention primitives: grid (word->region) attention, DAMSM double-softmax
attention, and Obj-GAN's object-driven attention with region pasting.

These are the numerical core of the framework; BASELINE.json demands
"bitwise-comparable attention maps at fp32", so every function here:
  * upcasts inputs to float32,
  * applies softmax/masking in one documented canonical order,
  * returns attention maps in float32.

Semantics follow the AttnGAN lineage that Obj-GAN extends (SURVEY.md §2.3;
reference tree unavailable):
  * ``grid_attention``  == ``GlobalAttentionGeneral``: one masked softmax over
    source words per query location.
  * ``damsm_attention`` == ``func_attention``: softmax over *words* first,
    then gamma1-scaled softmax over *regions*.
  * ``object_attention`` is Obj-GAN's addition (paper §3.3): per-object
    queries attend over words; contexts are pasted back into the spatial map
    inside each object's (mask-weighted) region.

Layouts are TPU-native: NHWC feature maps flattened to (B, L=H*W, C); every
contraction is a batched matmul that XLA tiles onto the MXU.

MASK POLARITY — two conventions coexist in this module, matching their
lineage counterparts; the parameter NAME is the contract:
  * ``mask`` (masked_softmax / grid_attention / object_attention):
    boolean, **True = padded/EXCLUDED** (AttnGAN passes ``mask`` of
    padding positions).
  * ``query_valid`` (damsm_attention): float/bool, **nonzero = VALID/
    included** (the lineage's ``cap_lens``-derived validity).
Passing a True-means-padded mask as ``query_valid`` would attend padding
only and produce plausible-looking garbage — check the name at every call
site.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# True fp32 contractions: on TPU the default einsum precision uses bf16 MXU
# passes (~1e-2 relative error) even for fp32 inputs, which would break the
# "bitwise-comparable fp32 attention maps" invariant. Same fix as
# ops/roi_align.py.
_HI = lax.Precision.HIGHEST

_NEG_INF = -1e9  # matches the lineage's masked_fill_(-inf) without nan risk


def masked_softmax(
    scores: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int
) -> jnp.ndarray:
    """Softmax with additive -inf masking (mask==True/1 -> excluded)."""
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, _NEG_INF, scores)
    return jax.nn.softmax(scores, axis=axis)


def grid_attention(
    query: jnp.ndarray,  # (B, L, C)  spatial features, L = H*W
    source: jnp.ndarray,  # (B, T, C)  projected word features
    word_mask: Optional[jnp.ndarray] = None,  # (B, T) True where PADDED
    context_dtype=None,  # None = fp32 contraction (lineage); or cfg.DTYPE
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AttnGAN grid attention: each location attends over words.

    Returns (context (B, L, C) in query dtype, attn (B, L, T) float32).

    ``context_dtype`` moves only the map->context matmul (the attention
    MAPS stay fp32 — the parity invariant): with e.g. bfloat16 the (B,L,C)
    context materializes in half the HBM bytes and the contraction runs
    native MXU passes instead of fp32-HIGHEST. cfg.GAN.OBJ_PASTE_DTYPE.
    """
    q = query.astype(jnp.float32)
    s = source.astype(jnp.float32)
    scores = jnp.einsum("blc,btc->blt", q, s, precision=_HI)  # (B, L, T)
    m = word_mask[:, None, :] if word_mask is not None else None
    attn = masked_softmax(scores, m, axis=-1)
    if context_dtype is not None:
        context = jnp.einsum("blt,btc->blc", attn.astype(context_dtype),
                             source.astype(context_dtype))
    else:
        context = jnp.einsum("blt,btc->blc", attn, s, precision=_HI)
    return context.astype(query.dtype), attn


def damsm_attention(
    query: jnp.ndarray,  # (B, T, C)  word features
    context: jnp.ndarray,  # (B, L, C)  region features
    gamma1: float,
    query_valid: Optional[jnp.ndarray] = None,  # (B, T) 1.0 for real words
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DAMSM ``func_attention``: double softmax, words first then regions.

    ``query_valid`` masks padded words out of the first softmax — the lineage
    achieves this by physically truncating captions to their length before
    calling ``func_attention``; masking is the static-shape equivalent.

    Returns (weighted region context (B, T, C) float32, attn (B, T, L) float32).
    """
    q = query.astype(jnp.float32)
    c = context.astype(jnp.float32)
    # (B, L, T): region-word affinities; softmax over words (the lineage's
    # first softmax, over queryL).
    scores = jnp.einsum("blc,btc->blt", c, q, precision=_HI)
    if query_valid is not None:
        scores = jnp.where(query_valid[:, None, :] > 0, scores, _NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    # transpose to (B, T, L), scale, softmax over regions.
    attn = jax.nn.softmax(gamma1 * jnp.swapaxes(attn, 1, 2), axis=-1)
    weighted = jnp.einsum("btl,blc->btc", attn, c, precision=_HI)
    return weighted, attn


def object_attention(
    obj_query: jnp.ndarray,  # (B, O, C)  per-object queries (label+box encoding)
    words: jnp.ndarray,  # (B, T, C)  projected word features
    word_mask: Optional[jnp.ndarray],  # (B, T) True where padded
    obj_valid: jnp.ndarray,  # (B, O) 1.0 for real objects, 0.0 for padding
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Obj-GAN object-driven attention (paper §3.3), word-side half.

    Each object's query attends over the caption's words, producing one
    context vector per object. Padded objects get zero context.

    Returns (obj_context (B, O, C) in words dtype, attn (B, O, T) float32).
    """
    q = obj_query.astype(jnp.float32)
    w = words.astype(jnp.float32)
    scores = jnp.einsum("boc,btc->bot", q, w, precision=_HI)
    m = word_mask[:, None, :] if word_mask is not None else None
    attn = masked_softmax(scores, m, axis=-1)
    attn = attn * obj_valid.astype(jnp.float32)[..., None]
    context = jnp.einsum("bot,btc->boc", attn, w, precision=_HI)
    return context.astype(words.dtype), attn


def paste_object_context(
    obj_context: jnp.ndarray,  # (B, O, C) per-object context vectors
    obj_maps: jnp.ndarray,  # (B, O, L) spatial weights (rasterized shape/box)
    obj_valid: jnp.ndarray,  # (B, O)
    normalize: bool = True,
    context_dtype=None,  # None = fp32 contraction; or cfg.DTYPE (see above)
) -> jnp.ndarray:
    """Paste per-object contexts into the spatial map, spatial-half of object
    attention: out[l] = sum_o m_o[l] * c_o / max(sum_o m_o[l], 1).

    Overlapping objects average rather than sum so activations stay bounded.
    Pure batched matmul (B,L,O)x(B,O,C) — MXU-shaped. Returns (B, L, C).
    ``context_dtype`` as in ``grid_attention`` (the normalizing denominator
    always accumulates in fp32 — it is O(L) bytes and fuses into the write).
    """
    maps = obj_maps.astype(jnp.float32) * obj_valid.astype(jnp.float32)[..., None]
    if context_dtype is not None:
        ctx = jnp.einsum("bol,boc->blc", maps.astype(context_dtype),
                         obj_context.astype(context_dtype))
    else:
        ctx = jnp.einsum("bol,boc->blc", maps, obj_context.astype(jnp.float32),
                         precision=_HI)
    if normalize:
        denom = jnp.maximum(jnp.sum(maps, axis=1), 1.0)  # (B, L)
        ctx = ctx / denom[..., None].astype(ctx.dtype)
    return ctx.astype(obj_context.dtype)
