"""Stage-C cascaded attentive image generator (G_NET).

AttnGAN-lineage topology with Obj-GAN's layout conditioning and
object-driven attention (paper §3.3; SURVEY.md §2.3 — reference tree
unavailable, semantics from the paper + lineage):

    CANet:        sent_emb -> (mu, logvar) -> reparameterized c_code + KL
    LayoutEncoder: label/shape canvas -> spatial layout features
    InitStageG:   [z ; c_code] seed + layout features -> 64x64 base features
    NextStageG:   features + grid-attn context + object-attn context
                  -> residual blocks -> 2x upsample       (64->128->256)
    GetImageG:    features -> tanh RGB head at every scale

TPU-native choices (documented divergences from the PyTorch lineage):
  * NHWC everywhere; convs are XLA ``conv_general_dilated`` on the MXU.
  * GroupNorm instead of BatchNorm in G — identical module interface but no
    cross-replica batch statistics, so the jitted step needs no sync and is
    deterministic under data parallelism.
  * GLU activations kept from the lineage (conv to 2C, gate half).
  * Attention math runs in fp32 (ops/attention.py) for the
    "bitwise-comparable fp32 attention maps" parity goal; everything else
    follows cfg.DTYPE (bfloat16 by default).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from objgan_tpu.core.config import Config
from objgan_tpu.models.common import gn, gn_glu
from objgan_tpu.ops import attention as att_ops
from objgan_tpu.ops import rasterize


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.DTYPE == "bfloat16" else jnp.float32


def glu(x: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


class UpBlock(nn.Module):
    """2x upsample -> 3x3 conv -> GroupNorm -> GLU.

    mode "nearest": lineage semantics (materialized nearest resize + conv).
    mode "subpixel": ESPCN-style conv at the LOW resolution emitting 4x the
    channels, then depth-to-space — identical MAC count but reads the input
    once instead of a materialized 4x-larger upsample (the 256px pipeline is
    HBM-bandwidth-bound; see BASELINE.md). Select with cfg.GAN.UP_MODE.
    """

    features: int
    dtype: Any = jnp.float32
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if self.mode == "subpixel":
            y = nn.Conv(8 * self.features, (3, 3), padding="SAME",
                        use_bias=False, dtype=self.dtype, name="conv")(x)
            y = y.reshape(b, h, w, 2, 2, 2 * self.features)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, 2 * h, 2 * w, 2 * self.features
            )
            x = y
        else:
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
            x = nn.Conv(2 * self.features, (3, 3), padding="SAME",
                        use_bias=False, dtype=self.dtype, name="conv")(x)
        return gn_glu(2 * self.features, self.dtype)(x)


class ResBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(2 * self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = gn_glu(2 * self.features, self.dtype)(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = gn(self.features, self.dtype)(h)
        return x + h


class CANet(nn.Module):
    """Conditioning augmentation: sent_emb -> sampled c_code, (mu, logvar).

    Lineage-exact structure (AttnGAN ``CA_NET``): ONE fc to 4*c_dim, GLU,
    then mu/logvar are the two halves of the result — so ``ca_net.fc`` from
    reference checkpoints transfers verbatim (core/name_maps.py)."""

    condition_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sent_emb, rng):
        x = nn.Dense(4 * self.condition_dim, dtype=self.dtype,
                     name="fc")(sent_emb)
        x = glu(x).astype(jnp.float32)  # (B, 2*c_dim)
        mu = x[..., : self.condition_dim]
        logvar = x[..., self.condition_dim:]
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape, jnp.float32)
        c_code = mu + std * eps
        return c_code.astype(self.dtype), mu, logvar


class LayoutEncoder(nn.Module):
    """Encode the rasterized layout into spatial features at a target grid.

    Input canvas (B, S, S, C_l): per-pixel class-label embeddings weighted by
    the object shape masks. Downsampled by strided convs to ``out_hw``.
    """

    features: int
    out_hw: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, canvas):
        x = canvas
        ch = self.features // 4
        while x.shape[1] > self.out_hw:
            ch = min(2 * ch, self.features)
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME",
                        use_bias=False, dtype=self.dtype)(x)
            x = gn(ch, self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = gn(self.features, self.dtype)(x)
        return nn.leaky_relu(x, 0.2)


class InitStageG(nn.Module):
    """[z ; c_code] -> 4x4 seed -> upsample to ``base_size``, fused with
    layout. base_size 64 gives the lineage's 4 up-blocks and 16x width."""

    gf_dim: int  # feature width at base_size output
    base_size: int = 64
    dtype: Any = jnp.float32
    up_mode: str = "nearest"

    @nn.compact
    def __call__(self, z_c, layout_feats):
        n_up = max(1, (self.base_size // 4).bit_length() - 1)  # 4 * 2^n = base
        ngf = self.gf_dim * (2**n_up)
        b = z_c.shape[0]
        x = nn.Dense(4 * 4 * ngf * 2, use_bias=False, dtype=self.dtype,
                     name="fc")(z_c)
        x = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x.reshape(b, -1))
        x = glu(x).reshape(b, 4, 4, ngf)
        # fuse layout features at the 4x4 seed
        x = jnp.concatenate([x, layout_feats], axis=-1)
        for i in range(n_up):
            x = UpBlock(self.gf_dim * (2 ** (n_up - 1 - i)), self.dtype,
                        self.up_mode, name=f"up{i}")(x)
        return x


class AttnStage(nn.Module):
    """Grid + object-driven attention feeding residual refinement + upsample."""

    gf_dim: int
    r_num: int
    dtype: Any = jnp.float32
    up_mode: str = "nearest"
    ctx_dtype: Any = None  # None = fp32 context contractions (lineage);
    #                        cfg.GAN.OBJ_PASTE_DTYPE='compute' passes dtype

    @nn.compact
    def __call__(self, h, word_embs, word_mask, obj_query, obj_maps, obj_valid):
        b, hh, ww, c = h.shape
        t = word_embs.shape[1]
        # project words into this stage's channel space (the lineage's 1x1
        # "conv_context"); shared by grid and object attention.
        words_p = nn.Dense(c, use_bias=False, dtype=self.dtype,
                           name="word_proj")(word_embs)
        grid_ctx, grid_attn = att_ops.grid_attention(
            h.reshape(b, hh * ww, c), words_p, word_mask,
            context_dtype=self.ctx_dtype,
        )
        obj_q = nn.Dense(c, use_bias=False, dtype=self.dtype,
                         name="obj_query_proj")(obj_query)
        obj_ctx, obj_attn = att_ops.object_attention(
            obj_q, words_p, word_mask, obj_valid
        )
        pasted = att_ops.paste_object_context(
            obj_ctx, obj_maps.reshape(*obj_maps.shape[:2], hh * ww), obj_valid,
            context_dtype=self.ctx_dtype,
        )
        x = jnp.concatenate(
            [h, grid_ctx.reshape(b, hh, ww, c), pasted.reshape(b, hh, ww, c)],
            axis=-1,
        )
        for i in range(self.r_num):
            x = ResBlock(3 * c, self.dtype, name=f"res{i}")(x)
        x = UpBlock(self.gf_dim, self.dtype, self.up_mode, name="up")(x)
        return x, grid_attn.reshape(b, hh, ww, t), obj_attn


class GetImageG(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h):
        # bias-free like the lineage's conv3x3 (exact checkpoint transfer)
        img = nn.Conv(3, (3, 3), padding="SAME", use_bias=False,
                      dtype=self.dtype, name="img")(h)
        return jnp.tanh(img.astype(jnp.float32))


class GNet(nn.Module):
    """Full cascaded generator. Returns per-scale images, attention maps and
    the CA-net statistics.

    Inputs (all statically shaped, padded to MAX_OBJECTS):
      z (B, Z), sent_emb (B, D), word_embs (B, T, D), word_mask (B, T) bool,
      labels_emb (B, O, L) GloVe label embeddings, boxes (B, O, 4),
      shapes (B, O, S, S) stage-B masks, obj_valid (B, O).
    """

    cfg: Config

    @nn.compact
    def __call__(self, z, sent_emb, word_embs, word_mask, labels_emb, boxes,
                 shapes, obj_valid, rng) -> Dict[str, Any]:
        cfg = self.cfg
        dt = _dtype(cfg)
        gf = cfg.GAN.GF_DIM
        base = cfg.TREE.BASE_SIZE

        # cfg.GAN.REMAT == "stages": rematerialize the attention stages —
        # their concat/res-block activations at 64/128px dominate the train
        # step's HBM traffic (roofline: BASELINE.md round-3). Forward-only
        # programs (sampling) are unaffected: remat without a backward pass
        # is the identity transform.
        Stage = (nn.remat(AttnStage) if cfg.GAN.REMAT == "stages"
                 else AttnStage)

        c_code, mu, logvar = CANet(cfg.GAN.CONDITION_DIM, dt, name="ca_net")(
            sent_emb.astype(dt), rng
        )
        z_c = jnp.concatenate([z.astype(dt), c_code], axis=-1)

        ctx_dt = dt if cfg.GAN.OBJ_PASTE_DTYPE == "compute" else None

        # rasterized layout at the base resolution: label embeddings painted
        # into each object's shape, averaged over overlaps.
        shape_maps = rasterize.paste_masks(shapes, boxes, base, base)  # (B,O,S,S)
        canvas = att_ops.paste_object_context(
            labels_emb.astype(dt),
            shape_maps.reshape(*shape_maps.shape[:2], base * base).astype(dt),
            obj_valid,
            context_dtype=ctx_dt,
        ).reshape(-1, base, base, labels_emb.shape[-1])
        layout4 = LayoutEncoder(gf * 8, 4, dt, name="layout_enc")(canvas)

        h = InitStageG(gf, base, dt, cfg.GAN.UP_MODE,
                       name="init_stage")(z_c, layout4)

        # per-object query: label embedding + box geometry
        obj_query = jnp.concatenate(
            [labels_emb.astype(dt), boxes.astype(dt)], axis=-1
        )

        imgs, grid_attns, obj_attns = [], [], []
        imgs.append(GetImageG(dt, name=f"img{base}")(h))
        res = base
        for i in range(1, cfg.TREE.BRANCH_NUM):
            if res == base:
                maps_i = shape_maps  # already rasterized for the canvas
            else:
                # bilinear-resize the base-resolution pastes instead of
                # re-rasterizing: the direct separable-matmul paste costs
                # O(B*O*res^2*S) MXU flops per scale and the maps are soft
                # attention weights where resampled edges are equivalent.
                b_, o_ = shape_maps.shape[:2]
                maps_i = jax.image.resize(
                    shape_maps.reshape(b_ * o_, base, base, 1),
                    (b_ * o_, res, res, 1), method="bilinear",
                ).reshape(b_, o_, res, res)
            h, g_attn, o_attn = Stage(
                gf, cfg.GAN.R_NUM, dt, cfg.GAN.UP_MODE, ctx_dt,
                name=f"attn_stage{i}"
            )(h, word_embs.astype(dt), word_mask, obj_query, maps_i, obj_valid)
            res *= 2
            imgs.append(GetImageG(dt, name=f"img{res}")(h))
            grid_attns.append(g_attn)
            obj_attns.append(o_attn)

        return {
            "images": imgs,               # list of (B, s, s, 3) fp32 in [-1,1]
            "grid_attn": grid_attns,      # list of (B, h, w, T) fp32
            "obj_attn": obj_attns,        # list of (B, O, T) fp32
            "mu": mu,
            "logvar": logvar,
        }


def kl_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """CA-net KL(N(mu, sigma) || N(0, I)), the lineage's ``KL_loss``.

    Mean over ALL elements (not sum-over-dim then batch-mean): the lineage's
    ``torch.mean(KLD_element)`` — summing over CONDITION_DIM first would
    weight the KL term ~100x stronger than the reference."""
    return -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
