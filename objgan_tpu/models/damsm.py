"""DAMSM text and image encoders (SURVEY.md §2.3 rows "Text encoder" /
"Image encoder"; reference tree unavailable — semantics from the AttnGAN
lineage Obj-GAN reuses).

``RNNEncoder``  — embedding + dropout + bi-LSTM; returns per-word features
``words_embs (B, T, D)`` and sentence embedding ``sent_emb (B, D)`` (final
hidden states of both directions, concatenated). Frozen during GAN training.

``CNNEncoder``  — maps images to region features (B, R, R, D) and a global
feature (B, D) for the DAMSM matching losses. The lineage uses ImageNet
Inception-v3 at 299px with a 17x17 mixed_6e region grid; no pretrained
torchvision weights exist in this environment (zero egress), so we ship
"InceptionLite": a compact all-conv backbone with a *static 16x16 region
grid at 256px* — power-of-two shapes that tile the MXU cleanly — trained
from scratch by the DAMSM pretrainer. The public interface (region + global
features projected to EMBEDDING_DIM) is identical, and a torchvision
Inception-v3 checkpoint converter can replace it for strict FID parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from objgan_tpu.core.config import Config
from objgan_tpu.models.common import gn
from objgan_tpu.ops.lstm import BiLSTM


class RNNEncoder(nn.Module):
    """Bi-LSTM caption encoder (PyTorch ``RNN_ENCODER`` equivalent)."""

    vocab_size: int
    embed_dim: int = 300       # word-vector input size (GloVe dim)
    hidden_dim: int = 128      # per direction; 2*hidden == EMBEDDING_DIM
    drop_prob: float = 0.5

    @nn.compact
    def __call__(self, captions: jnp.ndarray, cap_lens: jnp.ndarray,
                 deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")(
            captions
        )
        emb = nn.Dropout(self.drop_prob, deterministic=deterministic)(emb)
        outs, (h_f, h_b) = BiLSTM(self.hidden_dim, name="bilstm")(emb, cap_lens)
        words_embs = outs                              # (B, T, 2H)
        sent_emb = jnp.concatenate([h_f, h_b], -1)     # (B, 2H)
        return words_embs, sent_emb


class _ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = gn(self.features, self.dtype)(x)
        return nn.relu(x)


class CNNEncoder(nn.Module):
    """InceptionLite image encoder: images in [-1, 1], NHWC, any square size
    >= 64; region grid fixed at input_size // 16.

    Returns (region_feats (B, R*R, D) fp32, global_feat (B, D) fp32).
    """

    embed_dim: int
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        w = self.base_width
        x = images.astype(self.dtype)
        x = _ConvBlock(w, 2, self.dtype)(x)        # /2
        x = _ConvBlock(w * 2, 2, self.dtype)(x)    # /4
        x = _ConvBlock(w * 4, 2, self.dtype)(x)    # /8
        x = _ConvBlock(w * 4, 1, self.dtype)(x)
        x = _ConvBlock(w * 8, 2, self.dtype)(x)    # /16 -> region grid
        x = _ConvBlock(w * 8, 1, self.dtype)(x)
        regions = x                                 # (B, R, R, 8w)
        # region features -> common embedding space (lineage ``emb_features``)
        reg_emb = nn.Conv(self.embed_dim, (1, 1), use_bias=False,
                          dtype=self.dtype, name="emb_features")(regions)
        b, r1, r2, d = reg_emb.shape
        # global path: two more strided blocks + global average pool
        g = _ConvBlock(w * 16, 2, self.dtype)(x)
        g = _ConvBlock(w * 16, 2, self.dtype)(g)
        g = jnp.mean(g, axis=(1, 2))
        g_emb = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                         name="emb_cnn_code")(g)
        return (
            reg_emb.reshape(b, r1 * r2, d).astype(jnp.float32),
            g_emb.astype(jnp.float32),
        )


def build_text_encoder(cfg: Config) -> RNNEncoder:
    if 2 * cfg.TEXT.HIDDEN_DIM != cfg.TEXT.EMBEDDING_DIM:
        raise ValueError(
            "TEXT.HIDDEN_DIM is the per-direction bi-LSTM width; the "
            "concatenated directions must equal TEXT.EMBEDDING_DIM "
            f"(got 2*{cfg.TEXT.HIDDEN_DIM} != {cfg.TEXT.EMBEDDING_DIM})"
        )
    return RNNEncoder(
        vocab_size=cfg.TEXT.VOCAB_SIZE,
        embed_dim=cfg.TEXT.GLOVE_DIM,
        hidden_dim=cfg.TEXT.HIDDEN_DIM,
    )


def build_image_encoder(cfg: Config, base_width: int = 32):
    if cfg.TEXT.CNN_BACKBONE == "inception":
        from objgan_tpu.models.inception_v3 import InceptionEncoder

        return InceptionEncoder(embed_dim=cfg.TEXT.EMBEDDING_DIM)
    return CNNEncoder(embed_dim=cfg.TEXT.EMBEDDING_DIM, base_width=base_width)
