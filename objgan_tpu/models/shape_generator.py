"""Stage B — shape generator: box layout -> per-object instance masks.

Pix2pix-style conditional GAN (paper §3.2; SURVEY.md §2.2 — reference tree
unavailable): each object's mask is synthesized in its own SxS frame from its
rasterized box, label embedding and noise, with a **bi-directional
convolutional LSTM** across the object sequence at the U-Net bottleneck so
shapes are mutually consistent (a person's mask differs when a surfboard is
present, etc.).

Divergence note: the reference adds a perceptual loss from an ImageNet VGG;
no pretrained VGG exists in this zero-egress image, so the trainer uses
discriminator feature matching (pix2pixHD-style) as the perceptual term —
same role, self-contained. A VGG-checkpoint converter can restore strict
parity later.

TPU notes: objects fold into the batch dim (B*O) for all convs — one wide
NHWC conv instead of a per-object loop; only the conv-LSTM runs over the
object axis, via ``lax.scan``.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from objgan_tpu.core.config import Config
from objgan_tpu.models.common import gn, lrelu as _lrelu
from objgan_tpu.ops.lstm import BiConvLSTM
from objgan_tpu.ops.rasterize import box_maps




class _Down(nn.Module):
    features: int
    norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (4, 4), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        if self.norm:
            x = gn(self.features, self.dtype)(x)
        return _lrelu(x)


class _Up(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = gn(self.features, self.dtype)(x)
        return nn.relu(x)


class ShapeGenerator(nn.Module):
    """U-Net over (box raster, label, noise) with a bi-conv-LSTM bottleneck.

    Returns per-object mask logits (B, O, S, S); apply sigmoid for masks.
    """

    cfg: Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        boxes: jnp.ndarray,  # (B, O, 4)
        labels_emb: jnp.ndarray,  # (B, O, L)
        obj_valid: jnp.ndarray,  # (B, O)
        rng: jax.Array,
    ) -> jnp.ndarray:
        c = self.cfg
        s = c.OBJ.SHAPE_SIZE
        gf = c.SHAPE.GF_DIM
        b, o = boxes.shape[:2]

        canvas = box_maps(boxes, s, s).astype(self.dtype)  # (B, O, S, S)
        lab = nn.Dense(gf, dtype=self.dtype, name="label_proj")(
            labels_emb.astype(self.dtype)
        )  # (B, O, gf)
        lab_map = jnp.broadcast_to(lab[:, :, None, None, :], (b, o, s, s, gf))
        z = jax.random.normal(rng, (b, o, 1, 1, gf), self.dtype)
        z_map = jnp.broadcast_to(z, (b, o, s, s, gf))
        x = jnp.concatenate([canvas[..., None], lab_map, z_map], axis=-1)

        # fold objects into batch for the conv stacks
        x = x.reshape(b * o, s, s, x.shape[-1])
        e1 = _Down(gf, norm=False, dtype=self.dtype)(x)      # S/2
        e2 = _Down(gf * 2, dtype=self.dtype)(e1)             # S/4
        e3 = _Down(gf * 4, dtype=self.dtype)(e2)             # S/8

        lstm_in = e3.reshape(b, o, *e3.shape[1:])
        h = BiConvLSTM(c.SHAPE.HIDDEN_DIM, dtype=self.dtype, name="bi_clstm")(
            lstm_in, obj_valid
        )  # (B, O, S/8, S/8, 2*hidden)
        h = h.reshape(b * o, *h.shape[2:])

        d3 = _Up(gf * 2, dtype=self.dtype)(jnp.concatenate([h, e3], -1))  # S/4
        d2 = _Up(gf, dtype=self.dtype)(jnp.concatenate([d3, e2], -1))     # S/2
        d1 = _Up(gf, dtype=self.dtype)(jnp.concatenate([d2, e1], -1))     # S
        logits = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                         name="mask_head")(d1)
        return logits.reshape(b, o, s, s).astype(jnp.float32)


class ShapeDiscriminator(nn.Module):
    """Real/fake on (mask, box raster, label); returns logits + trunk features
    for the feature-matching (perceptual-substitute) loss."""

    cfg: Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        masks: jnp.ndarray,  # (B, O, S, S) in [0, 1]
        boxes: jnp.ndarray,
        labels_emb: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        c = self.cfg
        s = c.OBJ.SHAPE_SIZE
        df = c.SHAPE.DF_DIM
        b, o = masks.shape[:2]
        canvas = box_maps(boxes, s, s).astype(self.dtype)
        lab = nn.Dense(df // 2, dtype=self.dtype, name="label_proj")(
            labels_emb.astype(self.dtype)
        )
        lab_map = jnp.broadcast_to(
            lab[:, :, None, None, :], (b, o, s, s, df // 2)
        )
        x = jnp.concatenate(
            [masks.astype(self.dtype)[..., None], canvas[..., None], lab_map],
            axis=-1,
        ).reshape(b * o, s, s, -1)
        feats = []
        x = _Down(df, norm=False, dtype=self.dtype)(x)
        feats.append(x)
        x = _Down(df * 2, dtype=self.dtype)(x)
        feats.append(x)
        x = _Down(df * 4, dtype=self.dtype)(x)
        feats.append(x)
        logits = nn.Conv(1, (4, 4), padding="SAME", dtype=self.dtype,
                         name="logits")(x)
        return (
            logits.reshape(b, o, -1).mean(-1).astype(jnp.float32),
            [f.reshape(b, o, -1) for f in feats],
        )
