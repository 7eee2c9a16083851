"""Stage-C discriminators: per-scale patch-wise D's and the object-wise
Fast R-CNN D (paper §3.4; SURVEY.md §2.3 — reference tree unavailable).

``DNet`` (one per scale, 64/128/256):
    strided-conv trunk to a 4x4 grid; emits TWO heads
      * "uncond": patch logits from the trunk alone,
      * "cond": logits given the sentence embedding (tiled + 1x1 fused).
    Obj-GAN's patch-level layout conditioning enters as the rasterized
    layout canvas CONCATENATED into the trunk input (``__call__``), so
    BOTH heads are layout-conditioned — there is deliberately no separate
    third layout head (one trunk read instead of two; the loss weights in
    losses/gan_loss.py treat cond/uncond exactly as the lineage's).

``ObjectDNet``:
    shared conv trunk over the full image -> Pallas ROI-align over the
    (statically padded) GT boxes -> per-object head conditioned on the
    object's label embedding -> real/fake logit + class logits. Padded
    objects are masked out in the loss, never here.

TPU notes: NHWC, GroupNorm-free trunk (plain LeakyReLU convs, the lineage's
D uses BatchNorm only after the first block — we use GroupNorm there to stay
batch-stat-free under jit), logits returned in fp32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from objgan_tpu.core.config import Config
from objgan_tpu.models.common import gn, lrelu as _lrelu
from objgan_tpu.ops.roi_align import roi_align


class DownBlock(nn.Module):
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


class _Block3x3(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = gn(self.features, self.dtype)(x)
        return _lrelu(x)


class DNet(nn.Module):
    """Patch discriminator for one pyramid scale.

    ``img_size`` in {64, 128, 256, ...}: the trunk always reduces to 4x4 with
    ``log2(size) - 2`` stride-2 convs, widening up to 8 * df_dim.

    ``trunk``/``heads`` are exposed separately so the trainer can share one
    real-image trunk between the matched and mismatched caption pairs (the
    lineage runs the full D twice on the same real batch).
    """

    df_dim: int
    img_size: int
    dtype: Any = jnp.float32

    def setup(self):
        df = self.df_dim
        n_down = max(2, (self.img_size - 1).bit_length() - 2)  # to 4x4
        widths = [min(df * (2**i), df * 8) for i in range(n_down)]
        self.down_blocks = [
            DownBlock(w, norm=(i > 0), dtype=self.dtype)
            for i, w in enumerate(widths)
        ]
        self.extra = (
            _Block3x3(df * 8, self.dtype) if self.img_size > 64 else None
        )
        self.uncond_logits = nn.Conv(1, (4, 4), padding="SAME",
                                     dtype=self.dtype)
        self.cond_block = _Block3x3(df * 8, self.dtype)
        self.cond_logits = nn.Conv(1, (4, 4), padding="SAME",
                                   dtype=self.dtype)

    def trunk(
        self,
        images: jnp.ndarray,  # (B, S, S, 3) in [-1, 1]
        layout: Optional[jnp.ndarray] = None,  # (B, S, S, C_l) canvas
    ) -> jnp.ndarray:
        x = images.astype(self.dtype)
        if layout is not None:
            x = jnp.concatenate([x, layout.astype(self.dtype)], axis=-1)
        for blk in self.down_blocks:
            x = blk(x)
        if self.extra is not None:
            x = self.extra(x)
        return x  # (B, 4, 4, <=8df)

    def heads(
        self,
        trunk: jnp.ndarray,
        sent_emb: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        uncond = self.uncond_logits(trunk)
        out = {"uncond": uncond[..., 0].astype(jnp.float32)}
        if sent_emb is not None:
            b, hh, ww, _ = trunk.shape
            s = sent_emb.astype(self.dtype)[:, None, None, :]
            s = jnp.broadcast_to(s, (b, hh, ww, sent_emb.shape[-1]))
            h = self.cond_block(jnp.concatenate([trunk, s], axis=-1))
            out["cond"] = self.cond_logits(h)[..., 0].astype(jnp.float32)
        return out

    def __call__(
        self,
        images: jnp.ndarray,
        sent_emb: Optional[jnp.ndarray] = None,
        layout: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        return self.heads(self.trunk(images, layout), sent_emb)


class ObjectDNet(nn.Module):
    """Object-wise Fast R-CNN discriminator.

    trunk(image) -> features at 1/8 scale -> ROI-align(boxes) -> per-object
    [roi features ; label embedding] head -> real/fake + class logits.
    """

    cfg: Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, S, S, 3)
        boxes: jnp.ndarray,  # (B, O, 4) normalized (x0, y0, w, h)
        labels_emb: jnp.ndarray,  # (B, O, L)
    ) -> Dict[str, jnp.ndarray]:
        df = self.cfg.GAN.DF_DIM
        r = self.cfg.OBJ.ROI_SIZE
        x = images.astype(self.dtype)
        x = DownBlock(df, norm=False, dtype=self.dtype)(x)      # /2
        x = DownBlock(df * 2, dtype=self.dtype)(x)              # /4
        x = DownBlock(df * 4, dtype=self.dtype)(x)              # /8
        rois = roi_align(x, boxes, out_size=r, sampling_ratio=2)
        b, o = rois.shape[:2]
        roi_feats = rois.reshape(b * o, r, r, rois.shape[-1])
        pooled = DownBlock(df * 8, dtype=self.dtype)(roi_feats)
        pooled = jnp.mean(pooled, axis=(1, 2))  # (B*O, 8df)
        # Class head consumes ROI features ONLY (Fast R-CNN semantics,
        # paper §3.4): conditioning it on the label embedding would let it
        # decode the label from its own input, collapsing the class CE to
        # ~0 without looking at pixels and starving the generator of the
        # object-class-fidelity gradient the object D exists to provide.
        cls_h = _lrelu(nn.Dense(df * 4, dtype=self.dtype,
                                name="cls_fc")(pooled))
        cls = nn.Dense(self.cfg.OBJ.NUM_CLASSES, dtype=self.dtype,
                       name="cls_logits")(cls_h)
        # Real/fake head stays label-CONDITIONED (conditional-D semantics:
        # "is this a real object of THIS class at this location?").
        lab = labels_emb.astype(self.dtype).reshape(b * o, -1)
        h = jnp.concatenate([pooled, lab], axis=-1)
        h = _lrelu(nn.Dense(df * 4, dtype=self.dtype)(h))
        realfake = nn.Dense(1, dtype=self.dtype, name="obj_logits")(h)
        return {
            "obj": realfake.reshape(b, o).astype(jnp.float32),
            "cls": cls.reshape(b, o, -1).astype(jnp.float32),
        }


def build_discriminators(cfg: Config, dtype=jnp.float32):
    """One DNet per pyramid scale, in scale order (64 first)."""
    return [
        DNet(cfg.GAN.DF_DIM, size, dtype=dtype) for size in cfg.branch_sizes
    ]
