"""Inception-v3 (torchvision graph) in flax/NHWC — eval-only backbone for
strict DAMSM CNN_ENCODER parity and standard FID/IS.

The lineage's ``CNN_ENCODER`` wraps an ImageNet Inception-v3, frozen, with
two trainable projections: region features from Mixed_6e (17x17x768) and the
global feature from the final pool (2048) (SURVEY.md §2.3 "Image encoder").
Standard FID uses the same network's pool activations; IS uses its logits.

No pretrained weights exist in this zero-egress image, so this module ships
as the *architecture + converter*: module/param names mirror torchvision's
(``Mixed_5b.branch1x1.conv`` -> ``Mixed_5b/branch1x1/conv``), and
:func:`torch_name_map` produces the full ``.pth -> flax`` mapping
mechanically, so ``core/checkpoint.py:convert_torch_state_dict`` loads a
torchvision checkpoint in one call. BatchNorm is folded as frozen affine
statistics (the network is never trained here — matching the lineage, which
freezes it and trains only the projections).

TPU notes: NHWC; all convs hit the MXU; input is resized on device to
299x299 (bilinear, antialias off — torch ``interpolate`` semantics).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_EPS = 1e-3


class BasicConv2d(nn.Module):
    """conv(no bias) + frozen BatchNorm(eps=1e-3) + relu."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones,
                         (self.features,), jnp.float32)
        inv = jax.lax.rsqrt(var + BN_EPS) * scale
        x = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return nn.relu(x).astype(self.dtype)


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


def _avg_pool3(x):
    # torch F.avg_pool2d(k=3, s=1, p=1) with count_include_pad=True
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=self.dtype,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns dict with ``mixed_6e`` (B,17,17,768), ``pool`` (B,2048),
    ``logits`` (B,1000). Input NHWC in [-1, 1], any square size (resized to
    299 on device)."""

    dtype: Any = jnp.float32
    num_classes: int = 1000

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b = images.shape[0]
        x = images.astype(self.dtype)
        if x.shape[1] != 299:
            # antialias=False: torch F.interpolate(bilinear) applies no
            # antialiasing filter, and parity with the torchvision graph is
            # this module's entire purpose (jax's default True would change
            # every downstream activation for inputs > 299px)
            x = jax.image.resize(x, (b, 299, 299, 3), method="bilinear",
                                 antialias=False)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=self.dtype,
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5d")(x)
        x = InceptionB(self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, self.dtype, name="Mixed_6e")(x)
        mixed_6e = x  # (B, 17, 17, 768)
        x = InceptionD(self.dtype, name="Mixed_7a")(x)
        x = InceptionE(self.dtype, name="Mixed_7b")(x)
        x = InceptionE(self.dtype, name="Mixed_7c")(x)
        pool = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, 2048)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="fc")(pool)
        return {"mixed_6e": mixed_6e.astype(jnp.float32), "pool": pool,
                "logits": logits}


class InceptionEncoder(nn.Module):
    """Lineage ``CNN_ENCODER`` on the real Inception-v3: frozen backbone +
    trainable region/global projections. Same interface as
    ``damsm.CNNEncoder``."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = InceptionV3(self.dtype, name="backbone")(images)
        regions = jax.lax.stop_gradient(feats["mixed_6e"])  # frozen backbone
        pool = jax.lax.stop_gradient(feats["pool"])
        b, r1, r2, _ = regions.shape
        reg_emb = nn.Conv(self.embed_dim, (1, 1), use_bias=False,
                          dtype=jnp.float32, name="emb_features")(regions)
        # lineage CNN_ENCODER: emb_features is a bias-free conv1x1 but
        # emb_cnn_code is a default nn.Linear (bias=True) — keep the bias so
        # reference checkpoints load end-to-end (core/name_maps.py).
        g_emb = nn.Dense(self.embed_dim, use_bias=True, dtype=jnp.float32,
                         name="emb_cnn_code")(pool)
        return reg_emb.reshape(b, r1 * r2, -1), g_emb


# -- torchvision conversion -------------------------------------------------


def torch_name_map(torch_names: List[str]) -> Dict[str, str]:
    """Map torchvision ``inception_v3`` state_dict names to this module's
    flax paths (for ``core.checkpoint.convert_torch_state_dict``).

    AuxLogits.* entries are skipped (eval path only).
    """
    out: Dict[str, str] = {}
    for name in torch_names:
        if name.startswith("AuxLogits") or name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        leaf = parts[-1]
        scope = parts[:-1]
        if scope and scope[-1] == "bn":
            flax_leaf = {
                "weight": "bn_scale", "bias": "bn_bias",
                "running_mean": "bn_mean", "running_var": "bn_var",
            }[leaf]
            path = "/".join(scope[:-1]) + "/" + flax_leaf
        elif scope and scope[-1] == "conv":
            path = "/".join(scope) + "/kernel"
        elif scope == ["fc"]:
            path = "fc/" + ("kernel" if leaf == "weight" else "bias")
        else:
            raise KeyError(f"unhandled torchvision param {name!r}")
        out[name] = path
    return out


def load_torchvision_checkpoint(params, state_dict):
    """Write a torchvision inception_v3 state_dict into an ``InceptionV3``
    (or the ``backbone`` subtree of ``InceptionEncoder``) param tree."""
    from objgan_tpu.core.checkpoint import (
        apply_converted, convert_torch_state_dict,
    )

    usable = {
        k: v for k, v in state_dict.items()
        if not k.startswith("AuxLogits") and not k.endswith(
            "num_batches_tracked")
    }
    name_map = torch_name_map(list(usable))
    converted = convert_torch_state_dict(usable, name_map)
    return apply_converted(params, converted)
