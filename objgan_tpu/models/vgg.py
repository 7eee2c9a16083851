"""VGG-16 (torchvision graph) in flax/NHWC — the Stage-B perceptual loss
backbone (SURVEY.md §2.2 "Discriminator(s)": GAN loss + perceptual loss over
VGG features; paper §3.2).

Zero-egress: no pretrained weights ship in this image, so like
``models/inception_v3.py`` this module is the *architecture + converter*.
Module names mirror torchvision's ``vgg16`` Sequential indices
(``features.0`` → ``features_0``) so :func:`torch_name_map` is mechanical;
:func:`load_torchvision_vgg16` additionally handles the one layout subtlety a
plain transpose misses: ``classifier.0`` consumes the flattened conv grid,
whose element order is (C, H, W) under torch/NCHW but (H, W, C) here — its
kernel is permuted accordingly, round-trip-tested in tests/test_vgg.py.

The D-feature-matching substitute stays the default Stage-B perceptual term
(``SHAPE.PERCEPTUAL: fm``); switch to ``vgg`` (+ ``SHAPE.VGG_WEIGHTS`` for a
torchvision ``.pth``) for the lineage-exact loss once weights are available.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision vgg16 "features" program: Sequential index -> out-channels
# ('M' = 2x2 max pool). The indices are load-bearing: they name the params.
VGG16_LAYERS: Tuple[Tuple[int, Any], ...] = (
    (0, 64), (2, 64), (4, "M"),
    (5, 128), (7, 128), (9, "M"),
    (10, 256), (12, 256), (14, 256), (16, "M"),
    (17, 512), (19, 512), (21, 512), (23, "M"),
    (24, 512), (26, 512), (28, 512), (30, "M"),
)

# canonical perceptual taps: the relu following each named conv
PERCEPTUAL_TAPS = ("relu1_2", "relu2_2", "relu3_3", "relu4_3")
_TAP_AFTER_CONV = {2: "relu1_2", 7: "relu2_2", 14: "relu3_3",
                   21: "relu4_3", 28: "relu5_3"}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG16(nn.Module):
    """Returns {tap_name: (B, h, w, C) fp32} plus ``logits`` when
    ``with_classifier`` (requires 224px input). Input NHWC in [0, 1],
    ImageNet-normalized internally."""

    dtype: Any = jnp.float32
    with_classifier: bool = False
    # stop after producing this tap: small inputs (e.g. 16px Stage-B masks)
    # would hit a zero-size pool in block 5; perceptual use stops at relu4_3
    stop_at: str = "relu5_3"

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = ((images.astype(jnp.float32) - mean) / std).astype(self.dtype)
        taps: Dict[str, jnp.ndarray] = {}
        for idx, spec in VGG16_LAYERS:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(spec, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"features_{idx}")(x)
            x = nn.relu(x)
            tap = _TAP_AFTER_CONV.get(idx)
            if tap is not None:
                taps[tap] = x.astype(jnp.float32)
                if tap == self.stop_at and not self.with_classifier:
                    return taps
        if self.with_classifier:
            b = x.shape[0]
            x = x.reshape(b, -1).astype(jnp.float32)  # (B, 7*7*512) HWC order
            x = nn.relu(nn.Dense(4096, name="classifier_0")(x))
            x = nn.relu(nn.Dense(4096, name="classifier_3")(x))
            taps["logits"] = nn.Dense(1000, name="classifier_6")(x)
        return taps


def vgg_perceptual_loss(
    vgg: VGG16,
    vgg_params,
    fake: jnp.ndarray,   # (N, S, S) or (N, S, S, C) in [0, 1]
    real: jnp.ndarray,
    taps: Sequence[str] = PERCEPTUAL_TAPS,
) -> jnp.ndarray:
    """Mean per-sample L1 distance between frozen VGG features of fake and
    real images, summed over ``taps``. Returns (N,) fp32 — callers apply
    their own validity masking/weighting. Single-channel inputs (Stage-B
    masks) are tiled to RGB."""
    def prep(x):
        if x.ndim == 3:
            x = x[..., None]
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        return x

    sg = jax.lax.stop_gradient
    f = vgg.apply(vgg_params, prep(fake))
    r = vgg.apply(vgg_params, prep(real))
    total = jnp.zeros(fake.shape[0], jnp.float32)
    for t in taps:
        total = total + jnp.mean(jnp.abs(f[t] - sg(r[t])), axis=(1, 2, 3))
    return total


# -- torchvision conversion --------------------------------------------------


def torch_name_map(torch_names: Iterable[str]) -> Dict[str, str]:
    """torchvision ``vgg16`` state_dict names → this module's flax paths."""
    out: Dict[str, str] = {}
    for name in torch_names:
        parts = name.split(".")
        if parts[0] in ("features", "classifier") and len(parts) == 3:
            mod = f"{parts[0]}_{parts[1]}"
            leaf = {"weight": "kernel", "bias": "bias"}[parts[2]]
            out[name] = f"{mod}/{leaf}"
        else:
            raise KeyError(f"unhandled torchvision vgg16 param {name!r}")
    return out


def load_torchvision_vgg16(params, state_dict):
    """Write a torchvision ``vgg16`` state_dict into a :class:`VGG16` param
    tree. ``classifier.0.weight`` is permuted from torch's flattened
    (C, H, W) input order to this module's (H, W, C). State-dict entries
    with no module in the tree (classifier when built
    ``with_classifier=False``, block-5 convs under an earlier ``stop_at``)
    are skipped."""
    import numpy as np

    from objgan_tpu.core.checkpoint import (
        apply_converted, convert_torch_state_dict,
    )

    present = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        present.add("/".join(k for k in keys if k != "params"))
    name_map = torch_name_map(list(state_dict))
    usable = {k: v for k, v in state_dict.items() if name_map[k] in present}
    converted = convert_torch_state_dict(usable, name_map)
    if "classifier_0/kernel" in converted:
        # convert_torch_state_dict gave the plain transpose (25088, 4096) of
        # torch's (4096, 25088=C*H*W); reorder rows to (H*W*C)
        k = np.asarray(converted["classifier_0/kernel"])  # (C*H*W, 4096)
        k = k.reshape(512, 7, 7, 4096).transpose(1, 2, 0, 3).reshape(
            25088, 4096)
        converted["classifier_0/kernel"] = k
    return apply_converted(params, converted)
