"""Shared small layers for all model families."""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from objgan_tpu.ops.groupnorm import group_norm_op


class FusedGroupNorm(nn.Module):
    """GroupNorm (optionally fused with GLU) routed through the single-read
    Pallas kernel on TPU (ops/groupnorm.py); flax-GroupNorm-exact XLA
    reference elsewhere. Param names/shapes match ``nn.GroupNorm``
    (``scale``/``bias``, fp32)."""

    features: int
    num_groups: int
    dtype: Any = None
    use_glu: bool = False
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = group_norm_op(x, scale, bias, self.num_groups, self.eps,
                          self.use_glu)
        # nn.GroupNorm(dtype=d) parity: the output dtype is the module's,
        # not the input's (group_norm_op returns x.dtype).
        return y if self.dtype is None else y.astype(self.dtype)


def gn(features: int, dtype: Any = None, name: str | None = None):
    """GroupNorm with the largest power-of-two group count <= 32 that divides
    ``features`` (gcd with 32 — always valid, 1 group == LayerNorm-like)."""
    return FusedGroupNorm(features, num_groups=math.gcd(features, 32),
                          dtype=dtype, name=name)


def gn_glu(features: int, dtype: Any = None, name: str | None = None):
    """Fused GroupNorm -> GLU (``features`` = pre-GLU channel count; output
    has ``features // 2``). One HBM read instead of two on TPU."""
    return FusedGroupNorm(features, num_groups=math.gcd(features, 32),
                          dtype=dtype, use_glu=True, name=name)


def lrelu(x):
    return nn.leaky_relu(x, 0.2)


def glu(x):
    import jax.numpy as jnp

    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)
