"""Shared small layers for all model families."""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax


def gn(features: int, dtype: Any = None, name: str | None = None):
    """GroupNorm with the largest power-of-two group count <= 32 that divides
    ``features`` (gcd with 32 — always valid, 1 group == LayerNorm-like)."""
    return nn.GroupNorm(num_groups=math.gcd(features, 32), dtype=dtype,
                        name=name)


def lrelu(x):
    return nn.leaky_relu(x, 0.2)


def glu(x):
    import jax.numpy as jnp

    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)
