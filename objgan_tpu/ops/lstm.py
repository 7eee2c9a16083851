"""Recurrent cells and scan runners, TPU-native.

The reference leans on cuDNN LSTMs (PyTorch ``nn.LSTM``) for the DAMSM text
encoder and the box-generator decoder, and a hand-written bi-directional
convolutional LSTM for the shape generator (SURVEY.md §2.1-§2.3). Here every
recurrence is a ``jax.lax.scan`` over an explicit cell so XLA compiles one
fused step program; sequences are short (<= ~20 words, <= ~10 objects) so the
matmuls are batched wide rather than deep.

Weight layout is PyTorch-compatible on purpose: gate order ``i, f, g, o`` and
separate input/hidden kernels, so the ``.pth -> orbax`` checkpoint converter
(objgan_tpu/core/checkpoint.py) is a pure name-mapping with one transpose.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LSTMCell(nn.Module):
    """Plain LSTM cell, gate order i|f|g|o (PyTorch ``nn.LSTM`` convention)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        d = self.features
        w_ih = self.param(
            "w_ih", nn.initializers.lecun_normal(), (x.shape[-1], 4 * d), jnp.float32
        )
        w_hh = self.param(
            "w_hh", nn.initializers.orthogonal(), (d, 4 * d), jnp.float32
        )
        b = self.param("b", nn.initializers.zeros, (4 * d,), jnp.float32)
        gates = (
            jnp.dot(x, w_ih.astype(self.dtype))
            + jnp.dot(h, w_hh.astype(self.dtype))
            + b.astype(self.dtype)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return (new_h, new_c), new_h

    @staticmethod
    def init_carry(batch: int, features: int, dtype=jnp.float32):
        z = jnp.zeros((batch, features), dtype)
        return (z, z)


class _MaskedLSTMCell(nn.Module):
    """LSTM cell step with pack_padded_sequence semantics: the carry is frozen
    on padded steps, so the final carry equals the carry at each sequence's
    own last valid step (zero-init backward passes likewise)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, inp):
        x_t, v_t = inp
        new_carry, y = LSTMCell(self.features, dtype=self.dtype, name="cell")(
            carry, x_t
        )
        v = v_t[:, None].astype(y.dtype)
        carry = jax.tree.map(
            lambda n, o: n * v + o * (1.0 - v), new_carry, carry
        )
        return carry, y * v


class BiLSTM(nn.Module):
    """Bi-directional LSTM over padded (B, T, D) with per-sequence lengths.

    Returns (outputs (B, T, 2H), (h_fwd, h_bwd) final hiddens (B, H) each).
    Matches PyTorch ``nn.LSTM(bidirectional=True)`` + pack_padded semantics.
    """

    features: int  # per-direction hidden size
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: jnp.ndarray):
        b, t = xs.shape[:2]
        pos = jnp.arange(t)[None, :]
        valid = (pos < lengths[:, None]).astype(xs.dtype)  # (B, T)
        xs_t = jnp.swapaxes(xs, 0, 1)  # (T, B, D)
        valid_t = jnp.swapaxes(valid, 0, 1)  # (T, B)
        carry0 = LSTMCell.init_carry(b, self.features, xs.dtype)

        def scan_cell(name, reverse):
            return nn.scan(
                _MaskedLSTMCell,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
                reverse=reverse,
            )(self.features, dtype=self.dtype, name=name)

        (h_f, _), ys_f = scan_cell("fwd", False)(carry0, (xs_t, valid_t))
        (h_b, _), ys_b = scan_cell("bwd", True)(carry0, (xs_t, valid_t))
        ys = jnp.concatenate([ys_f, ys_b], axis=-1)
        return jnp.swapaxes(ys, 0, 1), (h_f, h_b)


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell (NHWC), gates i|f|g|o via one fused conv.

    Used by the Stage-B shape generator to couple mask synthesis across the
    object sequence (SURVEY.md §2.2 "bi-directional convolutional LSTM").
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        z = jnp.concatenate([x, h], axis=-1)
        gates = nn.Conv(
            4 * self.features,
            self.kernel,
            padding="SAME",
            dtype=self.dtype,
            name="gates",
        )(z)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return (new_h, new_c), new_h

    @staticmethod
    def init_carry(batch, h, w, features, dtype=jnp.float32):
        z = jnp.zeros((batch, h, w, features), dtype)
        return (z, z)


class _MaskedConvLSTMCell(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, inp):
        x_t, v_t = inp
        new_carry, y = ConvLSTMCell(
            self.features, self.kernel, self.dtype, name="cell"
        )(carry, x_t)
        v = v_t[:, None, None, None].astype(y.dtype)
        carry = jax.tree.map(
            lambda n, old: n * v + old * (1.0 - v), new_carry, carry
        )
        return carry, y * v


class BiConvLSTM(nn.Module):
    """Bi-directional conv-LSTM over an object sequence (B, O, H, W, C).

    Returns (B, O, H, W, 2F): forward and backward passes concatenated, so
    each object's features see every other object in the layout.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, valid: jnp.ndarray):
        b, o, h, w, _ = xs.shape
        carry0 = ConvLSTMCell.init_carry(b, h, w, self.features, xs.dtype)
        xs_t = jnp.moveaxis(xs, 1, 0)  # (O, B, H, W, C)
        valid_t = jnp.swapaxes(valid.astype(xs.dtype), 0, 1)

        def scan_cell(name, reverse):
            return nn.scan(
                _MaskedConvLSTMCell,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
                reverse=reverse,
            )(self.features, self.kernel, self.dtype, name=name)

        _, ys_f = scan_cell("fwd", False)(carry0, (xs_t, valid_t))
        _, ys_b = scan_cell("bwd", True)(carry0, (xs_t, valid_t))
        ys = jnp.concatenate([ys_f, ys_b], axis=-1)
        return jnp.moveaxis(ys, 0, 1)
