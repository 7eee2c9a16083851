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
        # cast inputs/carry too, not just the weights: fp32 operands would
        # otherwise promote the matmuls back to fp32 and a requested
        # non-default dtype would silently not take effect
        h, c, x = (a.astype(self.dtype) for a in (h, c, x))
        d = self.features
        w_ih = self.param(
            "w_ih", nn.initializers.lecun_normal(), (x.shape[-1], 4 * d), jnp.float32
        )
        w_hh = self.param(
            "w_hh", nn.initializers.orthogonal(), (d, 4 * d), jnp.float32
        )
        b = self.param("b", nn.initializers.zeros, (4 * d,), jnp.float32)
        hi = jax.lax.Precision.HIGHEST  # true-dtype matmuls (PyTorch parity)
        gates = (
            jnp.dot(x, w_ih.astype(self.dtype), precision=hi)
            + jnp.dot(h, w_hh.astype(self.dtype), precision=hi)
            + b.astype(self.dtype)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        # carry goes back out in the dtype it came in: lax.scan requires a
        # type-stable carry, and callers (BoxDecoder.init_state et al.)
        # build fp32 carries — without the cast-back, a non-default cell
        # dtype would raise a carry-type-mismatch at trace time in every
        # scanned decode path. No-op when carry dtype == self.dtype.
        carry_out = (new_h.astype(carry[0].dtype), new_c.astype(carry[1].dtype))
        return carry_out, new_h

    @staticmethod
    def init_carry(batch: int, features: int, dtype=jnp.float32):
        z = jnp.zeros((batch, features), dtype)
        return (z, z)


class BiLSTM(nn.Module):
    """Bi-directional LSTM over padded (B, T, D) with per-sequence lengths.

    Returns (outputs (B, T, 2H), (h_fwd, h_bwd) final hiddens (B, H) each).
    Matches PyTorch ``nn.LSTM(bidirectional=True)`` + pack_padded semantics
    (masked carry freezing — the carry doesn't move on padded steps).

    TPU-optimized recurrence (sequential scans are latency-bound):
      * every input projection is hoisted out of the scan into ONE wide
        (B*T, D)x(D, 4H) matmul per direction (the cuDNN trick) — the scan
        body is just the h @ W_hh matmuls + pointwise gates;
      * both directions run in ONE fused scan: the backward stream rides as
        a second batch half on time-reversed inputs, recurrent weights are
        stacked (2, H, 4H) and applied with a single batched einsum.

    Param layout stays PyTorch-mappable: {fwd,bwd}_w_ih (D, 4H),
    {fwd,bwd}_w_hh (H, 4H), {fwd,bwd}_b (4H,), gate order i|f|g|o.
    """

    features: int  # per-direction hidden size
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: jnp.ndarray):
        b, t, d = xs.shape
        h = self.features
        dt = self.dtype

        def p(name, shape, init):
            return self.param(name, init, shape, jnp.float32).astype(dt)

        lecun = nn.initializers.lecun_normal()
        orth = nn.initializers.orthogonal()
        zeros = nn.initializers.zeros
        w_ih = jnp.stack([p("fwd_w_ih", (d, 4 * h), lecun),
                          p("bwd_w_ih", (d, 4 * h), lecun)])  # (2, D, 4H)
        w_hh = jnp.stack([p("fwd_w_hh", (h, 4 * h), orth),
                          p("bwd_w_hh", (h, 4 * h), orth)])  # (2, H, 4H)
        bias = jnp.stack([p("fwd_b", (4 * h,), zeros),
                          p("bwd_b", (4 * h,), zeros)])  # (2, 4H)

        valid = (jnp.arange(t)[None, :] < lengths[:, None]).astype(dt)  # (B,T)
        x = xs.astype(dt)
        # all input projections in one batched matmul: (2, B, T, 4H)
        hi = jax.lax.Precision.HIGHEST
        xw = jnp.einsum("btd,kdg->kbtg", x, w_ih,
                        precision=hi) + bias[:, None, None, :]
        # fuse directions: time-major (T, 2, B, 4H), bwd half time-reversed
        xw = jnp.stack([xw[0], xw[1, :, ::-1]], axis=0)  # (2, B, T, 4H)
        xw_t = jnp.moveaxis(xw, 2, 0)  # (T, 2, B, 4H)
        valid_t = jnp.stack(
            [jnp.swapaxes(valid, 0, 1), jnp.swapaxes(valid, 0, 1)[::-1]], 1
        )  # (T, 2, B)

        def step(carry, inp):
            hc, cc = carry  # each (2, B, H)
            xw_s, v_s = inp  # (2, B, 4H), (2, B)
            gates = xw_s + jnp.einsum("kbh,khg->kbg", hc, w_hh,
                                      precision=hi)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            new_c = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
            new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
            v = v_s[..., None]
            hc = new_h * v + hc * (1.0 - v)
            cc = new_c * v + cc * (1.0 - v)
            return (hc, cc), new_h * v

        carry0 = (jnp.zeros((2, b, h), dt), jnp.zeros((2, b, h), dt))
        (h_fin, _), ys = jax.lax.scan(step, carry0, (xw_t, valid_t))
        ys_f = jnp.swapaxes(ys[:, 0], 0, 1)  # (B, T, H)
        ys_b = jnp.swapaxes(ys[:, 1][::-1], 0, 1)  # un-reverse time
        return jnp.concatenate([ys_f, ys_b], -1), (h_fin[0], h_fin[1])


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
