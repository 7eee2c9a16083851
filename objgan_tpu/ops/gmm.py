"""Gaussian-mixture box distribution for the Stage-A box generator.

Obj-GAN's box decoder emits, per step, a distribution over bounding boxes
b_t = (x, y, w, h) as a sketch-RNN-style Gaussian mixture (paper §3.1;
reference tree unavailable — SURVEY.md §2.1 "Box decoder"). We model a
K-component mixture over the 4-dim box vector with diagonal covariance,
hand-rolled (no tfp dependency), numerically stabilized with logsumexp.

All functions are shape-static and jit/vmap/scan-friendly:
  params layout (last dim): [K logits | K*4 means | K*4 log_sigmas]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BOX_DIM = 4
_LOG_2PI = 1.8378770664093453  # log(2*pi)


def param_size(num_components: int) -> int:
    return num_components * (1 + 2 * BOX_DIM)


def split_params(params: jnp.ndarray, num_components: int):
    """params (..., K*(1+8)) -> (logits (...,K), mu (...,K,4), log_sigma (...,K,4))."""
    k = num_components
    logits = params[..., :k]
    mu = params[..., k : k + k * BOX_DIM].reshape(*params.shape[:-1], k, BOX_DIM)
    log_sigma = params[..., k + k * BOX_DIM :].reshape(
        *params.shape[:-1], k, BOX_DIM
    )
    # Clamp for numerical safety under bf16 training noise.
    log_sigma = jnp.clip(log_sigma, -7.0, 7.0)
    return logits, mu, log_sigma


def log_prob(params: jnp.ndarray, box: jnp.ndarray, num_components: int) -> jnp.ndarray:
    """log p(box | params). box (..., 4) -> (...,)."""
    logits, mu, log_sigma = split_params(params, num_components)
    log_mix = jax.nn.log_softmax(logits, axis=-1)  # (..., K)
    z = (box[..., None, :] - mu) * jnp.exp(-log_sigma)  # (..., K, 4)
    comp_ll = -0.5 * jnp.sum(z * z + _LOG_2PI, axis=-1) - jnp.sum(
        log_sigma, axis=-1
    )  # (..., K)
    return jax.nn.logsumexp(log_mix + comp_ll, axis=-1)


def nll(params, box, num_components, valid=None):
    """Mean negative log-likelihood over valid steps (masked)."""
    ll = log_prob(params, box, num_components)
    if valid is None:
        return -jnp.mean(ll)
    valid = valid.astype(ll.dtype)
    return -jnp.sum(ll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def sample(
    params: jnp.ndarray,
    rng: jax.Array,
    num_components: int,
    temperature: float | jnp.ndarray = 1.0,
) -> jnp.ndarray:
    """Temperature sample a box (..., 4) from the mixture.

    Temperature scales both the mixture logits (logits / T) and the component
    scales (sigma * sqrt(T)), the sketch-RNN convention.
    """
    logits, mu, log_sigma = split_params(params, num_components)
    k_rng, g_rng = jax.random.split(rng)
    t = jnp.asarray(temperature, dtype=logits.dtype)
    comp = jax.random.categorical(k_rng, logits / jnp.maximum(t, 1e-6), axis=-1)
    onehot = jax.nn.one_hot(comp, num_components, dtype=mu.dtype)  # (..., K)
    sel_mu = jnp.sum(mu * onehot[..., None], axis=-2)  # (..., 4)
    sel_sigma = jnp.sum(jnp.exp(log_sigma) * onehot[..., None], axis=-2)
    eps = jax.random.normal(g_rng, sel_mu.shape, dtype=sel_mu.dtype)
    return sel_mu + sel_sigma * jnp.sqrt(t) * eps


def mean(params: jnp.ndarray, num_components: int) -> jnp.ndarray:
    """Mixture mean — the greedy/argmax-free deterministic box estimate."""
    logits, mu, _ = split_params(params, num_components)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(mu * w[..., None], axis=-2)
