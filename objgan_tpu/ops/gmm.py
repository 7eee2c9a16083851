"""Gaussian-mixture box distribution for the Stage-A box generator.

Obj-GAN's box decoder emits, per step, a distribution over bounding boxes
b_t = (x, y, w, h) as a sketch-RNN-style Gaussian mixture (paper §3.1;
reference tree unavailable — SURVEY.md §2.1 "Box decoder"). Two covariance
structures, switched by ``cfg.OBJ.GMM_MODE`` (VERDICT r2 missing #1):

  * ``"diag"`` — independent 4-D components (round-1/2 behavior).
  * ``"corr"`` — THE DEFAULT since round 3: won the held-out ablation on
    the 2k procedural manifest (NLL -3.19 vs -2.83 for diag, sample-mode
    label TV-distance 0.057 vs 0.127 — BASELINE.md round-3 GMM table),
    and matches the survey's sketch-RNN lineage spec.
    Sketch-RNN-style correlated bivariate blocks: (x, y) and
    (w, h) each get a tanh-bounded correlation ρ per component, capturing
    the strong geometric coupling in box data (w↔h aspect ratio, position↔
    size edge constraints) that a diagonal mixture cannot express. The
    covariance is block-diagonal over the two pairs — the full 4x4 case
    adds little over this and costs stability.

Hand-rolled (no tfp dependency), numerically stabilized with logsumexp.
All functions are shape-static and jit/vmap/scan-friendly:
  diag params layout (last dim): [K logits | K*4 means | K*4 log_sigmas]
  corr adds [... | K*2 rho_raw] (rho = 0.99 * tanh(rho_raw))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BOX_DIM = 4
_LOG_2PI = 1.8378770664093453  # log(2*pi)
# correlated pairs: (x, y) position block and (w, h) size block
_PAIRS = ((0, 1), (2, 3))
_RHO_MAX = 0.99  # keep 1-rho^2 bounded away from 0 (sketch-RNN convention)


_MODES = ("diag", "corr")


def _check_mode(mode: str) -> None:
    """Every switch below is ``if mode == "corr" else diag`` — without this
    guard an unrecognized value (typo, wrong case) would silently fall back
    to diag and quietly disable the ablation-backed corr default."""
    if mode not in _MODES:
        raise ValueError(f"unknown GMM mode {mode!r} (known: {_MODES})")


def param_size(num_components: int, mode: str = "diag") -> int:
    _check_mode(mode)
    per = 1 + 2 * BOX_DIM + (len(_PAIRS) if mode == "corr" else 0)
    return num_components * per


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


def split_params_corr(params: jnp.ndarray, num_components: int):
    """corr layout -> (logits (...,K), mu (...,K,4), log_sigma (...,K,4),
    rho (...,K,2)) with rho already tanh-bounded."""
    k = num_components
    diag_sz = k * (1 + 2 * BOX_DIM)
    logits, mu, log_sigma = split_params(params[..., :diag_sz], k)
    rho_raw = params[..., diag_sz:].reshape(*params.shape[:-1], k, len(_PAIRS))
    return logits, mu, log_sigma, _RHO_MAX * jnp.tanh(rho_raw)


def _comp_ll_corr(z, log_sigma, rho):
    """Per-component log-density from standardized residuals z (..., K, 4)
    with block-diagonal bivariate correlation rho (..., K, 2)."""
    ll = 0.0
    for p, (i, j) in enumerate(_PAIRS):
        zi, zj, r = z[..., i], z[..., j], rho[..., p]
        one_m_r2 = 1.0 - r * r
        q = (zi * zi - 2.0 * r * zi * zj + zj * zj) / one_m_r2
        ll = ll - 0.5 * q - _LOG_2PI - 0.5 * jnp.log(one_m_r2) \
            - log_sigma[..., i] - log_sigma[..., j]
    return ll


def log_prob(params: jnp.ndarray, box: jnp.ndarray, num_components: int,
             mode: str = "diag") -> jnp.ndarray:
    """log p(box | params). box (..., 4) -> (...,)."""
    _check_mode(mode)
    if mode == "corr":
        logits, mu, log_sigma, rho = split_params_corr(params, num_components)
    else:
        logits, mu, log_sigma = split_params(params, num_components)
    log_mix = jax.nn.log_softmax(logits, axis=-1)  # (..., K)
    z = (box[..., None, :] - mu) * jnp.exp(-log_sigma)  # (..., K, 4)
    if mode == "corr":
        comp_ll = _comp_ll_corr(z, log_sigma, rho)
    else:
        comp_ll = -0.5 * jnp.sum(z * z + _LOG_2PI, axis=-1) - jnp.sum(
            log_sigma, axis=-1
        )  # (..., K)
    return jax.nn.logsumexp(log_mix + comp_ll, axis=-1)


def nll(params, box, num_components, valid=None, mode: str = "diag"):
    """Mean negative log-likelihood over valid steps (masked)."""
    ll = log_prob(params, box, num_components, mode=mode)
    if valid is None:
        return -jnp.mean(ll)
    valid = valid.astype(ll.dtype)
    return -jnp.sum(ll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def sample(
    params: jnp.ndarray,
    rng: jax.Array,
    num_components: int,
    temperature: float | jnp.ndarray = 1.0,
    mode: str = "diag",
) -> jnp.ndarray:
    """Temperature sample a box (..., 4) from the mixture.

    Temperature scales both the mixture logits (logits / T) and the component
    scales (sigma * sqrt(T)), the sketch-RNN convention. In corr mode each
    (x,y)/(w,h) pair draws from its correlated bivariate Gaussian via the
    Cholesky transform b = mu_b + sigma_b (rho e_a + sqrt(1-rho^2) e_b).
    """
    _check_mode(mode)
    if mode == "corr":
        logits, mu, log_sigma, rho = split_params_corr(params, num_components)
    else:
        logits, mu, log_sigma = split_params(params, num_components)
    k_rng, g_rng = jax.random.split(rng)
    t = jnp.asarray(temperature, dtype=logits.dtype)
    comp = jax.random.categorical(k_rng, logits / jnp.maximum(t, 1e-6), axis=-1)
    onehot = jax.nn.one_hot(comp, num_components, dtype=mu.dtype)  # (..., K)
    sel_mu = jnp.sum(mu * onehot[..., None], axis=-2)  # (..., 4)
    sel_sigma = jnp.sum(jnp.exp(log_sigma) * onehot[..., None], axis=-2)
    eps = jax.random.normal(g_rng, sel_mu.shape, dtype=sel_mu.dtype)
    if mode == "corr":
        sel_rho = jnp.sum(rho * onehot[..., None], axis=-2)  # (..., 2)
        cols = []
        for p, (i, j) in enumerate(_PAIRS):
            r = sel_rho[..., p]
            cols.append(eps[..., i])
            cols.append(r * eps[..., i] + jnp.sqrt(1.0 - r * r) * eps[..., j])
        eps = jnp.stack(cols, axis=-1)
    return sel_mu + sel_sigma * jnp.sqrt(t) * eps


def mean(params: jnp.ndarray, num_components: int,
         mode: str = "diag") -> jnp.ndarray:
    """Mixture mean — the greedy/argmax-free deterministic box estimate.
    (Identical math in both modes: correlation doesn't move the mean, but
    corr params pack extra entries, so the layout must be known.)"""
    _check_mode(mode)
    if mode == "corr":
        logits, mu, _, _ = split_params_corr(params, num_components)
    else:
        logits, mu, _ = split_params(params, num_components)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(mu * w[..., None], axis=-2)
