"""Quality metrics: FID, Inception Score, R-precision (SURVEY.md §6 — the
paper's reported metrics; the reference computes FID/IS with external
scripts on dumped sample folders).

All metrics are generic over a feature extractor / classifier:
  * With converted ImageNet Inception-v3 weights they are the standard
    definitions (strict parity).
  * Offline (zero egress, no torchvision weights in-image) they run over the
    framework's own DAMSM CNNEncoder features — self-consistent relative
    numbers, clearly labeled "lite".

numpy-only: matrix sqrt via symmetric eigendecomposition, no scipy.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a symmetric PSD matrix via eigh."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def activation_stats(feats: np.ndarray,
                     eps: float = 1e-6) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, regularized covariance) of an activation set (N, D) — the
    sufficient statistics of one FID side (cacheable: the real side is
    identical across every checkpoint evaluated on the same manifest)."""
    f = np.asarray(feats, np.float64)
    if f.shape[0] < 2:
        raise ValueError(
            f"activation_stats needs >= 2 samples for a covariance, got "
            f"{f.shape[0]} — a 1-sample FID would be NaN (and, worse, could "
            f"be cached as a manifest's real-side statistics)")
    return f.mean(0), np.cov(f, rowvar=False) + eps * np.eye(f.shape[1])


def frechet_from_stats(mu_a: np.ndarray, cov_a: np.ndarray,
                       mu_b: np.ndarray, cov_b: np.ndarray) -> float:
    """FID from per-side sufficient statistics: ||mu_a - mu_b||^2 +
    Tr(Ca + Cb - 2 sqrt(sqrt(Ca) Cb sqrt(Ca)))."""
    sa = _sqrtm_psd(cov_a)
    covmean = _sqrtm_psd(sa @ cov_b @ sa)
    diff = mu_a - mu_b
    return float(diff @ diff + np.trace(cov_a) + np.trace(cov_b)
                 - 2.0 * np.trace(covmean))


def frechet_distance(
    feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6
) -> float:
    """FID between two activation sets (N, D)."""
    mu_a, ca = activation_stats(feats_a, eps)
    mu_b, cb = activation_stats(feats_b, eps)
    return frechet_from_stats(mu_a, ca, mu_b, cb)


def inception_score(
    probs: np.ndarray, splits: int = 10
) -> Tuple[float, float]:
    """IS from class probabilities (N, C): exp(E_x KL(p(y|x) || p(y)))."""
    p = np.asarray(probs, np.float64)
    p = p / np.clip(p.sum(-1, keepdims=True), 1e-12, None)
    scores = []
    n = p.shape[0]
    for i in range(splits):
        part = p[i * n // splits:(i + 1) * n // splits]
        if len(part) == 0:
            continue
        marginal = np.clip(part.mean(0, keepdims=True), 1e-12, None)
        kl = (part * (np.log(np.clip(part, 1e-12, None))
                      - np.log(marginal))).sum(-1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def r_precision(
    sent_embs: np.ndarray,  # (N, D) caption embeddings
    image_feats: np.ndarray,  # (N, D) matching image global features
    n_mismatched: int = 99,
    seed: int = 0,
) -> float:
    """Paper's R-precision: for each image, rank its true caption against
    ``n_mismatched`` random captions by cosine similarity; score is the
    fraction ranked STRICTLY first. Ties count as misses: the true caption
    sits at candidate index 0, so an argmax convention would hand a
    collapsed encoder (all similarities equal) a perfect 1.0 — the exact
    inversion of what the metric must signal."""
    s = np.asarray(sent_embs, np.float64)
    g = np.asarray(image_feats, np.float64)
    s = s / np.clip(np.linalg.norm(s, axis=1, keepdims=True), 1e-12, None)
    g = g / np.clip(np.linalg.norm(g, axis=1, keepdims=True), 1e-12, None)
    n = s.shape[0]
    rng = np.random.default_rng(seed)
    hits = 0
    for i in range(n):
        wrong = rng.choice(np.delete(np.arange(n), i),
                           size=min(n_mismatched, n - 1), replace=False)
        cand = np.concatenate([[i], wrong])
        sims = s[cand] @ g[i]
        # strictly-first; ties = miss (see docstring). n==1 has no
        # mismatched candidates at all — scored 0, not a vacuous hit.
        hits += int(sims.size > 1 and sims[0] > np.max(sims[1:]))
    return hits / max(n, 1)
