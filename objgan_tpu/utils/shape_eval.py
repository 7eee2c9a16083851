"""Stage-B evaluation utilities: held-out mask quality for the shape
generator (the Stage-B counterpart of utils/box_eval.py — the reference
evaluates shapes only qualitatively, paper §3.2; these give the training
loop a quantitative held-out signal).

All metrics are masked to valid objects (MAX_OBJECTS padding carries
``obj_valid``) and computed on host from jitted forward samples.
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax
import numpy as np


def heldout_mask_metrics(trainer, state, batches: Iterable[dict], rng,
                         threshold: float = 0.5) -> Dict[str, float]:
    """IoU / pixel-accuracy / area stats of sampled vs GT per-object masks.

    - ``mask_iou``: mean IoU over valid objects (prediction thresholded at
      ``threshold``, GT at 0.5; empty-vs-empty counts as IoU 1).
    - ``mask_pixel_acc``: mean per-object pixel accuracy.
    - ``area_ratio``: mean predicted-area / GT-area for objects with
      nonempty GT (calibration signal: ~1.0 is unbiased).
    - ``n_objects``: number of valid objects scored.
    """
    sample = trainer.jitted_sample()
    ious, accs, ratios = [], [], []
    n_obj = 0
    for i, batch in enumerate(batches):
        pred = np.asarray(sample(state, batch["boxes"], batch["labels"],
                                 batch["obj_valid"],
                                 jax.random.fold_in(rng, i)))
        gt = np.asarray(batch["shapes"]) > 0.5
        pm = pred > threshold
        valid = np.asarray(batch["obj_valid"], bool)
        for b, o in zip(*np.nonzero(valid)):
            p, g = pm[b, o], gt[b, o]
            inter = float(np.logical_and(p, g).sum())
            union = float(np.logical_or(p, g).sum())
            ious.append(inter / union if union else 1.0)
            accs.append(float((p == g).mean()))
            ga = float(g.sum())
            if ga:
                ratios.append(float(p.sum()) / ga)
            n_obj += 1
    return {
        "mask_iou": float(np.mean(ious)) if ious else 0.0,
        "mask_pixel_acc": float(np.mean(accs)) if accs else 0.0,
        "area_ratio": float(np.mean(ratios)) if ratios else 0.0,
        "n_objects": float(n_obj),
    }
