"""Stage-A evaluation utilities (the reference's ``eval_utils.py`` role —
SURVEY.md §2.1 "Sampling" row): held-out NLL and layout statistics that say
whether the box generator is any good beyond its training loss.

* held-out NLL — teacher-forced label CE + box GMM NLL on unseen batches.
* label histogram — class distribution of sampled vs ground-truth layouts.
* matched-label IoU — for each GT object, greedily match a sampled object of
  the same class by IoU; report the mean IoU over matches and the match rate
  (how many GT objects got any same-class prediction at all).
"""

from __future__ import annotations

from typing import Dict, Iterable, List

import numpy as np


def heldout_nll(trainer, state, batches: Iterable[Dict]) -> Dict[str, float]:
    """Teacher-forced NLL over held-out batches (no scheduled sampling)."""
    import jax

    loss_fn = jax.jit(lambda p, b: trainer.loss(p, b))
    totals: Dict[str, List[float]] = {}
    n = 0
    for batch in batches:
        total, aux = loss_fn(state.params, batch)
        aux = dict(aux, box_total=total)
        for k, v in aux.items():
            totals.setdefault(k, []).append(float(v))
        n += 1
    if n == 0:
        raise ValueError("no held-out batches")
    return {f"heldout_{k}": float(np.mean(v)) for k, v in totals.items()}


def label_histogram(labels: np.ndarray, valid: np.ndarray,
                    num_classes: int) -> np.ndarray:
    """Normalized class histogram over valid objects; zeros if none."""
    lab = np.asarray(labels).reshape(-1)
    v = np.asarray(valid).reshape(-1) > 0
    counts = np.bincount(lab[v], minlength=num_classes).astype(np.float64)
    return counts / max(counts.sum(), 1.0)


def box_iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two (x0, y0, w, h) boxes in normalized coords."""
    ax0, ay0, aw, ah = [float(x) for x in a]
    bx0, by0, bw, bh = [float(x) for x in b]
    ix = max(0.0, min(ax0 + aw, bx0 + bw) - max(ax0, bx0))
    iy = max(0.0, min(ay0 + ah, by0 + bh) - max(ay0, by0))
    inter = ix * iy
    union = max(aw, 0.0) * max(ah, 0.0) + max(bw, 0.0) * max(bh, 0.0) - inter
    return inter / union if union > 0 else 0.0


def matched_label_iou(gt_labels, gt_boxes, gt_valid,
                      sm_labels, sm_boxes, sm_valid) -> Dict[str, float]:
    """Greedy same-class matching between GT and sampled objects, per image.

    For each GT object (in order), pick the unmatched sampled object with the
    same label maximizing IoU. Returns mean IoU over matches and the fraction
    of GT objects matched."""
    gt_labels, sm_labels = np.asarray(gt_labels), np.asarray(sm_labels)
    gt_boxes, sm_boxes = np.asarray(gt_boxes), np.asarray(sm_boxes)
    gt_valid, sm_valid = np.asarray(gt_valid), np.asarray(sm_valid)
    ious, n_gt, n_match = [], 0, 0
    for i in range(gt_labels.shape[0]):
        taken = np.zeros(sm_labels.shape[1], bool)
        for j in range(gt_labels.shape[1]):
            if gt_valid[i, j] <= 0:
                continue
            n_gt += 1
            best, best_k = -1.0, -1
            for k in range(sm_labels.shape[1]):
                if taken[k] or sm_valid[i, k] <= 0:
                    continue
                if int(sm_labels[i, k]) != int(gt_labels[i, j]):
                    continue
                iou = box_iou(gt_boxes[i, j], sm_boxes[i, k])
                if iou > best:
                    best, best_k = iou, k
            if best_k >= 0:
                taken[best_k] = True
                n_match += 1
                ious.append(best)
    return {
        "matched_iou": float(np.mean(ious)) if ious else 0.0,
        "match_rate": n_match / n_gt if n_gt else 0.0,
        "n_gt_objects": float(n_gt),
    }


def layout_stats(trainer, state, batches: Iterable[Dict], rng,
                 num_classes: int, use_beam: bool = False) -> Dict[str, float]:
    """Sample layouts for held-out captions and compare against their GT."""
    import jax

    sampler = (trainer.jitted_beam_sample() if use_beam
               else trainer.jitted_sample())
    gt_hist = np.zeros(num_classes)
    sm_hist = np.zeros(num_classes)
    agg = {"matched_iou": [], "match_rate": []}
    counts = {"gt": [], "sampled": []}
    for i, batch in enumerate(batches):
        out = sampler(state, batch["captions"], batch["cap_lens"],
                      jax.random.fold_in(rng, i))
        sm_labels = np.asarray(out["labels"])
        sm_boxes = np.asarray(out["boxes"])
        sm_valid = np.asarray(out["obj_valid"])
        gt_hist += label_histogram(batch["labels"], batch["obj_valid"],
                                   num_classes)
        sm_hist += label_histogram(sm_labels, sm_valid, num_classes)
        m = matched_label_iou(batch["labels"], batch["boxes"],
                              batch["obj_valid"], sm_labels, sm_boxes,
                              sm_valid)
        agg["matched_iou"].append(m["matched_iou"])
        agg["match_rate"].append(m["match_rate"])
        counts["gt"].append(float((np.asarray(batch["obj_valid"]) > 0).sum(-1)
                                  .mean()))
        counts["sampled"].append(float((sm_valid > 0).sum(-1).mean()))
    if not agg["matched_iou"]:
        # np.mean([]) would return NaN with a warning; fail like
        # heldout_nll does for the same empty-input condition
        raise ValueError("layout_stats got an empty batches iterable")
    n = len(agg["matched_iou"])
    gt_hist, sm_hist = gt_hist / n, sm_hist / n
    # total-variation distance between label distributions, in [0, 1]
    tv = 0.5 * float(np.abs(gt_hist - sm_hist).sum())
    return {
        "matched_iou": float(np.mean(agg["matched_iou"])),
        "match_rate": float(np.mean(agg["match_rate"])),
        "label_tv_distance": tv,
        "mean_objects_gt": float(np.mean(counts["gt"])),
        "mean_objects_sampled": float(np.mean(counts["sampled"])),
    }
