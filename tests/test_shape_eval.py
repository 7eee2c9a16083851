"""Stage-B held-out mask metrics (utils/shape_eval.py)."""

import jax
import numpy as np

from objgan_tpu.data.synthetic import synthetic_batch
from objgan_tpu.train.shape import ShapeTrainer
from objgan_tpu.utils.shape_eval import heldout_mask_metrics


class _OracleTrainer:
    """Stub trainer whose sampler returns a fixed prediction tensor."""

    def __init__(self, pred):
        self.pred = pred

    def jitted_sample(self):
        return lambda state, boxes, labels, valid, rng: self.pred


def test_metric_math_against_hand_case():
    """2 objects: one exact match (IoU 1), one half-overlap."""
    s = 8
    gt = np.zeros((1, 2, s, s), np.float32)
    gt[0, 0, :4] = 1.0        # top half
    gt[0, 1, :, :4] = 1.0     # left half
    pred = np.zeros((1, 2, s, s), np.float32)
    pred[0, 0, :4] = 0.9      # exact match
    pred[0, 1, :, :2] = 0.9   # half of the GT area
    batch = {
        "shapes": gt,
        "boxes": np.zeros((1, 2, 4), np.float32),
        "labels": np.zeros((1, 2), np.int32),
        "obj_valid": np.array([[True, True]]),
    }
    m = heldout_mask_metrics(_OracleTrainer(pred), None, [batch],
                             jax.random.PRNGKey(0))
    assert m["n_objects"] == 2.0
    np.testing.assert_allclose(m["mask_iou"], (1.0 + 0.5) / 2)
    np.testing.assert_allclose(m["area_ratio"], (1.0 + 0.5) / 2)
    # obj 0 perfect, obj 1 wrong on a quarter of pixels
    np.testing.assert_allclose(m["mask_pixel_acc"], (1.0 + 0.75) / 2)


def test_invalid_objects_excluded():
    s = 8
    batch = {
        "shapes": np.ones((1, 2, s, s), np.float32),
        "boxes": np.zeros((1, 2, 4), np.float32),
        "labels": np.zeros((1, 2), np.int32),
        "obj_valid": np.array([[True, False]]),
    }
    pred = np.zeros((1, 2, s, s), np.float32)
    m = heldout_mask_metrics(_OracleTrainer(pred), None, [batch],
                             jax.random.PRNGKey(0))
    assert m["n_objects"] == 1.0
    assert m["mask_iou"] == 0.0  # valid object entirely missed


def test_real_trainer_end_to_end(tiny_cfg, rng):
    """The real ShapeTrainer path runs and returns finite metrics."""
    trainer = ShapeTrainer(tiny_cfg)
    batch = synthetic_batch(tiny_cfg, rng, 2)
    state = trainer.init_state(rng, batch)
    m = heldout_mask_metrics(trainer, state, [batch], rng)
    assert m["n_objects"] > 0
    assert 0.0 <= m["mask_iou"] <= 1.0
    assert 0.0 <= m["mask_pixel_acc"] <= 1.0
    assert np.isfinite(m["area_ratio"])
