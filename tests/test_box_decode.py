"""Beam search + scheduled-sampling tests for the Stage-A decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from objgan_tpu.data.synthetic import synthetic_batch
from objgan_tpu.train.box import BoxTrainer


def _cfg(tiny_cfg):
    return tiny_cfg.replace(DTYPE="float32")


def test_beam_sample_shapes_and_stop_monotone(tiny_cfg):
    cfg = _cfg(tiny_cfg)
    tr = BoxTrainer(cfg)
    batch = synthetic_batch(cfg, jax.random.PRNGKey(3), with_images=False)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    out = jax.jit(lambda s, c, l, r: tr.model.apply(
        s.params, c, l, r, beam_size=3, method="beam_sample"
    ))(state, batch["captions"], batch["cap_lens"], jax.random.PRNGKey(1))
    b = batch["captions"].shape[0]
    o = cfg.BOX.MAX_SEQ_LENGTH
    assert out["labels"].shape == (b, o)
    assert out["boxes"].shape == (b, o, 4)
    assert out["beam_scores"].shape == (b, 3)
    # scores sorted descending (top_k order)
    s = np.asarray(out["beam_scores"])
    assert (np.diff(s, axis=1) <= 1e-6).all()
    # once invalid, stays invalid
    v = np.asarray(out["obj_valid"])
    for row in v:
        seen = False
        for x in row:
            seen = seen or x == 0
            assert not (seen and x == 1)
    # valid boxes in range, invalid zeroed
    assert float(out["boxes"].min()) >= 0.0
    inv = 1.0 - out["obj_valid"]
    assert float(jnp.abs(out["boxes"] * inv[..., None]).max()) == 0.0


def test_beam_1_equals_greedy_consistency(tiny_cfg):
    """Beam size 1 must pick the argmax label at every step."""
    cfg = _cfg(tiny_cfg)
    tr = BoxTrainer(cfg)
    batch = synthetic_batch(cfg, jax.random.PRNGKey(5), with_images=False)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    out = tr.model.apply(
        state.params, batch["captions"], batch["cap_lens"],
        jax.random.PRNGKey(1), beam_size=1, method="beam_sample",
    )
    # greedy == temperature->0 sampling path
    greedy = tr.model.apply(
        state.params, batch["captions"], batch["cap_lens"],
        jax.random.PRNGKey(2), temperature=1e-7, gmm_temperature=1e-7,
        method="sample",
    )
    np.testing.assert_array_equal(
        np.asarray(out["labels"]), np.asarray(greedy["labels"])
    )


def test_scheduled_sampling_changes_logits_not_shapes(tiny_cfg):
    cfg = _cfg(tiny_cfg).merged({"BOX": {"SCHEDULED_SAMPLING_PROB": 1.0}})
    tr = BoxTrainer(cfg)
    batch = synthetic_batch(cfg, jax.random.PRNGKey(7), with_images=False)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    out_tf = tr.model.apply(
        state.params, batch["captions"], batch["cap_lens"], batch["labels"],
        batch["boxes"], batch["obj_valid"],
    )
    out_ss = tr.model.apply(
        state.params, batch["captions"], batch["cap_lens"], batch["labels"],
        batch["boxes"], batch["obj_valid"], ss_prob=1.0,
        rng=jax.random.PRNGKey(9),
    )
    assert out_ss["label_logits"].shape == out_tf["label_logits"].shape
    # with p=1 every input is the model's own prediction -> different logits
    # from step 1 on (step 0 input is BOS either way)
    diff = np.abs(
        np.asarray(out_ss["label_logits"][:, 1:])
        - np.asarray(out_tf["label_logits"][:, 1:])
    ).max()
    assert diff > 1e-6

    # training still steps with ss enabled
    new_state, aux = jax.jit(tr.train_step)(state, batch,
                                            jax.random.PRNGKey(11))
    assert np.isfinite(float(aux["box_total"]))
