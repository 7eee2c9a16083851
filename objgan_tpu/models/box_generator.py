"""Stage A — box generator: caption -> sequence of (class label, box) tuples.

Semantics per the Obj-GAN paper §3.1 and the captioning-lineage layout the
reference derives from (SURVEY.md §2.1; reference tree unavailable): an
attentive seq2seq model — bi-LSTM caption encoder, two-layer top-down
attention LSTM decoder emitting, per step, a softmax over object classes
(with STOP) and a sketch-RNN-style Gaussian-mixture over the box (x,y,w,h).

TPU-native design: the autoregressive decode is one ``lax.scan`` with a
static ``MAX_SEQ_LENGTH`` bound and STOP masking (SURVEY.md §7 hard part #4)
so sampling jits to a single XLA program; batched decode keeps the step
matmuls MXU-wide. Class 0 is reserved as STOP/padding.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from objgan_tpu.core.config import Config
from objgan_tpu.ops import gmm
from objgan_tpu.ops.lstm import BiLSTM, LSTMCell

STOP = 0  # class id 0 == STOP / padding


class CaptionEncoder(nn.Module):
    """Token embedding + bi-LSTM; returns (word_states, mean_state, mask)."""

    vocab_size: int
    embed_dim: int
    hidden_dim: int  # per direction

    @nn.compact
    def __call__(self, captions, cap_lens):
        emb = nn.Embed(self.vocab_size, self.embed_dim, name="embedding")(
            captions
        )
        states, _ = BiLSTM(self.hidden_dim, name="bilstm")(emb, cap_lens)
        t = captions.shape[1]
        valid = (jnp.arange(t)[None] < cap_lens[:, None]).astype(states.dtype)
        mean_state = jnp.sum(states * valid[..., None], 1) / jnp.maximum(
            jnp.sum(valid, 1, keepdims=True), 1.0
        )
        return states, mean_state, valid


class AdditiveAttention(nn.Module):
    """Bahdanau attention over encoder states (captioning-lineage ``Attention``)."""

    att_hid: int

    @nn.compact
    def __call__(self, query, states, valid):
        # query (B, H), states (B, T, S), valid (B, T)
        p_s = nn.Dense(self.att_hid, use_bias=False, name="ctx2att")(states)
        p_q = nn.Dense(self.att_hid, use_bias=False, name="h2att")(query)
        e = nn.Dense(1, use_bias=False, name="alpha_net")(
            jnp.tanh(p_s + p_q[:, None, :])
        )[..., 0]  # (B, T)
        e = jnp.where(valid > 0, e, -1e9)
        alpha = jax.nn.softmax(e.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum("bt,bts->bs", alpha.astype(states.dtype), states)
        return ctx, alpha


class DecoderState(NamedTuple):
    att_carry: Tuple[jnp.ndarray, jnp.ndarray]
    lang_carry: Tuple[jnp.ndarray, jnp.ndarray]


class BoxDecoder(nn.Module):
    """Two-layer top-down attention decoder with label + GMM box heads."""

    cfg: Config

    def setup(self):
        c = self.cfg
        self.label_embed = nn.Embed(
            c.OBJ.NUM_CLASSES, c.BOX.INPUT_ENCODING_SIZE, name="label_embed"
        )
        self.att_lstm = LSTMCell(c.BOX.RNN_SIZE, name="att_lstm")
        self.lang_lstm = LSTMCell(c.BOX.RNN_SIZE, name="lang_lstm")
        self.attention = AdditiveAttention(c.BOX.ATT_HID_SIZE, name="attention")
        self.label_head = nn.Dense(c.OBJ.NUM_CLASSES, name="label_head")
        self.box_head = nn.Dense(
            gmm.param_size(c.OBJ.GMM_COMPONENTS), name="box_head"
        )

    def init_state(self, batch: int) -> DecoderState:
        h = self.cfg.BOX.RNN_SIZE
        return DecoderState(
            LSTMCell.init_carry(batch, h), LSTMCell.init_carry(batch, h)
        )

    def step(
        self,
        state: DecoderState,
        prev_label: jnp.ndarray,  # (B,) int
        prev_box: jnp.ndarray,  # (B, 4)
        enc_states: jnp.ndarray,
        mean_state: jnp.ndarray,
        enc_valid: jnp.ndarray,
    ):
        """One decode step. Returns (state, label_logits, box_params, alpha).

        Box params are conditioned on the *current* step's label via the label
        head's argmax/sample done by the caller — here we emit parameters for
        every class-agnostic mixture; conditioning enters through the decoder
        state (the previous object) per the captioning lineage.
        """
        prev_emb = self.label_embed(prev_label)
        x_att = jnp.concatenate(
            [state.lang_carry[0], mean_state, prev_emb, prev_box], axis=-1
        )
        att_carry, h_att = self.att_lstm(state.att_carry, x_att)
        ctx, alpha = self.attention(h_att, enc_states, enc_valid)
        x_lang = jnp.concatenate([ctx, h_att], axis=-1)
        lang_carry, h_lang = self.lang_lstm(state.lang_carry, x_lang)
        label_logits = self.label_head(h_lang).astype(jnp.float32)
        box_params = self.box_head(h_lang).astype(jnp.float32)
        return DecoderState(att_carry, lang_carry), label_logits, box_params, alpha

    def __call__(self, state, prev_label, prev_box, enc_states, mean_state,
                 enc_valid):
        return self.step(state, prev_label, prev_box, enc_states, mean_state,
                         enc_valid)


class BoxGenerator(nn.Module):
    """Encoder + decoder with teacher-forced training and scan sampling."""

    cfg: Config

    def setup(self):
        c = self.cfg
        self.encoder = CaptionEncoder(
            c.TEXT.VOCAB_SIZE,
            c.BOX.INPUT_ENCODING_SIZE,
            c.BOX.RNN_SIZE // 2,
            name="encoder",
        )
        self.decoder = BoxDecoder(c, name="decoder")

    def teacher_forced(
        self, captions, cap_lens, labels, boxes, obj_valid
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced pass over the GT layout sequence.

        labels (B, O) with 0 padding; boxes (B, O, 4); obj_valid (B, O).
        Returns per-step label logits (B, O+1, C) — the extra step is the
        STOP prediction after the last object — and box params (B, O, P).
        """
        b, o = labels.shape
        enc_states, mean_state, enc_valid = self.encoder(captions, cap_lens)
        state = self.decoder.init_state(b)
        # inputs at step t: object t-1 (BOS = STOP label + zero box)
        in_labels = jnp.concatenate(
            [jnp.full((b, 1), STOP, labels.dtype), labels], axis=1
        )
        in_boxes = jnp.concatenate([jnp.zeros((b, 1, 4), boxes.dtype), boxes], 1)

        def step(state, inp):
            lab_t, box_t = inp
            state, logits, params, alpha = self.decoder.step(
                state, lab_t, box_t, enc_states, mean_state, enc_valid
            )
            return state, (logits, params, alpha)

        xs = (jnp.swapaxes(in_labels, 0, 1), jnp.swapaxes(in_boxes, 0, 1))
        _, (logits, params, alphas) = self._scan_steps(
            state, xs, enc_states, mean_state, enc_valid
        )
        return {
            "label_logits": jnp.swapaxes(logits, 0, 1),  # (B, O+1, C)
            "box_params": jnp.swapaxes(params, 0, 1),  # (B, O+1, P)
            "alphas": jnp.swapaxes(alphas, 0, 1),  # (B, O+1, T)
        }

    def _scan_steps(self, state, xs, enc_states, mean_state, enc_valid):
        def body(mdl, carry, x):
            lab_t, box_t = x
            new_state, logits, params, alpha = mdl.decoder.step(
                carry, lab_t, box_t, enc_states, mean_state, enc_valid
            )
            return new_state, (logits, params, alpha)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        return scan(self, state, xs)

    def sample(self, captions, cap_lens, rng, temperature=None,
               gmm_temperature=None) -> Dict[str, jnp.ndarray]:
        """Autoregressive decode with STOP masking, one jittable scan."""
        c = self.cfg
        temp = temperature if temperature is not None else c.BOX.TEMPERATURE
        gtemp = (
            gmm_temperature if gmm_temperature is not None
            else c.BOX.GMM_TEMPERATURE
        )
        b = captions.shape[0]
        enc_states, mean_state, enc_valid = self.encoder(captions, cap_lens)
        state = self.decoder.init_state(b)
        init = (
            state,
            jnp.full((b,), STOP, jnp.int32),
            jnp.zeros((b, 4), jnp.float32),
            jnp.ones((b,), jnp.float32),  # alive mask
        )

        def body(mdl, carry, step_rng):
            state, prev_lab, prev_box, alive = carry
            state, logits, params, _ = mdl.decoder.step(
                state, prev_lab, prev_box, enc_states, mean_state, enc_valid
            )
            k1, k2 = jax.random.split(step_rng)
            lab = jax.random.categorical(k1, logits / jnp.maximum(temp, 1e-6))
            box = gmm.sample(params, k2, c.OBJ.GMM_COMPONENTS, gtemp)
            box = jnp.clip(box, 0.0, 1.0)
            lab = jnp.where(alive > 0, lab, STOP).astype(jnp.int32)
            valid = alive * (lab != STOP)
            box = box * valid[:, None]
            new_alive = alive * (lab != STOP)
            return (state, lab, box, new_alive), (lab, box, valid)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        rngs = jax.random.split(rng, c.BOX.MAX_SEQ_LENGTH)
        _, (labels, boxes, valid) = scan(self, init, rngs)
        return {
            "labels": jnp.swapaxes(labels, 0, 1),  # (B, O)
            "boxes": jnp.swapaxes(boxes, 0, 1),  # (B, O, 4)
            "obj_valid": jnp.swapaxes(valid, 0, 1),  # (B, O)
        }

    def __call__(self, captions, cap_lens, labels, boxes, obj_valid):
        return self.teacher_forced(captions, cap_lens, labels, boxes, obj_valid)


def box_loss(outputs: Dict[str, jnp.ndarray], labels, boxes, obj_valid,
             num_components: int) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE over labels (incl. the STOP step) + masked GMM NLL over GT boxes."""
    b, o = labels.shape
    # targets at step t: object t for t<O, STOP at the first invalid step.
    n_obj = jnp.sum(obj_valid, axis=1).astype(jnp.int32)  # (B,)
    tgt_labels = jnp.concatenate(
        [labels, jnp.zeros((b, 1), labels.dtype)], axis=1
    )  # (B, O+1) — position n_obj holds STOP already (padding is 0)
    steps = jnp.arange(o + 1)[None]
    step_valid = (steps <= n_obj[:, None]).astype(jnp.float32)  # incl STOP step
    logp = jax.nn.log_softmax(outputs["label_logits"], axis=-1)
    ce = -jnp.take_along_axis(logp, tgt_labels[..., None], -1)[..., 0]
    label_loss = jnp.sum(ce * step_valid) / jnp.maximum(jnp.sum(step_valid), 1.0)

    box_valid = (steps[:, :o] < n_obj[:, None]).astype(jnp.float32) * obj_valid
    box_nll = gmm.nll(
        outputs["box_params"][:, :o], boxes, num_components, box_valid
    )
    total = label_loss + box_nll
    return total, {"label_loss": label_loss, "box_nll": box_nll}
