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

from typing import Dict, NamedTuple, Tuple

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
        # BiLSTM already zeroes padded steps, so summing states directly is
        # the masked sum; only the denominator needs the mask
        mean_state = jnp.sum(states, 1) / jnp.maximum(
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
            gmm.param_size(c.OBJ.GMM_COMPONENTS, c.OBJ.GMM_MODE),
            name="box_head"
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
        """One decode step. Returns (state, label_logits, h_lang, alpha).

        The box distribution factorizes as p(b_t | l_t, h_t) (paper §3.1):
        call :meth:`box_params` with the step's hidden state and the chosen
        (GT or sampled) label to get the class-conditioned GMM parameters.
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
        return DecoderState(att_carry, lang_carry), label_logits, h_lang, alpha

    def box_params(self, h_lang: jnp.ndarray, label: jnp.ndarray):
        """GMM parameters for the box, conditioned on the current label
        (a 'giraffe' box is tall, a 'frisbee' box is small)."""
        lab_emb = self.label_embed(label)
        return self.box_head(
            jnp.concatenate([h_lang, lab_emb], axis=-1)
        ).astype(jnp.float32)

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
        self, captions, cap_lens, labels, boxes, obj_valid,
        ss_prob: float = 0.0, rng: jax.Array | None = None,
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced pass over the GT layout sequence.

        labels (B, O) with 0 padding; boxes (B, O, 4); obj_valid (B, O).
        Returns per-step label logits (B, O+1, C) — the extra step is the
        STOP prediction after the last object — and box params (B, O, P).
        NOTE: outputs at padded steps are NOT suppressed here; ``obj_valid``
        is accepted for batch-API symmetry and all masking lives in
        :func:`box_loss` (which requires a prefix mask — see its doc).

        ``ss_prob`` > 0 enables scheduled sampling (the lineage's
        ``scheduled_sampling_prob``): per step and example, with probability
        p the decoder is fed its own previous prediction (argmax label,
        mixture-mean box) instead of the ground truth.
        """
        b, o = labels.shape
        use_ss = ss_prob > 0.0 and rng is not None
        enc_states, mean_state, enc_valid = self.encoder(captions, cap_lens)
        state = self.decoder.init_state(b)
        # inputs at step t: object t-1 (BOS = STOP label + zero box)
        in_labels = jnp.concatenate(
            [jnp.full((b, 1), STOP, labels.dtype), labels], axis=1
        )
        in_boxes = jnp.concatenate([jnp.zeros((b, 1, 4), boxes.dtype), boxes], 1)
        n_steps = o + 1
        step_rngs = (
            jax.random.split(rng, n_steps) if use_ss
            else jnp.zeros((n_steps, 2), jnp.uint32)
        )
        gmm_k = self.cfg.OBJ.GMM_COMPONENTS

        def body(mdl, carry, x):
            dec_state, prev_pred_lab, prev_pred_box = carry
            gt_lab, gt_box, r = x
            if use_ss:
                flip = jax.random.bernoulli(r, ss_prob, (b,))
                lab_in = jnp.where(flip, prev_pred_lab, gt_lab)
                box_in = jnp.where(flip[:, None], prev_pred_box, gt_box)
            else:
                lab_in, box_in = gt_lab, gt_box
            new_state, logits, h_lang, alpha = mdl.decoder.step(
                dec_state, lab_in, box_in, enc_states, mean_state, enc_valid
            )
            if use_ss:  # static: skipped entirely in plain teacher forcing
                pred_lab = jnp.argmax(logits, axis=-1).astype(gt_lab.dtype)
                pred_params = mdl.decoder.box_params(h_lang, pred_lab)
                pred_box = jnp.clip(
                    gmm.mean(pred_params, gmm_k, mdl.cfg.OBJ.GMM_MODE),
                    0.0, 1.0
                ).astype(gt_box.dtype)
            else:
                pred_lab, pred_box = prev_pred_lab, prev_pred_box
            return (new_state, pred_lab, pred_box), (logits, h_lang, alpha)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        xs = (
            jnp.swapaxes(in_labels, 0, 1),
            jnp.swapaxes(in_boxes, 0, 1),
            step_rngs,
        )
        carry0 = (state, in_labels[:, 0], in_boxes[:, 0])
        _, (logits, h_langs, alphas) = scan(self, carry0, xs)
        h_langs = jnp.swapaxes(h_langs, 0, 1)  # (B, O+1, H)
        # class-conditioned box params for the GT labels at each real step
        box_params = self.decoder.box_params(h_langs[:, :o], labels)
        return {
            "label_logits": jnp.swapaxes(logits, 0, 1),  # (B, O+1, C)
            "box_params": box_params,  # (B, O, P) conditioned on GT labels
            "alphas": jnp.swapaxes(alphas, 0, 1),  # (B, O+1, T)
        }

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
            state, logits, h_lang, _ = mdl.decoder.step(
                state, prev_lab, prev_box, enc_states, mean_state, enc_valid
            )
            k1, k2 = jax.random.split(step_rng)
            lab = jax.random.categorical(k1, logits / jnp.maximum(temp, 1e-6))
            params = mdl.decoder.box_params(h_lang, lab)
            box = gmm.sample(params, k2, c.OBJ.GMM_COMPONENTS, gtemp,
                             mode=c.OBJ.GMM_MODE)
            box = jnp.clip(box, 0.0, 1.0)
            lab = jnp.where(alive > 0, lab, STOP).astype(jnp.int32)
            # one definition: the step's validity IS the next carry's alive
            valid = alive * (lab != STOP)
            box = box * valid[:, None]
            return (state, lab, box, valid), (lab, box, valid)

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

    def beam_sample(self, captions, cap_lens, rng,
                    beam_size: int | None = None) -> Dict[str, jnp.ndarray]:
        """Beam search over label sequences (the captioning lineage's
        ``CaptionModel`` beam decode), one jittable scan.

        ``rng`` is accepted for call-signature symmetry with :meth:`sample`
        (callers switch between the two) but is NOT consumed: the decode is
        fully deterministic — varying the seed cannot produce beam
        diversity; vary ``beam_size``/temperature sampling for that.

        Beams rank by GNMT length-normalized label log-probability
        (``score / ((5+n)/6)^BEAM_LENGTH_NORM`` with n = emitted tokens incl.
        STOP): dead beams emit STOP at zero cost, so raw-sum ranking would
        systematically favor fewer objects than temperature sampling. Boxes
        come from the mixture mean of each kept beam's step (deterministic
        given the beam). Returns the best beam per example, same contract as
        :meth:`sample`; ``beam_scores`` are the normalized ranking scores.
        """
        c = self.cfg
        k = beam_size or c.BOX.BEAM_SIZE
        alpha = c.BOX.BEAM_LENGTH_NORM

        def lp(n):  # GNMT length penalty
            return ((5.0 + n) / 6.0) ** alpha
        b = captions.shape[0]
        n_cls = c.OBJ.NUM_CLASSES
        enc_states, mean_state, enc_valid = self.encoder(captions, cap_lens)

        def expand(x):  # (B, ...) -> (B*K, ...)
            return jnp.repeat(x, k, axis=0)

        enc_states_e = expand(enc_states)
        mean_state_e = expand(mean_state)
        enc_valid_e = expand(enc_valid)

        state = self.decoder.init_state(b * k)
        # beam 0 active, others -inf so step 1 fans out from one root
        scores0 = jnp.tile(
            jnp.concatenate(
                [jnp.zeros((1,)), jnp.full((k - 1,), -1e9)]
            )[None], (b, 1)
        ) if k > 1 else jnp.zeros((b, 1))
        t_max = c.BOX.MAX_SEQ_LENGTH
        init = (
            state,
            jnp.full((b * k,), STOP, jnp.int32),  # prev labels
            jnp.zeros((b * k, 4), jnp.float32),  # prev boxes
            jnp.ones((b * k,), jnp.float32),  # alive
            scores0,  # (B, K) raw accumulated log-prob
            jnp.zeros((b * k,), jnp.float32),  # emitted tokens incl. STOP
            # histories ride in the carry and are re-gathered on every beam
            # reordering (backtracking-free beam search)
            jnp.zeros((b * k, t_max), jnp.int32),  # hist labels
            jnp.zeros((b * k, t_max, 4), jnp.float32),  # hist boxes
            jnp.zeros((b * k, t_max), jnp.float32),  # hist valid
            jnp.zeros((), jnp.int32),  # step index
        )

        def gather_beams(x, src):  # x (B*K, ...) gathered by src (B, K)
            xs = x.reshape(b, k, *x.shape[1:])
            idx = src.reshape(b, k, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(
                xs, idx.astype(jnp.int32), axis=1
            ).reshape(x.shape)

        def body(mdl, carry, _):
            (state, prev_lab, prev_box, alive, scores, n_tok,
             hist_lab, hist_box, hist_valid, step_i) = carry
            state, logits, h_lang, _ = mdl.decoder.step(
                state, prev_lab, prev_box, enc_states_e, mean_state_e,
                enc_valid_e,
            )
            logp = jax.nn.log_softmax(logits, axis=-1)  # (B*K, C)
            # dead beams can only emit STOP at zero cost
            dead_row = jnp.full((n_cls,), -1e9).at[STOP].set(0.0)
            logp = jnp.where(alive[:, None] > 0, logp, dead_row[None])
            cand = scores.reshape(b * k, 1) + logp  # (B*K, C) raw
            # rank by length-normalized score (every candidate from a live
            # source beam has length n_tok+1 this step; dead beams keep n)
            cand_n = (n_tok + alive)[:, None]  # (B*K, 1)
            ranked = (cand / lp(cand_n)).reshape(b, k * n_cls)
            cand = cand.reshape(b, k * n_cls)
            _, top_idx = jax.lax.top_k(ranked, k)  # (B, K)
            top_scores = jnp.take_along_axis(cand, top_idx, axis=1)  # raw
            src_beam = top_idx // n_cls  # (B, K)
            new_lab = (top_idx % n_cls).reshape(b * k).astype(jnp.int32)
            # reindex every per-beam tensor to the chosen source beams
            state = jax.tree.map(lambda t: gather_beams(t, src_beam), state)
            alive = gather_beams(alive, src_beam)
            n_tok = gather_beams(n_tok, src_beam) + alive
            h_lang = gather_beams(h_lang, src_beam)
            hist_lab = gather_beams(hist_lab, src_beam)
            hist_box = gather_beams(hist_box, src_beam)
            hist_valid = gather_beams(hist_valid, src_beam)
            params = mdl.decoder.box_params(h_lang, new_lab)
            box = gmm.mean(params, c.OBJ.GMM_COMPONENTS,
                           mode=c.OBJ.GMM_MODE)
            box = jnp.clip(box, 0.0, 1.0)
            new_lab = jnp.where(alive > 0, new_lab, STOP)
            # one definition: the step's validity IS the next carry's alive
            valid = alive * (new_lab != STOP)
            box = box * valid[:, None]
            hist_lab = hist_lab.at[:, step_i].set(new_lab)
            hist_box = hist_box.at[:, step_i].set(box)
            hist_valid = hist_valid.at[:, step_i].set(valid)
            return (
                (state, new_lab, box, valid, top_scores, n_tok,
                 hist_lab, hist_box, hist_valid, step_i + 1),
                (),
            )

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
            length=t_max,
        )
        (_, _, _, _, final_scores, final_n,
         hist_lab, hist_box, hist_valid, _), _ = scan(self, init, None)
        # pick the best beam per example by normalized score (identical to
        # the last step's ranking, so these come out sorted descending)
        final_norm = final_scores / lp(final_n.reshape(b, k))
        best = jnp.argmax(final_norm, axis=-1)  # (B,)

        def pick(x):  # (B*K, T, ...) -> (B, T, ...)
            xs = x.reshape(b, k, *x.shape[1:])
            idx = best.reshape(b, 1, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(xs, idx.astype(jnp.int32), axis=1)[:, 0]

        return {
            "labels": pick(hist_lab),
            "boxes": pick(hist_box),
            "obj_valid": pick(hist_valid),
            "beam_scores": final_norm,
        }

    def __call__(self, captions, cap_lens, labels, boxes, obj_valid,
                 ss_prob: float = 0.0, rng: jax.Array | None = None):
        return self.teacher_forced(captions, cap_lens, labels, boxes,
                                   obj_valid, ss_prob=ss_prob, rng=rng)


def box_loss(outputs: Dict[str, jnp.ndarray], labels, boxes, obj_valid,
             num_components: int,
             gmm_mode: str = "diag") -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE over labels (incl. the STOP step) + masked GMM NLL over GT boxes.

    ``obj_valid`` must be a PREFIX mask (valid objects first, padding after
    — the data layer's canonical area-desc ordering guarantees this): the
    STOP-step CE target sits at index ``sum(obj_valid)``, which is only the
    first invalid step for prefix masks. Box NLL masks by ``obj_valid``
    directly, so it is correct for any mask shape."""
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

    box_valid = obj_valid.astype(jnp.float32)  # == steps<n_obj for prefix
    # masks, and strictly more correct should a non-prefix mask ever appear
    # box_params is exactly (B, O, P) — only label_logits carries the O+1
    # STOP step (teacher_forced's contract)
    box_nll = gmm.nll(
        outputs["box_params"], boxes, num_components, box_valid,
        mode=gmm_mode,
    )
    total = label_loss + box_nll
    return total, {"label_loss": label_loss, "box_nll": box_nll}
