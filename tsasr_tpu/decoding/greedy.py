"""Greedy transducer decoding as a single on-device ``lax.scan``.

Replaces the reference's Python frame loop
(``vendor/speechbrain/speechbrain/decoders/transducer.py:138-218``) with a
compiled scan: the whole batch decodes in one XLA program, never leaving
the device (SURVEY.md §3.5's "must become a lax.while_loop on TPU").

Semantics match the reference greedy exactly: at most one emission per
encoder frame; the prediction network advances only for batch elements
that emitted a non-blank (computed for all, applied by select — the TPU
trade: redundant FLOPs beat data-dependent control flow).
"""

import jax
import jax.numpy as jnp


def greedy_decode(predict_step, joint_step, initial_state, enc_out,
                  rel_lengths=None, blank=0):
    """
    Arguments
    ---------
    predict_step : fn (token (B,), state) -> (dec_proj (B, J), state)
        One prediction-network step (already closed over params).
    joint_step : fn (enc_t (B, J), dec (B, J)) -> log_probs (B, V)
        Joint + head + log-softmax for one frame.
    initial_state : prediction-network initial state.
    enc_out : (B, T, J) projected encoder output.
    rel_lengths : (B,) relative lengths (frames beyond the valid length
        never emit).
    blank : blank token index.

    Returns
    -------
    tokens : (B, T) int32 emitted tokens (blank = no emission that frame)
    counts : (B,) int32 number of emissions
    scores : (B,) float32 sum of emitted log-probs
    """
    B, T, _ = enc_out.shape
    if rel_lengths is None:
        abs_len = jnp.full((B,), T, jnp.int32)
    else:
        abs_len = jnp.round(rel_lengths * T).astype(jnp.int32)

    bos = jnp.full((B,), blank, jnp.int32)
    dec0, state0 = predict_step(bos, initial_state)

    def step(carry, inputs):
        dec, state, count, score = carry
        enc_t, t = inputs
        log_probs = joint_step(enc_t, dec)                  # (B, V)
        best = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        best_lp = jnp.take_along_axis(log_probs, best[:, None],
                                      axis=-1)[:, 0]
        valid = t < abs_len
        emit = (best != blank) & valid

        new_dec, new_state = predict_step(best, state)
        dec = jnp.where(emit[:, None], new_dec, dec)
        state = jax.tree.map(
            lambda new, old: jnp.where(
                emit.reshape((1, B) + (1,) * (old.ndim - 2)), new, old),
            new_state, state)
        count = count + emit.astype(jnp.int32)
        score = score + jnp.where(emit, best_lp, 0.0)
        token = jnp.where(emit, best, blank)
        return (dec, state, count, score), token

    init = (dec0, state0, jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.float32))
    (_, _, counts, scores), tokens = jax.lax.scan(
        step, init, (jnp.swapaxes(enc_out, 0, 1), jnp.arange(T)))
    return jnp.swapaxes(tokens, 0, 1), counts, scores


class TransducerGreedySearcher:
    """Callable wrapper producing Python token lists (reference searcher
    interface: returns (hyps, mean exp score, None, None))."""

    def __init__(self, model, params, blank_index=0):
        self.model = model
        self.params = params
        self.blank = blank_index
        self._jitted = jax.jit(self._decode)

    def update_params(self, params):
        self.params = params

    def _decode(self, params, enc_out, rel_lengths):
        def predict_step(token, state):
            return self.model.apply(params, token, state,
                                    method=self.model.predict_step)

        def joint_step(enc_t, dec):
            logits = self.model.apply(
                params, enc_t[:, None, :], dec[:, None, :],
                method=self.model.joint_logits)[:, 0, :]
            return jax.nn.log_softmax(logits, axis=-1)

        state0 = self.model.apply(
            params, enc_out.shape[0],
            method=self.model.predictor_initial_state)
        return greedy_decode(predict_step, joint_step, state0, enc_out,
                             rel_lengths, self.blank)

    def __call__(self, enc_out, rel_lengths=None):
        import numpy as np
        if rel_lengths is None:
            rel_lengths = jnp.ones((enc_out.shape[0],), jnp.float32)
        tokens, counts, scores = self._jitted(self.params, enc_out,
                                              rel_lengths)
        tokens = np.asarray(tokens)
        counts = np.asarray(counts)
        hyps = [[int(tok) for tok in row if tok != self.blank]
                for row in tokens]
        mean_score = float(np.exp(np.asarray(scores)).mean())
        return hyps, mean_score, None, None
