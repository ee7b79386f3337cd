"""Attention/seq2seq (AED) searchers: on-device greedy + batched beam.

Reference surface: ``vendor/speechbrain/speechbrain/decoders/seq2seq.py``
(S2SBaseSearcher / S2SGreedySearcher / S2SBeamSearcher, ~1100 LoC of
per-utterance torch loops) — C13 framework surface beyond the transducer
recipe. TPU-native redesign: both searchers are model-agnostic over a
``step_fn(tokens (N,), state) -> (log_probs (N, V), state)`` closure
(the model side: embed + decoder cell + attention over enc_out, already
closed over params/enc), compiled as one ``lax.scan`` over decode steps.

Semantics mirrored from the reference:
- decode from <bos>, stop bookkeeping at <eos> (finished hypotheses are
  frozen; their score stops accumulating);
- ``min_decode_ratio`` / ``max_decode_ratio`` scale the number of steps
  by the encoder length; eos is masked out before the min step;
- ``length_normalization``: final ranking by score / length
  (S2SBeamSearcher's ``length_normalization=True`` default);
- ``eos_threshold``: eos is only eligible when its log-prob is within
  ``log(eos_threshold)``... the reference compares eos score to the
  best non-eos score (seq2seq.py:760-780) — same rule here;
- optional shallow-fusion LM (``lm_step_fn``/``lm_weight``), applied to
  every expansion like the reference's ``lm_modules`` path.
"""

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1e30


def s2s_greedy_search(step_fn, initial_state, batch_size, bos_index,
                      eos_index, max_steps):
    """Greedy AED decode as one scan.

    Returns (tokens (B, max_steps), lengths (B,), scores (B,)) where
    length counts tokens before (excluding) eos.
    """
    B = batch_size

    def body(carry, _):
        tok, state, finished, length, score = carry
        log_probs, state = step_fn(tok, state)
        best = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        best_lp = jnp.take_along_axis(log_probs, best[:, None],
                                      axis=-1)[:, 0]
        emit = ~finished
        score = score + jnp.where(emit, best_lp, 0.0)
        length = length + (emit & (best != eos_index)).astype(jnp.int32)
        out_tok = jnp.where(emit, best, eos_index)
        finished = finished | (best == eos_index)
        return (out_tok, state, finished, length, score), out_tok

    init = (jnp.full((B,), bos_index, jnp.int32), initial_state,
            jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.float32))
    (_, _, _, lengths, scores), tokens = jax.lax.scan(
        body, init, None, length=max_steps)
    return jnp.swapaxes(tokens, 0, 1), lengths, scores


def s2s_beam_search(step_fn, initial_state, batch_size, bos_index,
                    eos_index, max_steps, beam_size=4, min_steps=0,
                    length_normalization=True, eos_threshold=1.5,
                    lm_step_fn=None, lm_weight=0.0,
                    lm_initial_state=None):
    """Batched fixed-K AED beam search as one scan.

    ``initial_state`` (and ``lm_initial_state``) must hold B*K streams
    with the stream axis at -2 in every leaf (like the scan-LSTM).

    Returns (tokens (B, K, max_steps), lengths (B, K), scores (B, K))
    ranked best-first (length-normalized when enabled); eos is excluded
    from the returned tokens/lengths.
    """
    B, K = batch_size, beam_size
    use_lm = lm_step_fn is not None and lm_weight > 0

    def flat(x):
        return x.reshape((B * K,) + x.shape[2:])

    def unflat(x):
        return x.reshape((B, K) + x.shape[1:])

    def gather_streams(tree, src):
        flat_src = (src + jnp.arange(B)[:, None] * K).reshape(-1)

        def gather_leaf(leaf):
            moved = jnp.moveaxis(leaf, -2, 0)
            return jnp.moveaxis(moved[flat_src], 0, -2)

        return jax.tree.map(gather_leaf, tree)

    carry = {
        "tok": jnp.full((B, K), bos_index, jnp.int32),
        "tokens": jnp.full((B, K, max_steps), eos_index, jnp.int32),
        "lengths": jnp.zeros((B, K), jnp.int32),
        "scores": jnp.full((B, K), NEG).at[:, 0].set(0.0),
        "finished": jnp.zeros((B, K), bool),
        "state": initial_state,
        "lm_state": lm_initial_state if use_lm else jnp.zeros(()),
    }

    def body(carry, step_idx):
        log_probs, state = step_fn(flat(carry["tok"]), carry["state"])
        log_probs = unflat(log_probs)                     # (B, K, V)
        V = log_probs.shape[-1]
        if use_lm:
            lm_lp, lm_state = lm_step_fn(flat(carry["tok"]),
                                         carry["lm_state"])
            total_lp = log_probs + lm_weight * unflat(lm_lp)
        else:
            lm_state = carry["lm_state"]
            total_lp = log_probs

        # eos gating: before min_steps eos is masked; afterwards eos is
        # eligible only when eos_logp > eos_threshold * max_logp — the
        # reference _check_eos_threshold rule (seq2seq.py: log-probs are
        # negative, so 1.5x the max is a LOWER bar)
        non_eos = total_lp.at[..., eos_index].set(NEG)
        best_all = jnp.max(log_probs, axis=-1)
        eos_ok = (log_probs[..., eos_index]
                  > eos_threshold * best_all) & (step_idx >= min_steps)
        eos_col = jnp.where(eos_ok, total_lp[..., eos_index], NEG)
        gated = non_eos.at[..., eos_index].set(eos_col)

        # finished hypotheses: only a self-loop on eos with no cost
        frozen_row = jnp.full((V,), NEG).at[eos_index].set(0.0)
        gated = jnp.where(carry["finished"][..., None], frozen_row,
                          gated)

        cand = carry["scores"][..., None] + gated         # (B, K, V)
        top_scores, top_idx = jax.lax.top_k(cand.reshape(B, K * V), K)
        src = top_idx // V
        new_tok = (top_idx % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(carry["tokens"], src[..., None],
                                     axis=1)
        lengths = jnp.take_along_axis(carry["lengths"], src, axis=1)
        finished = jnp.take_along_axis(carry["finished"], src, axis=1)
        state = gather_streams(state, src)
        lm_state = gather_streams(lm_state, src) if use_lm else lm_state

        emit = ~finished & (new_tok != eos_index)
        at_pos = (jnp.arange(max_steps)[None, None, :]
                  == lengths[..., None])
        tokens = jnp.where(at_pos & emit[..., None], new_tok[..., None],
                           tokens)
        lengths = lengths + emit.astype(jnp.int32)
        finished = finished | (new_tok == eos_index)

        new_carry = {"tok": new_tok, "tokens": tokens,
                     "lengths": lengths, "scores": top_scores,
                     "finished": finished, "state": state,
                     "lm_state": lm_state}
        return new_carry, None

    carry, _ = jax.lax.scan(body, carry, jnp.arange(max_steps))

    scores = carry["scores"]
    if length_normalization:
        scores = scores / jnp.maximum(carry["lengths"] + 1, 1)
    order = jnp.argsort(-scores, axis=1)
    tokens = jnp.take_along_axis(carry["tokens"], order[..., None],
                                 axis=1)
    lengths = jnp.take_along_axis(carry["lengths"], order, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    return tokens, lengths, scores


class S2SGreedySearcher:
    """Callable wrapper (reference S2SGreedySearcher interface):
    ``__call__(enc_out, rel_lens)`` -> (hyps, scores). The model
    provides ``make_step_fn(enc_out, rel_lens) -> (step_fn, state0)``."""

    def __init__(self, make_step_fn, bos_index, eos_index,
                 max_decode_ratio=1.0):
        self.make_step_fn = make_step_fn
        self.bos = bos_index
        self.eos = eos_index
        self.max_decode_ratio = max_decode_ratio

    def __call__(self, enc_out, rel_lens=None):
        B, T = enc_out.shape[0], enc_out.shape[1]
        step_fn, state0 = self.make_step_fn(enc_out, rel_lens)
        max_steps = max(int(T * self.max_decode_ratio), 1)
        tokens, lengths, scores = s2s_greedy_search(
            step_fn, state0, B, self.bos, self.eos, max_steps)
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        hyps = [tokens[b, : lengths[b]].tolist() for b in range(B)]
        return hyps, np.asarray(scores).tolist()


class S2SBeamSearcher:
    """Callable wrapper (reference S2SBeamSearcher interface). The model
    provides ``make_step_fn(enc_out, rel_lens, n_streams) ->
    (step_fn, state0)`` with B*K streams."""

    def __init__(self, make_step_fn, bos_index, eos_index, beam_size=4,
                 min_decode_ratio=0.0, max_decode_ratio=1.0,
                 length_normalization=True, eos_threshold=1.5,
                 lm_step_fn=None, lm_weight=0.0,
                 lm_initial_state_fn=None, nbest=1):
        self.make_step_fn = make_step_fn
        self.bos = bos_index
        self.eos = eos_index
        self.beam_size = beam_size
        self.min_decode_ratio = min_decode_ratio
        self.max_decode_ratio = max_decode_ratio
        self.length_normalization = length_normalization
        self.eos_threshold = eos_threshold
        self.lm_step_fn = lm_step_fn
        self.lm_weight = lm_weight
        self.lm_initial_state_fn = lm_initial_state_fn
        self.nbest = nbest

    def __call__(self, enc_out, rel_lens=None):
        B, T = enc_out.shape[0], enc_out.shape[1]
        step_fn, state0 = self.make_step_fn(enc_out, rel_lens,
                                            B * self.beam_size)
        lm_state0 = None
        if self.lm_step_fn is not None and self.lm_weight > 0:
            lm_state0 = self.lm_initial_state_fn(B * self.beam_size)
        tokens, lengths, scores = s2s_beam_search(
            step_fn, state0, B, self.bos, self.eos,
            max_steps=max(int(T * self.max_decode_ratio), 1),
            beam_size=self.beam_size,
            min_steps=int(T * self.min_decode_ratio),
            length_normalization=self.length_normalization,
            eos_threshold=self.eos_threshold,
            lm_step_fn=self.lm_step_fn, lm_weight=self.lm_weight,
            lm_initial_state=lm_state0)
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        hyps = [tokens[b, 0, : lengths[b, 0]].tolist() for b in range(B)]
        nbest_hyps = [[tokens[b, k, : lengths[b, k]].tolist()
                       for k in range(min(self.nbest, self.beam_size))]
                      for b in range(B)]
        return hyps, np.asarray(scores)[:, 0].tolist(), nbest_hyps
