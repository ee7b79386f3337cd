"""Batched on-device transducer beam search.

The reference beam search (``decoders/transducer.py:220-443``) is a
per-utterance Python A*-style loop — frame-rate host round trips and no
batching. This module is the TPU-native redesign (SURVEY.md §7 hard-part
2): a fixed-beam tensorized search where the hypothesis set is a dense
(B, K) block and pruning is masking, compiled as one ``lax.scan`` over
frames with a static inner expansion loop.

Per frame, ``max_expansions`` rounds of:
  - joint log-probs for all (B, K) hypotheses at this frame;
  - candidate set = {stay: finalize the frame with a blank} ∪
    {expand: append a non-blank, advance the prediction network};
  - top-K over all candidates; "stayed" hypotheses are frozen for the
    rest of the frame (they consumed their blank, like hypotheses moving
    from A to B in the reference).
After the loop any unfrozen hypothesis is forced to take its blank.
The reference's ``expand_beam`` pruning maps to masking expansions more
than ``expand_beam`` below the best expansion; ``state_beam`` has no
direct analogue (the fixed-K top-k plays its role); hypotheses are
length-normalized for the final ranking exactly like the reference.

This is the fast path; ``TransducerBeamSearcher`` keeps the exact
reference algorithm (``backend="exact"``) for parity checking.
"""

import jax
import jax.numpy as jnp

NEG = -1e30


def beam_search_batched(predict_step, joint_step, initial_state, enc_out,
                        rel_lengths=None, blank=0, beam_size=4,
                        max_symbols=200, max_expansions=3,
                        expand_beam=2.3, lm_step_fn=None, lm_weight=0.0,
                        lm_initial_state=None):
    """
    Arguments
    ---------
    predict_step : fn (tokens (N,), state) -> (dec_proj (N, J), state)
    joint_step : fn (enc (N, J), dec (N, J)) -> log_probs (N, V)
    initial_state : prediction-network state for N = B*K streams.
    enc_out : (B, T, J) projected encoder output.
    rel_lengths : (B,) relative lengths.
    blank : blank index.
    beam_size : K.
    max_symbols : token buffer capacity per hypothesis.
    max_expansions : non-blank expansion rounds per frame.
    expand_beam : mask expansions worse than best - expand_beam.
    lm_step_fn : optional shallow-fusion LM, fn (tokens (N,), state) ->
        (log_probs (N, V), state); non-blank expansions gain
        ``lm_weight * log p_lm(token)`` and the LM state advances with
        the emission (reference decoders/transducer.py:386-409).
    lm_weight : fusion weight (0 disables).
    lm_initial_state : LM state for N = B*K streams (required with LM).

    Returns
    -------
    tokens (B, K, max_symbols), lengths (B, K), scores (B, K) sorted by
    length-normalized score, best first.
    """
    B, T, J = enc_out.shape
    K = beam_size
    if rel_lengths is None:
        abs_len = jnp.full((B,), T, jnp.int32)
    else:
        abs_len = jnp.round(rel_lengths * T).astype(jnp.int32)

    def flat(x):                       # (B, K, ...) -> (B*K, ...)
        return x.reshape((B * K,) + x.shape[2:])

    def unflat(x):
        return x.reshape((B, K) + x.shape[1:])

    use_lm = lm_step_fn is not None and lm_weight > 0

    # initial PN forward on blank for every stream
    bos = jnp.full((B * K,), blank, jnp.int32)
    dec0, state0 = predict_step(bos, initial_state)

    carry = {
        "tokens": jnp.full((B, K, max_symbols), blank, jnp.int32),
        "lengths": jnp.zeros((B, K), jnp.int32),
        "scores": jnp.full((B, K), NEG).at[:, 0].set(0.0),
        "dec": unflat(dec0),
        "state": state0,               # leaves (..., B*K, H)
    }
    if use_lm:
        lm_logp0, lm_state0 = lm_step_fn(bos, lm_initial_state)
        carry["lm_logp"] = unflat(lm_logp0)          # (B, K, V)
        carry["lm_state"] = lm_state0

    def gather_streams(tree, src):     # src: (B, K) indices into K
        flat_src = (src + jnp.arange(B)[:, None] * K).reshape(-1)

        def gather_leaf(leaf):
            # leaves have a B*K axis at -2 (LSTM: (L, B*K, H))
            moved = jnp.moveaxis(leaf, -2, 0)
            picked = moved[flat_src]
            return jnp.moveaxis(picked, 0, -2)

        return jax.tree.map(gather_leaf, tree)

    def frame_step(carry, inputs):
        enc_t, t = inputs              # enc_t: (B, J)
        frozen = jnp.zeros((B, K), bool)
        enc_flat = jnp.repeat(enc_t, K, axis=0)          # (B*K, J)

        def expansion(ecarry, _):
            (tokens, lengths, scores, dec, state, frozen,
             lm_logp, lm_state) = ecarry
            logp = unflat(joint_step(enc_flat, flat(dec)))   # (B, K, V)
            V = logp.shape[-1]
            blank_lp = logp[..., blank]
            stay_scores = jnp.where(frozen, scores,
                                    scores + blank_lp)       # (B, K)
            expand_total = scores[..., None] + logp          # (B, K, V)
            if use_lm:
                # fusion only on non-blank expansions (blank column is
                # overwritten with NEG below anyway)
                expand_total = expand_total + lm_weight * lm_logp
            # frozen hyps and the blank column cannot expand
            expand_total = expand_total.at[..., blank].set(NEG)
            expand_total = jnp.where(frozen[..., None], NEG,
                                     expand_total)
            # full hyps cannot expand
            expand_total = jnp.where(
                (lengths >= max_symbols)[..., None], NEG, expand_total)
            # expand_beam pruning relative to the best expansion
            best_expand = jnp.max(expand_total, axis=(1, 2),
                                  keepdims=True)
            expand_total = jnp.where(
                expand_total >= best_expand - expand_beam,
                expand_total, NEG)

            cand = jnp.concatenate(
                [stay_scores, expand_total.reshape(B, K * V)], axis=1)
            top_scores, top_idx = jax.lax.top_k(cand, K)
            is_stay = top_idx < K
            src = jnp.where(is_stay, top_idx, (top_idx - K) // V)
            new_tok = jnp.where(is_stay, blank,
                                (top_idx - K) % V).astype(jnp.int32)

            tokens = jnp.take_along_axis(tokens, src[..., None], axis=1)
            lengths_g = jnp.take_along_axis(lengths, src, axis=1)
            frozen_g = jnp.take_along_axis(frozen, src, axis=1)
            dec_g = jnp.take_along_axis(dec, src[..., None], axis=1)
            state_g = gather_streams(state, src)

            # append the emitted token for expanded hyps
            emit = ~is_stay
            pos = jnp.clip(lengths_g, 0, max_symbols - 1)
            at_pos = (jnp.arange(max_symbols)[None, None, :]
                      == pos[..., None])
            tokens = jnp.where(at_pos & emit[..., None],
                               new_tok[..., None], tokens)
            lengths_new = lengths_g + emit.astype(jnp.int32)

            # advance the PN for expanded hyps
            new_dec_flat, new_state = predict_step(flat(new_tok),
                                                   state_g)
            emit_flat = flat(emit[..., None])
            dec_new = jnp.where(emit_flat, new_dec_flat, flat(dec_g))
            state_new = jax.tree.map(
                lambda new, old: jnp.where(
                    _bcast_mask(emit.reshape(-1), old), new, old),
                new_state, state_g)

            if use_lm:
                lm_logp_g = jnp.take_along_axis(lm_logp, src[..., None],
                                                axis=1)
                lm_state_g = gather_streams(lm_state, src)
                new_lm_logp, new_lm_state = lm_step_fn(flat(new_tok),
                                                       lm_state_g)
                lm_logp_new = jnp.where(emit[..., None], unflat(new_lm_logp),
                                        lm_logp_g)
                lm_state_new = jax.tree.map(
                    lambda new, old: jnp.where(
                        _bcast_mask(emit.reshape(-1), old), new, old),
                    new_lm_state, lm_state_g)
            else:
                lm_logp_new, lm_state_new = lm_logp, lm_state

            frozen_new = frozen_g | is_stay
            return (tokens, lengths_new, top_scores, unflat(dec_new),
                    state_new, frozen_new, lm_logp_new, lm_state_new), None

        ecarry = (carry["tokens"], carry["lengths"], carry["scores"],
                  carry["dec"], carry["state"], frozen,
                  carry.get("lm_logp", jnp.zeros(())),
                  carry.get("lm_state", jnp.zeros(())))
        (tokens, lengths, scores, dec, state, frozen, lm_logp,
         lm_state), _ = jax.lax.scan(
            expansion, ecarry, None, length=max_expansions)

        # force unfrozen hyps to consume their blank
        logp = unflat(joint_step(enc_flat, flat(dec)))
        scores = jnp.where(frozen, scores,
                           scores + logp[..., blank])

        # frames past the valid length change nothing
        valid = t < abs_len                                   # (B,)
        out = {}
        updates = [("tokens", tokens), ("lengths", lengths),
                   ("scores", scores), ("dec", dec)]
        if use_lm:
            updates.append(("lm_logp", lm_logp))
        for key, new in updates:
            old = carry[key]
            mask = valid.reshape((B,) + (1,) * (new.ndim - 1))
            out[key] = jnp.where(mask, new, old)
        stream_valid = jnp.repeat(valid, K)
        out["state"] = jax.tree.map(
            lambda new, old: jnp.where(
                _bcast_mask(stream_valid, old), new, old),
            state, carry["state"])
        if use_lm:
            out["lm_state"] = jax.tree.map(
                lambda new, old: jnp.where(
                    _bcast_mask(stream_valid, old), new, old),
                lm_state, carry["lm_state"])
        return out, None

    carry, _ = jax.lax.scan(
        frame_step, carry,
        (jnp.swapaxes(enc_out, 0, 1), jnp.arange(T)))

    # length-normalized ranking: score / len(prediction) with the BOS
    # counted, matching the reference's get_transducer_key
    norm = carry["scores"] / jnp.maximum(carry["lengths"] + 1, 1)
    order = jnp.argsort(-norm, axis=1)
    tokens = jnp.take_along_axis(carry["tokens"], order[..., None],
                                 axis=1)
    lengths = jnp.take_along_axis(carry["lengths"], order, axis=1)
    norm_sorted = jnp.take_along_axis(norm, order, axis=1)
    return tokens, lengths, norm_sorted


def _bcast_mask(mask_flat, leaf):
    """Broadcast a (N,) bool mask against a leaf with N at axis -2."""
    shape = [1] * leaf.ndim
    shape[-2] = mask_flat.shape[0]
    return mask_flat.reshape(shape)


class BatchedBeamSearcher:
    """Callable wrapper mirroring the searcher interface."""

    def __init__(self, model, params, blank_index=0, beam_size=4,
                 nbest=1, expand_beam=2.3, max_expansions=3,
                 max_symbols=300, lm_step_fn=None, lm_weight=0.0,
                 lm_initial_state_fn=None):
        self.model = model
        self.params = params
        self.blank = blank_index
        self.beam_size = beam_size
        self.nbest = nbest
        self.expand_beam = expand_beam
        self.max_expansions = max_expansions
        self.max_symbols = max_symbols
        self.lm_step_fn = lm_step_fn
        self.lm_weight = lm_weight
        self.lm_initial_state_fn = lm_initial_state_fn
        if lm_weight > 0 and (lm_step_fn is None
                              or lm_initial_state_fn is None):
            raise ValueError("lm_weight > 0 requires lm_step_fn and "
                             "lm_initial_state_fn")
        self._jitted = jax.jit(self._decode)

    def update_params(self, params):
        self.params = params

    def _decode(self, params, enc_out, rel_lengths):
        B = enc_out.shape[0]

        def predict_step(tokens, state):
            return self.model.apply(params, tokens, state,
                                    method=self.model.predict_step)

        def joint_step(enc, dec):
            logits = self.model.apply(
                params, enc[:, None, :], dec[:, None, :],
                method=self.model.joint_logits)[:, 0, :]
            return jax.nn.log_softmax(logits, axis=-1)

        state0 = self.model.apply(
            params, B * self.beam_size,
            method=self.model.predictor_initial_state)
        lm_state0 = None
        if self.lm_weight > 0:
            lm_state0 = self.lm_initial_state_fn(B * self.beam_size)
        return beam_search_batched(
            predict_step, joint_step, state0, enc_out, rel_lengths,
            blank=self.blank, beam_size=self.beam_size,
            max_symbols=self.max_symbols,
            max_expansions=self.max_expansions,
            expand_beam=self.expand_beam, lm_step_fn=self.lm_step_fn,
            lm_weight=self.lm_weight, lm_initial_state=lm_state0)

    def __call__(self, enc_out, rel_lengths=None):
        import numpy as np
        if rel_lengths is None:
            rel_lengths = jnp.ones((enc_out.shape[0],), jnp.float32)
        tokens, lengths, norm_scores = self._jitted(
            self.params, jnp.asarray(enc_out), jnp.asarray(rel_lengths))
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        norm_scores = np.asarray(norm_scores)
        best, nbest_all, nbest_scores = [], [], []
        for b in range(tokens.shape[0]):
            hyps = [tokens[b, k, : lengths[b, k]].tolist()
                    for k in range(min(self.nbest, tokens.shape[1]))]
            scores = norm_scores[b, : self.nbest].tolist()
            best.append(hyps[0])
            nbest_all.append(hyps)
            nbest_scores.append(scores)
        mean_score = float(np.exp(norm_scores[:, 0]).mean())
        return best, mean_score, nbest_all, nbest_scores
