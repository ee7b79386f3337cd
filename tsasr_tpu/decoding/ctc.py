"""CTC decoding: batched greedy (on-device) + prefix beam search.

Reference surface: ``vendor/speechbrain/speechbrain/decoders/ctc.py``
(``ctc_greedy_decode`` + ``filter_ctc_output``; the ``CTCPrefixScorer``
used for joint CTC/attention scoring) — part of the C13 framework
surface beyond the transducer recipe. The greedy path is one argmax +
vectorized collapse, jit-friendly; the prefix beam is the standard
Hannun et al. 2014 algorithm on host (an eval-time tool, vectorized
over the vocabulary per step).
"""

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1e30


def ctc_greedy_decode(log_probs, rel_lengths=None, blank_index=0):
    """Argmax + collapse-repeats + drop-blank (reference
    ``ctc_greedy_decode`` -> ``filter_ctc_output``).

    Arguments
    ---------
    log_probs : (B, T, V) per-frame log-probs (or logits; only argmax
        is used).
    rel_lengths : (B,) relative lengths.
    blank_index : CTC blank.

    Returns
    -------
    list[list[int]] decoded token sequences.
    """
    log_probs = jnp.asarray(log_probs)
    B, T, _ = log_probs.shape
    best = jnp.argmax(log_probs, axis=-1)                     # (B, T)
    if rel_lengths is None:
        abs_len = jnp.full((B,), T, jnp.int32)
    else:
        abs_len = jnp.round(jnp.asarray(rel_lengths) * T).astype(jnp.int32)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, best.dtype), best[:, :-1]], axis=1)
    valid = jnp.arange(T)[None, :] < abs_len[:, None]
    keep = (best != blank_index) & (best != prev) & valid
    best_np = np.asarray(best)
    keep_np = np.asarray(keep)
    return [[int(t) for t in best_np[b][keep_np[b]]] for b in range(B)]


def ctc_prefix_beam_search(log_probs, beam_size=8, blank_index=0,
                           rel_length=None, nbest=1,
                           lm_step_fn=None, lm_weight=0.0):
    """Prefix beam search over one utterance's (T, V) log-probs.

    Tracks per-prefix (p_blank, p_nonblank) mass; at each frame expands
    every beam prefix with every symbol, merging duplicate prefixes
    (Hannun et al. 2014). Exact for beam_size >= number of reachable
    prefixes.

    Optional shallow LM fusion: ``lm_step_fn(token, state) ->
    (log_probs (V,), state)`` (the RNN-LM / n-gram contract,
    ``models/lm.py`` / ``lm/fusion.py``); each new prefix adds
    ``lm_weight * logP(token | prefix)`` to its ranking score (the CTC
    (pb, pnb) masses stay pure so merging is unaffected).

    Returns (prefixes, scores): nbest token lists with total
    log-probabilities (LM component included when fused).
    """
    log_probs = np.asarray(log_probs)
    T, V = log_probs.shape
    if rel_length is not None:
        T = int(round(float(rel_length) * T))
    use_lm = lm_step_fn is not None and lm_weight > 0

    def logsumexp2(a, b):
        m = max(a, b)
        if m == -np.inf:
            return -np.inf
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    # prefix -> [cumulative lm score, next-token row or None, lm state,
    #            pending (parent_state, last_token) for the lazy step]
    lm_info = {(): [0.0, None, None, (None, blank_index)]}

    def lm_row(prefix):
        """logP(next | prefix) vector, computed lazily per prefix."""
        info = lm_info[prefix]
        if info[1] is None:
            parent_state, last = info[3]
            row, state = lm_step_fn(last, parent_state)
            info[1] = np.asarray(row)
            info[2] = state
        return info[1]

    def lm_extend(prefix, s):
        new_prefix = prefix + (s,)
        if new_prefix not in lm_info:
            row = lm_row(prefix)
            lm_info[new_prefix] = [
                lm_info[prefix][0] + float(row[s]), None, None,
                (lm_info[prefix][2], s)]

    def rank_score(prefix, masses):
        score = logsumexp2(*masses)
        if use_lm:
            score += lm_weight * lm_info[prefix][0]
        return score

    # prefix -> (log p ending in blank, log p ending in non-blank)
    beams = {(): (0.0, -np.inf)}
    for t in range(T):
        row = log_probs[t]
        new = {}

        def add(prefix, pb, pnb):
            old_pb, old_pnb = new.get(prefix, (-np.inf, -np.inf))
            new[prefix] = (logsumexp2(old_pb, pb),
                           logsumexp2(old_pnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            total = logsumexp2(pb, pnb)
            # extend with blank: prefix unchanged, ends in blank
            add(prefix, total + row[blank_index], -np.inf)
            last = prefix[-1] if prefix else None
            for s in range(V):
                if s == blank_index:
                    continue
                p_s = row[s]
                if s == last:
                    # repeat: same prefix only from a blank-ended path;
                    # extended prefix only from the non-blank-ended path
                    add(prefix, -np.inf, pnb + p_s)
                    add(prefix + (s,), -np.inf, pb + p_s)
                else:
                    add(prefix + (s,), -np.inf, total + p_s)
                if use_lm:
                    lm_extend(prefix, s)

        ranked = sorted(new.items(),
                        key=lambda kv: -rank_score(*kv))
        beams = dict(ranked[:beam_size])
        if use_lm:
            # keep LM bookkeeping bounded: survivors + their parents
            keep = set(beams)
            keep.update(p[:-1] for p in beams if p)
            lm_info = {p: info for p, info in lm_info.items()
                       if p in keep}

    ranked = sorted(((rank_score(prefix, masses), prefix)
                     for prefix, masses in beams.items()),
                    reverse=True)
    top = ranked[:nbest]
    return [list(p) for _, p in top], [s for s, _ in top]


def ctc_prefix_beam_search_batch(log_probs, rel_lengths=None,
                                 beam_size=8, blank_index=0, nbest=1,
                                 lm_step_fn=None, lm_weight=0.0):
    """Batch wrapper -> (list of nbest prefix lists, list of scores)."""
    log_probs = np.asarray(log_probs)
    B = log_probs.shape[0]
    rels = [None] * B if rel_lengths is None else np.asarray(rel_lengths)
    all_prefixes, all_scores = [], []
    for b in range(B):
        prefixes, scores = ctc_prefix_beam_search(
            log_probs[b], beam_size=beam_size, blank_index=blank_index,
            rel_length=None if rels[b] is None else float(rels[b]),
            nbest=nbest, lm_step_fn=lm_step_fn, lm_weight=lm_weight)
        all_prefixes.append(prefixes)
        all_scores.append(scores)
    return all_prefixes, all_scores


class CTCPrefixScorer:
    """Incremental CTC prefix log-probabilities for joint CTC/attention
    decoding (reference ``decoders/ctc.py`` CTCPrefixScorer): given the
    frame log-probs of one utterance, ``score(prefix, candidates)``
    returns log P_ctc(prefix + [c] is a prefix) for each candidate c.

    Naive exact implementation (recomputes the forward pass per call) —
    correctness-first; the seq2seq searchers call it per expansion.
    """

    def __init__(self, log_probs, blank_index=0, eos_index=None):
        self.log_probs = np.asarray(log_probs)      # (T, V)
        self.blank = blank_index
        self.eos = eos_index
        self.T, self.V = self.log_probs.shape

    def _forward(self, labels):
        """Standard CTC alpha for label seq -> (gamma_b, gamma_nb) per
        frame: prob of emitting exactly `labels` as a PREFIX by frame t."""
        T, lp = self.T, self.log_probs
        n = len(labels)
        # gamma[t] = (log p prefix complete, ending blank/nonblank)
        gb = np.full(T + 1, -np.inf)
        gnb = np.full(T + 1, -np.inf)
        if n == 0:
            gb[0] = 0.0
            for t in range(T):
                gb[t + 1] = gb[t] + lp[t, self.blank]
            return gb, gnb
        # recursive over labels using prefix-beam relations
        pb, pnb = np.full(T + 1, -np.inf), np.full(T + 1, -np.inf)
        pb[0] = 0.0
        for t in range(T):
            pb[t + 1] = pb[t] + lp[t, self.blank]
        for i, s in enumerate(labels):
            nb_new = np.full(T + 1, -np.inf)
            b_new = np.full(T + 1, -np.inf)
            prev_same = i > 0 and labels[i - 1] == s
            for t in range(T):
                # extend at frame t with symbol s
                src = pb[t] if prev_same else np.logaddexp(pb[t], pnb[t])
                emit = src + lp[t, s]
                stay = nb_new[t] + lp[t, s]          # repeat collapse
                nb_new[t + 1] = np.logaddexp(emit, stay)
                b_new[t + 1] = np.logaddexp(b_new[t], nb_new[t]) \
                    + lp[t, self.blank]
            pb, pnb = b_new, nb_new
        return pb, pnb

    def score(self, prefix, candidates):
        """Prefix log-probabilities: for non-eos c,
        log P(output starts with prefix + [c]) = logsumexp_t
        Phi_t(prefix) + lp[t, c] (Graves prefix search / Watanabe hybrid
        scoring); eos gets log P(output == prefix) exactly."""
        prefix = [int(x) for x in prefix]
        pb, pnb = self._forward(prefix)
        last = prefix[-1] if prefix else None
        lp = self.log_probs
        # state after t frames, about to emit at frame t
        both = np.logaddexp(pb[:-1], pnb[:-1])          # (T,)
        out = np.full(len(candidates), -np.inf)
        for j, c in enumerate(candidates):
            c = int(c)
            if self.eos is not None and c == self.eos:
                out[j] = np.logaddexp(pb[self.T], pnb[self.T])
                continue
            if c == self.blank:
                continue
            phi = pb[:-1] if c == last else both
            vals = phi + lp[:, c]
            m = vals.max()
            if m > -np.inf:
                out[j] = m + np.log(np.exp(vals - m).sum())
        return out
