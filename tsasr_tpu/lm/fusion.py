"""Jit-safe shallow fusion with a backoff n-gram LM.

The host-side :class:`tsasr_tpu.lm.ngram.BackoffNgramLM` is dict-based
and cannot run inside a jitted beam. For the small token vocabularies
the beams operate over (char/BPE), the whole model densifies exactly:
precompute ``table[context_index, token] -> log P(token | context)`` for
every possible (order-1)-token context, and the fused step becomes a
single gather. This gives the CTC / seq2seq / transducer beams the same
``lm_step_fn(tokens (N,), state) -> (log_probs (N, V), state)`` contract
as the RNN-LM (``models/lm.py:make_lm_step_fn``), with state = the
context token ids (sentinel-padded before the first real token).

Reference wiring equivalent: ``decoders/transducer.py:311-314,386-409``
(lm_modules there are torch RNNs; count-based LMs in the reference are
query-only, ``lm/ngram.py``).
"""

import math

import numpy as np

import jax.numpy as jnp

LOG10 = math.log(10.0)
FLOOR_LOG10 = -99.0  # conventional ARPA "effectively impossible"


def dense_ngram_table(lm, id2token, bos_token="<s>", bos_id=None):
    """Densify a :class:`BackoffNgramLM` over a token-id vocabulary.

    Builds ``table[(V+1)^(order-1), V]`` of NATURAL-log probabilities
    (matching the RNN-LM's log-softmax convention); context position
    value ``V`` is the sentinel meaning "before sentence start"
    (mapped to ``bos_token`` for the query). ``bos_id`` additionally
    maps that in-vocab id (the blank, which the recipe uses as BOS —
    ``make_text_pipeline``'s ``[blank]+tokens``) to the sentinel, so
    beams that seed the LM with the blank token get start-of-sentence
    statistics instead of an unseen-token backoff.
    """
    V = len(id2token)
    S = V + 1
    ctx_len = lm.top_order - 1
    n_ctx = S ** ctx_len
    table = np.empty((n_ctx, V), np.float32)

    def tok(i):
        return bos_token if i == V or i == bos_id else id2token[i]

    for idx in range(n_ctx):
        ids = [(idx // (S ** j)) % S for j in range(ctx_len)]
        # column 0 = oldest, column ctx_len-1 = most recent; repeated
        # leading sentinels resolve correctly through backoff (the
        # ("<s>", "<s>") context is unseen, backs off to ("<s>",))
        ctx = tuple(tok(i) for i in ids)
        for t in range(V):
            lp = lm.logprob(id2token[t], ctx)
            if lp == float("-inf"):
                lp = FLOOR_LOG10
            table[idx, t] = lp * LOG10
    return table


def make_ngram_lm_step_fn(lm, id2token, bos_token="<s>", bos_id=None):
    """-> ``(lm_step_fn, lm_initial_state_fn)`` for beam shallow fusion.

    ``lm_step_fn`` accepts scalar or (N,) token ids; ``state=None``
    means the sentinel (sentence-start) context. Drop-in replacement for
    the RNN-LM step fn in ``TransducerBeamSearcher`` /
    ``BatchedBeamSearcher`` / ``s2s_beam_search`` /
    ``CTCPrefixScorer``-style decoders.
    """
    V = len(id2token)
    S = V + 1
    ctx_len = lm.top_order - 1
    table = jnp.asarray(dense_ngram_table(lm, id2token, bos_token,
                                          bos_id))
    powers = jnp.asarray([S ** j for j in range(ctx_len)], jnp.int32)

    def initial_state_fn(n):
        return jnp.full((n, ctx_len), V, jnp.int32)

    def lm_step_fn(tokens, state):
        arr = jnp.asarray(tokens, jnp.int32)
        scalar = arr.ndim == 0
        batch = arr[None] if scalar else arr
        if state is None:
            state = initial_state_fn(batch.shape[0])
        if ctx_len > 0:
            state = jnp.concatenate([state[:, 1:], batch[:, None]],
                                    axis=1)
            idx = jnp.sum(state * powers[None, :], axis=-1)
        else:
            idx = jnp.zeros((batch.shape[0],), jnp.int32)
        lp = table[idx]
        return (lp[0] if scalar else lp), state

    return lm_step_fn, initial_state_fn
