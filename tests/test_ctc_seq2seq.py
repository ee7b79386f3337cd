"""CTC + seq2seq (AED) decoder tests.

CTC is pinned against brute force: enumerate every alignment of a tiny
lattice, collapse to outputs, and compare posterior masses with the
prefix beam / prefix scorer. Seq2seq searchers are checked on synthetic
step functions with known optima (including the delayed-reward case
where greedy fails and beam must recover).
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from tsasr_tpu.decoding.ctc import (
    CTCPrefixScorer,
    ctc_greedy_decode,
    ctc_prefix_beam_search,
    ctc_prefix_beam_search_batch,
)
from tsasr_tpu.decoding.seq2seq import (
    S2SBeamSearcher,
    S2SGreedySearcher,
    s2s_beam_search,
    s2s_greedy_search,
)


def _collapse(path, blank=0):
    out, prev = [], None
    for p in path:
        if p != blank and p != prev:
            out.append(p)
        prev = p
    return tuple(out)


def _brute_force_posteriors(log_probs, blank=0):
    """Exact P(output sequence) by enumerating all alignments."""
    T, V = log_probs.shape
    post = {}
    for path in itertools.product(range(V), repeat=T):
        lp = sum(log_probs[t, s] for t, s in enumerate(path))
        key = _collapse(path, blank)
        post[key] = np.logaddexp(post.get(key, -np.inf), lp)
    return post


class TestCTCGreedy:
    def test_collapse_and_blank_removal(self):
        # argmax path: [1, 1, 0, 1, 2, 2] -> [1, 1, 2]
        V = 3
        path = [1, 1, 0, 1, 2, 2]
        lp = np.full((1, len(path), V), -5.0, np.float32)
        for t, s in enumerate(path):
            lp[0, t, s] = 0.0
        assert ctc_greedy_decode(lp) == [[1, 1, 2]]

    def test_respects_lengths(self):
        lp = np.full((1, 4, 3), -5.0, np.float32)
        lp[0, :, 1] = 0.0  # argmax always 1 -> collapses to [1]
        lp[0, 2, :] = [-5.0, -5.0, 0.0]  # a 2 at frame 2
        full = ctc_greedy_decode(lp)
        half = ctc_greedy_decode(lp, rel_lengths=np.asarray([0.5]))
        assert full == [[1, 2, 1]]
        assert half == [[1]]


class TestCTCPrefixBeam:
    def test_matches_brute_force_map(self):
        rng = np.random.default_rng(0)
        T, V = 5, 3
        logits = rng.normal(size=(T, V)).astype(np.float32) * 1.5
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        post = _brute_force_posteriors(lp)
        best_true = max(post.items(), key=lambda kv: kv[1])
        prefixes, scores = ctc_prefix_beam_search(lp, beam_size=64)
        assert tuple(prefixes[0]) == best_true[0]
        np.testing.assert_allclose(scores[0], best_true[1], atol=1e-5)

    def test_classic_greedy_suboptimal_case(self):
        # blank dominates every frame slightly, but the mass of paths
        # emitting [1] exceeds the empty output
        lp = np.log(np.asarray([
            [0.4, 0.35, 0.25],
            [0.4, 0.35, 0.25],
        ], np.float32))
        post = _brute_force_posteriors(lp)
        greedy = ctc_greedy_decode(lp[None])[0]
        prefixes, scores = ctc_prefix_beam_search(lp, beam_size=16)
        best_true = max(post.items(), key=lambda kv: kv[1])
        assert tuple(prefixes[0]) == best_true[0]
        # and this is a case where they differ
        assert greedy == [] and list(best_true[0]) == [1]

    def test_batch_wrapper(self):
        rng = np.random.default_rng(1)
        lp = rng.normal(size=(2, 4, 3)).astype(np.float32)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        prefixes, scores = ctc_prefix_beam_search_batch(lp, beam_size=32,
                                                        nbest=2)
        assert len(prefixes) == 2 and len(prefixes[0]) == 2
        assert scores[0][0] >= scores[0][1]


class TestCTCPrefixScorer:
    def test_prefix_scores_match_brute_force(self):
        rng = np.random.default_rng(2)
        T, V = 5, 3
        logits = rng.normal(size=(T, V)).astype(np.float32)
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        post = _brute_force_posteriors(lp)

        def true_prefix_mass(prefix):
            acc = -np.inf
            for seq, p in post.items():
                if seq[: len(prefix)] == tuple(prefix):
                    acc = np.logaddexp(acc, p)
            return acc

        scorer = CTCPrefixScorer(lp, blank_index=0)
        for g in ([], [1], [2], [1, 2], [1, 1]):
            cands = [1, 2]
            scores = scorer.score(g, cands)
            for c, s in zip(cands, scores):
                np.testing.assert_allclose(
                    s, true_prefix_mass(list(g) + [c]), atol=1e-5,
                    err_msg=f"prefix {g} + [{c}]")

    def test_eos_scores_complete_sequence(self):
        rng = np.random.default_rng(3)
        T, V = 4, 4  # last index = eos marker for the scorer API
        logits = rng.normal(size=(T, V - 1)).astype(np.float32)
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        post = _brute_force_posteriors(lp)
        scorer = CTCPrefixScorer(lp, blank_index=0, eos_index=3)
        for g in ([], [1], [2, 1]):
            s = scorer.score(g, [3])[0]
            np.testing.assert_allclose(
                s, post.get(tuple(g), -np.inf), atol=1e-5)


def _table_step_fn(table):
    """step_fn emitting fixed per-step log-prob rows (B*K streams);
    state counts the step (stream axis at -2)."""
    table = jnp.asarray(table)  # (S, V)

    def step_fn(tokens, state):
        idx = jnp.clip(state[..., 0].astype(jnp.int32),
                       0, table.shape[0] - 1)        # (N,)
        return table[idx], state + 1.0

    return step_fn


class TestS2SGreedy:
    def test_decodes_argmax_until_eos(self):
        # V=4, eos=3: steps prefer 1, 2, then eos
        table = np.log(np.asarray([
            [0.05, 0.8, 0.1, 0.05],
            [0.05, 0.1, 0.8, 0.05],
            [0.05, 0.1, 0.05, 0.8],
            [0.05, 0.8, 0.1, 0.05],   # after eos: ignored
        ], np.float32))
        step = _table_step_fn(table)
        tokens, lengths, scores = s2s_greedy_search(
            step, jnp.zeros((2, 1)), 2, bos_index=0, eos_index=3,
            max_steps=4)
        for b in range(2):
            assert [int(x) for x in
                    np.asarray(tokens[b, : int(lengths[b])])] == [1, 2]

    def test_wrapper(self):
        table = np.log(np.asarray([
            [0.05, 0.8, 0.1, 0.05],
            [0.05, 0.1, 0.05, 0.8],
        ], np.float32))

        def make_step_fn(enc_out, rel_lens):
            return _table_step_fn(table), jnp.zeros((enc_out.shape[0], 1))

        searcher = S2SGreedySearcher(make_step_fn, bos_index=0,
                                     eos_index=3, max_decode_ratio=1.0)
        hyps, scores = searcher(np.zeros((1, 2, 8), np.float32))
        assert hyps == [[1]]


class TestS2SBeam:
    def test_matches_greedy_on_peaked_model(self):
        table = np.log(np.asarray([
            [0.02, 0.9, 0.04, 0.04],
            [0.02, 0.04, 0.9, 0.04],
            [0.02, 0.04, 0.04, 0.9],
        ], np.float32))
        step = _table_step_fn(table)
        B, K = 1, 3
        tokens, lengths, _ = s2s_beam_search(
            step, jnp.zeros((B * K, 1)), B, bos_index=0, eos_index=3,
            max_steps=3, beam_size=K)
        assert [int(x) for x in
                np.asarray(tokens[0, 0, : int(lengths[0, 0])])] == [1, 2]

    def test_beam_recovers_delayed_evidence(self):
        """First-step token 2 looks slightly worse but leads to a
        confident continuation; greedy takes 1 (and hits a mediocre
        continuation), beam with length normalization finds [2, 1]."""
        eos = 3

        def step_fn(tokens, state):
            count = state[..., 0]
            first = jnp.log(jnp.asarray([0.02, 0.50, 0.44, 0.04]))
            # after a 1: everything mediocre, eos the best of a bad lot
            after1 = jnp.log(jnp.asarray([0.10, 0.10, 0.10, 0.70]))
            # after a 2: token 1 near-certain
            after2 = jnp.log(jnp.asarray([0.02, 0.92, 0.02, 0.04]))
            row = jnp.where(count[..., None] < 1, first[None],
                            jnp.where((tokens == 2)[..., None],
                                      after2[None], after1[None]))
            return row, state + 1.0

        B, K = 1, 3
        g_tokens, g_len, _ = s2s_greedy_search(
            step_fn, jnp.zeros((B, 1)), B, 0, eos, max_steps=3)
        greedy = [int(x) for x in np.asarray(g_tokens[0, : int(g_len[0])])]

        tokens, lengths, _ = s2s_beam_search(
            step_fn, jnp.zeros((B * K, 1)), B, 0, eos, max_steps=3,
            beam_size=K, length_normalization=True)
        beam = [int(x) for x in
                np.asarray(tokens[0, 0, : int(lengths[0, 0])])]
        assert greedy == [1]
        assert beam == [2, 1]

    def test_min_steps_blocks_early_eos(self):
        table = np.log(np.asarray([
            [0.02, 0.08, 0.04, 0.86],   # eos immediately attractive
            [0.02, 0.9, 0.04, 0.04],
            [0.02, 0.04, 0.04, 0.9],
        ], np.float32))
        step = _table_step_fn(table)
        tokens, lengths, _ = s2s_beam_search(
            step, jnp.zeros((2, 1)), 1, 0, 3, max_steps=3, beam_size=2,
            min_steps=1)
        best = [int(x) for x in
                np.asarray(tokens[0, 0, : int(lengths[0, 0])])]
        assert len(best) >= 1 and best[0] != 3

    def test_lm_fusion_flips_beam(self):
        table = np.log(np.asarray([
            [0.02, 0.50, 0.44, 0.04],
            [0.02, 0.04, 0.04, 0.90],
        ], np.float32))
        step = _table_step_fn(table)

        def lm_step(tokens, state):
            row = jnp.log(jnp.asarray([0.05, 0.05, 0.85, 0.05]))
            return jnp.broadcast_to(row, (tokens.shape[0], 4)), state

        B, K = 1, 2
        no_lm_tokens, no_lm_len, _ = s2s_beam_search(
            step, jnp.zeros((B * K, 1)), B, 0, 3, max_steps=1,
            beam_size=K)
        tokens, lengths, _ = s2s_beam_search(
            step, jnp.zeros((B * K, 1)), B, 0, 3, max_steps=1,
            beam_size=K, lm_step_fn=lm_step, lm_weight=2.0,
            lm_initial_state=jnp.zeros((B * K, 1)))
        base = [int(x) for x in
                np.asarray(no_lm_tokens[0, 0, : int(no_lm_len[0, 0])])]
        best = [int(x) for x in
                np.asarray(tokens[0, 0, : int(lengths[0, 0])])]
        assert base == [1]
        assert best == [2]

    def test_wrapper_nbest(self):
        table = np.log(np.asarray([
            [0.02, 0.58, 0.36, 0.04],
            [0.02, 0.04, 0.04, 0.90],
        ], np.float32))

        def make_step_fn(enc_out, rel_lens, n_streams):
            return _table_step_fn(table), jnp.zeros((n_streams, 1))

        searcher = S2SBeamSearcher(make_step_fn, bos_index=0, eos_index=3,
                                   beam_size=2, nbest=2)
        hyps, scores, nbest = searcher(np.zeros((1, 2, 8), np.float32))
        assert hyps == [[1]]
        assert nbest[0][1] == [2]
