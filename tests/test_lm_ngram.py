"""Backoff n-gram LM: counting, estimation, ARPA round-trip, query
semantics, perplexity, and jit-safe dense fusion.

Value pins follow the reference doctests (``lm/arpa.py:26-58``,
``lm/ngram.py:55-66``, ``lm/counting.py``) plus hand-computed absolute
discounting values.
"""

import io
import math

import numpy as np
import pytest

from tsasr_tpu.lm import (
    BackoffNgramLM,
    count_ngrams,
    make_ngram_lm_step_fn,
    ngram_evaluation_details,
    ngram_perplexity,
    ngrams,
    ngrams_for_evaluation,
    pad_ends,
    read_arpa,
    train_backoff_ngram,
    write_arpa,
)

ARPA_TEXT = """Anything can be here

\\data\\
ngram 1=2
ngram 2=3

\\1-grams:
-0.6931 a
-0.6931 b 0.

\\2-grams:
-0.6931 a a
-0.6931 a b
-0.6931 b a

\\end\\
"""


class TestCounting:
    def test_pad_ends(self):
        assert pad_ends(["Speech", "Brain"]) == \
            ["<s>", "Speech", "Brain", "</s>"]
        assert pad_ends(["x"], pad_left=False) == ["x", "</s>"]

    def test_ngrams(self):
        assert ngrams("Brain", 3) == [
            ("B", "r", "a"), ("r", "a", "i"), ("a", "i", "n")]
        assert ngrams("ab", 3) == []
        with pytest.raises(ValueError):
            ngrams("ab", 0)

    def test_ngrams_for_evaluation(self):
        # reference doctest (lm/counting.py:137-144)
        got = list(ngrams_for_evaluation("Brain", 3, predict_first=True))
        assert got == [("B", ()), ("r", ("B",)), ("a", ("B", "r")),
                       ("i", ("r", "a")), ("n", ("a", "i"))]
        got = list(ngrams_for_evaluation("Brain", 2))
        assert got[0] == ("r", ("B",))

    def test_count_ngrams(self):
        counts = count_ngrams([["a", "b"], ["a"]], order=2)
        assert counts[1][("a",)] == 2
        assert counts[2][("<s>", "a")] == 2
        assert counts[2][("a", "b")] == 1
        assert counts[2][("b", "</s>")] == 1


class TestBackoffQuery:
    def test_reference_doctest_values(self):
        # lm/ngram.py:55-66
        ngrams_d = {1: {(): {"a": -0.6931, "b": -0.6931}},
                    2: {("a",): {"a": -0.6931, "b": -0.6931},
                        ("b",): {"a": -0.6931}}}
        backoffs = {1: {("b",): 0.0}}
        lm = BackoffNgramLM(ngrams_d, backoffs)
        assert round(math.exp(lm.logprob("a", ("b",))), 1) == 0.5
        # backed-off: P(b|b) = backoff(b) * P(b) = 1 * 0.5
        assert round(math.exp(lm.logprob("b", ("b",))), 1) == 0.5

    def test_longer_context_truncated(self):
        lm = BackoffNgramLM({1: {(): {"a": -1.0}}}, {1: {}})
        assert lm.logprob("a", ("x", "y", "z")) == -1.0
        assert lm.logprob("q") == float("-inf")

    def test_bad_backoff_order_raises(self):
        with pytest.raises(ValueError):
            BackoffNgramLM({1: {}, 2: {}}, {})


class TestArpa:
    def test_read_reference_example(self):
        # pinned to the reference doctest (lm/arpa.py:26-58)
        num, ngrams_d, backoffs = read_arpa(io.StringIO(ARPA_TEXT))
        assert num == {1: 2, 2: 3}
        lm = BackoffNgramLM(ngrams_d, backoffs)
        assert lm.logprob("a", ()) == -0.6931
        assert lm.logprob("b", ("b",)) == -0.6931  # via backoff(b)=0
        assert backoffs[1][("b",)] == 0.0

    def test_roundtrip(self):
        _, ngrams_d, backoffs = read_arpa(io.StringIO(ARPA_TEXT))
        buf = io.StringIO()
        write_arpa(buf, ngrams_d, backoffs)
        buf.seek(0)
        num2, ngrams2, backoffs2 = read_arpa(buf)
        assert ngrams2 == ngrams_d
        assert {n: bo for n, bo in backoffs2.items() if bo} == \
            {n: bo for n, bo in backoffs.items() if bo}

    def test_trained_model_roundtrips(self):
        sents = [list("abab"), list("abba"), list("aab")]
        ngrams_d, backoffs = train_backoff_ngram(sents, order=3)
        buf = io.StringIO()
        write_arpa(buf, ngrams_d, backoffs)
        buf.seek(0)
        _, ngrams2, backoffs2 = read_arpa(buf)
        lm1 = BackoffNgramLM(ngrams_d, backoffs)
        lm2 = BackoffNgramLM(ngrams2, backoffs2)
        for tok in ("a", "b", "</s>"):
            for ctx in ((), ("a",), ("a", "b"), ("<s>",), ("b", "b")):
                np.testing.assert_allclose(
                    lm1.logprob(tok, ctx), lm2.logprob(tok, ctx),
                    atol=2e-6)

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            read_arpa(io.StringIO("no data here\n"))
        bad = ARPA_TEXT.replace("ngram 2=3\n", "")
        with pytest.raises(ValueError):
            read_arpa(io.StringIO(bad + "\n\\2-grams:\n"))


class TestTraining:
    def test_absolute_discounting_hand_values(self):
        """One sentence "a b", order 2, D=0.5 — hand-computed:
        unigrams: counts a=1, b=1, </s>=1 (no <s>); P=1/3 each.
        bigrams: c(<s> a)=1, c(a b)=1, c(b </s>)=1; each context total 1,
        one continuation type: P(a|<s>) = (1-0.5)/1 = 0.5."""
        ngrams_d, backoffs = train_backoff_ngram([["a", "b"]], order=2,
                                                 discount=0.5)
        lm = BackoffNgramLM(ngrams_d, backoffs)
        np.testing.assert_allclose(10 ** lm.logprob("a", ()), 1 / 3,
                                   atol=1e-9)
        np.testing.assert_allclose(10 ** lm.logprob("a", ("<s>",)), 0.5,
                                   atol=1e-9)
        # backoff(<s>) = D*types/total / (1 - P_uni(a)) = 0.5/(2/3)
        np.testing.assert_allclose(
            10 ** backoffs[1][("<s>",)], 0.5 / (2 / 3), atol=1e-9)
        # unseen continuation: P(b|<s>) = backoff(<s>) * P_uni(b)
        np.testing.assert_allclose(
            10 ** lm.logprob("b", ("<s>",)), 0.75 * (1 / 3), atol=1e-9)

    def test_probabilities_sum_to_one(self):
        """Per-context distributions (incl. backoff mass over the full
        vocab + </s>) must sum to ~1 for a trained model."""
        sents = [list(w) for w in
                 ["hello", "help", "hero", "world", "word", "would"]]
        ngrams_d, backoffs = train_backoff_ngram(sents, order=3,
                                                 discount=0.5)
        lm = BackoffNgramLM(ngrams_d, backoffs)
        vocab = sorted({c for s in sents for c in s}) + ["</s>"]
        for ctx in ((), ("h",), ("<s>",), ("h", "e"), ("w", "o")):
            total = sum(10 ** lm.logprob(t, ctx) for t in vocab)
            np.testing.assert_allclose(total, 1.0, atol=1e-6)

    def test_perplexity_improves_with_order(self):
        sents = [list(w) for w in
                 ["abcabc", "abcabd", "abcabc", "bcabca"]] * 3

        def ppl(order):
            ng, bo = train_backoff_ngram(sents, order=order, discount=0.4)
            lm = BackoffNgramLM(ng, bo)
            data = [list(ngrams_for_evaluation(pad_ends(s), order))
                    for s in sents]
            return ngram_perplexity(ngram_evaluation_details(data, lm))

        assert ppl(3) < ppl(1)

    def test_perplexity_reference_doctest(self):
        # lm/ngram.py:ngram_perplexity doctest
        import collections
        details = [collections.Counter(neglogprob=5, num_tokens=5),
                   collections.Counter(neglogprob=15, num_tokens=15)]
        assert ngram_perplexity(details) == 10.0


class TestDenseFusion:
    def make_lm(self):
        sents = [list(w) for w in ["ab", "abb", "ba", "aab"]]
        ngrams_d, backoffs = train_backoff_ngram(sents, order=3)
        return BackoffNgramLM(ngrams_d, backoffs)

    def test_dense_matches_dict_queries(self):
        lm = self.make_lm()
        id2token = ["a", "b"]
        step_fn, init_fn = make_ngram_lm_step_fn(lm, id2token)
        # feed "a" then "b"; compare each output with host queries
        state = init_fn(1)
        lp1, state = step_fn(np.asarray([0]), state)   # after "a"
        lp2, state = step_fn(np.asarray([1]), state)   # after "a b"
        ln10 = math.log(10)
        np.testing.assert_allclose(
            float(lp1[0, 1]), lm.logprob("b", ("<s>", "a")) * ln10,
            rtol=1e-5)
        np.testing.assert_allclose(
            float(lp2[0, 0]), lm.logprob("a", ("a", "b")) * ln10,
            rtol=1e-5)

    def test_none_state_and_scalar(self):
        lm = self.make_lm()
        step_fn, _ = make_ngram_lm_step_fn(lm, ["a", "b"])
        lp, state = step_fn(np.int32(0), None)
        assert lp.shape == (2,)
        assert state.shape == (1, 2)

    def test_fusion_changes_s2s_beam(self):
        """The dense n-gram plugs into the seq2seq beam as lm_step_fn
        and changes the selected hypothesis scores."""
        import jax.numpy as jnp
        from tsasr_tpu.decoding.seq2seq import s2s_beam_search

        lm = self.make_lm()
        V = 4  # 0=bos-ish, 1=eos, 2="a", 3="b"
        id2token = ["<pad>", "</s>", "a", "b"]
        step_fn, init_fn = make_ngram_lm_step_fn(lm, id2token)

        logits = np.log(np.asarray([0.25, 0.25, 0.25, 0.25], np.float32))

        def dec_step(tokens, state):
            return jnp.broadcast_to(jnp.asarray(logits),
                                    (tokens.shape[0], V)), state

        base = s2s_beam_search(dec_step, {}, 1, bos_index=0, eos_index=1,
                               max_steps=3, beam_size=2)
        fused = s2s_beam_search(dec_step, {}, 1, bos_index=0, eos_index=1,
                                max_steps=3, beam_size=2,
                                lm_step_fn=step_fn, lm_weight=0.5,
                                lm_initial_state=init_fn(2))
        assert not np.allclose(np.asarray(base[1]), np.asarray(fused[1]))

    def test_fusion_changes_ctc_prefix_beam(self):
        """n-gram fusion biases the CTC prefix beam toward LM-likely
        prefixes: with ambiguous acoustics between "ab" and "bb", an LM
        trained on "ab" flips/boosts the "ab"-style prefix."""
        from tsasr_tpu.decoding.ctc import ctc_prefix_beam_search

        sents = [list("ab")] * 10
        ngrams_d, backoffs = train_backoff_ngram(sents, order=2)
        lm = BackoffNgramLM(ngrams_d, backoffs)
        # CTC vocab: 0=blank, 1="a", 2="b"; blank doubles as BOS
        step_fn, _ = make_ngram_lm_step_fn(lm, ["<blk>", "a", "b"],
                                           bos_id=0)

        logp = np.log(np.asarray([
            [0.2, 0.41, 0.39],   # slight preference "a"
            [0.2, 0.39, 0.41],   # slight preference "b"
        ], np.float32))
        base_prefixes, base_scores = ctc_prefix_beam_search(
            logp, beam_size=4, nbest=4)
        fused_prefixes, fused_scores = ctc_prefix_beam_search(
            logp, beam_size=4, nbest=4, lm_step_fn=step_fn,
            lm_weight=2.0)
        assert base_prefixes[0] == [2]          # acoustics alone: "b"
        # with the LM, "a"-initial prefixes outrank all "b"-initial ones
        assert fused_prefixes[0][0] == 1
        assert fused_prefixes.index([1, 2]) < fused_prefixes.index([2])
        assert base_scores != fused_scores
