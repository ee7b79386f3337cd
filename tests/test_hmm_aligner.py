"""HMM aligner + CTC segmentation tests.

Pins: the reference HMMAligner doctest (``alignment/aligner.py:49-74``),
a brute-force path-enumeration oracle on tiny inputs, and segmentation
boundary recovery on synthetic posteriors.
"""

import itertools
import math

import numpy as np
import pytest

from tsasr_tpu.alignment.hmm import HMMAligner


def brute_force(emissions, phns, T, U):
    """Enumerate all monotone state paths (start at 0, end anywhere for
    forward / end at U-1 for viterbi) with the reference transition
    probs: log(0.5) self/advance except final-state self-loop 0."""
    def trans(u, v, last):
        if u == v:
            return 0.0 if u == last else math.log(0.5)
        if v == u + 1 and u != last:
            return math.log(0.5)
        return -np.inf

    last = U - 1
    paths = []
    for path in itertools.product(range(U), repeat=T):
        if path[0] != 0:
            continue
        ok = all(np.isfinite(trans(a, b, last))
                 for a, b in zip(path[:-1], path[1:]))
        if not ok:
            continue
        score = emissions[0, path[0]]
        for t in range(1, T):
            score += trans(path[t - 1], path[t], last) + \
                emissions[t, path[t]]
        paths.append((score, path))
    return paths


class TestHMMAligner:
    def test_reference_doctest(self):
        log_post = np.asarray([[[-1., -10., -10.],
                                [-10., -1., -10.],
                                [-10., -10., -1.]],
                               [[-1., -10., -10.],
                                [-10., -1., -10.],
                                [-10., -10., -10.]]], np.float32)
        lens = np.asarray([1.0, 0.66])
        phns = np.asarray([[0, 1, 2], [0, 1, 0]])
        phn_lens = np.asarray([1.0, 0.66])
        aligner = HMMAligner()
        fwd = aligner(log_post, lens, phns, phn_lens, "forward")
        assert fwd.shape == (2,)
        scores, alignments = aligner(log_post, lens, phns, phn_lens,
                                     "viterbi")
        assert alignments == [[0, 1, 2], [0, 1]]
        assert scores.shape == (2,)

    def test_forward_matches_brute_force(self):
        rng = np.random.default_rng(0)
        T, U, V = 5, 3, 4
        em_vocab = rng.normal(size=(1, T, V)).astype(np.float32)
        phns = np.asarray([[1, 3, 0]])
        em = em_vocab[0][:, phns[0]]
        paths = brute_force(em, phns, T, U)
        expected = np.logaddexp.reduce([s for s, _ in paths])
        aligner = HMMAligner()
        got = float(aligner(em_vocab, np.ones(1), phns, np.ones(1),
                            "forward")[0])
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_viterbi_matches_brute_force(self):
        rng = np.random.default_rng(1)
        T, U, V = 6, 3, 5
        em_vocab = rng.normal(size=(1, T, V)).astype(np.float32)
        phns = np.asarray([[2, 0, 4]])
        em = em_vocab[0][:, phns[0]]
        paths = [p for p in brute_force(em, phns, T, U)
                 if p[1][-1] == U - 1]
        best_score, best_path = max(paths)
        aligner = HMMAligner()
        scores, alignments = aligner(em_vocab, np.ones(1), phns,
                                     np.ones(1), "viterbi")
        np.testing.assert_allclose(float(scores[0]), best_score,
                                   rtol=1e-5)
        assert alignments[0] == [int(phns[0][u]) for u in best_path]

    def test_variable_lengths_batch(self):
        """Batched viterbi equals per-utterance viterbi under padding."""
        rng = np.random.default_rng(2)
        V = 6
        T1, T2 = 8, 5
        U1, U2 = 4, 2
        em1 = rng.normal(size=(T1, V)).astype(np.float32)
        em2 = rng.normal(size=(T2, V)).astype(np.float32)
        phns1 = [1, 2, 3, 4]
        phns2 = [5, 2]
        aligner = HMMAligner()

        s1, a1 = aligner(em1[None], np.ones(1), np.asarray([phns1]),
                         np.ones(1), "viterbi")
        s2, a2 = aligner(em2[None], np.ones(1), np.asarray([phns2]),
                         np.ones(1), "viterbi")

        em_b = np.zeros((2, T1, V), np.float32)
        em_b[0] = em1
        em_b[1, :T2] = em2
        phns_b = np.zeros((2, U1), np.int64)
        phns_b[0] = phns1
        phns_b[1, :U2] = phns2
        sb, ab = aligner(em_b, np.asarray([1.0, T2 / T1]), phns_b,
                         np.asarray([1.0, U2 / U1]), "viterbi")
        np.testing.assert_allclose(float(sb[0]), float(s1[0]), rtol=1e-5)
        np.testing.assert_allclose(float(sb[1]), float(s2[0]), rtol=1e-5)
        assert ab[0] == a1[0] and ab[1] == a2[0]

    def test_states_per_phoneme_roundtrip(self):
        aligner = HMMAligner(states_per_phoneme=2)
        phns = np.asarray([[3, 1]])
        expanded, new_lens = aligner.expand_phns_by_states_per_phoneme(
            phns, np.ones(1))
        assert list(np.asarray(expanded)[0]) == [6, 7, 2, 3]
        collapsed = aligner.collapse_alignments([[6, 6, 7, 2, 3, 3]])
        assert collapsed == [[3, 3, 3, 1, 1, 1]]

    def test_flat_start_and_store(self):
        aligner = HMMAligner()
        em = np.zeros((1, 6, 4), np.float32)
        phns = np.asarray([[1, 2, 3]])
        flat = aligner.get_prev_alignments(["u1"], em, np.ones(1), phns,
                                           np.ones(1))
        assert list(np.asarray(flat)[0]) == [1, 1, 2, 2, 3, 3]
        aligner.store_alignments(["u1"], [[1, 1, 1, 2, 3, 3]])
        stored = aligner.get_prev_alignments(["u1"], em, np.ones(1),
                                             phns, np.ones(1))
        assert list(np.asarray(stored)[0]) == [1, 1, 1, 2, 3, 3]

    def test_calc_accuracy(self):
        aligner = HMMAligner()
        acc = aligner.calc_accuracy(
            alignments=[[1, 1, 2, 2]], ends=[[2, 4]], phns=[[1, 2]])
        assert acc == 100.0
        acc = aligner.calc_accuracy(
            alignments=[[1, 2, 2, 2]], ends=[[2, 4]], phns=[[1, 2]])
        assert acc == 75.0


class TestCTCSegmentation:
    def make_posteriors(self, segments, T, V, blank=0):
        """Synthetic peaked CTC posteriors: token active over its span,
        blank elsewhere."""
        logits = np.full((T, V), -8.0, np.float32)
        logits[:, blank] = -0.5
        for tok, s, e in segments:
            logits[s:e, :] = -8.0
            logits[s:e, tok] = -0.1
        # normalize to log-probs
        logits = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        return logits

    def test_recovers_boundaries(self):
        from tsasr_tpu.alignment.ctc_segmentation import CTCSegmentation
        V = 6
        # two utterances: [1,2] around frames 10-20, [3] at 40-45
        log_probs = self.make_posteriors(
            [(1, 10, 14), (2, 16, 20), (3, 40, 45)], T=60, V=V)
        seg = CTCSegmentation(frame_duration=0.04)
        task = seg(log_probs, [[1, 2], [3]], texts=["AB", "C"])
        (s1, e1, c1), (s2, e2, c2) = task.segments
        assert abs(s1 - 10 * 0.04) < 0.1 and abs(e1 - 20 * 0.04) < 0.1
        assert abs(s2 - 40 * 0.04) < 0.1 and abs(e2 - 45 * 0.04) < 0.1
        assert c1 > 0.8 and c2 > 0.8
        out = str(task)
        assert "AB" in out and out.count("\n") == 1

    def test_too_short_audio_raises(self):
        from tsasr_tpu.alignment.ctc_segmentation import CTCSegmentation
        log_probs = self.make_posteriors([], T=3, V=4)
        seg = CTCSegmentation(frame_duration=0.04)
        with pytest.raises(ValueError, match="too short"):
            seg(log_probs, [[1, 2], [3, 2]])
