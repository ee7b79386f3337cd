"""CTC forced alignment pinned against brute-force path enumeration."""

import itertools

import numpy as np

from tsasr_tpu.alignment import ctc_forced_align, ctc_token_spans


def _collapse(path, blank=0):
    out, prev = [], None
    for p in path:
        if p != blank and p != prev:
            out.append(int(p))
        prev = p
    return out


def _brute_best_alignment(log_probs, targets, blank=0):
    T, V = log_probs.shape
    best_lp, best_path = -np.inf, None
    for path in itertools.product(range(V), repeat=T):
        if _collapse(path, blank) != list(targets):
            continue
        lp = sum(log_probs[t, s] for t, s in enumerate(path))
        if lp > best_lp:
            best_lp, best_path = lp, path
    return best_path, best_lp


class TestForcedAlign:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(0)
        for seed in range(4):
            rng = np.random.default_rng(seed)
            T, V = 6, 3
            logits = rng.normal(size=(T, V)).astype(np.float32) * 2
            lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
            targets = [1, 2] if seed % 2 else [2, 1, 2]
            ref_path, ref_lp = _brute_best_alignment(lp, targets)
            path, score = ctc_forced_align(lp, targets)
            np.testing.assert_allclose(score, ref_lp, atol=1e-5)
            assert list(path) == list(ref_path), seed

    def test_repeated_tokens_need_blank(self):
        # targets [1, 1] over 3 frames: only path is 1, blank, 1
        lp = np.log(np.full((3, 2), 0.5, np.float32))
        path, score = ctc_forced_align(lp, [1, 1])
        assert list(path) == [1, 0, 1]

    def test_token_spans(self):
        # strongly peaked: frames 0-1 -> token 1, 2 -> blank, 3-4 -> 2
        lp = np.full((5, 3), -10.0, np.float32)
        for t, s in enumerate([1, 1, 0, 2, 2]):
            lp[t, s] = 0.0
        spans, score = ctc_token_spans(lp, [1, 2])
        assert spans == [(1, 0, 2), (2, 3, 5)]

    def test_impossible_alignment_scores_neg(self):
        lp = np.log(np.full((2, 3), 1 / 3, np.float32))
        _, score = ctc_forced_align(lp, [1, 1])   # needs >= 3 frames
        assert score < -1e20
