"""PLDA / LDA tests: EM training on synthetic speaker clusters,
verification separation (EER), and an end-to-end ECAPA-embedding run.

Reference counterpart: ``processing/PLDA_LDA.py`` (StatObject ceremony
dropped; same model math).
"""

import numpy as np
import pytest

from tsasr_tpu.processing.plda import LDA, PLDA
from tsasr_tpu.utils.metric_stats import BinaryMetricStats


def EER(pos, neg):
    m = BinaryMetricStats()
    m.append(list(range(len(pos) + len(neg))),
             np.concatenate([pos, neg]),
             np.concatenate([np.ones(len(pos)), np.zeros(len(neg))]))
    out = m.summarize()
    return out["EER"], out.get("threshold", 0.0)


def synthetic_embeddings(rng, n_spk=8, per_spk=12, dim=16,
                         between=3.0, within=0.5):
    spk_means = rng.normal(size=(n_spk, dim)) * between
    X, y = [], []
    for s in range(n_spk):
        X.append(spk_means[s] + rng.normal(size=(per_spk, dim)) * within)
        y.extend([s] * per_spk)
    return np.concatenate(X), np.asarray(y), spk_means


class TestPLDA:
    def test_separates_speakers(self):
        rng = np.random.default_rng(0)
        X, y, means = synthetic_embeddings(rng)
        plda = PLDA(rank_f=8, nb_iter=5)
        plda.fit(X, y)

        # held-out trials from the same speaker distribution
        enroll = means + rng.normal(size=means.shape) * 0.5
        test = means + rng.normal(size=means.shape) * 0.5
        scores = plda.score_matrix(enroll, test)
        assert scores.shape == (8, 8)
        same = np.diag(scores)
        diff = scores[~np.eye(8, dtype=bool)]
        assert same.min() > diff.max() - 1e-9  # fully separated
        eer, _ = EER(same, diff)
        assert eer < 0.01

    def test_speaker_structure_matters(self):
        """A PLDA trained with true labels must separate far better than
        one trained with shuffled labels (no speaker structure) — the
        between/within decomposition is doing real work."""
        rng = np.random.default_rng(1)
        X, y, means = synthetic_embeddings(rng, between=1.0, within=0.8)
        enroll = means + rng.normal(size=means.shape) * 0.8
        test = means + rng.normal(size=means.shape) * 0.8

        def eer_of(plda):
            s = plda.score_matrix(enroll, test)
            return EER(np.diag(s), s[~np.eye(8, dtype=bool)])[0]

        trained = PLDA(rank_f=8, nb_iter=10).fit(X, y)
        shuffled = PLDA(rank_f=8, nb_iter=10).fit(
            X, rng.permutation(y))
        assert eer_of(trained) < eer_of(shuffled)

    def test_score_trials_pairs(self):
        rng = np.random.default_rng(2)
        X, y, means = synthetic_embeddings(rng)
        plda = PLDA(rank_f=4, nb_iter=3).fit(X, y)
        pairs = [(0, 0), (0, 1), (2, 2)]
        out = plda.score_trials(means, means, pairs)
        mat = plda.score_matrix(means, means)
        np.testing.assert_allclose(out, [mat[0, 0], mat[0, 1], mat[2, 2]])

    def test_ecapa_end_to_end(self):
        """Full loop: fbank -> ECAPA embeddings -> PLDA verification.
        Same-speaker trials must outscore different-speaker trials."""
        import jax
        import jax.numpy as jnp
        from tsasr_tpu.models.ecapa import ECAPA_TDNN, ECAPAConfig
        from tsasr_tpu.ops import Fbank, input_normalization

        rng = np.random.default_rng(3)
        sr = 16000
        model = ECAPA_TDNN(ECAPAConfig(
            input_size=80, channels=(32, 32, 32, 32, 96),
            lin_neurons=24))
        fbank = Fbank(sample_rate=sr, n_fft=512, n_mels=80,
                      win_length=32.0)

        # distinct per-speaker "voices": band-limited noise in disjoint
        # bands (strong spectral-envelope differences survive an
        # untrained embedding extractor)
        def utt(band, seed):
            r = np.random.default_rng(seed)
            noise = r.normal(size=sr).astype(np.float32)
            spec = np.fft.rfft(noise)
            keep = np.zeros_like(spec)
            lo, hi = band
            keep[lo:hi] = spec[lo:hi]
            sig = np.fft.irfft(keep, n=sr).astype(np.float32)
            return sig / (np.abs(sig).max() + 1e-6) * 0.3

        bands = [(50, 1200), (1500, 2800), (3100, 4600), (5000, 7000)]
        wavs = np.stack([utt(b, 10 * s + i)
                         for s, b in enumerate(bands)
                         for i in range(6)])
        labels = np.repeat(np.arange(4), 6)
        rel = jnp.ones((len(wavs),), jnp.float32)
        feats = input_normalization(fbank(jnp.asarray(wavs)), rel)
        params = model.init(jax.random.PRNGKey(0), feats[:2], rel[:2])
        embs = np.asarray(model.apply(params, feats, rel))[:, 0, :]

        train_idx = np.asarray([i for i in range(24) if i % 6 < 4])
        eval_idx = np.asarray([i for i in range(24) if i % 6 >= 4])
        plda = PLDA(rank_f=8, nb_iter=5).fit(embs[train_idx],
                                             labels[train_idx])
        ev = embs[eval_idx]
        ev_lab = labels[eval_idx]
        scores = plda.score_matrix(ev, ev)
        same_mask = ev_lab[:, None] == ev_lab[None, :]
        off_diag = ~np.eye(len(ev), dtype=bool)
        same = scores[same_mask & off_diag]
        diff = scores[~same_mask]
        assert same.mean() > diff.mean()
        eer, _ = EER(same, diff)
        assert eer < 0.35


class TestLDA:
    def test_projection_separates(self):
        rng = np.random.default_rng(4)
        X, y, _ = synthetic_embeddings(rng, n_spk=3, dim=10)
        lda = LDA().fit(X, y, reduced_dim=2)
        Z = lda.transform(X)
        assert Z.shape == (X.shape[0], 2)
        # class separation in the projected space: between-class
        # distance dominates within-class scatter
        cm = np.stack([Z[y == c].mean(axis=0) for c in range(3)])
        within = np.mean([Z[y == c].std(axis=0).mean()
                          for c in range(3)])
        between = np.linalg.norm(cm[0] - cm[1])
        assert between > 3 * within
