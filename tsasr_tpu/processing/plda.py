"""PLDA and LDA for speaker-embedding scoring.

Re-implementation of the reference's simplified PLDA (low-rank
between-class eigenvoice matrix F + full residual covariance Sigma,
EM-trained with a minimum-divergence step) and its fast two-covariance
verification scoring, plus Fisher LDA
(``vendor/speechbrain/speechbrain/processing/PLDA_LDA.py:339-1014``).

API redesign: plain numpy arrays + integer/string speaker labels instead
of the reference's StatObject/Ndx/Scores containers; ``score_matrix``
returns the full (n_enroll, n_test) log-likelihood-ratio matrix, which
is what EER/minDCF consume (``utils/metric_stats.py``).
"""

import numpy as np
from numpy import linalg


def _class_sums(embeddings, labels):
    """-> (classes, sums (C, D), counts (C,)) in first-seen order."""
    classes, inv = np.unique(np.asarray(labels), return_inverse=True)
    C = len(classes)
    D = embeddings.shape[1]
    sums = np.zeros((C, D))
    counts = np.zeros(C)
    np.add.at(sums, inv, embeddings)
    np.add.at(counts, inv, 1.0)
    return classes, sums, counts


class PLDA:
    """Simplified PLDA: x = mu + F h + eps, eps ~ N(0, Sigma).

    ``fit`` runs the reference's EM (eigendecomposition whitening per
    iteration, per-speaker posteriors over h, minimum-divergence update);
    ``score_matrix`` the reference's ``fast_PLDA_scoring`` math.
    """

    def __init__(self, rank_f=100, nb_iter=10, scaling_factor=1.0):
        self.rank_f = rank_f
        self.nb_iter = nb_iter
        self.scaling_factor = scaling_factor
        self.mean = None
        self.F = None
        self.Sigma = None

    # ------------------------------------------------------------ training
    def fit(self, embeddings, labels):
        """Train on (N, D) embeddings with per-row speaker labels."""
        X = np.asarray(embeddings, np.float64)
        N, D = X.shape
        rank = min(self.rank_f, D)

        self.mean = X.mean(axis=0)
        Xc = X - self.mean
        sigma_obs = Xc.T @ Xc / N
        self.Sigma = sigma_obs.copy()

        _, sums, counts = _class_sums(X, labels)
        sums = sums * self.scaling_factor
        counts = counts * self.scaling_factor
        C = len(counts)

        evals, evecs = linalg.eigh(sigma_obs)
        idx = np.argsort(evals)[::-1]
        self.F = evecs[:, idx[:rank]]

        for _ in range(self.nb_iter):
            # whiten the summed stats and F with the current Sigma
            evals, evecs = linalg.eigh(self.Sigma)
            order = evals.argsort()[::-1]
            evals, evecs = evals[order], evecs[:, order]
            sqr_inv_sigma = evecs @ np.diag(1.0 / np.sqrt(
                np.maximum(evals, 1e-12)))
            F_w = sqr_inv_sigma.T @ self.F
            stats_w = (sums - counts[:, None] * self.mean) @ sqr_inv_sigma

            # E-step: posterior of h per speaker
            A = F_w.T @ F_w
            e_h = np.zeros((C, rank))
            e_hh = np.zeros((C, rank, rank))
            for c in range(C):
                inv_lambda = linalg.inv(counts[c] * A + np.eye(rank))
                e_h[c] = inv_lambda @ F_w.T @ stats_w[c]
                e_hh[c] = inv_lambda + np.outer(e_h[c], e_h[c])

            # M-step (+ minimum divergence)
            R = e_hh.sum(axis=0) / C
            C_mat = e_h.T @ stats_w @ linalg.inv(sqr_inv_sigma)
            A_mat = np.einsum("ijk,i->jk", e_hh, counts)
            self.F = linalg.solve(A_mat, C_mat).T
            self.Sigma = sigma_obs - self.F @ C_mat / counts.sum()
            self.F = self.F @ linalg.cholesky(R)
        return self

    # ------------------------------------------------------------- scoring
    def score_matrix(self, enroll, test):
        """(M, D) enroll x (K, D) test -> (M, K) PLDA LLR scores
        (reference ``fast_PLDA_scoring`` math, :700-790)."""
        E = np.asarray(enroll, np.float64) - self.mean
        T = np.asarray(test, np.float64) - self.mean

        inv_sigma = linalg.inv(self.Sigma)
        I_spk = np.eye(self.F.shape[1])
        K_mat = self.F.T @ (inv_sigma * self.scaling_factor) @ self.F
        K1 = linalg.inv(K_mat + I_spk)
        K2 = linalg.inv(2 * K_mat + I_spk)
        plda_cst = linalg.slogdet(K2)[1] / 2.0 - linalg.slogdet(K1)[1]

        sigma_ac = self.F @ self.F.T
        sigma_tot = sigma_ac + self.Sigma
        sigma_tot_inv = linalg.inv(sigma_tot)
        tmp = linalg.inv(sigma_tot - sigma_ac @ sigma_tot_inv @ sigma_ac)
        phi = sigma_tot_inv - tmp
        psi = sigma_tot_inv @ sigma_ac @ tmp

        model_part = 0.5 * np.einsum("ij,ji->i", E @ phi, E.T)
        seg_part = 0.5 * np.einsum("ij,ji->i", T @ phi, T.T)
        scores = model_part[:, None] + seg_part[None, :] + plda_cst
        scores += E @ psi @ T.T
        return scores * self.scaling_factor

    def score_trials(self, enroll, test, pairs):
        """Score (i, j) trial pairs -> (len(pairs),) LLRs."""
        mat = self.score_matrix(enroll, test)
        return np.asarray([mat[i, j] for i, j in pairs])


class LDA:
    """Fisher LDA projection (reference ``get_lda_matrix_stat1``)."""

    def __init__(self):
        self.transform_mat = None

    def fit(self, embeddings, labels, reduced_dim=2):
        X = np.asarray(embeddings, np.float64)
        D = X.shape[1]
        mu = X.mean(axis=0)
        classes = np.unique(np.asarray(labels))
        class_means = np.zeros((len(classes), D))
        Sw = np.zeros((D, D))
        labels = np.asarray(labels)
        for i, c in enumerate(classes):
            Xi = X[labels == c]
            Xi_c = Xi - Xi.mean(axis=0)
            Sw += Xi_c.T @ Xi_c / Xi.shape[0]
            class_means[i] = Xi.mean(axis=0)
        Sb = (class_means - mu).T @ (class_means - mu)
        disc = (Sb @ linalg.inv(Sw)).T
        evals, evecs = linalg.eigh(disc)
        idx = evals.real.argsort()[-reduced_dim:][::-1]
        self.transform_mat = evecs.real[:, idx]
        return self

    def transform(self, embeddings):
        return np.asarray(embeddings, np.float64) @ self.transform_mat
