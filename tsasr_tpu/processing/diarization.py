"""Speaker diarization: spectral clustering over speaker embeddings.

Reference surface:
``vendor/speechbrain/speechbrain/processing/diarization.py`` (the
``Spec_Clust_unorm`` estimator — cosine similarity, p-pruning,
unnormalized Laplacian, eigengap speaker-count estimation, k-means on
spectral embeddings — plus AHC and the RTTM plumbing). Rebuilt on
numpy/JAX:

- the affinity/Laplacian/eigendecomposition run as dense linear algebra
  (MXU-friendly batched matmuls when jitted; eval-time host numpy is
  fine at typical segment counts);
- ``spectral_cluster`` auto-estimates the number of speakers by the
  largest eigengap within [min_num_spkrs, max_num_spkrs], like the
  reference (:887-975);
- ``ahc_cluster`` is average-linkage agglomerative clustering with a
  cosine-similarity stopping threshold (reference do_AHC);
- RTTM read/write + same-speaker sub-segment merging mirror the
  recipe-side plumbing (:54-337).
"""

import numpy as np


# ------------------------------------------------------------ clustering

def cosine_similarity_matrix(embs):
    """(N, E) -> (N, N) cosine similarity (reference get_sim_mat)."""
    embs = np.asarray(embs, np.float64)
    norm = np.linalg.norm(embs, axis=1, keepdims=True)
    unit = embs / np.maximum(norm, 1e-12)
    return unit @ unit.T


def p_prune(affinity, pval):
    """Zero all but the top ``pval`` fraction of entries per row
    (reference p_pruning :835-863)."""
    A = np.array(affinity, np.float64, copy=True)
    n = A.shape[0]
    n_zero = int(round(n * (1.0 - pval)))
    n_zero = min(max(n_zero, 0), n - 1)
    if n_zero == 0:
        return A
    for i in range(n):
        low = np.argsort(A[i])[:n_zero]
        A[i, low] = 0.0
    return A


def _laplacian(A):
    np.fill_diagonal(A, 0.0)
    D = np.diag(A.sum(axis=1))
    return D - A


def _eigengap_k(eig_vals, min_k, max_k):
    """Largest gap among the smallest eigenvalues (reference
    getEigenGaps + do_spec_clust k estimation)."""
    kmax = min(max_k, len(eig_vals))
    gaps = np.diff(eig_vals[:kmax])
    if len(gaps) == 0:
        return 1
    lo = max(min_k - 1, 0)
    k = int(np.argmax(gaps[lo:]) + lo + 1)
    return max(k, min_k)


def _kmeans(X, k, n_iter=100, seed=0):
    """Lloyd's k-means with k-means++ seeding (host, deterministic)."""
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    centers = [X[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(
            [np.sum((X - c) ** 2, axis=1) for c in centers], axis=0)
        total = d2.sum()
        if total <= 0:
            centers.append(X[rng.integers(n)])
            continue
        centers.append(X[rng.choice(n, p=d2 / total)])
    centers = np.stack(centers)
    labels = np.zeros(n, np.int64)
    for _ in range(n_iter):
        dists = ((X[:, None, :] - centers[None]) ** 2).sum(-1)
        new_labels = dists.argmin(1)
        if np.array_equal(new_labels, labels) and _ > 0:
            break
        labels = new_labels
        for j in range(k):
            mask = labels == j
            if mask.any():
                centers[j] = X[mask].mean(0)
    return labels


class SpectralClusterer:
    """Reference ``Spec_Clust_unorm`` equivalent."""

    def __init__(self, min_num_spkrs=2, max_num_spkrs=10):
        self.min_num_spkrs = min_num_spkrs
        self.max_num_spkrs = max_num_spkrs

    def __call__(self, embs, n_spkrs=None, pval=0.3):
        embs = np.asarray(embs)
        n = embs.shape[0]
        if n == 1:
            return np.zeros(1, np.int64)
        sim = cosine_similarity_matrix(embs)
        pruned = p_prune(sim, pval)
        sym = 0.5 * (pruned + pruned.T)
        L = _laplacian(sym)
        eig_vals, eig_vecs = np.linalg.eigh(L)
        if n_spkrs is None:
            n_spkrs = _eigengap_k(eig_vals, self.min_num_spkrs,
                                  self.max_num_spkrs)
        n_spkrs = min(n_spkrs, n)
        spec_embs = eig_vecs[:, :n_spkrs]
        return _kmeans(spec_embs, n_spkrs)


def spectral_cluster(embs, n_spkrs=None, pval=0.3, min_num_spkrs=2,
                     max_num_spkrs=10):
    """Functional front door (reference do_spec_clustering backend
    'SC')."""
    return SpectralClusterer(min_num_spkrs, max_num_spkrs)(
        embs, n_spkrs=n_spkrs, pval=pval)


def ahc_cluster(embs, n_spkrs=None, threshold=0.5):
    """Average-linkage agglomerative clustering over cosine similarity
    (reference do_AHC). Stops at ``n_spkrs`` clusters, or when the best
    merge similarity drops below ``threshold`` when n_spkrs is None."""
    embs = np.asarray(embs, np.float64)
    n = embs.shape[0]
    clusters = {i: [i] for i in range(n)}
    sim = cosine_similarity_matrix(embs)

    def linkage(a, b):
        return float(np.mean([sim[i, j] for i in clusters[a]
                              for j in clusters[b]]))

    while len(clusters) > (n_spkrs or 1):
        keys = sorted(clusters)
        best, best_pair = -np.inf, None
        for i, a in enumerate(keys):
            for b in keys[i + 1:]:
                s = linkage(a, b)
                if s > best:
                    best, best_pair = s, (a, b)
        if best_pair is None:
            break
        if n_spkrs is None and best < threshold:
            break
        a, b = best_pair
        clusters[a].extend(clusters.pop(b))
    labels = np.zeros(n, np.int64)
    for idx, (_, members) in enumerate(sorted(clusters.items())):
        for m in members:
            labels[m] = idx
    return labels


# ------------------------------------------------------------ RTTM / segs

def merge_ssegs_same_speaker(segs):
    """Merge adjacent sub-segments with the same label (reference
    :169-221). ``segs``: list of (rec_id, start, end, label)."""
    if not segs:
        return []
    out = [list(segs[0])]
    for rec_id, start, end, label in segs[1:]:
        last = out[-1]
        if label == last[3] and rec_id == last[0] and start <= last[2]:
            last[2] = max(last[2], end)
        else:
            out.append([rec_id, start, end, label])
    return [tuple(s) for s in out]


def write_rttm(segs, path):
    """Write (rec_id, start, end, label) tuples as RTTM SPEAKER lines
    (reference :301-337)."""
    with open(path, "w") as f:
        for rec_id, start, end, label in segs:
            f.write(f"SPEAKER {rec_id} 0 {start:.4f} {end - start:.4f} "
                    f"<NA> <NA> {label} <NA> <NA>\n")


def read_rttm(path):
    """RTTM -> list of (rec_id, start, end, label) (reference :54-75)."""
    segs = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "SPEAKER":
                continue
            rec_id = parts[1]
            start = float(parts[3])
            dur = float(parts[4])
            segs.append((rec_id, start, start + dur, parts[7]))
    return segs


def diarize_segments(embs, segments, rec_id="rec", n_spkrs=None,
                     pval=0.3, backend="sc"):
    """Embeddings + (start, end) windows -> merged RTTM-style segments.

    ``backend``: 'sc' spectral clustering | 'ahc'.
    """
    if backend == "sc":
        labels = spectral_cluster(embs, n_spkrs=n_spkrs, pval=pval)
    elif backend == "ahc":
        labels = ahc_cluster(embs, n_spkrs=n_spkrs)
    else:
        raise ValueError(f"unknown diarization backend {backend!r}")
    segs = [(rec_id, float(s), float(e), f"spk_{labels[i]}")
            for i, (s, e) in enumerate(segments)]
    return merge_ssegs_same_speaker(segs), labels
