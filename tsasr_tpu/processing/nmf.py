"""NMF-based source separation on magnitude spectra.

Re-implementation of the reference ``processing/NMF.py:11-189``:
given per-source NMF template (dictionary) matrices, decompose mixture
magnitude spectra into per-source activations by multiplicative
updates, reconstruct per-source spectra, and Wiener-filter back to
waveforms. Adds :func:`train_nmf_templates` (multiplicative-update NMF
training) — the reference trains its W matrices in a recipe, not in the
module.
"""

import numpy as np

import jax
import jax.numpy as jnp


def spectral_phase(stft_complex):
    """Phase of a complex spectrum (reference ``spectral_phase``)."""
    return jnp.angle(stft_complex)


def train_nmf_templates(mag, K, n_iter=200, seed=0, eps=1e-20):
    """Multiplicative-update NMF: mag (F, N) >= 0 -> (W (F, K),
    H (K, N)) minimizing KL divergence."""
    rng = np.random.default_rng(seed)
    mag = jnp.asarray(mag)
    F, N = mag.shape
    W = jnp.asarray(rng.random((F, K)) + 0.1)
    H = jnp.asarray(rng.random((K, N)) + 0.1)

    def body(carry, _):
        W, H = carry
        V = mag / (W @ H + eps)
        H = H * (W.T @ V) / jnp.maximum(
            jnp.sum(W, axis=0)[:, None], eps)
        V = mag / (W @ H + eps)
        W = W * (V @ H.T) / jnp.maximum(
            jnp.sum(H, axis=1)[None, :], eps)
        return (W, H), None

    (W, H), _ = jax.lax.scan(body, (W, H), None, length=n_iter)
    return W, H


def nmf_separate_spectra(Whats, Xmix, n_iter=1000, seed=0, eps=1e-20):
    """Separate mixtures with fixed per-source templates.

    Whats : [W1 (F, K1), W2 (F, K2)] trained template matrices.
    Xmix : (B, T, F) mixture magnitude spectra.
    Returns (X1hat, X2hat), each (B, F, T) — the reference's output
    layout (``NMF.py:31-100``).
    """
    W1, W2 = (jnp.asarray(w) for w in Whats)
    B, T, F = Xmix.shape
    X = jnp.swapaxes(jnp.asarray(Xmix), 1, 2)       # (B, F, T)
    X = jnp.concatenate([X[b] for b in range(B)], axis=1)  # (F, B*T)
    n = X.shape[1]

    g = jnp.sum(X, axis=0) + eps
    z = X / g

    w = jnp.concatenate([W1, W2], axis=1)
    # the activation updates keep each h column summing to 1, so w's
    # columns must sum to 1 for w @ h to match the normalized mixture z
    w = w / (jnp.sum(w, axis=0, keepdims=True) + eps)
    K = w.shape[1]
    K1 = W1.shape[1]
    rng = np.random.default_rng(seed)
    h0 = jnp.asarray(0.1 * rng.random((K, n)))
    h0 = h0 / (jnp.sum(h0, axis=0) + eps)

    def body(h, _):
        v = z / (w @ h + eps)
        nh = h * (w.T @ v)
        return nh / (jnp.sum(nh, axis=0) + eps), None

    h, _ = jax.lax.scan(body, h0, None, length=n_iter)
    h = h * g
    X1 = w[:, :K1] @ h[:K1]                          # (F, B*T)
    X2 = w[:, K1:] @ h[K1:]
    X1 = jnp.stack(jnp.split(X1, B, axis=1))         # (B, F, T)
    X2 = jnp.stack(jnp.split(X2, B, axis=1))
    return X1, X2


def reconstruct_results(X1hat, X2hat, X_stft_complex, sample_rate,
                        istft_fn):
    """Wiener-filter the mixture's complex spectrum with the separated
    magnitudes and invert to waveforms (reference
    ``reconstruct_results``, :102-189).

    X1hat/X2hat (B, F, T); X_stft_complex (B, T, F) complex mixtures.
    Returns (wavs1, wavs2) lists of 1-D arrays.
    """
    eps = 1e-12
    mix_mag = jnp.abs(X_stft_complex)                 # (B, T, F)
    m1 = jnp.swapaxes(X1hat, 1, 2)
    m2 = jnp.swapaxes(X2hat, 1, 2)
    total = m1 + m2 + eps
    mask1 = m1 / total
    mask2 = m2 / total
    spec1 = mask1 * mix_mag * jnp.exp(
        1j * jnp.angle(X_stft_complex))
    spec2 = mask2 * mix_mag * jnp.exp(
        1j * jnp.angle(X_stft_complex))
    wavs1 = [istft_fn(spec1[b][None])[0] for b in
             range(spec1.shape[0])]
    wavs2 = [istft_fn(spec2[b][None])[0] for b in
             range(spec2.shape[0])]
    return wavs1, wavs2
