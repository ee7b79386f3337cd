"""Multi-microphone processing: covariance, TDOA/DOA estimation and
beamforming.

TPU-native re-implementation of the reference
``processing/multi_mic.py:85-1222`` (Covariance, GccPhat, DelaySum,
Mvdr, Gev, SrpPhat, Music). Redesign: the reference threads torch.stft's
real-view tensors ``(..., 2, M)`` and vectorized upper-triangular
covariance; here everything is complex64 jnp with full Hermitian
matrices — XLA handles complex natively and the code stays readable.

Conventions: ``Xs`` are complex STFTs (B, T, F, M) with ``n_fft`` even,
F = n_fft//2 + 1; TDOAs are in samples (mic 0 = reference).
"""

import jax
import jax.numpy as jnp


def covariance(Xs, average=True):
    """Spatial covariance (B, T, F, M, M) (or time-averaged
    (B, 1, F, M, M)); Hermitian, X X^H per TF bin."""
    cov = jnp.einsum("btfm,btfn->btfmn", Xs, jnp.conj(Xs))
    if average:
        cov = jnp.mean(cov, axis=1, keepdims=True)
    return cov


def gcc_phat(cov, n_fft, tdoa_max=None, eps=1e-20):
    """GCC-PHAT time-difference-of-arrival per mic pair.

    cov : (B, T', F, M, M) covariance (any T', e.g. averaged).
    Returns tdoas (B, T', M) in samples relative to mic 0
    (reference ``GccPhat``: phase transform, inverse FFT, argmax in the
    +/- tdoa_max window, parabolic interpolation).
    """
    B, Tp, F, M, _ = cov.shape
    xx = cov[..., :, 0]                              # (B,T',F,M) pair m-0
    xx = xx / jnp.maximum(jnp.abs(xx), eps)          # PHAT
    full = jnp.concatenate(
        [xx, jnp.conj(jnp.flip(xx[:, :, 1:-1], axis=2))], axis=2)
    cc = jnp.real(jnp.fft.ifft(full, axis=2))        # (B,T',n_fft,M)
    n = cc.shape[2]
    if tdoa_max is None:
        tdoa_max = n // 2
    tdoa_max = int(min(tdoa_max, n // 2))
    lags = jnp.concatenate([jnp.arange(0, tdoa_max),
                            jnp.arange(n - tdoa_max, n)])
    windowed = cc[:, :, lags, :]                     # (B,T',2W,M)
    idx = jnp.argmax(windowed, axis=2)
    lag = jnp.where(idx < tdoa_max, idx, idx - 2 * tdoa_max)

    # parabolic interpolation around the peak (reference's quadratic fit)
    def frac(c, i):
        n_ = c.shape[0]
        ym1 = c[(i - 1) % n_]
        y0 = c[i % n_]
        yp1 = c[(i + 1) % n_]
        denom = ym1 - 2 * y0 + yp1
        return jnp.where(jnp.abs(denom) > eps,
                         0.5 * (ym1 - yp1) / jnp.where(
                             jnp.abs(denom) > eps, denom, 1.0), 0.0)

    raw_idx = jnp.where(lag >= 0, lag, lag + n)
    delta = jax.vmap(jax.vmap(jax.vmap(frac, in_axes=(-1, -1),
                                       out_axes=-1),
                              in_axes=(0, 0)), in_axes=(0, 0))(
        cc, raw_idx)
    return lag.astype(jnp.float32) + delta


def steering_vector(tdoas, F, n_fft):
    """TDOAs (…, M) in samples -> steering (…, F, M) complex."""
    freqs = jnp.arange(F) / n_fft                     # cycles/sample
    phase = -2j * jnp.pi * freqs[..., :, None] * \
        tdoas[..., None, :].astype(jnp.complex64)
    return jnp.exp(phase)


def delay_sum(Xs, tdoas, n_fft):
    """Delay-and-sum beamforming: align each channel to mic 0 and
    average -> (B, T, F) (reference ``DelaySum``)."""
    B, T, F, M = Xs.shape
    A = steering_vector(tdoas.reshape(B, 1, -1)[:, 0], F, n_fft)
    # conj(A) undoes the propagation delay
    return jnp.einsum("btfm,bfm->btf", Xs, jnp.conj(A)) / M


def mvdr(Xs, nn_cov, tdoas, n_fft, eps=1e-8):
    """MVDR beamforming: w = Rnn^-1 d / (d^H Rnn^-1 d)
    (reference ``Mvdr``). ``nn_cov`` (B, 1, F, M, M) noise covariance."""
    B, T, F, M = Xs.shape
    A = steering_vector(tdoas.reshape(B, -1)[:, :M], F, n_fft)  # (B,F,M)
    R = nn_cov[:, 0] + eps * jnp.eye(M)[None, None]
    Rinv_d = jnp.linalg.solve(R, A[..., None])[..., 0]          # (B,F,M)
    denom = jnp.einsum("bfm,bfm->bf", jnp.conj(A), Rinv_d)
    w = Rinv_d / (denom[..., None] + eps)
    return jnp.einsum("btfm,bfm->btf", Xs, jnp.conj(w))


def gev(Xs, ss_cov, nn_cov, eps=1e-8):
    """GEV (max-SNR) beamforming: leading generalized eigenvector of
    (Rss, Rnn) per frequency (reference ``Gev``)."""
    B, T, F, M = Xs.shape
    Rss = ss_cov[:, 0]
    Rnn = nn_cov[:, 0] + eps * jnp.eye(M)[None, None]
    # solve Rnn^-1 Rss v = lambda v (not Hermitian -> use eig via
    # whitening: L^-1 Rss L^-H with L = chol(Rnn))
    L = jnp.linalg.cholesky(Rnn)
    Linv = jnp.linalg.inv(L)
    Mw = Linv @ Rss @ jnp.conj(jnp.swapaxes(Linv, -1, -2))
    evals, evecs = jnp.linalg.eigh(Mw)
    v = evecs[..., -1]                                 # top eigvec
    w = jnp.einsum("bfmn,bfn->bfm",
                   jnp.conj(jnp.swapaxes(Linv, -1, -2)), v)
    # Blind analytic normalization is omitted; scale to unit norm
    w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + eps)
    return jnp.einsum("btfm,bfm->btf", Xs, jnp.conj(w))


def srp_phat(cov, mics, doa_grid, sample_rate, n_fft, speed=343.0,
             eps=1e-20):
    """Steered-response-power PHAT direction of arrival.

    cov : (B, 1, F, M, M); mics (M, 3) positions in meters;
    doa_grid (D, 3) unit direction candidates.
    Returns (B, D) SRP power and (B, 3) the best direction
    (reference ``SrpPhat``).
    """
    B, _, F, M, _ = cov.shape
    # TDOA per candidate direction and mic: tau = -(d . p_m) / c
    taus = -(doa_grid @ mics.T) / speed * sample_rate   # (D, M) samples
    A = steering_vector(taus, F, n_fft)                 # (D, F, M)
    xx = cov[:, 0]                                      # (B, F, M, M)
    xx = xx / jnp.maximum(jnp.abs(xx), eps)
    power = jnp.real(jnp.einsum("dfm,bfmn,dfn->bd", jnp.conj(A), xx, A))
    best = doa_grid[jnp.argmax(power, axis=1)]
    return power, best


def music(cov, mics, doa_grid, sample_rate, n_fft, n_sources=1,
          speed=343.0, eps=1e-8):
    """MUSIC pseudo-spectrum over candidate directions
    (reference ``Music``). Returns (B, D) spectrum and (B, 3) peak."""
    B, _, F, M, _ = cov.shape
    taus = -(doa_grid @ mics.T) / speed * sample_rate
    A = steering_vector(taus, F, n_fft)                 # (D, F, M)
    R = cov[:, 0]
    evals, evecs = jnp.linalg.eigh(R)                   # ascending
    En = evecs[..., : M - n_sources]                    # (B,F,M,K) noise
    proj = jnp.einsum("dfm,bfmk->bdfk", jnp.conj(A), En)
    denom = jnp.sum(jnp.abs(proj) ** 2, axis=-1)        # (B, D, F)
    spectrum = jnp.mean(1.0 / (denom + eps), axis=-1)   # (B, D)
    best = doa_grid[jnp.argmax(spectrum, axis=1)]
    return spectrum, best


def sphere_grid(n_points=162):
    """Fibonacci sphere of candidate unit directions (D, 3) (the
    reference ships a precomputed mesh; same purpose)."""
    import numpy as np
    i = np.arange(n_points) + 0.5
    phi = np.arccos(1 - 2 * i / n_points)
    golden = np.pi * (1 + 5 ** 0.5)
    theta = golden * i
    return jnp.asarray(np.stack([
        np.cos(theta) * np.sin(phi),
        np.sin(theta) * np.sin(phi),
        np.cos(phi)], axis=1), jnp.float32)
