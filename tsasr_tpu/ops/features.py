"""Feature extraction ops: STFT, mel filterbank, log-amplitude, normalization.

TPU-native re-implementation of the reference feature frontend:
- STFT conventions: ``processing/features.py:51-178`` (ms->samples via
  int(round(sr/1000*w)), periodic hamming window, center=True with
  constant zero padding, onesided rFFT).
- ``spectral_magnitude``: ``processing/features.py:317-348`` (power=1 =>
  |X|^2 power spectrum).
- ``Filterbank``: ``processing/features.py:351-705`` (mel-spaced triangular
  filters on a linspace(0, sr//2, n_fft//2+1) frequency axis, then
  10*log10 dB with amin=1e-10 and per-utterance top_db=80 clamping).
- ``Fbank`` pipeline: ``lobes/features.py:22-149``.
- ``InputNormalization`` (sentence mode): ``processing/features.py:933-1152``
  (masked per-utterance mean/std with torch's unbiased std, eps=1e-10).

Design notes (TPU-first):
- The DFT is computed as two real matmuls against precomputed cos/sin
  matrices (frames @ C, frames @ S). For n_fft=512 this maps straight onto
  the MXU and fuses with the downstream mel matmul; it is faster than the
  XLA FFT custom call for these sizes and keeps everything inside one
  fusable jit program. ``use_fft=True`` switches to ``jnp.fft.rfft``.
- Everything is static-shape: the number of frames is a function of the
  padded waveform length only; real lengths ride along as relative
  lengths, exactly like the reference.
"""

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tsasr_tpu.ops.masks import length_to_mask, relative_to_absolute_lengths


def _ms_to_samples(sample_rate, ms):
    """ms -> samples with the reference's rounding (features.py:122-127)."""
    return int(round((sample_rate / 1000.0) * ms))


@functools.lru_cache(maxsize=8)
def _hamming_window(win_length):
    """Periodic hamming window, matching torch.hamming_window defaults."""
    n = np.arange(win_length)
    # periodic => denominator win_length (not win_length - 1)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft):
    """Real/imag DFT matrices (n_fft, n_fft//2+1) for the onesided rFFT."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    angle = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(angle).astype(np.float32), np.sin(angle).astype(np.float32)


def num_frames(num_samples, sample_rate=16000, hop_length=10.0, center=True,
               n_fft=512):
    """Number of STFT frames produced for a padded waveform length."""
    hop = _ms_to_samples(sample_rate, hop_length)
    if center:
        return 1 + num_samples // hop
    return 1 + (num_samples - n_fft) // hop


def frame_signal(x, frame_length, hop_length, center=True, pad_value=0.0):
    """Slice a batch of waveforms (B, L) into frames (B, T, frame_length).

    center=True pads frame_length//2 zeros on both sides first (constant
    mode, the reference default ``pad_mode='constant'``).
    """
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), constant_values=pad_value)
    n = 1 + (x.shape[-1] - frame_length) // hop_length
    # Gather-free framing: as_strided is unavailable in JAX; use a reshaped
    # gather which XLA lowers to an efficient strided slice copy.
    idx = (jnp.arange(n)[:, None] * hop_length
           + jnp.arange(frame_length)[None, :])
    return x[:, idx]


def stft(x, sample_rate=16000, win_length=25.0, hop_length=10.0, n_fft=400,
         center=True, use_fft=False):
    """Onesided STFT of (B, L) waveforms -> (real, imag) (B, T, n_fft//2+1).

    Matches the reference STFT module (``processing/features.py:51-178``):
    ms-based window/hop, periodic hamming window, center zero-padding.
    When ``win_length < n_fft`` the window is zero-padded symmetrically to
    ``n_fft`` as torch.stft does.

    TPU implementation: the windowed DFT is ONE strided convolution with
    the (window ⊙ DFT basis) rows as filters — the conv's implicit im2col
    replaces the explicit framing gather (which dominated feature time),
    and the contraction runs on the MXU at full f32 (log-compression
    downstream makes bf16 matmul noise audible).
    """
    win = _ms_to_samples(sample_rate, win_length)
    hop = _ms_to_samples(sample_rate, hop_length)
    window = _hamming_window(win)
    if win < n_fft:
        left = (n_fft - win) // 2
        window = np.pad(window, (left, n_fft - win - left))
    elif win > n_fft:
        raise ValueError(f"win_length ({win}) > n_fft ({n_fft})")
    if use_fft:
        frames = frame_signal(x, n_fft, hop, center=center)
        frames = frames * jnp.asarray(window)[None, None, :]
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        return jnp.real(spec), jnp.imag(spec)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)))
    cos_f, sin_f = _windowed_dft_filters_cached(n_fft, win)
    spec = jax.lax.conv_general_dilated(
        x[:, None, :],
        jnp.asarray(np.concatenate([cos_f, sin_f], axis=0)),
        window_strides=(hop,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)       # (B, 2F, T)
    n_bins = n_fft // 2 + 1
    spec = jnp.swapaxes(spec, 1, 2)                 # (B, T, 2F)
    return spec[..., :n_bins], spec[..., n_bins:]


@functools.lru_cache(maxsize=8)
def _windowed_dft_filters_cached(n_fft, win):
    window = _hamming_window(win)
    if win < n_fft:
        left = (n_fft - win) // 2
        window = np.pad(window, (left, n_fft - win - left))
    cos_m, sin_m = _dft_matrices(n_fft)
    cos_f = (cos_m * window[:, None]).T[:, None, :]   # (F, 1, n_fft)
    sin_f = (sin_m * window[:, None]).T[:, None, :]
    return cos_f.astype(np.float32), sin_f.astype(np.float32)


def spectral_magnitude(re, im, power=1, log=False, eps=1e-14):
    """Magnitude of a complex spectrogram, ref ``features.py:317-348``.

    power=1 returns the power spectrum |X|^2 (the Fbank default).
    """
    spectr = re * re + im * im
    if power < 1:
        spectr = spectr + eps
    if power != 1:
        spectr = spectr ** power
    if log:
        return jnp.log(spectr + eps)
    return spectr


def _to_mel(hz):
    return 2595.0 * math.log10(1.0 + hz / 700.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank_matrix(n_mels=40, n_fft=400, sample_rate=16000, f_min=0.0,
                          f_max=None, filter_shape="triangular"):
    """Mel filter matrix (n_fft//2+1, n_mels), ref ``features.py:554-601``.

    Centers/bands from a linspace in mel space with n_mels+2 points; the
    frequency axis is ``linspace(0, sample_rate//2, n_fft//2+1)`` (integer
    floor division, as in the reference).
    """
    if f_max is None:
        f_max = sample_rate / 2
    n_stft = n_fft // 2 + 1
    mel = np.linspace(_to_mel(f_min), _to_mel(f_max), n_mels + 2)
    hz = 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    band = hz[1:] - hz[:-1]
    band = band[:-1]                      # (n_mels,)
    f_central = hz[1:-1]                  # (n_mels,)
    all_freqs = np.linspace(0, sample_rate // 2, n_stft)  # (n_stft,)

    slope = (all_freqs[None, :] - f_central[:, None]) / band[:, None]
    if filter_shape == "triangular":
        fbank = np.maximum(0.0, np.minimum(slope + 1.0, 1.0 - slope))
    elif filter_shape == "rectangular":
        low = f_central - band
        high = f_central + band
        fbank = ((all_freqs[None, :] >= low[:, None])
                 & (all_freqs[None, :] <= high[:, None])).astype(np.float64)
    elif filter_shape == "gaussian":
        fbank = np.exp(-0.5 * (slope * 2.0) ** 2)
    else:
        raise ValueError(f"Unknown filter_shape: {filter_shape}")
    return fbank.T.astype(np.float32)     # (n_stft, n_mels)


def amplitude_to_db(x, multiplier=10.0, amin=1e-10, ref_value=1.0,
                    top_db=80.0):
    """Linear fbanks -> dB with per-utterance top_db clamp.

    Ref ``Filterbank._amplitude_to_DB`` (``features.py:676-705``): the max
    is taken over time and frequency of each sequence.
    """
    x_db = multiplier * jnp.log10(jnp.maximum(x, amin))
    x_db = x_db - multiplier * math.log10(max(amin, ref_value))
    max_db = jnp.max(x_db, axis=(-2, -1), keepdims=True)
    return jnp.maximum(x_db, max_db - top_db)


@dataclass(frozen=True)
class FbankConfig:
    """Configuration mirroring the reference ``Fbank`` lobe keys
    (``lobes/features.py:22-149``)."""

    sample_rate: int = 16000
    n_fft: int = 400
    n_mels: int = 40
    win_length: float = 25.0
    hop_length: float = 10.0
    f_min: float = 0.0
    f_max: float = None
    filter_shape: str = "triangular"
    power: int = 1
    log_mel: bool = True
    top_db: float = 80.0
    use_fft: bool = False


class Fbank:
    """Waveform (B, L) -> log-mel features (B, T, n_mels).

    Functional equivalent of the reference ``Fbank`` lobe: STFT -> power
    spectrum -> mel filterbank matmul -> dB. The mel matmul immediately
    follows the DFT matmuls, so the full frontend is three MXU matmuls +
    elementwise ops that XLA fuses into one program.
    """

    def __init__(self, config: FbankConfig = None, **kwargs):
        if config is None:
            config = FbankConfig(**kwargs)
        self.config = config
        if config.f_max is not None and config.f_min >= config.f_max:
            raise ValueError(
                f"Require f_min ({config.f_min}) < f_max ({config.f_max})")
        self._mel = mel_filterbank_matrix(
            n_mels=config.n_mels, n_fft=config.n_fft,
            sample_rate=config.sample_rate, f_min=config.f_min,
            f_max=config.f_max, filter_shape=config.filter_shape)

    def __call__(self, wav):
        c = self.config
        re, im = stft(wav, sample_rate=c.sample_rate, win_length=c.win_length,
                      hop_length=c.hop_length, n_fft=c.n_fft,
                      use_fft=c.use_fft)
        mag = spectral_magnitude(re, im, power=c.power)
        fbanks = jnp.matmul(mag, jnp.asarray(self._mel),
                            precision=jax.lax.Precision.HIGHEST)
        if c.log_mel:
            fbanks = amplitude_to_db(fbanks, top_db=c.top_db)
        return fbanks


def istft(re, im, sample_rate=16000, win_length=25.0, hop_length=10.0,
          n_fft=400, center=True, length=None):
    """Inverse STFT with overlap-add + squared-window normalization
    (reference ``ISTFT``, ``processing/features.py:180-315``)."""
    win = _ms_to_samples(sample_rate, win_length)
    hop = _ms_to_samples(sample_rate, hop_length)
    window = _hamming_window(win)
    if win < n_fft:
        left = (n_fft - win) // 2
        window = np.pad(window, (left, n_fft - win - left))
    window = jnp.asarray(window)

    spec = re + 1j * im                                  # (B, T, F)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)       # (B, T, n_fft)
    frames = frames * window[None, None, :]
    B, T, _ = frames.shape
    out_len = n_fft + hop * (T - 1)
    sig = jnp.zeros((B, out_len))
    norm = jnp.zeros((out_len,))
    win_sq = window * window
    for t in range(T):
        sig = sig.at[:, t * hop: t * hop + n_fft].add(frames[:, t])
        norm = norm.at[t * hop: t * hop + n_fft].add(win_sq)
    sig = sig / jnp.maximum(norm, 1e-11)[None, :]
    if center:
        sig = sig[:, n_fft // 2: out_len - n_fft // 2]
    if length is not None:
        sig = sig[:, :length]
    return sig


def deltas(x, window_length=5):
    """Delta coefficients via the standard regression filter over time
    (reference ``Deltas``, ``processing/features.py:708-781``)."""
    n = (window_length - 1) // 2
    denom = n * (n + 1) * (2 * n + 1) / 3
    kernel = jnp.arange(-n, n + 1, dtype=x.dtype) / denom
    padded = jnp.pad(x, ((0, 0), (n, n), (0, 0)), mode="edge")
    # depthwise conv over time realized as a vectorized correlation
    out = jnp.zeros_like(x)
    for i, c in enumerate(np.arange(-n, n + 1) / denom):
        out = out + c * padded[:, i: i + x.shape[1], :]
    return out


def context_window(x, left_frames=5, right_frames=5):
    """Concatenate left/right context frames along features
    (reference ``ContextWindow``, ``processing/features.py:784-871``)."""
    pieces = []
    T = x.shape[1]
    padded = jnp.pad(x, ((0, 0), (left_frames, right_frames), (0, 0)))
    for offset in range(left_frames + right_frames + 1):
        pieces.append(padded[:, offset: offset + T, :])
    return jnp.concatenate(pieces, axis=-1)


@functools.lru_cache(maxsize=8)
def _dct_matrix(n_input, n_out, ortho_norm=True):
    """Type-II DCT matrix (n_input, n_out)."""
    n = np.arange(n_input, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)
    mat = np.cos(np.pi / n_input * (n[:, None] + 0.5) * k[None, :])
    if ortho_norm:
        mat[:, 0] *= 1.0 / np.sqrt(2.0)
        mat *= np.sqrt(2.0 / n_input)
    else:
        mat *= 2.0
    return mat.astype(np.float32)


def dct(x, n_out=20, ortho_norm=True):
    """DCT over the feature axis (reference ``DCT``,
    ``processing/features.py:874-930``)."""
    return jnp.matmul(x, jnp.asarray(_dct_matrix(x.shape[-1], n_out,
                                                 ortho_norm)))


class MFCC:
    """Waveform -> MFCCs: Fbank -> DCT (+ optional deltas/context),
    reference ``lobes/features.py`` MFCC lobe."""

    def __init__(self, sample_rate=16000, n_fft=400, n_mels=23,
                 n_mfcc=20, win_length=25.0, hop_length=10.0,
                 use_deltas=True, use_context=True, left_frames=5,
                 right_frames=5, f_min=0.0, f_max=None):
        self.fbank = Fbank(sample_rate=sample_rate, n_fft=n_fft,
                           n_mels=n_mels, win_length=win_length,
                           hop_length=hop_length, f_min=f_min,
                           f_max=f_max)
        self.n_mfcc = n_mfcc
        self.use_deltas = use_deltas
        self.use_context = use_context
        self.left_frames = left_frames
        self.right_frames = right_frames

    def __call__(self, wav):
        feats = dct(self.fbank(wav), n_out=self.n_mfcc)
        if self.use_deltas:
            d1 = deltas(feats)
            d2 = deltas(d1)
            feats = jnp.concatenate([feats, d1, d2], axis=-1)
        if self.use_context:
            feats = context_window(feats, self.left_frames,
                                   self.right_frames)
        return feats


def input_normalization(x, rel_lengths, mean_norm=True, std_norm=True,
                        eps=1e-10):
    """Sentence-level mean/variance normalization over valid frames.

    Vectorized equivalent of the reference ``InputNormalization`` with
    ``norm_type='sentence'`` (``processing/features.py:1007-1028``):
    per-utterance stats over ``round(rel_len * T)`` frames, per-feature
    mean, *unbiased* std (torch.std default), std clamped to >= eps.

    Unlike the reference's Python loop over the batch, this is a fully
    masked batched computation (one fused XLA kernel).
    """
    T = x.shape[1]
    counts = relative_to_absolute_lengths(rel_lengths, T)       # (B,)
    mask = length_to_mask(counts, T)[..., None]                 # (B, T, 1)
    n = jnp.maximum(counts, 1).astype(x.dtype)[:, None, None]   # (B, 1, 1)
    if mean_norm:
        mean = jnp.sum(jnp.where(mask, x, 0.0), axis=1, keepdims=True) / n
    else:
        mean = jnp.zeros_like(x[:, :1, :])
    if std_norm:
        sq = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0), axis=1,
                     keepdims=True)
        # torch.std is unbiased (ddof=1)
        std = jnp.sqrt(sq / jnp.maximum(n - 1.0, 1.0))
        std = jnp.maximum(std, eps)
    else:
        std = jnp.ones_like(mean)
    return (x - mean) / std


def pad_time_frames(x, rel_lengths, multiple):
    """Pad the frame axis of ``x`` (B, T, F) up to a multiple, rescaling
    relative lengths so downstream ``round(rel * T)`` masking still
    covers exactly the valid frames.

    TPU-first addition with no reference counterpart: XLA tiles the MXU
    in (8, 128) sublane/lane blocks, and a measured probe (see
    reports/perf_r3.md section 4) shows the production encoder is
    *faster in absolute time* when the post-subsample frame count is a
    multiple of 8 — e.g. 4 s of audio gives 401 fbank frames -> 101
    encoder frames; padding 401 -> 416 gives 104 encoder frames and a
    faster layer stack. Semantically this is identical to the padding
    any bucketed batch already carries (rel_lengths < 1): pad frames are
    zero and masked by every length-aware op.

    Returns ``(x_padded, rel_rescaled)``; a no-op when already aligned.
    """
    T = x.shape[1]
    T_new = -(-T // multiple) * multiple
    if T_new == T:
        return x, rel_lengths
    x = jnp.pad(x, ((0, 0), (0, T_new - T), (0, 0)))
    return x, rel_lengths * (T / T_new)


def pad_audio_to_frame_multiple(wav, rel_lengths, multiple,
                                sample_rate=16000, hop_length=10.0):
    """Zero-pad waveforms (B, L) so the center-STFT frame count is a
    multiple of ``multiple``, rescaling relative lengths.

    TPU-first addition with no reference counterpart: XLA tiles the MXU
    in (8, 128) sublane/lane blocks and a measured probe (see
    reports/perf_r3.md section 4) shows the production conformer stack is
    *faster in absolute time* when the post-subsample frame count is a
    multiple of 8 — e.g. 4 s of audio gives 401 fbank frames -> 101
    encoder frames; padding the audio so fbank yields 416 frames gives
    104 encoder frames and a faster layer stack.

    Padding in the *audio* domain (not the feature domain) keeps the
    semantics bit-identical to what every bucket-quantized batch already
    does (``data/batch.py pad_to_multiple``): pad frames carry the
    log-of-silence fbank value after normalization, exactly as in the
    reference's padded batches. All shapes are static under jit.
    """
    hop = _ms_to_samples(sample_rate, hop_length)
    L = wav.shape[-1]
    T = 1 + L // hop
    T_new = -(-T // multiple) * multiple
    L_new = (T_new - 1) * hop
    if L_new <= L:
        return wav, rel_lengths
    wav = jnp.pad(wav, ((0, 0), (0, L_new - L)))
    return wav, rel_lengths * (L / L_new)
