"""Time-domain waveform augmenters (PRNG-keyed, jit-safe).

Equivalents of the reference's waveform augmentation family
(``vendor/speechbrain/speechbrain/processing/speech_augmentation.py``:
``AddNoise``:30, ``AddReverb``:295, ``AddBabble``:824, ``DropFreq``:909,
``DropChunk``:1013, ``DoClip``:1176 and the ``TimeDomainSpecAugment`` /
``EnvCorrupt`` lobes). Everything is static-shape: noise/reverb sources
are tensors the caller provides (host-side loading stays in the data
layer), randomness comes from explicit JAX keys.
"""

import jax
import jax.numpy as jnp

from tsasr_tpu.ops.masks import length_to_mask, relative_to_absolute_lengths


def _rms(x, axis=-1, keepdims=True):
    return jnp.sqrt(jnp.mean(x * x, axis=axis, keepdims=keepdims) + 1e-14)


def add_noise(wav, noise, rng, snr_low=0.0, snr_high=0.0, mix_prob=1.0):
    """Add noise at a random SNR (dB); noise (B, L) pre-aligned.

    Matches the reference's SNR formula: noise is scaled so that
    rms(noise)/rms(signal) hits the drawn SNR.
    """
    k_snr, k_prob = jax.random.split(rng)
    B = wav.shape[0]
    snr = jax.random.uniform(k_snr, (B, 1), minval=snr_low,
                             maxval=snr_high)
    noise_amp_factor = 1.0 / (10 ** (snr / 20.0))
    scaled = noise * (_rms(wav) / _rms(noise)) * noise_amp_factor
    noisy = wav + scaled
    apply = jax.random.uniform(k_prob, (B, 1)) < mix_prob
    return jnp.where(apply, noisy, wav)


def add_reverb(wav, rir, mix_prob=1.0, rng=None):
    """Convolve with room impulse responses (B, R) via FFT convolution,
    energy-normalized like the reference's reverberate helper."""
    B, L = wav.shape
    R = rir.shape[-1]
    n = L + R - 1
    spec = jnp.fft.rfft(wav, n=n) * jnp.fft.rfft(rir, n=n)
    rev = jnp.fft.irfft(spec, n=n)[:, :L]
    # align energy with the dry signal
    rev = rev * (_rms(wav) / _rms(rev))
    if rng is None or mix_prob >= 1.0:
        return rev
    apply = jax.random.uniform(rng, (B, 1)) < mix_prob
    return jnp.where(apply, rev, wav)


def add_babble(wav, rng, speaker_count=3, snr_low=0.0, snr_high=0.0):
    """Babble from rotated batch mixtures (the reference rolls the batch
    to synthesize competing speakers)."""
    babble = jnp.zeros_like(wav)
    for i in range(1, speaker_count + 1):
        babble = babble + jnp.roll(wav, i, axis=0)
    return add_noise(wav, babble, rng, snr_low, snr_high)


def drop_freq(wav, rng, drop_count_low=1, drop_count_high=2,
              drop_freq_low=1e-14, drop_freq_high=1.0, drop_width=0.05,
              filter_length=101):
    """Notch-filter random frequencies (reference ``DropFreq``).

    Builds a cascade of band-stop FIR filters (sinc-based notch) and
    convolves. ``drop_count_high`` filters are always built; beyond the
    drawn count they collapse to identity (static shapes).
    """
    k_count, k_freq = jax.random.split(rng)
    B, L = wav.shape
    count = jax.random.randint(k_count, (B, 1), drop_count_low,
                               drop_count_high + 1)
    freqs = jax.random.uniform(k_freq, (B, drop_count_high),
                               minval=drop_freq_low,
                               maxval=drop_freq_high)
    pad = filter_length // 2
    t = jnp.arange(filter_length) - pad
    window = jnp.hamming(filter_length)

    out = wav
    for i in range(drop_count_high):
        f = freqs[:, i:i + 1]                                 # (B, 1)
        # band-stop = delta - band-pass(width) around f (normalized freq)
        hlow = (f - drop_width / 2).clip(1e-8, 1.0)
        hhigh = (f + drop_width / 2).clip(1e-8, 1.0)
        sinc_hi = jnp.where(t == 0, hhigh,
                            jnp.sin(jnp.pi * hhigh * t)
                            / (jnp.pi * t + 1e-14))
        sinc_lo = jnp.where(t == 0, hlow,
                            jnp.sin(jnp.pi * hlow * t)
                            / (jnp.pi * t + 1e-14))
        bandpass = (sinc_hi - sinc_lo) * window
        notch = jnp.zeros_like(bandpass).at[:, pad].set(1.0) - bandpass
        active = (i < count).astype(wav.dtype)                # (B, 1)
        kernel = active * notch + (1 - active) * \
            jnp.zeros_like(notch).at[:, pad].set(1.0)
        # depthwise conv: each batch element its own kernel
        padded = jnp.pad(out, ((0, 0), (pad, pad)))
        out = jax.vmap(
            lambda sig, ker: jnp.convolve(sig, ker, mode="valid"))(
                padded, kernel)
    return out


def drop_chunk(wav, rel_lengths, rng, drop_length_low=100,
               drop_length_high=1000, drop_count_low=1,
               drop_count_high=3, drop_start=0, noise_factor=0.0):
    """Zero (or noise-fill) random chunks (reference ``DropChunk``)."""
    B, L = wav.shape
    lengths = relative_to_absolute_lengths(rel_lengths, L)
    k_len, k_pos, k_count, k_noise = jax.random.split(rng, 4)
    n = drop_count_high
    count = jax.random.randint(k_count, (B, 1, 1), drop_count_low,
                               drop_count_high + 1)
    chunk_len = jax.random.randint(k_len, (B, n, 1), drop_length_low,
                                   drop_length_high + 1)
    max_start = jnp.maximum(lengths[:, None, None] - chunk_len, 1)
    start = jax.random.randint(k_pos, (B, n, 1), 0, 2 ** 30) % max_start
    start = jnp.maximum(start, drop_start)
    idx = jnp.arange(L)[None, None, :]
    active = (jnp.arange(n)[None, :, None] < count)
    mask = ((idx >= start) & (idx < start + chunk_len) & active).any(
        axis=1)
    if noise_factor == 0.0:
        return jnp.where(mask, 0.0, wav)
    noise_max = 2 * _rms(wav)[:, 0:1] * noise_factor
    noise = (jax.random.uniform(k_noise, wav.shape) * 2 - 1) * noise_max
    return jnp.where(mask, noise, wav)


def do_clip(wav, rng, clip_low=0.5, clip_high=1.0):
    """Random amplitude clipping (reference ``DoClip``)."""
    B = wav.shape[0]
    level = jax.random.uniform(rng, (B, 1), minval=clip_low,
                               maxval=clip_high)
    return jnp.clip(wav, -level, level)


def time_domain_spec_augment(wav, rel_lengths, rng, perturb_prob=1.0,
                             drop_freq_prob=1.0, drop_chunk_prob=1.0,
                             speeds=(95, 100, 105), sample_rate=16000,
                             drop_freq_count_low=0,
                             drop_freq_count_high=3,
                             drop_chunk_count_low=0,
                             drop_chunk_count_high=5,
                             drop_chunk_length_low=1000,
                             drop_chunk_length_high=2000,
                             drop_chunk_noise_factor=0.0):
    """Speed perturb + drop-freq + drop-chunk cascade
    (reference ``TimeDomainSpecAugment`` lobe)."""
    from tsasr_tpu.ops.augment import speed_perturb
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    factor = jnp.float32(1.0)
    if perturb_prob > 0:
        wav, factor = speed_perturb(wav, k1, speeds=speeds,
                                    sample_rate=sample_rate)
        rel_lengths = jnp.minimum(rel_lengths * factor, 1.0)
    if drop_freq_prob > 0 and drop_freq_count_high > 0:
        wav = drop_freq(wav, k2,
                        drop_count_low=max(drop_freq_count_low, 0),
                        drop_count_high=drop_freq_count_high)
    if drop_chunk_prob > 0 and drop_chunk_count_high > 0:
        wav = drop_chunk(wav, rel_lengths, k3,
                         drop_length_low=drop_chunk_length_low,
                         drop_length_high=drop_chunk_length_high,
                         drop_count_low=max(drop_chunk_count_low, 0),
                         drop_count_high=drop_chunk_count_high,
                         noise_factor=drop_chunk_noise_factor)
    return wav, rel_lengths


def env_corrupt(wav, rel_lengths, rng, noise=None, rir=None,
                babble_count=0, noise_snr_low=0.0, noise_snr_high=15.0,
                babble_snr_low=0.0, babble_snr_high=15.0,
                reverb_prob=1.0, noise_prob=1.0, babble_prob=1.0):
    """Reverb + babble + noise cascade (reference ``EnvCorrupt`` lobe)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    if rir is not None and reverb_prob > 0:
        wav = add_reverb(wav, rir, mix_prob=reverb_prob, rng=k1)
    if babble_count > 0 and babble_prob > 0:
        wav = add_babble(wav, k2, speaker_count=babble_count,
                         snr_low=babble_snr_low,
                         snr_high=babble_snr_high)
    if noise is not None and noise_prob > 0:
        wav = add_noise(wav, noise, k3, snr_low=noise_snr_low,
                        snr_high=noise_snr_high, mix_prob=noise_prob)
    return wav
