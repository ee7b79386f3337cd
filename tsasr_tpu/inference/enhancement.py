"""Spectral-mask speech enhancement interface.

Equivalent of the reference ``SpectralMaskEnhancement``
(``pretrained/interfaces.py:2263-2360``): a model predicts a [0, 1]
mask over log-magnitude features; enhancement multiplies the noisy
magnitude by the mask and resynthesizes with the noisy phase
(``ops/signal_processing.resynthesize``).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tsasr_tpu.ops.features import istft, stft


class SpectralMaskEnhancement:
    """Callable enhancer over any masking model.

    ``mask_fn(params, log_mag (B, T, F)) -> mask (B, T, F)`` in [0, 1].
    """

    def __init__(self, mask_fn, params, sample_rate=16000, n_fft=512,
                 win_length=32.0, hop_length=10.0):
        self.mask_fn = mask_fn
        self.params = params
        self.sample_rate = sample_rate
        self.stft_kwargs = dict(
            sample_rate=sample_rate, n_fft=n_fft,
            win_length=win_length, hop_length=hop_length)
        self._jitted = jax.jit(mask_fn)

    def compute_features(self, wavs):
        """Noisy waveforms -> ((re, im) spectrum, log-magnitude)."""
        re, im = stft(jnp.asarray(wavs, jnp.float32),
                      **self.stft_kwargs)
        mag = jnp.sqrt(re ** 2 + im ** 2 + 1e-12)
        return (re, im), jnp.log1p(mag)

    def enhance_batch(self, noisy, lengths=None):
        """(B, L) noisy -> (B, L) enhanced waveforms (masked magnitude,
        noisy phase)."""
        arr = jnp.asarray(noisy, jnp.float32)
        single = arr.ndim == 1
        if single:
            arr = arr[None]
        (re, im), log_mag = self.compute_features(arr)
        mask = jnp.clip(self._jitted(self.params, log_mag), 0.0, 1.0)
        wavs = istft(re * mask, im * mask, **self.stft_kwargs,
                     length=arr.shape[-1])
        return wavs[0] if single else wavs

    def enhance_file(self, filename, output_filename=None):
        from tsasr_tpu.data.audio import read_audio, write_wav
        wav, sr = read_audio(filename)
        out = np.asarray(self.enhance_batch(np.asarray(wav)))
        if output_filename is not None:
            write_wav(output_filename, out, sr)
        return out
