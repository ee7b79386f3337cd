"""General signal-processing ops (public surface).

TPU-native equivalents of the reference
``processing/signal_processing.py:16-533``: amplitude computation /
normalization / rescaling, FFT convolution, reverberation, dB
conversion, notch filtering, overlap-add, and spectral resynthesis.
All functions are jnp, jit-safe, and follow the reference's
relative-length masking convention.
"""

import math

import jax.numpy as jnp


def compute_amplitude(waveforms, lengths=None, amp_type="avg",
                      scale="linear", eps=1e-14):
    """Average-absolute or peak amplitude, optionally in dB
    (reference :16-69). waveforms (..., L); lengths absolute samples."""
    x = jnp.abs(waveforms)
    if amp_type == "avg":
        if lengths is None:
            out = jnp.mean(x, axis=-1, keepdims=True)
        else:
            mask = jnp.arange(x.shape[-1])[None, :] < \
                jnp.reshape(lengths, (-1, 1))
            out = jnp.sum(x * mask, axis=-1, keepdims=True) / \
                jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
    elif amp_type == "peak":
        out = jnp.max(x, axis=-1, keepdims=True)
    else:
        raise ValueError("amp_type must be 'avg' or 'peak'")
    if scale == "linear":
        return out
    if scale == "dB":
        return jnp.clip(20 * jnp.log10(out + eps), a_min=-80.0)
    raise ValueError("scale must be 'linear' or 'dB'")


def normalize(waveforms, lengths=None, amp_type="avg", eps=1e-14):
    """Divide by amplitude (reference :70-106)."""
    amp = compute_amplitude(waveforms, lengths, amp_type)
    return waveforms / (amp + eps)


def rescale(waveforms, lengths, target_lvl, amp_type="avg",
            scale="linear"):
    """Normalize then scale to the target level (linear or dB,
    reference :107-156)."""
    out = normalize(waveforms, lengths, amp_type)
    if scale == "linear":
        return target_lvl * out
    if scale == "dB":
        return dB_to_amplitude(target_lvl) * out
    raise ValueError("scale must be 'linear' or 'dB'")


def convolve1d(waveform, kernel, padding=0):
    """FFT-based 1-D convolution of (B, L) with (B, K) (or (K,))
    kernels, 'same'-style when padding=(K-1)//2-like tuples are given
    (reference :157-279 uses torch conv; FFT is the TPU-friendly path
    for long RIRs)."""
    if kernel.ndim == 1:
        kernel = kernel[None]
    if isinstance(padding, (tuple, list)):
        waveform = jnp.pad(waveform, ((0, 0), tuple(padding)))
    elif padding:
        waveform = jnp.pad(waveform, ((0, 0), (padding, padding)))
    L = waveform.shape[-1]
    K = kernel.shape[-1]
    n = L + K - 1
    n_fft = 1 << (n - 1).bit_length()
    Wf = jnp.fft.rfft(waveform, n_fft)
    Kf = jnp.fft.rfft(kernel, n_fft)
    out = jnp.fft.irfft(Wf * Kf, n_fft)[..., :n]
    return out[..., :L]


def reverberate(waveforms, rir_waveform, rescale_amp="avg"):
    """Convolve with a room impulse response, direct-path-aligned and
    amplitude-preserving (reference :280-354): the output window starts
    at the RIR's peak so the dry signal stays time-aligned."""
    import jax

    orig_amp = compute_amplitude(waveforms, amp_type=rescale_amp)
    if rir_waveform.ndim == 1:
        rir_waveform = rir_waveform[None]
    B, L = waveforms.shape
    K = rir_waveform.shape[-1]
    n = L + K - 1
    n_fft = 1 << (n - 1).bit_length()
    full = jnp.fft.irfft(
        jnp.fft.rfft(waveforms, n_fft) *
        jnp.fft.rfft(rir_waveform, n_fft), n_fft)[..., :n]
    peaks = jnp.argmax(jnp.abs(rir_waveform), axis=-1)
    peaks = jnp.broadcast_to(peaks, (B,)) if peaks.shape[0] != B \
        else peaks
    out = jax.vmap(
        lambda f, p: jax.lax.dynamic_slice(f, (p,), (L,)))(full, peaks)
    new_amp = compute_amplitude(out, amp_type=rescale_amp)
    return out * orig_amp / (new_amp + 1e-14)


def dB_to_amplitude(SNR):
    """10^(dB/20) (reference :355-372)."""
    return 10.0 ** (SNR / 20.0)


def notch_filter(notch_freq, filter_width=101, notch_width=0.05):
    """FIR band-rejection filter kernel (reference :373-432: sum of a
    lowpass and a highpass sinc, Blackman-windowed)."""
    pad = filter_width // 2
    inputs = jnp.arange(filter_width) - pad
    notch_freq = notch_freq + notch_width

    def sinc(x):
        def _sinc(x):
            return jnp.where(x == 0, 1.0,
                             jnp.sin(x) / jnp.where(x == 0, 1.0, x))
        return _sinc(x)

    def blackman(n):
        x = jnp.arange(n, dtype=jnp.float32) / (n - 1)
        return (0.42 - 0.5 * jnp.cos(2 * math.pi * x)
                + 0.08 * jnp.cos(4 * math.pi * x))

    hlpf = sinc(3 * (notch_freq - notch_width) * inputs) * \
        blackman(filter_width)
    hlpf = hlpf / jnp.sum(hlpf)
    hhpf = sinc(3 * (notch_freq + notch_width) * inputs) * \
        blackman(filter_width)
    hhpf = hhpf / -jnp.sum(hhpf)
    hhpf = hhpf.at[pad].add(1.0)
    return (hlpf + hhpf)[None, :]


def overlap_and_add(signal, frame_step):
    """(..., frames, frame_len) -> (..., samples) overlap-add
    (reference :433-485)."""
    *lead, frames, frame_len = signal.shape
    out_len = (frames - 1) * frame_step + frame_len
    sig = signal.reshape(-1, frames, frame_len)
    out = jnp.zeros((sig.shape[0], out_len), signal.dtype)
    for f in range(frames):
        out = out.at[:, f * frame_step: f * frame_step + frame_len].add(
            sig[:, f])
    return out.reshape(*lead, out_len)


def resynthesize(enhanced_mag, noisy_inputs, stft_fn, istft_fn,
                 normalize_wavs=True):
    """Mask-style resynthesis: enhanced magnitude + noisy phase ->
    waveform (reference :486-533). ``stft_fn``/``istft_fn`` are this
    framework's ops.features stft/istft closures returning/consuming
    complex spectra."""
    noisy_spec = stft_fn(noisy_inputs)
    phase = jnp.angle(noisy_spec)
    complex_spec = enhanced_mag * jnp.exp(1j * phase)
    wavs = istft_fn(complex_spec)
    if normalize_wavs:
        wavs = normalize(wavs, amp_type="peak")
    return wavs
