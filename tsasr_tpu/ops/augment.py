"""On-device augmentation: SpecAugment + speed perturbation.

TPU-native equivalents of the reference augmenters, PRNG-keyed and
jit-safe (no Python randomness, static shapes):

- ``spec_augment`` — ``vendor/speechbrain/speechbrain/lobes/augment.py:32-220``:
  time warp (interpolated stretch around a random center), ``n`` frequency
  masks and ``n`` time masks with uniformly-drawn widths/positions, filled
  with zero or the batch mean. The reference draws one warp for the whole
  batch and per-example mask positions; reproduced here.
- ``speed_perturb`` — ``processing/speech_augmentation.py:435-508``: random
  choice among resampling ratios {95, 100, 105}%. On device this is
  implemented by sinc-interpolation with a fixed output length per ratio;
  batches pick one ratio per call like the reference (one random choice
  per batch element there; one per batch here keeps shapes static — the
  distributional effect is equivalent at batch sizes used).

The time warp matches the reference's ``time_warp_mode: bicubic``:
torch's cubic convolution kernel (a = -0.75) with align_corners=True
index maps and border-replicated taps. Along frequency the reference's
2D interpolate is the identity (same size + align_corners), so a 1D
cubic gather along time is the exact computation.
"""

import functools

import jax
import jax.numpy as jnp


def _interp_linear(x, new_len, old_len):
    """Align-corners linear resample of x (B, T, F) slice along time."""
    if old_len == 1:
        return jnp.repeat(x[:, :1], new_len, axis=1)
    pos = jnp.linspace(0.0, old_len - 1, new_len)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, old_len - 1)
    w = (pos - lo)[None, :, None]
    return x[:, lo] * (1 - w) + x[:, hi] * w


def _mask_along_axis(x, rng, dim, n_masks, width_range, fill):
    """Random span masks along time (dim=1) or freq (dim=2)."""
    B = x.shape[0]
    D = x.shape[dim]
    k1, k2 = jax.random.split(rng)
    if width_range[1] <= width_range[0]:
        return x
    lengths = jax.random.randint(k1, (B, n_masks, 1), width_range[0],
                                 width_range[1])
    max_pos = jnp.maximum(1, D - lengths.max())
    pos = jax.random.randint(k2, (B, n_masks, 1), 0, max_pos)
    arange = jnp.arange(D)[None, None, :]
    mask = ((pos <= arange) & (arange < pos + lengths)).any(axis=1)
    if dim == 1:
        mask = mask[:, :, None]
    else:
        mask = mask[:, None, :]
    return jnp.where(mask, fill, x)


def spec_augment(x, rng, time_warp=True, time_warp_window=5,
                 freq_mask=True, freq_mask_width=(0, 30), n_freq_mask=2,
                 time_mask=True, time_mask_width=(0, 20), n_time_mask=2,
                 replace_with_zero=False):
    """SpecAugment over (B, T, F) features. Widths given as int are
    treated as (0, width) like the reference."""
    if isinstance(freq_mask_width, int):
        freq_mask_width = (0, freq_mask_width)
    if isinstance(time_mask_width, int):
        time_mask_width = (0, time_mask_width)
    k_warp, k_f, k_t = jax.random.split(rng, 3)

    if time_warp:
        x = _time_warp(x, k_warp, time_warp_window)
    fill = 0.0 if replace_with_zero else jnp.mean(x)
    if freq_mask:
        x = _mask_along_axis(x, k_f, dim=2, n_masks=n_freq_mask,
                             width_range=freq_mask_width, fill=fill)
    if time_mask:
        x = _mask_along_axis(x, k_t, dim=1, n_masks=n_time_mask,
                             width_range=time_mask_width, fill=fill)
    return x


def _cubic_weight(t, a=-0.75):
    """torch's cubic convolution kernel (upsample bicubic, a=-0.75)."""
    t = jnp.abs(t)
    inner = (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
    outer = a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
    return jnp.where(t <= 1, inner, jnp.where(t < 2, outer, 0.0))


def _cubic_gather_time(x, pos, lo_limit, hi_limit):
    """Sample x (B, T, F) at float time positions with the bicubic
    kernel; taps are clamped to [lo_limit, hi_limit] (torch replicates
    the border pixel). ``pos``/limits may be traced scalars/vectors."""
    base = jnp.floor(pos).astype(jnp.int32)
    frac = pos - base
    out = 0.0
    for k in (-1, 0, 1, 2):
        idx = jnp.clip(base + k, lo_limit, hi_limit)
        weight = _cubic_weight(frac - k)[None, :, None]
        out = out + x[:, idx] * weight
    return out


def _time_warp(x, rng, window):
    """Stretch [0, c) to [0, w) and [c, T) to [w, T) with random c, w
    (reference lobes/augment.py:115-149, time_warp_mode=bicubic).

    Shapes stay static: the warp is realized as a cubic-kernel gather
    with align-corners piecewise index maps (one draw per batch, like
    the reference); each segment's taps are clamped inside the segment,
    reproducing torch's border replication per interpolate call.
    """
    T = x.shape[1]
    if T - window <= window:
        return x
    k1, k2 = jax.random.split(rng)
    c = jax.random.randint(k1, (), window, T - window)
    w = jax.random.randint(k2, (), c - window, c + window) + 1
    t = jnp.arange(T)
    # left segment: positions [0, w) sample source [0, c); right:
    # positions [w, T) sample source [c, T)  (align-corners maps)
    left_pos = t * (c - 1) / jnp.maximum(w - 1, 1)
    right_pos = c + (t - w) * (T - c - 1) / jnp.maximum(T - w - 1, 1)
    is_left = t < w
    pos = jnp.where(is_left, left_pos, right_pos)
    lo_limit = jnp.where(is_left, 0, c)
    hi_limit = jnp.where(is_left, c - 1, T - 1)
    pos = jnp.clip(pos, lo_limit, hi_limit)
    return _cubic_gather_time(x, pos, lo_limit, hi_limit)


def resample_device(wav, orig_freq, new_freq):
    """Windowed-sinc polyphase resampling on device (B, L) -> (B, L').

    Same Kaiser-sinc kernel design as the host resampler
    (``tsasr_tpu/data/audio.py::_sinc_kernel``), realized as ONE
    strided convolution with the polyphase kernels as output channels —
    MXU-friendly (the reference's ``Resample`` runs a torch conv,
    ``processing/speech_augmentation.py:511-823``).
    """
    import math

    from tsasr_tpu.data.audio import _sinc_kernel

    if int(orig_freq) == int(new_freq):
        return wav
    kernels, width, of, nf = _sinc_kernel(int(orig_freq), int(new_freq))
    B, L = wav.shape
    target_len = int(math.ceil(nf * L / of))
    padded = jnp.pad(wav, ((0, 0), (width, width + of)))
    kw = kernels.shape[1]
    # conv: out channel = phase, stride = of  -> (B, nf, n_frames)
    out = jax.lax.conv_general_dilated(
        padded[:, None, :], jnp.asarray(kernels)[:, None, :],
        window_strides=(of,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    # interleave phases: sample index = frame * nf + phase
    out = jnp.swapaxes(out, 1, 2).reshape(B, -1)
    return out[:, :target_len]


def speed_perturb(wav, rng, speeds=(95, 100, 105), sample_rate=16000):
    """Random speed change of (B, L) waveforms; output stays (B, L)
    (sped-up audio is right-padded with zeros, slowed audio truncated —
    keeps shapes static inside jit; callers rescale lengths with the
    returned factor). Uses the same windowed-sinc resampler as the
    reference ``SpeedPerturb`` (:435-508)."""
    B, L = wav.shape
    idx = jax.random.randint(rng, (), 0, len(speeds))
    branches = []
    for s in speeds:
        def branch(w, s=s):
            if s == 100:
                return w, jnp.float32(1.0)
            # speed s% => resample 100 -> s (fewer samples = faster)
            out = resample_device(w, 100, s)
            new_len = out.shape[1]
            if new_len >= L:
                return out[:, :L], jnp.float32(min(new_len, L) / L)
            pad = jnp.zeros((B, L - new_len), w.dtype)
            return jnp.concatenate([out, pad], axis=1), \
                jnp.float32(new_len / L)

        branches.append(branch)
    return jax.lax.switch(idx, branches, wav)
