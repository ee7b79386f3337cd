"""SincConv (SincNet) — learnable band-pass filterbank convolution.

Parity port of the reference ``nnet/CNN.py::SincConv`` (:28-310):
parameters are per-filter (low_hz_, band_hz_); filters are rebuilt every
call as windowed ideal band-passes

    h[n] = (sin(2π f_hi n) − sin(2π f_lo n)) / (n/2) · hamming(n) / (2·band)

with mel-spaced initialization, ``min_low_hz``/``min_band_hz`` floors
and Nyquist clamping — exactly the reference math (pinned by
``tests/test_reference_parity.py``). The convolution itself is one
depthwise conv, MXU/XLA friendly; the filter synthesis is a handful of
elementwise ops XLA fuses into the conv prologue.
"""

import math
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _to_mel(hz):
    return 2595 * np.log10(1 + hz / 700)


def _to_hz(mel):
    return 700 * (10 ** (mel / 2595) - 1)


class SincConv(nn.Module):
    out_channels: int
    kernel_size: int
    sample_rate: int = 16000
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    dtype: Dtype = jnp.float32

    def _init_bands(self):
        high_hz = self.sample_rate / 2 - (self.min_low_hz
                                          + self.min_band_hz)
        mel = np.linspace(_to_mel(self.min_low_hz), _to_mel(high_hz),
                          self.out_channels + 1)
        hz = _to_hz(mel)
        return (hz[:-1].astype(np.float32)[:, None],
                np.diff(hz).astype(np.float32)[:, None])

    @nn.compact
    def __call__(self, x):
        """x: (B, T) or (B, T, 1) waveform -> (B, T', out_channels)."""
        if self.kernel_size % 2 == 0:
            raise ValueError("SincConv kernel_size must be odd")
        low_init, band_init = self._init_bands()
        low_hz = self.param("low_hz_", lambda _k: jnp.asarray(low_init))
        band_hz = self.param("band_hz_",
                             lambda _k: jnp.asarray(band_init))

        low = self.min_low_hz + jnp.abs(low_hz)            # (C, 1)
        high = jnp.clip(low + self.min_band_hz + jnp.abs(band_hz),
                        self.min_low_hz, self.sample_rate / 2)
        band = (high - low)[:, 0]                          # (C,)

        half = self.kernel_size // 2
        n_lin = jnp.linspace(0, self.kernel_size / 2 - 1, half)
        window = 0.54 - 0.46 * jnp.cos(
            2 * math.pi * n_lin / self.kernel_size)        # (half,)
        n_ = (2 * math.pi
              * jnp.arange(-((self.kernel_size - 1) / 2.0), 0)
              / self.sample_rate)[None, :]                 # (1, half)

        f_lo = low @ n_                                    # (C, half)
        f_hi = high @ n_
        left = ((jnp.sin(f_hi) - jnp.sin(f_lo)) / (n_ / 2)) * window
        center = 2 * band[:, None]
        filters = jnp.concatenate(
            [left, center, left[:, ::-1]], axis=1)         # (C, K)
        filters = filters / (2 * band[:, None])

        if x.ndim == 2:
            x = x[:, :, None]
        if self.padding == "same":
            # reference 'same' REFLECT-pads (CNN.py padding_mode default)
            (lo, hi), = self._same_pad()
            x = jnp.pad(x, [(0, 0), (lo, hi), (0, 0)], mode="reflect")
            pad = "VALID"
        elif self.padding == "causal":
            pad = [((self.kernel_size - 1) * self.dilation, 0)]
        elif self.padding == "valid":
            pad = "VALID"
        else:
            raise ValueError(f"padding {self.padding!r}")
        kernel = filters.T[:, None, :]                     # (K, 1, C)
        conv = nn.Conv(features=self.out_channels,
                       kernel_size=(self.kernel_size,),
                       strides=(self.stride,),
                       kernel_dilation=(self.dilation,),
                       padding=pad, use_bias=False, dtype=self.dtype)
        return conv.apply(
            {"params": {"kernel": kernel.astype(self.dtype)}},
            x.astype(self.dtype))

    def _same_pad(self):
        # reference get_padding_elem: stride>1 -> floor(k/2) both sides;
        # stride==1 -> (L_in - L_out)/2 with L_out = L_in - d*(k-1)
        if self.stride > 1:
            p = self.kernel_size // 2
            return [(p, p)]
        total = self.dilation * (self.kernel_size - 1)
        return [(total // 2, total // 2)]
