"""``torchaudio`` shim for the north-star reference run.

torchaudio is not installed on this host; the reference recipe touches
exactly three of its surfaces on the LibriSpeechMix `none` path:

- ``torchaudio.load`` / ``torchaudio.save`` (wav I/O) — backed here by
  the stdlib ``wave`` module (the synthetic dataset is 16-bit PCM wav);
- ``torchaudio.functional.resample`` — identity for equal rates (the
  synthetic corpus is all 16 kHz), windowed-sinc polyphase otherwise;
- ``torchaudio.functional.rnnt_loss`` — the reference's training loss
  (``nnet/losses.py:61-80``); backed by
  ``tools/northstar/rnnt_loss_torch.py``, a float64 lattice with
  analytic gradients value-pinned against this repo's JAX oracle at
  rtol 1e-5 before each run.

The shim lives OUTSIDE the reference tree; the reference runs unmodified.
"""

import os
import sys
import wave
from types import SimpleNamespace

import numpy as np
import torch

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _here not in sys.path:
    sys.path.insert(0, _here)

from rnnt_loss_torch import rnnt_loss as _rnnt_loss  # noqa: E402

__version__ = "2.1.0-shim"


def load(path, normalize=True, **kwargs):
    """-> (FloatTensor (channels, frames), sample_rate)."""
    with wave.open(str(path), "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32)
        if normalize:
            data = data / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32)
        if normalize:
            data = data / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    data = data.reshape(-1, ch).T
    return torch.from_numpy(data.copy()), sr


def save(path, src, sample_rate, **kwargs):
    arr = src.detach().cpu().numpy()
    if arr.ndim == 1:
        arr = arr[None]
    pcm = np.clip(arr.T * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(pcm.shape[1])
        f.setsampwidth(2)
        f.setframerate(int(sample_rate))
        f.writeframes(pcm.tobytes())


def info(path, **kwargs):
    with wave.open(str(path), "rb") as f:
        return SimpleNamespace(
            sample_rate=f.getframerate(), num_frames=f.getnframes(),
            num_channels=f.getnchannels(),
            bits_per_sample=f.getsampwidth() * 8, encoding="PCM_S")


def set_audio_backend(name):
    pass


def get_audio_backend():
    return "shim-wave"


def _resample(waveform, orig_freq, new_freq, lowpass_filter_width=6):
    orig_freq, new_freq = int(orig_freq), int(new_freq)
    if orig_freq == new_freq:
        return waveform
    from math import gcd
    g = gcd(orig_freq, new_freq)
    up, down = new_freq // g, orig_freq // g
    x = waveform.detach().cpu().numpy()
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    n_out = int(np.ceil(x.shape[-1] * up / down))
    # windowed-sinc interpolation evaluated at the output grid
    t_out = np.arange(n_out) * (down / up)
    width = lowpass_filter_width
    out = np.zeros(x.shape[:-1] + (n_out,), np.float32)
    for i, t in enumerate(t_out):
        lo = max(0, int(np.floor(t)) - width)
        hi = min(x.shape[-1], int(np.floor(t)) + width + 1)
        k = np.arange(lo, hi) - t
        w = np.sinc(k * min(1.0, up / down)) * np.hanning(2 * width + 1)[
            : hi - lo] * min(1.0, up / down)
        out[..., i] = (x[..., lo:hi] * w).sum(-1)
    if squeeze:
        out = out[0]
    return torch.from_numpy(out)


from . import functional  # noqa: E402  (real submodule, see functional.py)


class _Resample(torch.nn.Module):
    def __init__(self, orig_freq=16000, new_freq=16000, **kwargs):
        super().__init__()
        self.orig_freq, self.new_freq = orig_freq, new_freq

    def forward(self, waveform):
        return _resample(waveform, self.orig_freq, self.new_freq)


transforms = SimpleNamespace(Resample=_Resample)
backend = SimpleNamespace(common=SimpleNamespace(AudioMetaData=object))
