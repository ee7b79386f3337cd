"""Source-separation inference interface.

Equivalent of the reference ``SepformerSeparation`` pretrained
interface (``pretrained/interfaces.py`` :~2203): load a trained
separator, separate batches or files, write per-source wavs. Works with
any model whose ``apply(params, mix (B, L)) -> (B, L, S)`` (SepFormer or
ConvTasNet from ``models/separation.py``).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp


class SepformerSeparation:
    """Callable separator with batch/file entry points."""

    def __init__(self, model, params, sample_rate=8000):
        self.model = model
        self.params = params
        self.sample_rate = sample_rate
        self._jitted = jax.jit(
            lambda p, m: self.model.apply(p, m, deterministic=True))

    @classmethod
    def from_checkpoint(cls, model, path, sample_rate=8000):
        """msgpack params file -> interface."""
        import flax.serialization
        with open(path, "rb") as f:
            raw = f.read()
        dummy = jnp.zeros((1, sample_rate), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), dummy)
        params = flax.serialization.from_bytes(params, raw)
        return cls(model, params, sample_rate)

    def separate_batch(self, mix):
        """(B, L) or (L,) waveforms -> (B, L, num_spks) estimates,
        rescaled to the input's peak like the reference interface."""
        arr = jnp.asarray(mix, jnp.float32)
        single = arr.ndim == 1
        if single:
            arr = arr[None]
        est = self._jitted(self.params, arr)
        # normalize each source to the mixture's peak amplitude
        peak_in = jnp.max(jnp.abs(arr), axis=1, keepdims=True)[..., None]
        peak_out = jnp.max(jnp.abs(est), axis=1,
                           keepdims=True) + 1e-8
        est = est / peak_out * peak_in
        return est[0] if single else est

    def separate_file(self, path, savedir=None):
        """Read a wav/flac, separate, optionally write
        ``<stem>_source{k}.wav`` files; returns the estimates."""
        from tsasr_tpu.data.audio import read_audio, write_wav
        wav, sr = read_audio(path)
        est = np.asarray(self.separate_batch(np.asarray(wav)))
        if savedir is not None:
            os.makedirs(savedir, exist_ok=True)
            stem = os.path.splitext(os.path.basename(path))[0]
            for k in range(est.shape[-1]):
                write_wav(os.path.join(savedir,
                                       f"{stem}_source{k + 1}.wav"),
                          est[:, k], sr)
        return est
