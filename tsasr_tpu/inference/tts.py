"""Text-to-speech inference interface (Tacotron2 -> HiFi-GAN).

Reference surface: ``pretrained/interfaces.py`` ``Tacotron2`` +
``HIFIGAN`` wrappers (encode_text/decode_batch chained by the TTS
recipes). One object holds both flax models and jits the full
text -> mel -> waveform pipeline.
"""

import numpy as np

import jax
import jax.numpy as jnp


class TextToSpeech:
    """Chain a Tacotron2 and a HifiganGenerator for synthesis."""

    def __init__(self, tacotron, tacotron_variables, vocoder,
                 vocoder_variables, text_encoder=None):
        """
        tacotron / vocoder : flax modules (models/tacotron2.py,
            models/hifigan.py) with their variables.
        text_encoder : optional
            ``CategoricalEncoder``-style label encoder mapping
            characters/phonemes to ids (``encode_sequence``).
        """
        self.tacotron = tacotron
        self.tacotron_variables = tacotron_variables
        self.vocoder = vocoder
        self.vocoder_variables = vocoder_variables
        self.text_encoder = text_encoder
        self._jitted = jax.jit(self._synthesize)

    def _synthesize(self, tokens, lengths, rng):
        mels, mel_lengths, aligns = self.tacotron.apply(
            self.tacotron_variables, tokens, lengths,
            method=self.tacotron.infer, rngs={"prenet": rng})
        wav = self.vocoder.apply(self.vocoder_variables, mels)
        return wav[..., 0], mels, mel_lengths, aligns

    def encode_text(self, texts):
        """Strings -> padded (B, L) id array + lengths (needs a
        text_encoder)."""
        if self.text_encoder is None:
            raise ValueError("encode_text needs a text_encoder")
        seqs = [self.text_encoder.encode_sequence(list(t)) for t in texts]
        L = max(len(s) for s in seqs)
        tokens = np.zeros((len(seqs), L), np.int32)
        lengths = np.zeros((len(seqs),), np.int32)
        for i, s in enumerate(seqs):
            tokens[i, : len(s)] = s
            lengths[i] = len(s)
        return jnp.asarray(tokens), jnp.asarray(lengths)

    def synthesize_batch(self, tokens, lengths=None, seed=0):
        """(B, L) token ids -> (waveforms (B, T_wav), mels, mel_lengths,
        alignments). The prenet rng reproduces the reference's always-on
        inference dropout (seeded for determinism)."""
        tokens = jnp.asarray(tokens, jnp.int32)
        if lengths is None:
            lengths = jnp.full((tokens.shape[0],), tokens.shape[1],
                               jnp.int32)
        return self._jitted(tokens, jnp.asarray(lengths),
                            jax.random.PRNGKey(seed))

    def synthesize(self, text, seed=0):
        """One string -> (waveform (T,), mel (T_mel, n_mel))."""
        tokens, lengths = self.encode_text([text])
        wav, mels, mel_lengths, _ = self.synthesize_batch(tokens, lengths,
                                                          seed=seed)
        n = int(mel_lengths[0])
        hop = wav.shape[1] // mels.shape[1]
        return np.asarray(wav[0][: n * hop]), np.asarray(mels[0][:n])
