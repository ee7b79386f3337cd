"""Audio classification inference interface (EncoderClassifier-style).

Reference surface: ``vendor/speechbrain/speechbrain/pretrained/
interfaces.py`` ``EncoderClassifier`` (encode_batch -> classify_batch
with a label encoder, classify_file) — the generic "embedding +
classifier head + labels" wrapper used for language/speaker/emotion ID.
Backend-agnostic here: any callable ``(wavs (B, L), rel_lens) ->
logits-or-embeddings (B, D)`` plus an optional head and a
``CategoricalEncoder`` for label decoding.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tsasr_tpu.data.audio import read_audio, resample


class EncoderClassifier:
    """Embed audio and classify with decoded labels."""

    def __init__(self, encode_fn, label_encoder=None, classify_fn=None,
                 sample_rate=16000):
        """
        encode_fn : (wavs (B, L), rel_lens (B,)) -> (B, D) embeddings.
        classify_fn : optional (B, D) -> (B, C) logits; identity when
            encode_fn already returns logits.
        label_encoder : CategoricalEncoder mapping class index -> label.
        """
        self.encode_fn = encode_fn
        self.classify_fn = classify_fn
        self.label_encoder = label_encoder
        self.sample_rate = sample_rate

    def encode_batch(self, wavs, rel_lens=None):
        wavs = jnp.asarray(wavs, jnp.float32)
        if rel_lens is None:
            rel_lens = jnp.ones((wavs.shape[0],), jnp.float32)
        return self.encode_fn(wavs, jnp.asarray(rel_lens))

    def classify_batch(self, wavs, rel_lens=None):
        """-> (log_probs (B, C), scores (B,), indices (B,), labels)."""
        emb = self.encode_batch(wavs, rel_lens)
        logits = self.classify_fn(emb) if self.classify_fn else emb
        log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        indices = jnp.argmax(log_probs, axis=-1)
        scores = jnp.take_along_axis(log_probs, indices[:, None],
                                     axis=-1)[:, 0]
        labels = None
        if self.label_encoder is not None:
            labels = self.label_encoder.decode_ndim(
                np.asarray(indices).tolist())
        return log_probs, scores, indices, labels

    def classify_file(self, path):
        wav, sr = read_audio(path)
        if sr != self.sample_rate:
            wav = resample(wav, sr, self.sample_rate)
        log_probs, scores, indices, labels = self.classify_batch(
            wav[None])
        return (log_probs[0], float(scores[0]), int(indices[0]),
                labels[0] if labels else None)
