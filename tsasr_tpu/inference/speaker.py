"""Speaker-recognition inference interface (verification/scoring).

Reference surface: ``vendor/speechbrain/speechbrain/pretrained/
interfaces.py`` ``SpeakerRecognition`` (encode_batch / verify_batch /
verify_files with cosine similarity) and ``EncoderClassifier`` — C13
pretrained-interface slices. Backends:

- the flax WavLM-XVector port (``models/wavlm.py``) for HF checkpoints;
- the recipe's scratch Conformer speaker encoder via a TSTransducer
  checkpoint (``extract_speaker`` + pooling);
- any callable ``(wav (B, L), rel_lens (B,)) -> (B, E)``.

EER / minDCF over scored trial lists live in
``tsasr_tpu.utils.metric_stats``.
"""

import numpy as np

import jax.numpy as jnp

from tsasr_tpu.data.audio import read_audio, resample


class SpeakerRecognition:
    """Embed, score, and verify speaker pairs with cosine similarity."""

    def __init__(self, embed_fn, sample_rate=16000, threshold=0.5):
        self.embed_fn = embed_fn
        self.sample_rate = sample_rate
        self.threshold = threshold

    # ------------------------------------------------------------ factory
    @classmethod
    def from_wavlm(cls, model_path, sample_rate=16000, threshold=0.5):
        """Local HF WavLM-XVector checkpoint directory -> interface."""
        from tsasr_tpu.models.wavlm import (WavLMForXVector,
                                            load_pretrained_xvector)
        config, variables = load_pretrained_xvector(model_path)
        model = WavLMForXVector(config)

        def embed_fn(wavs, rel_lens):
            L = wavs.shape[1]
            lengths = jnp.minimum(jnp.ceil(rel_lens * L), L).astype(
                jnp.int32)
            return model.apply(variables, wavs, lengths)["embeddings"]

        return cls(embed_fn, sample_rate=sample_rate, threshold=threshold)

    @classmethod
    def from_ecapa(cls, model, variables, fbank, sample_rate=16000,
                   threshold=0.5):
        """ECAPA-TDNN (``models/ecapa.py``) over fbank features."""
        from tsasr_tpu.ops import input_normalization

        def embed_fn(wavs, rel_lens):
            feats = input_normalization(fbank(wavs), rel_lens)
            return model.apply(variables, feats, rel_lens)[:, 0, :]

        return cls(embed_fn, sample_rate=sample_rate, threshold=threshold)

    @classmethod
    def from_tsasr(cls, model, params, fbank, sample_rate=16000,
                   threshold=0.5):
        """Scratch speaker-encoder branch of a TSTransducer."""
        from tsasr_tpu.ops import input_normalization

        def embed_fn(wavs, rel_lens):
            feats = input_normalization(fbank(wavs), rel_lens)
            embs = model.apply(params, feats, rel_lens,
                               deterministic=True,
                               method=model.extract_speaker)
            return embs[:, 0, :] if embs.ndim == 3 else embs

        return cls(embed_fn, sample_rate=sample_rate, threshold=threshold)

    # ------------------------------------------------------------ embed
    def encode_batch(self, wavs, rel_lens=None):
        """(B, L) waveforms -> (B, E) embeddings."""
        wavs = jnp.asarray(wavs, jnp.float32)
        if rel_lens is None:
            rel_lens = jnp.ones((wavs.shape[0],), jnp.float32)
        return self.embed_fn(wavs, jnp.asarray(rel_lens))

    def encode_file(self, path):
        wav, sr = read_audio(path)
        if sr != self.sample_rate:
            wav = resample(wav, sr, self.sample_rate)
        return np.asarray(self.encode_batch(wav[None]))[0]

    # ------------------------------------------------------------ verify
    @staticmethod
    def cosine(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        return np.sum(a * b, axis=-1) / np.maximum(denom, 1e-12)

    def verify_batch(self, wavs1, wavs2, rel_lens1=None, rel_lens2=None):
        """-> (scores (B,), decisions (B,) bool)."""
        e1 = self.encode_batch(wavs1, rel_lens1)
        e2 = self.encode_batch(wavs2, rel_lens2)
        scores = self.cosine(e1, e2)
        return scores, scores > self.threshold

    def verify_files(self, path1, path2):
        """-> (score, same_speaker) for two audio files."""
        e1 = self.encode_file(path1)
        e2 = self.encode_file(path2)
        score = float(self.cosine(e1, e2))
        return score, score > self.threshold
