"""Frozen speaker-embedding (d-vector) providers for the ``pretrained``
variant.

The reference loads HF ``AutoModelForAudioXVector`` (WavLM-base-sv) and
runs it frozen under no_grad per batch
(``/root/reference/train_librispeechmix_pretrained.py:45-63,557-562``).
Two backends:

- ``JaxSpeakerEncoder`` — the full-parity path: the flax WavLM-XVector
  port (``tsasr_tpu/models/wavlm.py``, numerically pinned vs HF torch)
  runs frozen *inside the jitted train step*, so enrollment embedding
  rides the same TPU program as the rest of the forward. Loads an HF
  checkpoint directory (config.json + safetensors/bin); no torch import
  on the hot path.
- host torch + disk cache — since the embedding of an enrollment wav is
  deterministic and frozen, compute once on host and cache as .npy
  (SURVEY.md §7 hard-part 7); useful when only a hub id is available.

Network egress is unavailable in some deployments, so the HF model must
resolve from a local path / populated HF cache; a clear error explains
the requirement otherwise.
"""

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


class JaxSpeakerEncoder:
    """Frozen on-device WavLM-XVector (loads once, applies in-jit).

    ``embed(wav, rel_lens)`` returns (B, 1, E) pooled d-vectors, or
    (B, S, embedding_dim) frame-level features when ``frame_level``
    (the reference's cross_attention mode takes
    ``hidden_states[-1][..., :speaker_embedding_dim]``,
    train_librispeechmix_pretrained.py:58-63).
    """

    def __init__(self, model_path, frame_level=False, embedding_dim=512):
        from tsasr_tpu.models.wavlm import (WavLMForXVector,
                                            load_pretrained_xvector)
        if not (os.path.isdir(model_path) and os.path.exists(
                os.path.join(model_path, "config.json"))):
            raise FileNotFoundError(
                f"speaker_encoder_path '{model_path}' is not a local HF "
                f"checkpoint directory (config.json + weights). Download "
                f"the WavLM-sv checkpoint beforehand, or set "
                f"speaker_encoder_backend: torch_cache.")
        self.config, self.variables = load_pretrained_xvector(model_path)
        self.module = WavLMForXVector(self.config)
        self.frame_level = frame_level
        self.embedding_dim = embedding_dim
        n_params = sum(int(np.prod(x.shape)) for x in
                       __import__("jax").tree_util.tree_leaves(
                           self.variables))
        logger.info("%dM parameters in frozen speaker encoder",
                    round(n_params / 1e6))

    def embed(self, wav, rel_lens):
        """(B, L) waveforms + relative lengths -> speaker embeddings.
        jit-safe; gradients are stopped (the encoder is frozen, like the
        reference's no_grad)."""
        import jax
        import jax.numpy as jnp

        L = wav.shape[1]
        # the reference masks with (lens * L).ceil().clamp(max=L)
        lengths = jnp.minimum(jnp.ceil(rel_lens * L), L).astype(jnp.int32)
        out = self.module.apply(self.variables, wav, lengths)
        if self.frame_level:
            embs = out["hidden_states"][-1][..., : self.embedding_dim]
        else:
            embs = out["embeddings"][:, None, :]
        return jax.lax.stop_gradient(embs)

_MODEL_CACHE = {}


def _load_xvector_model(model_path):
    if model_path in _MODEL_CACHE:
        return _MODEL_CACHE[model_path]
    try:
        import torch  # noqa: F401
        from transformers import AutoModelForAudioXVector
    except ImportError as e:
        raise ImportError(
            "The pretrained variant needs torch + transformers for the "
            "frozen speaker encoder") from e
    try:
        model = AutoModelForAudioXVector.from_pretrained(model_path)
    except OSError as e:
        raise OSError(
            f"Could not load speaker encoder '{model_path}'. In an "
            f"offline environment, download it beforehand and point "
            f"speaker_encoder_path at the local directory.") from e
    model.eval()
    _MODEL_CACHE[model_path] = model
    return model


def compute_xvector(waveform, sample_rate, model_path):
    """Frozen d-vector (E,) for one waveform (host, torch no_grad)."""
    import torch
    model = _load_xvector_model(model_path)
    with torch.no_grad():
        out = model(input_values=torch.from_numpy(
            np.asarray(waveform, np.float32))[None])
    return out.embeddings[0].numpy()


class SpeakerEmbeddingCache:
    """Disk-backed per-wav d-vector cache (.npy files keyed by path)."""

    def __init__(self, cache_dir, model_path, sample_rate=16000):
        self.cache_dir = cache_dir
        self.model_path = model_path
        self.sample_rate = sample_rate
        os.makedirs(cache_dir, exist_ok=True)

    def _cache_path(self, wav_path):
        key = wav_path.replace(os.sep, "_").replace(".", "_")
        return os.path.join(self.cache_dir, f"{key}.npy")

    def get(self, wav_path, waveform):
        target = self._cache_path(wav_path)
        if os.path.exists(target):
            return np.load(target)
        emb = compute_xvector(waveform, self.sample_rate, self.model_path)
        np.save(target, emb)
        return emb


def make_speaker_embedding_pipeline(hparams):
    """Dynamic item: enroll_sig -> speaker_emb (1, E) from the cache."""
    from tsasr_tpu.data.pipeline import provides, takes

    cache = SpeakerEmbeddingCache(
        cache_dir=os.path.join(hparams["save_folder"], "speaker_embs"),
        model_path=hparams["speaker_encoder_path"],
        sample_rate=hparams["sample_rate"])

    @takes("enroll_wav", "enroll_sig")
    @provides("speaker_emb")
    def speaker_embedding_pipeline(enroll_wav, enroll_sig):
        emb = cache.get(enroll_wav, enroll_sig)
        return emb[None, :].astype(np.float32)     # (1, E)

    return speaker_embedding_pipeline
