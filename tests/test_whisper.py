"""Whisper JAX port parity vs HF torch (C13 tail, round-4 verdict #9).

Reference: ``lobes/models/huggingface_whisper.py`` (wraps HF
``WhisperModel``; log-mel frontend :217-300). Pinned against a
random-init tiny HF ``WhisperModel`` — no weights are downloadable on
this host, but the converter is checkpoint-agnostic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from tsasr_tpu.models.whisper import (  # noqa: E402
    WhisperJAX,
    WhisperJAXConfig,
    load_hf_whisper_params,
    log_mel_spectrogram,
    whisper_mel_filters,
)


@pytest.fixture(scope="module")
def hf_pair():
    cfg = transformers.WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=80,
        max_source_positions=75, max_target_positions=32,
        vocab_size=51000, dropout=0.0)
    torch.manual_seed(0)
    hf = transformers.WhisperModel(cfg).eval()
    jcfg = WhisperJAXConfig.from_hf_dict(cfg.to_dict())
    model = WhisperJAX(jcfg)
    params = load_hf_whisper_params(hf.state_dict(), jcfg)
    return hf, model, params


def test_encoder_decoder_parity(hf_pair):
    hf, model, params = hf_pair
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, 80, 150)).astype(np.float32)
    ids = rng.integers(0, 51000, size=(2, 7))
    with torch.no_grad():
        out = hf(torch.from_numpy(mel),
                 decoder_input_ids=torch.from_numpy(ids))
    enc, dec = model.apply(params, jnp.asarray(mel), jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(enc), out.encoder_last_hidden_state.numpy(),
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(dec), out.last_hidden_state.numpy(), atol=2e-4)


def test_mel_filters_match_hf():
    fe = transformers.WhisperFeatureExtractor()
    mf = fe.mel_filters
    if mf.shape[0] != fe.feature_size:   # transformers >= 4.29 layout
        mf = mf.T
    np.testing.assert_allclose(whisper_mel_filters(), mf, atol=1e-6)


def test_log_mel_frontend_matches_hf():
    fe = transformers.WhisperFeatureExtractor()
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(2, 32000)) * 0.1).astype(np.float32)
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
    ref = fe([w for w in wav], sampling_rate=16000,
             return_tensors="np", padding="max_length")
    np.testing.assert_allclose(ours, ref.input_features, atol=2e-4)
    assert ours.shape == (2, 80, 3000)
