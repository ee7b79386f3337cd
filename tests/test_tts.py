"""TTS pipeline tests: Tacotron2 + HiFi-GAN behind the TextToSpeech
interface (tiny random models; parity vs torch lives in
test_reference_parity.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsasr_tpu.data.encoder import CategoricalEncoder
from tsasr_tpu.inference.tts import TextToSpeech
from tsasr_tpu.models.hifigan import HifiganConfig, HifiganGenerator
from tsasr_tpu.models.tacotron2 import Tacotron2, Tacotron2Config


@pytest.fixture(scope="module")
def tts():
    t2cfg = Tacotron2Config(
        n_symbols=30, symbols_embedding_dim=16, n_mel_channels=8,
        encoder_n_convolutions=1, encoder_embedding_dim=16,
        attention_rnn_dim=12, attention_dim=8,
        attention_location_n_filters=4, attention_location_kernel_size=5,
        decoder_rnn_dim=12, prenet_dim=8, prenet_dropout=0.0,
        max_decoder_steps=10, gate_threshold=0.999,  # run to max steps
        postnet_embedding_dim=8, postnet_kernel_size=5,
        postnet_n_convolutions=2)
    t2 = Tacotron2(t2cfg)
    tokens = jnp.zeros((1, 6), jnp.int32)
    t2v = t2.init({"params": jax.random.PRNGKey(0)}, tokens,
                  jnp.asarray([6]), jnp.zeros((1, 4, 8)))
    vcfg = HifiganConfig(
        in_channels=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, upsample_factors=(4, 2))
    voc = HifiganGenerator(vcfg)
    vv = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 10, 8)))
    enc = CategoricalEncoder()
    enc.update_from_iterable("helo wrd")
    return TextToSpeech(t2, t2v, voc, vv, text_encoder=enc)


class TestTextToSpeech:
    def test_synthesize_batch_shapes(self, tts):
        tokens = jnp.zeros((2, 5), jnp.int32)
        wav, mels, mel_lengths, aligns = tts.synthesize_batch(tokens)
        # hop = prod(upsample_factors) = 8 samples per mel frame
        assert wav.shape == (2, mels.shape[1] * 8)
        assert mels.shape[2] == 8
        assert aligns.shape[:2] == (2, mels.shape[1])

    def test_synthesize_string(self, tts):
        wav, mel = tts.synthesize("hello world")
        assert wav.ndim == 1 and mel.ndim == 2 and mel.shape[1] == 8
        assert len(wav) == mel.shape[0] * 8

    def test_deterministic_given_seed(self, tts):
        tokens = jnp.zeros((1, 5), jnp.int32)
        w1, *_ = tts.synthesize_batch(tokens, seed=7)
        w2, *_ = tts.synthesize_batch(tokens, seed=7)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    def test_encode_text_requires_encoder(self):
        bare = TextToSpeech(None, None, None, None)
        with pytest.raises(ValueError, match="text_encoder"):
            bare.encode_text(["x"])
