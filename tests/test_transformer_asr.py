"""TransformerASR / TransformerLM lobes (C13 tail, round-4 verdict #9).

Reference:
``lobes/models/transformer/TransformerASR.py`` / ``TransformerLM.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsasr_tpu.models.transformer_asr import (
    TransformerASR,
    TransformerASRConfig,
    TransformerLM,
    TransformerLMConfig,
)


@pytest.fixture(scope="module")
def asr():
    cfg = TransformerASRConfig(tgt_vocab=31, input_size=40, d_model=32,
                               nhead=4, num_encoder_layers=2,
                               num_decoder_layers=2, d_ffn=64)
    model = TransformerASR(cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(2, 12, 40)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 31, size=(2, 7)), jnp.int32)
    wav_len = jnp.asarray([1.0, 0.5], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), src, tgt, wav_len)
    return model, params, src, tgt, wav_len


def test_forward_shapes(asr):
    model, params, src, tgt, wav_len = asr
    enc, dec = model.apply(params, src, tgt, wav_len)
    assert enc.shape == (2, 12, 32)
    assert dec.shape == (2, 7, 32)
    assert np.all(np.isfinite(np.asarray(enc)))
    assert np.all(np.isfinite(np.asarray(dec)))


def test_decoder_is_causal(asr):
    """dec_out[:, :t] must not change when tgt[:, t:] changes."""
    model, params, src, tgt, wav_len = asr
    enc = model.apply(params, src, wav_len, method=model.encode)
    d1 = model.apply(params, tgt, enc, wav_len, method=model.decode)
    tgt2 = tgt.at[:, 4:].set(7)
    d2 = model.apply(params, tgt2, enc, wav_len, method=model.decode)
    np.testing.assert_allclose(np.asarray(d1[:, :4]),
                               np.asarray(d2[:, :4]), atol=1e-5)
    assert not np.allclose(np.asarray(d1[:, 4:]), np.asarray(d2[:, 4:]))


def test_src_padding_is_masked(asr):
    """Changing padded source frames (beyond wav_len) must not change
    valid encoder rows (transformer module: positionwise except
    attention, which masks padded keys)."""
    model, params, src, tgt, wav_len = asr
    e1 = model.apply(params, src, wav_len, method=model.encode)
    src2 = src.at[1, 6:].set(9.9)  # row 1 valid length = 6
    e2 = model.apply(params, src2, wav_len, method=model.encode)
    np.testing.assert_allclose(np.asarray(e1[1, :6]),
                               np.asarray(e2[1, :6]), atol=1e-5)


def test_conformer_encoder_module():
    cfg = TransformerASRConfig(tgt_vocab=31, input_size=40, d_model=32,
                               nhead=4, num_encoder_layers=1,
                               num_decoder_layers=1, d_ffn=64,
                               kernel_size=5,
                               encoder_module="conformer")
    model = TransformerASR(cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(2, 12, 40)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 31, size=(2, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, tgt,
                        jnp.ones(2, jnp.float32))
    enc, dec = model.apply(params, src, tgt, jnp.ones(2, jnp.float32))
    assert enc.shape == (2, 12, 32) and dec.shape == (2, 5, 32)


def test_lm_causal_logits():
    cfg = TransformerLMConfig(vocab=31, d_model=32, nhead=4,
                              num_layers=2, d_ffn=64)
    model = TransformerLM(cfg)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, 31, size=(2, 9)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    l1 = model.apply(params, toks)
    assert l1.shape == (2, 9, 31)
    l2 = model.apply(params, toks.at[:, 5:].set(3))
    np.testing.assert_allclose(np.asarray(l1[:, :5]),
                               np.asarray(l2[:, :5]), atol=1e-5)
