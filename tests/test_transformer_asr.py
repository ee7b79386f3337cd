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

# --- CNNTransformerSE (reference transformer/TransformerSE.py) -------

from tsasr_tpu.models.transformer_asr import (  # noqa: E402
    CNNTransformerSE,
    CNNTransformerSEConfig,
    TransformerST,
    TransformerSTConfig,
)


def test_se_forward_and_causality():
    """Causal SE (the reference default, TransformerSE.py:62): output
    frame t must not depend on input frames > t."""
    cfg = CNNTransformerSEConfig(d_model=32, output_size=33, nhead=4,
                                 num_layers=2, d_ffn=64, causal=True)
    model = CNNTransformerSE(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y1 = model.apply(params, x)
    assert y1.shape == (2, 10, 33)
    assert np.all(np.asarray(y1) >= 0)          # ReLU output activation
    y2 = model.apply(params, x.at[:, 6:].set(5.0))
    np.testing.assert_allclose(np.asarray(y1[:, :6]),
                               np.asarray(y2[:, :6]), atol=1e-5)
    assert not np.allclose(np.asarray(y1[:, 6:]), np.asarray(y2[:, 6:]))


def test_se_custom_emb_module():
    """The optional pre-encoder slots in as a flax submodule
    (reference custom_emb_module, TransformerSE.py:60-61, :87-88)."""
    import flax.linen as fnn

    class _PreEnc(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            return fnn.Dense(32, name="proj")(x)

    cfg = CNNTransformerSEConfig(d_model=32, output_size=20, nhead=4,
                                 num_layers=1, d_ffn=64, causal=False,
                                 output_activation="sigmoid")
    model = CNNTransformerSE(cfg, custom_emb_module=_PreEnc())
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 40)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x, jnp.asarray([1.0, 0.5], jnp.float32))
    assert y.shape == (2, 8, 20)
    assert np.all((np.asarray(y) >= 0) & (np.asarray(y) <= 1))


# --- TransformerST (reference transformer/TransformerST.py) ----------

@pytest.fixture(scope="module")
def st():
    cfg = TransformerSTConfig(tgt_vocab=31, input_size=40, d_model=32,
                              nhead=4, num_encoder_layers=2,
                              num_decoder_layers=2, d_ffn=64,
                              ctc_weight=0.3, asr_weight=0.3,
                              mt_weight=0.2, asr_tgt_vocab=29,
                              mt_src_vocab=37)
    model = TransformerST(cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(2, 12, 40)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 31, size=(2, 7)), jnp.int32)
    wav_len = jnp.asarray([1.0, 0.5], jnp.float32)
    asr_tgt = jnp.asarray(rng.integers(1, 29, size=(2, 6)), jnp.int32)
    mt_src = jnp.asarray(rng.integers(1, 37, size=(2, 9)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, tgt, asr_tgt,
                        mt_src, wav_len, method=model.init_all)
    return model, params, src, tgt, wav_len


def test_st_main_forward(st):
    """The ST main path IS the ASR forward (reference TransformerST
    subclasses TransformerASR, :28)."""
    model, params, src, tgt, wav_len = st
    enc, dec = model.apply(params, src, tgt, wav_len)
    assert enc.shape == (2, 12, 32) and dec.shape == (2, 7, 32)


def test_st_forward_asr_branch(st):
    """Auxiliary ASR decoder over the shared encoder output
    (reference forward_asr, :205-250) — and it must be causal."""
    model, params, src, tgt, wav_len = st
    enc = model.apply(params, src, wav_len, method=model.encode)
    asr_tgt = jnp.asarray(
        np.random.default_rng(2).integers(1, 29, size=(2, 6)), jnp.int32)
    d1 = model.apply(params, enc, asr_tgt, wav_len,
                     method=model.forward_asr)
    assert d1.shape == (2, 6, 32)
    d2 = model.apply(params, enc, asr_tgt.at[:, 3:].set(5), wav_len,
                     method=model.forward_asr)
    np.testing.assert_allclose(np.asarray(d1[:, :3]),
                               np.asarray(d2[:, :3]), atol=1e-5)


def test_st_forward_mt_branch(st):
    """Auxiliary MT branch: own source embedding + text encoder, the
    SHARED translation decoder (reference forward_mt, :252-304)."""
    model, params, src, tgt, wav_len = st
    rng = np.random.default_rng(3)
    mt_src = jnp.asarray(rng.integers(1, 37, size=(2, 9)), jnp.int32)
    enc, dec = model.apply(params, mt_src, tgt, method=model.forward_mt)
    assert enc.shape == (2, 9, 32) and dec.shape == (2, 7, 32)
    # decoder-only variant against precomputed float memory
    d = model.apply(params, enc, tgt, method=model.forward_mt_decoder_only)
    assert d.shape == (2, 7, 32)


def test_st_branch_gating():
    """asr/mt branches only exist when their weights enable them
    (reference :149-165)."""
    cfg = TransformerSTConfig(tgt_vocab=31, input_size=40, d_model=32,
                              nhead=4, num_encoder_layers=1,
                              num_decoder_layers=1, d_ffn=64)
    model = TransformerST(cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(1, 8, 40)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 31, size=(1, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, tgt,
                        jnp.ones(1, jnp.float32))
    names = set(params["params"].keys())
    assert not any(n.startswith("asr_") for n in names)
    assert not any(n.startswith("mt_") for n in names)
