"""G2P lobes (C13 tail, round-4 verdict #9). Reference:
``lobes/models/g2p/model.py`` (AttentionSeq2Seq :20-143,
TransformerG2P :216-420)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tsasr_tpu.models.g2p import (
    AttentionG2P,
    AttentionG2PConfig,
    TransformerG2P,
    TransformerG2PConfig,
)

G, P, U = 12, 10, 6


def _toy_batch(rng):
    """Toy deterministic G2P task: phoneme[i] = (grapheme[i] % (P-2)) + 1."""
    graphemes = jnp.asarray(rng.integers(1, G, size=(8, U)), jnp.int32)
    phones = (graphemes % (P - 2)) + 1
    phn_bos = jnp.concatenate(
        [jnp.zeros((8, 1), jnp.int32), phones[:, :-1]], axis=1)
    return graphemes, phn_bos, phones


def test_attention_g2p_shapes_and_overfit(rng):
    cfg = AttentionG2PConfig(grapheme_vocab=G, phoneme_vocab=P,
                             emb_dim=32, enc_hidden=32, enc_layers=1)
    model = AttentionG2P(cfg)
    graphemes, phn_bos, phones = _toy_batch(rng)
    rel = jnp.ones((8,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), graphemes, phn_bos, rel)
    logp, enc_out, attn = model.apply(params, graphemes, phn_bos, rel)
    assert logp.shape == (8, U, P)
    assert enc_out.shape == (8, U, 64)
    assert attn.shape == (8, U, U)

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            lp, _, _ = model.apply(p, graphemes, phn_bos, rel)
            return -jnp.mean(jnp.take_along_axis(
                lp, phones[..., None], axis=-1))

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for _ in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], losses[::15]
    lp, _, _ = model.apply(params, graphemes, phn_bos, rel)
    acc = float(jnp.mean(jnp.argmax(lp, -1) == phones))
    assert acc > 0.9, acc


def test_transformer_g2p_shapes(rng):
    cfg = TransformerG2PConfig(grapheme_vocab=G, phoneme_vocab=P,
                               d_model=32, nhead=4,
                               num_encoder_layers=1,
                               num_decoder_layers=1, d_ffn=64,
                               dropout=0.0)
    model = TransformerG2P(cfg)
    graphemes, phn_bos, phones = _toy_batch(rng)
    rel = jnp.ones((8,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), graphemes, phn_bos, rel)
    logp, enc_out = model.apply(params, graphemes, phn_bos, rel)
    assert logp.shape == (8, U, P)
    assert enc_out.shape == (8, U, 32)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-4)
