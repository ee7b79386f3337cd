"""Attentional seq2seq decoder tests: step/scan consistency, masking,
and a copy-task overfit that drives training + greedy + beam end to end
(the loss-goes-down oracle for the AED stack)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tsasr_tpu.decoding.seq2seq import s2s_beam_search, s2s_greedy_search
from tsasr_tpu.models.seq2seq import (
    Seq2SeqDecoder,
    Seq2SeqDecoderConfig,
    make_step_fn,
)


def _make(attn_type="content", vocab=8, enc_dim=12, seed=0):
    cfg = Seq2SeqDecoderConfig(
        vocab_size=vocab, enc_dim=enc_dim, embedding_dim=12,
        hidden_size=16, attn_dim=16, attn_type=attn_type,
        conv_channels=4, kernel_size=3, rnn_type="gru", dropout=0.0)
    model = Seq2SeqDecoder(cfg)
    enc = jnp.zeros((2, 7, enc_dim))
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((2, 3), jnp.int32), enc)
    return model, variables, cfg


class TestDecoderModule:
    @pytest.mark.parametrize("attn_type", ["content", "location"])
    def test_shapes(self, attn_type):
        model, variables, cfg = _make(attn_type)
        rng = np.random.default_rng(0)
        enc = jnp.asarray(rng.normal(size=(2, 7, 12)).astype(np.float32))
        tokens = jnp.asarray(rng.integers(0, 8, (2, 5)), jnp.int32)
        logits, attn = model.apply(variables, tokens, enc,
                                   jnp.asarray([1.0, 0.6]))
        assert logits.shape == (2, 5, 8)
        assert attn.shape == (2, 5, 7)
        # masked encoder frames get (near) zero attention
        np.testing.assert_allclose(np.asarray(attn[1, :, 5:]).sum(), 0.0,
                                   atol=1e-6)

    @pytest.mark.parametrize("attn_type", ["content", "location"])
    def test_step_matches_teacher_forced(self, attn_type):
        model, variables, cfg = _make(attn_type, seed=1)
        rng = np.random.default_rng(1)
        enc = jnp.asarray(rng.normal(size=(2, 7, 12)).astype(np.float32))
        tokens = jnp.asarray(rng.integers(0, 8, (2, 4)), jnp.int32)
        logits, _ = model.apply(variables, tokens, enc)
        ref = jax.nn.log_softmax(logits, axis=-1)

        step_fn, state = make_step_fn(model, variables, enc)
        for u in range(tokens.shape[1]):
            lp, state = step_fn(tokens[:, u], state)
            np.testing.assert_allclose(np.asarray(lp),
                                       np.asarray(ref[:, u]), atol=1e-5)


class TestCopyTaskOverfit:
    def test_trains_and_decodes(self):
        """Encoder states = one-hot source tokens; the decoder must learn
        to copy the sequence (then emit eos). Greedy and beam both
        reproduce the source after a short overfit."""
        V = 7          # 0..4 symbols, 5 = bos, 6 = eos
        BOS, EOS = 5, 6
        U, B = 5, 8
        rng = np.random.default_rng(0)
        src = rng.integers(0, 5, size=(B, U)).astype(np.int32)
        enc = jax.nn.one_hot(src, 5)                      # (B, U, 5)
        tokens_bos = np.concatenate(
            [np.full((B, 1), BOS, np.int32), src], axis=1)
        targets = np.concatenate(
            [src, np.full((B, 1), EOS, np.int32)], axis=1)

        cfg = Seq2SeqDecoderConfig(
            vocab_size=V, enc_dim=5, embedding_dim=16, hidden_size=32,
            attn_dim=32, attn_type="content", rnn_type="gru",
            dropout=0.0)
        model = Seq2SeqDecoder(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(tokens_bos), jnp.asarray(enc))
        tx = optax.adam(3e-3)
        opt_state = tx.init(variables)

        @jax.jit
        def train_step(variables, opt_state):
            def loss_fn(v):
                logits, _ = model.apply(v, jnp.asarray(tokens_bos),
                                        jnp.asarray(enc))
                lp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(
                    lp, jnp.asarray(targets)[..., None], axis=-1)
                return nll.mean()

            loss, grads = jax.value_and_grad(loss_fn)(variables)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(variables, updates), opt_state, \
                loss

        first = None
        for i in range(300):
            variables, opt_state, loss = train_step(variables, opt_state)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.1 < first

        # greedy decode reproduces the source
        step_fn, state0 = make_step_fn(model, variables, jnp.asarray(enc))
        tokens, lengths, _ = s2s_greedy_search(
            step_fn, state0, B, BOS, EOS, max_steps=U + 1)
        for b in range(B):
            hyp = [int(x) for x in
                   np.asarray(tokens[b, : int(lengths[b])])]
            assert hyp == list(src[b]), b

        # batched beam agrees
        K = 2
        step_fn, state0 = make_step_fn(model, variables, jnp.asarray(enc),
                                       n_streams=B * K)
        btokens, blengths, _ = s2s_beam_search(
            step_fn, state0, B, BOS, EOS, max_steps=U + 1, beam_size=K)
        for b in range(B):
            hyp = [int(x) for x in
                   np.asarray(btokens[b, 0, : int(blengths[b, 0])])]
            assert hyp == list(src[b]), b


class TestAEDStackOverfit:
    def test_crdnn_encoder_decoder_overfit(self):
        """Full AED ASR stack: fbank-like features -> CRDNN -> attentional
        decoder -> nll; overfits a fixed batch and greedy-decodes the
        targets (the loss-goes-down oracle for the seq2seq pipeline)."""
        from tsasr_tpu.models.crdnn import CRDNN, CRDNNConfig

        V, BOS, EOS = 7, 5, 6
        B, T, F, U = 4, 24, 16, 4
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
        src = rng.integers(0, 5, size=(B, U)).astype(np.int32)
        tokens_bos = np.concatenate(
            [np.full((B, 1), BOS, np.int32), src], axis=1)
        targets = np.concatenate(
            [src, np.full((B, 1), EOS, np.int32)], axis=1)

        enc_cfg = CRDNNConfig(
            input_size=F, cnn_blocks=1, cnn_channels=(4,),
            inter_layer_pooling_size=(2,), rnn_layers=1, rnn_neurons=16,
            rnn_bidirectional=True, dnn_blocks=1, dnn_neurons=24,
            dropout=0.0)
        encoder = CRDNN(enc_cfg)
        dec_cfg = Seq2SeqDecoderConfig(
            vocab_size=V, enc_dim=24, embedding_dim=16, hidden_size=32,
            attn_dim=24, attn_type="location", conv_channels=4,
            kernel_size=3, rnn_type="gru", dropout=0.0)
        decoder = Seq2SeqDecoder(dec_cfg)

        enc_vars = encoder.init(jax.random.PRNGKey(0), feats)
        enc0 = encoder.apply(enc_vars, feats)
        dec_vars = decoder.init(jax.random.PRNGKey(1),
                                jnp.asarray(tokens_bos), enc0)
        tx = optax.adam(3e-3)
        params = {"enc": enc_vars, "dec": dec_vars}
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, opt_state):
            def loss_fn(p):
                enc = encoder.apply(p["enc"], feats)
                logits, _ = decoder.apply(p["dec"],
                                          jnp.asarray(tokens_bos), enc)
                lp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(
                    lp, jnp.asarray(targets)[..., None], axis=-1)
                return nll.mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        first = None
        for _ in range(400):
            params, opt_state, loss = train_step(params, opt_state)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.1 < first

        enc = encoder.apply(params["enc"], feats)
        step_fn, state0 = make_step_fn(decoder, params["dec"], enc)
        tokens, lengths, _ = s2s_greedy_search(
            step_fn, state0, B, BOS, EOS, max_steps=U + 1)
        for b in range(B):
            hyp = [int(x) for x in
                   np.asarray(tokens[b, : int(lengths[b])])]
            assert hyp == list(src[b]), b
