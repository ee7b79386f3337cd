"""Model-stack unit tests: shapes, causality, injection modes, features.

Mirrors the reference's unit strategy (SURVEY.md §4): shape/contract
tests (``test_attention.py``, ``test_CNN.py``, ``test_RNN.py``), the
causal-frontend invariance self-check
(``lobes/models/convolution.py:269-297``), and feature-value tests
(``test_features.py``) — here pinned against scipy/numpy references.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsasr_tpu.models import (
    ConformerEncoderLayer,
    ConvolutionFrontEnd,
    LSTM,
    TSConformerEncoder,
    TSTransducer,
)
from tsasr_tpu.models.attention import RelPosMHAXL, rel_pos_encoding
from tsasr_tpu.models.transducer import OneHotEmbedding, TSTransducerConfig
from tsasr_tpu.ops import Fbank, input_normalization
from tsasr_tpu.ops.features import mel_filterbank_matrix, stft


class TestFeatures:
    def test_stft_matches_numpy(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 3200)), jnp.float32)
        re, im = stft(x, sample_rate=16000, win_length=32.0,
                      hop_length=10.0, n_fft=512)
        # numpy reference with identical conventions
        sig = np.pad(np.asarray(x[0]), (256, 256))
        n = np.arange(512)
        window = 0.54 - 0.46 * np.cos(2 * np.pi * n / 512)
        frames = []
        for start in range(0, len(sig) - 512 + 1, 160):
            frames.append(sig[start:start + 512] * window)
        spec = np.fft.rfft(np.stack(frames), axis=-1)
        np.testing.assert_allclose(np.asarray(re[0]), spec.real,
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(im[0]), spec.imag,
                                   atol=2e-2)

    def test_frame_count(self):
        x = jnp.zeros((1, 16000))
        re, _ = stft(x, sample_rate=16000, win_length=32.0, n_fft=512)
        assert re.shape[1] == 101  # 1 + 16000 // 160

    def test_mel_matrix_shape_and_partition(self):
        m = mel_filterbank_matrix(n_mels=80, n_fft=512, sample_rate=16000)
        assert m.shape == (257, 80)
        assert (m >= 0).all() and m.max() <= 1.0

    def test_fbank_output(self, rng):
        wav = jnp.asarray(rng.normal(size=(2, 16000)), jnp.float32)
        feats = Fbank(sample_rate=16000, n_fft=512, n_mels=80,
                      win_length=32.0)(wav)
        assert feats.shape == (2, 101, 80)
        assert bool(jnp.isfinite(feats).all())
        # top_db clamp: dynamic range within 80 dB per utterance
        rng_db = feats.max(axis=(1, 2)) - feats.min(axis=(1, 2))
        assert float(rng_db.max()) <= 80.0 + 1e-3

    def test_input_normalization_masked(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 10, 4)), jnp.float32)
        # second element: only first 5 frames valid
        rel = jnp.asarray([1.0, 0.5])
        out = input_normalization(x, rel)
        valid = np.asarray(out[1, :5])
        np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-5)
        # unbiased std over 5 frames
        np.testing.assert_allclose(valid.std(axis=0, ddof=1), 1.0,
                                   atol=1e-4)


class TestAttention:
    def test_rel_pos_encoding_shape_symmetry(self):
        pe = rel_pos_encoding(10, 16)
        assert pe.shape == (1, 19, 16)
        # distance symmetry (the reference's quirk)
        np.testing.assert_allclose(np.asarray(pe[0, 0]),
                                   np.asarray(pe[0, -1]), atol=1e-6)

    def test_mha_shapes_and_masking(self, rng):
        mha = RelPosMHAXL(embed_dim=32, num_heads=4)
        x = jnp.asarray(rng.normal(size=(2, 6, 32)), jnp.float32)
        pe = rel_pos_encoding(6, 32)
        params = mha.init(jax.random.PRNGKey(0), x, pe)
        out, attn = mha.apply(params, x, pe)
        assert out.shape == (2, 6, 32)
        kp = jnp.asarray([[False] * 6, [False] * 3 + [True] * 3])
        _, attn = mha.apply(params, x, pe, key_padding_mask=kp)
        assert float(np.asarray(attn)[1, :, :, 3:].max()) < 1e-6

    def test_causal_masking(self, rng):
        mha = RelPosMHAXL(embed_dim=32, num_heads=4, mask_pos_future=True)
        x = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
        pe = rel_pos_encoding(8, 32)
        params = mha.init(jax.random.PRNGKey(0), x, pe)
        out1, _ = mha.apply(params, x, pe,
                            attn_mask=jnp.triu(jnp.ones((8, 8), bool), 1))
        x2 = x.at[:, 4:].set(0.0)
        out2, _ = mha.apply(params, x2, pe,
                            attn_mask=jnp.triu(jnp.ones((8, 8), bool), 1))
        np.testing.assert_allclose(np.asarray(out1[:, :4]),
                                   np.asarray(out2[:, :4]), atol=1e-5)


class TestFrontend:
    def test_subsampling_shape(self, rng):
        fe = ConvolutionFrontEnd()
        x = jnp.asarray(rng.normal(size=(2, 40, 80)), jnp.float32)
        params = fe.init(jax.random.PRNGKey(0), x)
        out = fe.apply(params, x)
        assert out.shape == (2, 10, 20, 128)  # 4x time, 4x freq, 128 ch

    def test_causal_frontend_invariance(self, rng):
        """The reference's causality self-check: with causal padding,
        frame 0 must not depend on future frames."""
        fe = ConvolutionFrontEnd(causal=True, dropout=0.0)
        x1 = jnp.asarray(rng.normal(size=(2, 40, 80)), jnp.float32)
        x2 = x1.at[:, 1:].set(
            jnp.asarray(rng.normal(size=(2, 39, 80)), jnp.float32))
        params = fe.init(jax.random.PRNGKey(0), x1)
        o1 = fe.apply(params, x1)
        o2 = fe.apply(params, x2)
        np.testing.assert_allclose(np.asarray(o1[:, 0]),
                                   np.asarray(o2[:, 0]), atol=1e-5)


class TestConformer:
    def make_layer(self, causal=False):
        return ConformerEncoderLayer(d_model=32, d_ffn=64, nhead=4,
                                     kernel_size=7, causal=causal,
                                     dropout=0.0)

    def test_layer_shape(self, rng):
        layer = self.make_layer()
        x = jnp.asarray(rng.normal(size=(2, 10, 32)), jnp.float32)
        pe = rel_pos_encoding(10, 32)
        params = layer.init(jax.random.PRNGKey(0), x, pe)
        out, attn = layer.apply(params, x, pe)
        assert out.shape == x.shape
        assert attn.shape == (2, 4, 10, 10)

    def test_causal_layer_invariance(self, rng):
        from tsasr_tpu.ops.masks import lookahead_mask
        layer = self.make_layer(causal=True)
        x1 = jnp.asarray(rng.normal(size=(1, 12, 32)), jnp.float32)
        x2 = x1.at[:, 6:].set(0.0)
        pe = rel_pos_encoding(12, 32)
        mask = lookahead_mask(12)
        params = layer.init(jax.random.PRNGKey(0), x1, pe,
                            attn_mask=mask)
        o1, _ = layer.apply(params, x1, pe, attn_mask=mask)
        o2, _ = layer.apply(params, x2, pe, attn_mask=mask)
        np.testing.assert_allclose(np.asarray(o1[:, :6]),
                                   np.asarray(o2[:, :6]), atol=1e-4)

    @pytest.mark.parametrize("causal", [False, True])
    def test_direct_pos_lookup_equals_rel_shift(self, rng, causal):
        """The distance-lookup positional scores must equal the
        Transformer-XL rel-shift trick (kept as the oracle)."""
        from tsasr_tpu.models.attention import _rel_shift

        B, H, T, Dh = 2, 3, 9, 4
        q_v = jnp.asarray(rng.normal(size=(B, T, H, Dh)), jnp.float32)
        p = jnp.asarray(rng.normal(size=(2 * T - 1, H, Dh)), jnp.float32)

        full = jnp.einsum("bthd,shd->bhts", q_v, p)      # (B,H,T,2T-1)
        shifted = _rel_shift(full, klen=T, causal=causal)

        idx = (jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
               + (T - 1))
        direct = jnp.einsum("bthd,tshd->bhts", q_v, p[idx])
        # note: no causal zeroing — the oracle's tri only affects
        # columns beyond the final slice, so shifted == direct for
        # both causal settings
        np.testing.assert_allclose(np.asarray(shifted),
                                   np.asarray(direct), atol=1e-5)

    @pytest.mark.parametrize("policy", ["full", "dots"])
    def test_remat_matches_norematerialization(self, rng, policy):
        """remat (either policy) must not change outputs or grads."""
        def build(remat):
            return TSConformerEncoder(
                d_model=32, nhead=4, num_layers=2, d_ffn=64,
                kernel_size=7, dropout=0.0, remat=remat,
                remat_policy=policy)

        src = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
        rel = jnp.asarray([1.0, 0.75])
        params = build(False).init(jax.random.PRNGKey(0), src,
                                   rel_lengths=rel)

        def loss(p, remat):
            out = build(remat).apply(p, src, rel_lengths=rel)
            return jnp.sum(out ** 2)

        v0, g0 = jax.value_and_grad(loss)(params, False)
        v1, g1 = jax.value_and_grad(loss)(params, True)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    @pytest.mark.parametrize("mode", ["prod", "sum", "cat",
                                      "cross_attention", None])
    def test_injection_modes(self, rng, mode):
        enc = TSConformerEncoder(d_model=32, nhead=4, num_layers=2,
                                 d_ffn=64, kernel_size=7, dropout=0.0,
                                 injection_mode=mode,
                                 injection_after=(-1, 0))
        src = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
        spk = jnp.asarray(rng.normal(size=(2, 1, 32)), jnp.float32)
        rel = jnp.asarray([1.0, 0.75])
        kwargs = dict(rel_lengths=rel, speaker_embs=spk,
                      speaker_embs_length=rel)
        params = enc.init(jax.random.PRNGKey(0), src, **kwargs)
        out = enc.apply(params, src, **kwargs)
        assert out.shape == (2, 8, 32)
        assert bool(jnp.isfinite(out).all())
        if mode is not None:
            # injection must change the output
            out_none = enc.apply(params, src, rel_lengths=rel)
            assert not np.allclose(np.asarray(out), np.asarray(out_none))


class TestLSTMAndTransducer:
    def test_lstm_step_matches_scan(self, rng):
        lstm = LSTM(hidden_size=16, in_features=8, num_layers=2)
        x = jnp.asarray(rng.normal(size=(3, 5, 8)), jnp.float32)
        params = lstm.init(jax.random.PRNGKey(0), x)
        seq_out, (h, c) = lstm.apply(params, x)
        state = lstm.apply(params, 3, method=lstm.initial_state)
        outs = []
        for t in range(5):
            out, state = lstm.apply(params, x[:, t], state,
                                    method=lstm.step)
            outs.append(out)
        np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                                   np.asarray(seq_out), atol=1e-5)
        np.testing.assert_allclose(np.asarray(state[0]), np.asarray(h),
                                   atol=1e-5)

    def test_one_hot_embedding(self):
        emb = OneHotEmbedding(num_embeddings=5, blank_id=0)
        out = emb(jnp.asarray([0, 1, 4]))
        expected = np.zeros((3, 4), np.float32)
        expected[1, 0] = 1.0
        expected[2, 3] = 1.0
        np.testing.assert_allclose(np.asarray(out), expected)

    def test_one_hot_nonzero_blank(self):
        emb = OneHotEmbedding(num_embeddings=4, blank_id=2)
        out = np.asarray(emb(jnp.asarray([0, 1, 2, 3])))
        assert out[2].sum() == 0
        assert out[0, 0] == 1 and out[1, 1] == 1 and out[3, 2] == 1

    def test_transducer_logit_shapes(self, rng):
        cfg = TSTransducerConfig(encoder_num_layers=1,
                                 speaker_encoder_layers=1, d_ffn=64,
                                 d_model=32, nhead=4, joint_dim=48,
                                 decoder_neurons=24,
                                 injection_mode="sum")
        model = TSTransducer(cfg)
        feats = jnp.asarray(rng.normal(size=(2, 20, 80)), jnp.float32)
        efeats = jnp.asarray(rng.normal(size=(2, 12, 80)), jnp.float32)
        rel = jnp.ones(2)
        tokens_bos = jnp.zeros((2, 5), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, rel,
                            tokens_bos, efeats, rel)
        logits, enc = model.apply(params, feats, rel, tokens_bos,
                                  efeats, rel)
        assert logits.shape == (2, 5, 5, cfg.vocab_size)  # T'=20/4
        assert enc.shape == (2, 5, 48)


class TestEcapaSpeakerBranch:
    def test_forward_and_grad_with_ecapa_encoder(self):
        """speaker_encoder_type='ecapa' trains end to end (frozen-BN
        convention keeps the jitted step immutable)."""
        import jax
        import jax.numpy as jnp

        from tsasr_tpu.models.transducer import (
            TSTransducer,
            TSTransducerConfig,
        )

        cfg = TSTransducerConfig(
            vocab_size=11, n_mels=16, d_model=32, nhead=4,
            encoder_num_layers=1, d_ffn=48, kernel_size=7,
            frontend_channels=(8, 8), decoder_neurons=16, joint_dim=24,
            injection_mode="cat", speaker_encoder_type="ecapa",
            ecapa_channels=(16, 16, 16, 16, 48), ecapa_lin_neurons=24)
        model = TSTransducer(cfg)
        feats = jnp.zeros((2, 20, 16))
        efeats = jnp.zeros((2, 16, 16))
        rel = jnp.ones((2,))
        tb = jnp.zeros((2, 5), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), feats, rel, tb,
                               efeats, rel)

        def loss_fn(v):
            logits, _ = model.apply(
                v, feats, rel, tb, efeats, rel, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.square(logits).mean()

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        assert jnp.isfinite(loss)
        spk = grads["params"]["speaker_encoder"]
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(spk))
        assert total > 0  # the ECAPA branch receives gradients

    def test_cross_attention_rejected(self):
        from tsasr_tpu.models.transducer import (
            TSTransducer,
            TSTransducerConfig,
        )
        import jax
        import jax.numpy as jnp
        import pytest as _pytest

        cfg = TSTransducerConfig(
            vocab_size=11, n_mels=16, d_model=32, nhead=4,
            encoder_num_layers=1, d_ffn=48, kernel_size=7,
            frontend_channels=(8, 8), decoder_neurons=16, joint_dim=24,
            injection_mode="cross_attention",
            speaker_encoder_type="ecapa")
        model = TSTransducer(cfg)
        with _pytest.raises(ValueError, match="cross_attention"):
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                       jnp.ones((1,)), jnp.zeros((1, 3), jnp.int32),
                       jnp.zeros((1, 8, 16)), jnp.ones((1,)))
