"""Feature-op extras: ISTFT round trip, deltas, context window, DCT/MFCC
(the reference's test_features.py covers filterbank/deltas/istft)."""

import numpy as np

import jax.numpy as jnp

from tsasr_tpu.ops.features import (
    MFCC,
    context_window,
    dct,
    deltas,
    istft,
    pad_time_frames,
    stft,
)


class TestISTFT:
    def test_round_trip(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 4800)), jnp.float32)
        re, im = stft(x, sample_rate=16000, win_length=25.0,
                      hop_length=10.0, n_fft=400)
        rec = istft(re, im, sample_rate=16000, win_length=25.0,
                    hop_length=10.0, n_fft=400, length=4800)
        # edges are lossy; interior must reconstruct
        np.testing.assert_allclose(np.asarray(rec[:, 400:-400]),
                                   np.asarray(x[:, 400:-400]), atol=5e-3)


class TestDeltasContext:
    def test_deltas_constant_is_zero(self):
        x = jnp.ones((1, 20, 4))
        d = deltas(x)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    def test_deltas_linear_ramp(self):
        t = jnp.arange(20, dtype=jnp.float32)
        x = jnp.broadcast_to(t[None, :, None], (1, 20, 3))
        d = deltas(x)
        # slope of a ramp = 1 in the interior
        np.testing.assert_allclose(np.asarray(d[0, 5:15, 0]), 1.0,
                                   atol=1e-5)

    def test_context_window_shape(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 10, 4)), jnp.float32)
        out = context_window(x, left_frames=2, right_frames=3)
        assert out.shape == (2, 10, 4 * 6)


class TestDCT:
    def test_orthonormal_energy(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 5, 16)), jnp.float32)
        full = dct(x, n_out=16)
        # orthonormal transform preserves energy
        np.testing.assert_allclose(
            float(jnp.sum(full ** 2)), float(jnp.sum(x ** 2)), rtol=1e-4)

    def test_mfcc_pipeline_shape(self, rng):
        wav = jnp.asarray(rng.normal(size=(2, 16000)), jnp.float32)
        feats = MFCC(n_mels=23, n_mfcc=20)(wav)
        # 20 mfcc x3 (deltas) x11 (context 5+5+1)
        assert feats.shape == (2, 101, 20 * 3 * 11)


class TestPadTimeFrames:
    """MXU frame-padding lever (`pad_feats_to`): padding must be exactly
    the semantics of a more-padded bucketed batch."""

    def test_noop_when_aligned(self):
        x = jnp.ones((2, 32, 4))
        rel = jnp.array([1.0, 0.5])
        y, r = pad_time_frames(x, rel, 8)
        assert y.shape == x.shape and np.allclose(r, rel)

    def test_pad_and_rescale(self):
        x = jnp.ones((2, 401, 4))
        rel = jnp.array([1.0, 0.75])
        y, r = pad_time_frames(x, rel, 32)
        assert y.shape == (2, 416, 4)
        # padded region is zero
        assert np.allclose(np.asarray(y[:, 401:]), 0.0)
        # round(rel * T) frame counts are preserved exactly
        old = np.round(np.asarray(rel) * 401)
        new = np.round(np.asarray(r) * 416)
        assert np.array_equal(old, new)

    def test_audio_pad_identity_and_alignment(self):
        """pad_audio_to_frame_multiple == manual bucket padding, and the
        frame count comes out aligned with round(rel*T) preserved."""
        from tsasr_tpu.ops.features import (Fbank,
                                            pad_audio_to_frame_multiple)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.normal(size=(2, 16000)) * 0.1, jnp.float32)
        rel = jnp.array([1.0, 0.8])
        wav_p, rel_p = pad_audio_to_frame_multiple(wav, rel, 32)
        # manual bucket padding to the same length
        L_new = wav_p.shape[-1]
        man = jnp.pad(wav, ((0, 0), (0, L_new - 16000)))
        assert np.array_equal(np.asarray(wav_p), np.asarray(man))
        assert np.allclose(np.asarray(rel_p),
                           np.asarray(rel) * 16000 / L_new)
        fb = Fbank(sample_rate=16000, n_fft=512, n_mels=24)
        T = fb(wav_p).shape[1]
        assert T % 32 == 0
        # valid frame counts preserved at the new T
        T0 = fb(wav).shape[1]
        assert np.array_equal(np.round(np.asarray(rel) * T0),
                              np.round(np.asarray(rel_p) * T))

    def test_model_loss_invariant(self):
        """Training loss under frame-aligned audio padding stays close
        to the unpadded loss (the residual is the conv-boundary padding
        artifact every bucket-quantized batch already carries)."""
        import jax
        from tsasr_tpu.models.transducer import (TSTransducer,
                                                 TSTransducerConfig)
        from tsasr_tpu.ops import input_normalization
        from tsasr_tpu.ops.features import (Fbank,
                                            pad_audio_to_frame_multiple)
        from tsasr_tpu.ops.rnnt_loss import rnnt_loss

        cfg = TSTransducerConfig(
            encoder_num_layers=2, speaker_encoder_layers=1, d_model=32,
            nhead=2, d_ffn=64, joint_dim=32, vocab_size=12, n_mels=24,
            decoder_neurons=16, injection_mode="cat")
        model = TSTransducer(cfg)
        rng = np.random.default_rng(0)
        fbank = Fbank(sample_rate=16000, n_fft=512, n_mels=24)
        wav = jnp.asarray(rng.normal(size=(2, 16000)) * 0.1, jnp.float32)
        enr = jnp.asarray(rng.normal(size=(2, 16000)) * 0.1, jnp.float32)
        rel = jnp.array([1.0, 0.8])
        tokens_bos = jnp.asarray(
            rng.integers(1, 12, size=(2, 7)), jnp.int32).at[:, 0].set(0)
        efeats = input_normalization(fbank(enr), rel)
        params = [None]

        def loss_of(w, r):
            feats = input_normalization(fbank(w), r)
            if params[0] is None:
                params[0] = model.init(jax.random.PRNGKey(0), feats, r,
                                       tokens_bos, efeats, rel)
            logits, _ = model.apply(params[0], feats, r, tokens_bos,
                                    efeats, rel)
            t_lens = jnp.round(r * logits.shape[1]).astype(jnp.int32)
            u_lens = jnp.array([6, 6], jnp.int32)
            return rnnt_loss(logits, tokens_bos[:, 1:], t_lens, u_lens,
                             reduction="none")

        wav_p, rel_p = pad_audio_to_frame_multiple(wav, rel, 32)
        base = loss_of(wav, rel)
        padded = loss_of(wav_p, rel_p)
        assert np.allclose(np.asarray(base), np.asarray(padded),
                           rtol=0.05, atol=1.0)
