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
