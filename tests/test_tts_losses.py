"""Tacotron2 loss + guided attention, pinned to the reference doctest
(guidedattn_loss.py:44-66) and hand-computed values."""

import numpy as np
import pytest

import jax.numpy as jnp

from tsasr_tpu.ops.tts_losses import (
    guided_attention_loss,
    guided_attention_weights,
    tacotron2_loss,
)


class TestGuidedAttention:
    def test_reference_doctest_value(self):
        alignments = jnp.asarray([
            [[0.8, 0.2, 0.0],
             [0.4, 0.6, 0.0],
             [0.2, 0.8, 0.0],
             [0.0, 0.0, 0.0]],
            [[0.6, 0.2, 0.2],
             [0.1, 0.7, 0.2],
             [0.3, 0.4, 0.3],
             [0.2, 0.3, 0.5]],
        ])
        loss = guided_attention_loss(
            alignments, jnp.asarray([2, 3]), jnp.asarray([3, 4]),
            sigma=0.2)
        np.testing.assert_allclose(float(loss), 0.1142, atol=1e-4)

    def test_diagonal_attention_cheap(self):
        """A perfectly diagonal attention costs much less than an
        anti-diagonal one."""
        T = S = 8
        eye = jnp.eye(T)[None]
        anti = jnp.flip(jnp.eye(T), 1)[None]
        lens_i = jnp.asarray([S])
        lens_t = jnp.asarray([T])
        good = float(guided_attention_loss(eye, lens_i, lens_t))
        bad = float(guided_attention_loss(anti, lens_i, lens_t))
        assert good < 0.2 * bad

    def test_weights_zero_outside_lengths(self):
        w = guided_attention_weights(jnp.asarray([2]), jnp.asarray([3]),
                                     4, 5)
        w = np.asarray(w)[0]
        assert (w[2:, :] == 0).all() and (w[:, 3:] == 0).all()


class TestTacotronLoss:
    def test_components_hand_computed(self):
        B, M, T, S = 1, 2, 3, 2
        mel_t = jnp.zeros((B, M, T))
        mel_o = jnp.ones((B, M, T))           # mse 1.0
        mel_p = jnp.zeros((B, M, T))          # mse 0.0
        gate_t = jnp.ones((B, T))
        gate_o = jnp.zeros((B, T))            # bce = log(2)
        align = jnp.zeros((B, T, S))
        out = tacotron2_loss(
            (mel_o, mel_p, gate_o, align), (mel_t, gate_t),
            jnp.asarray([S]), jnp.asarray([T]),
            guided_attention_weight=0.0)
        np.testing.assert_allclose(float(out.mel_loss), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(out.gate_loss),
                                   float(np.log(2)), atol=1e-6)
        np.testing.assert_allclose(float(out.attn_loss), 0.0)
        np.testing.assert_allclose(
            float(out.loss), 1.0 + float(np.log(2)), atol=1e-6)

    def test_hard_stop_disables_attention(self):
        B, M, T, S = 1, 2, 4, 3
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.normal(size=(B, M, T)), jnp.float32)
        align = jnp.asarray(rng.random((B, T, S)), jnp.float32)
        args = ((mel, mel, jnp.zeros((B, T)), align),
                (mel, jnp.zeros((B, T))),
                jnp.asarray([S]), jnp.asarray([T]))
        active = tacotron2_loss(*args, epoch=3,
                                guided_attention_hard_stop=5)
        stopped = tacotron2_loss(*args, epoch=7,
                                 guided_attention_hard_stop=5)
        assert float(active.attn_loss) > 0
        assert float(stopped.attn_loss) == 0.0
