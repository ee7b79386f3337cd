"""Banded (pruned) RNN-T loss vs the full-lattice oracle.

Exactness: with band width W >= U+1 the band covers the whole lattice,
so values and gradients must equal the wavefront oracle. Narrow bands
prune paths, so the NLL can only increase, and for peaked (trained-like)
distributions the gap must be small.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tsasr_tpu.ops.rnnt_loss import _rnnt_forward_backward
from tsasr_tpu.ops.rnnt_loss_banded import band_centers, rnnt_loss_banded


def make_case(rng, B=3, T=12, U=7, V=10):
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    t_lens = jnp.asarray([T, T - 3, T - 7][:B], jnp.int32)
    u_lens = jnp.asarray([U, U - 3, 0][:B], jnp.int32)
    return logits, labels, t_lens, u_lens


def band_gather(logits, centers, W):
    """Full (B,T,U1,V) logits -> banded (B,T,W,V) via the same gather
    the model-side joint uses."""
    B, T, U1, V = logits.shape
    idx = jnp.clip(centers[:, :, None] + jnp.arange(W)[None, None, :],
                   0, U1 - 1)
    return jnp.take_along_axis(logits, idx[..., None], axis=2)


class TestBandedExact:
    def test_covering_band_matches_oracle(self, rng):
        logits, labels, t_lens, u_lens = make_case(rng)
        B, T, U1, V = logits.shape
        W = U1  # covers the whole lattice
        centers = band_centers(t_lens, u_lens, T, W)
        assert int(jnp.max(centers)) == 0
        lb = band_gather(logits, centers, W)
        got = rnnt_loss_banded(lb, labels, centers, t_lens, u_lens,
                               reduction="none")
        ref = _rnnt_forward_backward(logits, labels, t_lens, u_lens, 0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5)

    def test_covering_band_grads_match_oracle(self, rng):
        logits, labels, t_lens, u_lens = make_case(rng)
        B, T, U1, V = logits.shape
        W = U1
        centers = band_centers(t_lens, u_lens, T, W)

        def f_band(lg):
            lb = band_gather(lg, centers, W)
            return jnp.sum(rnnt_loss_banded(lb, labels, centers, t_lens,
                                            u_lens, reduction="none"))

        def f_ref(lg):
            return jnp.sum(_rnnt_forward_backward(lg, labels, t_lens,
                                                  u_lens, 0))

        g_band = jax.grad(f_band)(logits)
        g_ref = jax.grad(f_ref)(logits)
        np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_ref),
                                   atol=5e-4)

    def test_narrow_band_upper_bounds_nll(self, rng):
        logits, labels, t_lens, u_lens = make_case(rng, B=2, T=16, U=10)
        T = logits.shape[1]
        W = 4
        centers = band_centers(t_lens, u_lens, T, W)
        lb = band_gather(logits, centers, W)
        got = rnnt_loss_banded(lb, labels, centers, t_lens, u_lens,
                               reduction="none")
        ref = _rnnt_forward_backward(logits, labels, t_lens, u_lens, 0)
        assert np.all(np.asarray(got) >= np.asarray(ref) - 1e-4)
        assert np.all(np.isfinite(np.asarray(got)))

    def test_peaked_distribution_small_gap(self, rng):
        """A near-deterministic diagonal alignment loses almost nothing
        to a narrow band (the trained-model regime)."""
        B, T, U, V = 1, 20, 9, 8
        labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
        # favor: emit label k around t = 2k+1, blanks elsewhere
        logits = np.full((B, T, U + 1, V), -8.0, np.float32)
        logits[..., 0] = 0.0  # blank default
        for u in range(U):
            t_star = min(2 * u + 1, T - 1)
            lab = int(labels[0, u])
            logits[0, t_star, u, 0] = -8.0
            logits[0, t_star, u, lab] = 4.0
        logits = jnp.asarray(logits)
        t_lens = jnp.asarray([T], jnp.int32)
        u_lens = jnp.asarray([U], jnp.int32)
        ref = _rnnt_forward_backward(logits, labels, t_lens, u_lens, 0)
        W = 8
        centers = band_centers(t_lens, u_lens, T, W)
        lb = band_gather(logits, centers, W)
        got = rnnt_loss_banded(lb, labels, centers, t_lens, u_lens,
                               reduction="none")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3)


class TestModelBandedJoint:
    def test_joint_logits_banded_matches_full_slice(self, rng):
        from tsasr_tpu.models.transducer import (
            TSTransducer,
            TSTransducerConfig,
        )
        cfg = TSTransducerConfig(
            vocab_size=8, encoder_num_layers=1, d_model=32, nhead=4,
            d_ffn=64, joint_dim=48, decoder_neurons=24, dropout=0.0,
            injection_mode=None, use_speaker_encoder=False)
        model = TSTransducer(cfg)
        B, T, U = 2, 10, 5
        feats = jnp.asarray(rng.normal(size=(B, 41, 80)), jnp.float32)
        rel = jnp.ones(B)
        tokens_bos = jnp.asarray(rng.integers(0, 8, size=(B, U + 1)),
                                 jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, rel, tokens_bos)
        logits_full, _ = model.apply(params, feats, rel, tokens_bos)
        Tp = logits_full.shape[1]
        W = 3
        t_lens = jnp.full((B,), Tp, jnp.int32)
        u_lens = jnp.full((B,), U, jnp.int32)
        centers = band_centers(t_lens, u_lens, Tp, W)

        enc = model.apply(params, feats, rel, method="encode")
        dec, _ = model.apply(params, tokens_bos, method="predict")
        lb = model.apply(params, enc, dec, centers, W,
                         method="joint_logits_banded")
        ref = band_gather(logits_full, centers, W)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(ref),
                                   atol=1e-5)
