"""RNN-T loss tests: brute-force oracle, reference-scan, wavefront, grads.

Mirrors the reference's value-pinned kernel test strategy
(``vendor/speechbrain/tests/unittests/test_losses.py:109-153``) but checks
against an exhaustive path-enumeration oracle instead of a pinned constant,
plus gradient checks the reference never had.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsasr_tpu.ops.rnnt_loss import (
    rnnt_loss,
    rnnt_loss_reference,
    transducer_loss,
    _rnnt_forward_backward,
)


def brute_force_rnnt_nll(log_probs, labels, T, U, blank):
    """Sum over all monotonic lattice paths by dynamic programming in
    plain Python floats (log-space, exhaustive recurrence)."""
    import math

    alpha = {}
    alpha[(0, 0)] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if (t, u) == (0, 0):
                continue
            terms = []
            if t > 0 and (t - 1, u) in alpha:
                terms.append(alpha[(t - 1, u)] + log_probs[t - 1, u, blank])
            if u > 0 and (t, u - 1) in alpha:
                terms.append(alpha[(t, u - 1)]
                             + log_probs[t, u - 1, labels[u - 1]])
            if terms:
                m = max(terms)
                alpha[(t, u)] = m + math.log(
                    sum(math.exp(x - m) for x in terms))
    return -(alpha[(T - 1, U)] + log_probs[T - 1, U, blank])


def make_case(rng, B=3, T=6, U=4, V=5):
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    t_lens = jnp.asarray([T, T - 1, T - 2][:B], jnp.int32)
    u_lens = jnp.asarray([U, U - 1, U - 2][:B], jnp.int32)
    return logits, labels, t_lens, u_lens


class TestAgainstBruteForce:
    def test_wavefront_matches_bruteforce(self, rng):
        logits, labels, t_lens, u_lens = make_case(rng)
        losses = rnnt_loss(logits, labels, t_lens, u_lens, blank=0,
                           reduction="none", use_pallas=False)
        log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        for b in range(logits.shape[0]):
            expected = brute_force_rnnt_nll(
                log_probs[b], np.asarray(labels[b]), int(t_lens[b]),
                int(u_lens[b]), blank=0)
            np.testing.assert_allclose(losses[b], expected, rtol=1e-5)

    def test_reference_scan_matches_bruteforce(self, rng):
        logits, labels, t_lens, u_lens = make_case(rng)
        losses = rnnt_loss_reference(logits, labels, t_lens, u_lens, blank=0)
        log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        for b in range(logits.shape[0]):
            expected = brute_force_rnnt_nll(
                log_probs[b], np.asarray(labels[b]), int(t_lens[b]),
                int(u_lens[b]), blank=0)
            np.testing.assert_allclose(losses[b], expected, rtol=1e-5)

    def test_nonzero_blank_index(self, rng):
        B, T, U, V = 2, 5, 3, 6
        blank = 2
        logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
        labels_np = rng.integers(0, V - 1, size=(B, U))
        labels_np[labels_np >= blank] += 1  # targets exclude the blank
        labels = jnp.asarray(labels_np, jnp.int32)
        t_lens = jnp.asarray([T, T - 1], jnp.int32)
        u_lens = jnp.asarray([U, U - 1], jnp.int32)
        losses = rnnt_loss(logits, labels, t_lens, u_lens, blank=blank,
                           reduction="none", use_pallas=False)
        log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        for b in range(B):
            expected = brute_force_rnnt_nll(
                log_probs[b], labels_np[b], int(t_lens[b]), int(u_lens[b]),
                blank=blank)
            np.testing.assert_allclose(losses[b], expected, rtol=1e-5)


class TestGradients:
    def test_analytic_grad_matches_autodiff(self, rng):
        logits, labels, t_lens, u_lens = make_case(rng, B=2, T=5, U=3, V=4)

        def loss_custom(lg):
            return jnp.sum(_rnnt_forward_backward(lg, labels, t_lens,
                                                  u_lens, 0))

        def loss_auto(lg):
            return jnp.sum(rnnt_loss_reference(lg, labels, t_lens, u_lens, 0))

        g_custom = jax.grad(loss_custom)(logits)
        g_auto = jax.grad(loss_auto)(logits)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                                   atol=1e-4, rtol=1e-4)

    def test_grad_zero_outside_valid_region(self, rng):
        logits, labels, t_lens, u_lens = make_case(rng, B=2, T=6, U=4, V=5)
        g = jax.grad(lambda lg: jnp.sum(
            _rnnt_forward_backward(lg, labels, t_lens, u_lens, 0)))(logits)
        g = np.asarray(g)
        for b in range(2):
            T_b, U_b = int(t_lens[b]), int(u_lens[b])
            if T_b < g.shape[1]:
                assert np.abs(g[b, T_b:]).max() == 0.0
            if U_b + 1 < g.shape[2]:
                assert np.abs(g[b, :, U_b + 1:]).max() == 0.0

    def test_grad_under_jit_and_padding_invariance(self, rng):
        # Padding must not change loss/grad of the valid region.
        logits, labels, t_lens, u_lens = make_case(rng, B=1, T=4, U=2, V=5)
        loss1 = jax.jit(lambda lg: rnnt_loss(
            lg, labels, t_lens, u_lens, reduction="sum",
            use_pallas=False))(logits)
        pad_logits = jnp.pad(logits, ((0, 0), (0, 3), (0, 2), (0, 0)))
        pad_labels = jnp.pad(labels, ((0, 0), (0, 2)))
        loss2 = jax.jit(lambda lg: rnnt_loss(
            lg, pad_labels, t_lens, u_lens, reduction="sum",
            use_pallas=False))(pad_logits)
        np.testing.assert_allclose(loss1, loss2, rtol=1e-5)


class TestWrapper:
    def test_relative_length_rounding(self, rng):
        # (lens * shape).round() convention from nnet/losses.py:58-59.
        logits, labels, t_lens, u_lens = make_case(rng)
        T, U = logits.shape[1], labels.shape[1]
        rel_t = t_lens.astype(jnp.float32) / T
        rel_u = u_lens.astype(jnp.float32) / U
        l1 = transducer_loss(logits, labels, rel_t, rel_u, blank_index=0,
                             use_pallas=False)
        l2 = rnnt_loss(logits, labels, t_lens, u_lens, reduction="mean",
                       use_pallas=False)
        np.testing.assert_allclose(l1, l2, rtol=1e-6)

    @pytest.mark.parametrize("reduction", ["mean", "batchmean", "sum"])
    def test_reductions(self, rng, reduction):
        logits, labels, t_lens, u_lens = make_case(rng)
        per_utt = rnnt_loss(logits, labels, t_lens, u_lens,
                            reduction="none", use_pallas=False)
        red = rnnt_loss(logits, labels, t_lens, u_lens,
                        reduction=reduction, use_pallas=False)
        expected = {"mean": jnp.mean(per_utt),
                    "batchmean": jnp.sum(per_utt) / per_utt.shape[0],
                    "sum": jnp.sum(per_utt)}[reduction]
        np.testing.assert_allclose(red, expected, rtol=1e-6)

    def test_empty_target(self, rng):
        # U_len = 0: the only path is all blanks.
        B, T, V = 1, 4, 3
        logits = jnp.asarray(rng.normal(size=(B, T, 2, V)), jnp.float32)
        labels = jnp.asarray([[1]], jnp.int32)
        loss = rnnt_loss(logits, labels, jnp.asarray([T]), jnp.asarray([0]),
                         reduction="sum", use_pallas=False)
        log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        expected = -log_probs[0, :, 0, 0].sum()
        np.testing.assert_allclose(loss, expected, rtol=1e-5)
