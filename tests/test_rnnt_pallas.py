"""Pallas RNN-T kernel vs the XLA wavefront oracle (interpret mode on
CPU; the compiled path is exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tsasr_tpu.ops.rnnt_loss import _rnnt_forward_backward
from tsasr_tpu.ops.rnnt_loss_pallas import rnnt_loss_pallas


def make_case(rng, B=3, T=12, U=7, V=10):
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    t_lens = jnp.asarray([T, T - 3, T - 7][:B], jnp.int32)
    u_lens = jnp.asarray([U, U - 3, 0][:B], jnp.int32)
    return logits, labels, t_lens, u_lens


class TestPallasKernel:
    def test_loss_matches_oracle(self, rng):
        logits, labels, t_lens, u_lens = make_case(rng)
        ref = _rnnt_forward_backward(logits, labels, t_lens, u_lens, 0)
        got = rnnt_loss_pallas(logits, labels, t_lens, u_lens, 0, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4)

    def test_grads_match_oracle(self, rng):
        logits, labels, t_lens, u_lens = make_case(rng)

        def f_ref(lg):
            return jnp.sum(_rnnt_forward_backward(lg, labels, t_lens,
                                                  u_lens, 0))

        def f_pk(lg):
            return jnp.sum(rnnt_loss_pallas(lg, labels, t_lens, u_lens,
                                            0, True))

        g_ref = jax.grad(f_ref)(logits)
        g_pk = jax.grad(f_pk)(logits)
        np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref),
                                   atol=5e-4)

    def test_batch_padding_to_block(self, rng):
        # B=5 forces padding to the kernel's batch block
        logits, labels, t_lens, u_lens = make_case(rng, B=3)
        logits5 = jnp.concatenate([logits, logits[:2]], axis=0)
        labels5 = jnp.concatenate([labels, labels[:2]], axis=0)
        t5 = jnp.concatenate([t_lens, t_lens[:2]])
        u5 = jnp.concatenate([u_lens, u_lens[:2]])
        ref = _rnnt_forward_backward(logits5, labels5, t5, u5, 0)
        got = rnnt_loss_pallas(logits5, labels5, t5, u5, 0, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4)

    def test_nonzero_blank(self, rng):
        B, T, U, V = 2, 8, 4, 6
        blank = 3
        logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)),
                             jnp.float32)
        labels_np = rng.integers(0, V - 1, size=(B, U))
        labels_np[labels_np >= blank] += 1
        labels = jnp.asarray(labels_np, jnp.int32)
        t_lens = jnp.asarray([T, T - 2], jnp.int32)
        u_lens = jnp.asarray([U, U - 1], jnp.int32)
        ref = _rnnt_forward_backward(logits, labels, t_lens, u_lens,
                                     blank)
        got = rnnt_loss_pallas(logits, labels, t_lens, u_lens, blank,
                               True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4)


class TestPallasSharded:
    def test_shard_mapped_matches_single_device(self, rng):
        """shard_map-wrapped kernel over a (data=4, model=2) mesh ==
        single-device values and grads (the multi-chip production
        path; VERDICT r1 item 2)."""
        from tsasr_tpu.ops.rnnt_loss_pallas import rnnt_loss_pallas_sharded
        from tsasr_tpu.parallel.mesh import make_mesh, shard_batch

        logits, labels, t_lens, u_lens = make_case(rng, B=3)
        logits = jnp.concatenate([logits] * 3, axis=0)[:8]
        labels = jnp.concatenate([labels] * 3, axis=0)[:8]
        t_lens = jnp.concatenate([t_lens] * 3)[:8]
        u_lens = jnp.concatenate([u_lens] * 3)[:8]

        ref = _rnnt_forward_backward(logits, labels, t_lens, u_lens, 0)
        g_ref = jax.grad(lambda lg: jnp.sum(_rnnt_forward_backward(
            lg, labels, t_lens, u_lens, 0)))(logits)

        mesh = make_mesh(dp=4, tp=2)
        batch = shard_batch({"lg": np.asarray(logits),
                             "lb": np.asarray(labels),
                             "tl": np.asarray(t_lens),
                             "ul": np.asarray(u_lens)}, mesh)

        def loss_sum(lg):
            return jnp.sum(rnnt_loss_pallas_sharded(
                lg, batch["lb"], batch["tl"], batch["ul"], 0,
                mesh=mesh, interpret=True))

        with mesh:
            got = jax.jit(lambda lg: rnnt_loss_pallas_sharded(
                lg, batch["lb"], batch["tl"], batch["ul"], 0,
                mesh=mesh, interpret=True))(batch["lg"])
            g_got = jax.jit(jax.grad(loss_sum))(batch["lg"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=5e-4)
