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


class TestSlabStreamingKernel:
    """T-slab streaming variant (any-T lattices) vs the resident kernel
    and the oracle — covers carry hand-off across slab boundaries,
    T not a multiple of the slab, B not a multiple of the block, and
    uneven lengths whose Tl-1 row falls mid-slab."""

    def _lattices(self, logits, labels, blank=0):
        from tsasr_tpu.ops.rnnt_loss import _gather_label_blank_logprobs
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return _gather_label_blank_logprobs(lp, labels, blank)

    def _run(self, rng, B, T, U, V=10):
        from tsasr_tpu.ops.rnnt_loss_pallas import _pallas_lattice
        logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)),
                             jnp.float32)
        labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
        t_lens = jnp.asarray(rng.integers(max(1, T - 9), T + 1, size=B),
                             jnp.int32)
        u_lens = jnp.asarray(rng.integers(0, U + 1, size=B), jnp.int32)
        lpb, lpl = self._lattices(logits, labels)
        res = _pallas_lattice(lpb, lpl, t_lens, u_lens,
                              interpret=True, variant="resident")
        slab = _pallas_lattice(lpb, lpl, t_lens, u_lens,
                               interpret=True, variant="slab")
        for r, s in zip(res, slab):
            np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                       rtol=1e-5, atol=1e-6)
        return slab

    def test_multi_slab_matches_resident(self, rng):
        # T=40 spans multiple 16-row slabs incl. a padded tail
        self._run(rng, B=3, T=40, U=7)

    def test_slab_boundary_lengths(self, rng):
        # Tl-1 exactly at and adjacent to slab boundaries
        from tsasr_tpu.ops.rnnt_loss_pallas import _pallas_lattice
        B, T, U, V = 4, 33, 5, 8
        logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)),
                             jnp.float32)
        labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
        t_lens = jnp.asarray([16, 17, 32, 33], jnp.int32)
        u_lens = jnp.asarray([U, U - 2, 1, 0], jnp.int32)
        lpb, lpl = self._lattices(logits, labels)
        res = _pallas_lattice(lpb, lpl, t_lens, u_lens,
                              interpret=True, variant="resident")
        slab = _pallas_lattice(lpb, lpl, t_lens, u_lens,
                               interpret=True, variant="slab")
        for r, s in zip(res, slab):
            np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                       rtol=1e-5, atol=1e-6)

    def test_loss_matches_oracle_via_dispatch(self, rng, monkeypatch):
        # the auto dispatcher under TSASR_RNNT_SLAB=1 routes the public
        # rnnt_loss_pallas through the streaming kernels end to end
        monkeypatch.setenv("TSASR_RNNT_SLAB", "1")
        logits, labels, t_lens, u_lens = make_case(rng)
        ref = _rnnt_forward_backward(logits, labels, t_lens, u_lens, 0)
        got = rnnt_loss_pallas(logits, labels, t_lens, u_lens, 0, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4)

    def test_grads_match_oracle_via_dispatch(self, rng, monkeypatch):
        monkeypatch.setenv("TSASR_RNNT_SLAB", "1")
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
