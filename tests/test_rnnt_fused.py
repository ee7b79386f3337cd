"""Fused joint+head+RNN-T loss (ops.rnnt_loss_fused) vs the unfused
composition: loss and all four gradients (enc, dec, head_w, head_b)
must match the autodiff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsasr_tpu.ops.rnnt_loss import rnnt_loss
from tsasr_tpu.ops.rnnt_loss_fused import rnnt_loss_fused


def _make_problem(rng, B=3, T=11, U=6, J=16, V=7, dtype=jnp.float32):
    enc = jnp.asarray(rng.normal(size=(B, T, J)), dtype)
    dec = jnp.asarray(rng.normal(size=(B, U + 1, J)), dtype)
    w = jnp.asarray(rng.normal(size=(J, V)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    t_lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    u_lens = jnp.asarray(rng.integers(0, U + 1, size=(B,)), jnp.int32)
    return enc, dec, w, b, labels, t_lens, u_lens


def _unfused(enc, dec, w, b, labels, t_lens, u_lens, blank=0):
    joint = jax.nn.leaky_relu(enc[:, :, None, :] + dec[:, None, :, :])
    logits = joint @ w.astype(joint.dtype) + b.astype(joint.dtype)
    return rnnt_loss(logits, labels, t_lens, u_lens, blank=blank,
                     reduction="none", use_pallas=False)


class TestFusedLoss:
    @pytest.mark.parametrize("chunk", [1, 4, 8, 32])
    def test_loss_matches_unfused(self, rng, chunk):
        args = _make_problem(rng)
        ref = _unfused(*args)
        got = rnnt_loss_fused(*args, chunk=chunk, use_pallas=False)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("chunk", [3, 8])
    def test_grads_match_autodiff(self, rng, chunk):
        enc, dec, w, b, labels, t_lens, u_lens = _make_problem(rng)
        weights = jnp.asarray(rng.uniform(0.5, 1.5, size=(enc.shape[0],)),
                              jnp.float32)

        def loss_ref(e, d, wi, bi):
            return jnp.sum(_unfused(e, d, wi, bi, labels, t_lens,
                                    u_lens) * weights)

        def loss_fused(e, d, wi, bi):
            return jnp.sum(rnnt_loss_fused(
                e, d, wi, bi, labels, t_lens, u_lens, chunk=chunk,
                use_pallas=False) * weights)

        ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(enc, dec, w, b)
        got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(enc, dec, w, b)
        for r, g, name in zip(ref, got, ["enc", "dec", "w", "b"]):
            np.testing.assert_allclose(
                g, r, rtol=2e-4, atol=2e-5,
                err_msg=f"gradient mismatch for {name}")

    def test_nonzero_blank(self, rng):
        enc, dec, w, b, labels, t_lens, u_lens = _make_problem(rng)
        labels = jnp.where(labels == 3, 0, labels)   # blank=3 -> avoid it
        ref = _unfused(enc, dec, w, b, labels, t_lens, u_lens, blank=3)
        got = rnnt_loss_fused(enc, dec, w, b, labels, t_lens, u_lens,
                              blank=3, chunk=4, use_pallas=False)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_zero_label_length_and_chunk_gt_T(self, rng):
        enc, dec, w, b, labels, t_lens, u_lens = _make_problem(rng, T=5)
        u_lens = u_lens.at[0].set(0)
        ref = _unfused(enc, dec, w, b, labels, t_lens, u_lens)
        got = rnnt_loss_fused(enc, dec, w, b, labels, t_lens, u_lens,
                              chunk=16, use_pallas=False)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_under_jit(self, rng):
        enc, dec, w, b, labels, t_lens, u_lens = _make_problem(rng)

        @jax.jit
        def f(e, d, wi, bi):
            return rnnt_loss_fused(e, d, wi, bi, labels, t_lens, u_lens,
                                   chunk=4, use_pallas=False)

        np.testing.assert_allclose(
            f(enc, dec, w, b),
            _unfused(enc, dec, w, b, labels, t_lens, u_lens),
            rtol=1e-5, atol=1e-5)

    def test_bf16_inputs(self, rng):
        enc, dec, w, b, labels, t_lens, u_lens = _make_problem(
            rng, dtype=jnp.bfloat16)
        ref = _unfused(enc, dec, w, b, labels, t_lens, u_lens)
        got = rnnt_loss_fused(enc, dec, w, b, labels, t_lens, u_lens,
                              chunk=4, use_pallas=False)
        np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)
        g = jax.grad(lambda e: jnp.sum(rnnt_loss_fused(
            e, dec, w, b, labels, t_lens, u_lens, chunk=4,
            use_pallas=False)))(enc)
        assert g.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))

    def test_sharded_matches_single(self, rng):
        from tsasr_tpu.parallel.mesh import make_mesh

        enc, dec, w, b, labels, t_lens, u_lens = _make_problem(rng, B=8)
        mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
        ref = rnnt_loss_fused(enc, dec, w, b, labels, t_lens, u_lens,
                              chunk=4, use_pallas=False)
        got = rnnt_loss_fused(enc, dec, w, b, labels, t_lens, u_lens,
                              chunk=4, use_pallas=False, mesh=mesh)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

        # head-weight grads must be psum-reduced across shards
        weights = jnp.ones((8,), jnp.float32)

        def lf(wi, use_mesh):
            return jnp.sum(rnnt_loss_fused(
                enc, dec, wi, b, labels, t_lens, u_lens, chunk=4,
                use_pallas=False, mesh=mesh if use_mesh else None)
                * weights)

        gw_ref = jax.grad(lambda wi: lf(wi, False))(w)
        gw_got = jax.grad(lambda wi: lf(wi, True))(w)
        np.testing.assert_allclose(gw_got, gw_ref, rtol=1e-4, atol=1e-5)

    def test_model_fused_matches_unfused(self, rng):
        """encode_predict + rnnt_loss_fused (with head params pulled
        from the variables tree, as the recipe does) reproduces
        __call__ + rnnt_loss — loss and full-params gradients."""
        from tsasr_tpu.models.transducer import (TSTransducer,
                                                 TSTransducerConfig)

        cfg = TSTransducerConfig(
            encoder_num_layers=2, speaker_encoder_layers=1, d_model=32,
            nhead=2, d_ffn=64, joint_dim=32, vocab_size=12, n_mels=24,
            decoder_neurons=16, injection_mode=None,
            use_speaker_encoder=False)
        model = TSTransducer(cfg)
        B, T, U = 2, 19, 6
        feats = jnp.asarray(rng.normal(size=(B, T, 24)), jnp.float32)
        rel = jnp.array([1.0, 0.7])
        tokens_bos = jnp.asarray(
            rng.integers(1, 12, size=(B, U + 1)),
            jnp.int32).at[:, 0].set(0)
        tokens = tokens_bos[:, 1:]
        u_lens = jnp.array([U, U - 2], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, rel, tokens_bos)

        def loss_unfused(p):
            logits, _ = model.apply(p, feats, rel, tokens_bos)
            t_lens = jnp.round(rel * logits.shape[1]).astype(jnp.int32)
            return jnp.sum(rnnt_loss(logits, tokens, t_lens, u_lens,
                                     reduction="none", use_pallas=False))

        def loss_fused(p):
            enc, dec = model.apply(p, feats, rel, tokens_bos,
                                   method=model.encode_predict)
            head = p["params"]["transducer_head"]
            t_lens = jnp.round(rel * enc.shape[1]).astype(jnp.int32)
            return jnp.sum(rnnt_loss_fused(
                enc, dec, head["kernel"], head["bias"], tokens, t_lens,
                u_lens, chunk=4, use_pallas=False))

        np.testing.assert_allclose(loss_fused(params),
                                   loss_unfused(params), rtol=1e-5)
        g_ref = jax.grad(loss_unfused)(params)
        g_got = jax.grad(loss_fused)(params)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_got = jax.tree_util.tree_leaves_with_path(g_got)
        assert len(flat_ref) == len(flat_got)
        for (pr, r), (pg, g) in zip(flat_ref, flat_got):
            assert pr == pg
            np.testing.assert_allclose(
                g, r, rtol=5e-4, atol=1e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(pr)}")

    def test_recipe_fused_flag_flow_through(self, rng):
        """TSASRBrain.compute_forward/objectives with fused_joint_loss
        on vs off produce the same loss at f32."""
        from tsasr_tpu.models.transducer import (TSTransducer,
                                                 TSTransducerConfig)
        from tsasr_tpu.recipes.librispeechmix import TSASRBrain
        from tsasr_tpu.utils.stage import Stage

        cfg = TSTransducerConfig(
            encoder_num_layers=1, d_model=32, nhead=2, d_ffn=64,
            joint_dim=32, vocab_size=12, n_mels=24, decoder_neurons=16,
            injection_mode=None, use_speaker_encoder=False)
        model = TSTransducer(cfg)
        h = {"sample_rate": 16000, "n_fft": 512, "n_mels": 24,
             "win_length": 32, "augment": False, "blank_index": 0,
             "vocab_size": 12}
        wav = np.asarray(rng.normal(size=(2, 8000)) * 0.1, np.float32)
        batch = {"mixed_sig": wav,
                 "mixed_lens": np.array([1.0, 0.8], np.float32),
                 "tokens_bos": np.asarray(
                     rng.integers(1, 12, size=(2, 7)), np.int32),
                 "tokens_lens": np.array([1.0, 1.0], np.float32),
                 "weight": np.ones(2, np.float32)}
        batch["tokens_bos"][:, 0] = 0
        batch["tokens"] = batch["tokens_bos"][:, 1:]

        losses = {}
        for fused in (True, False):
            brain = TSASRBrain(
                modules={"model": model},
                hparams=dict(h, fused_joint_loss=fused),
                variant="none")
            assert brain._fused_loss_active() == fused
            params = brain._init_params(jax.random.PRNGKey(0), batch)
            preds = brain.compute_forward(params, batch, Stage.VALID,
                                          jax.random.PRNGKey(1))
            assert isinstance(preds[0], tuple) == fused
            losses[fused] = float(brain.compute_objectives(
                preds, batch, Stage.VALID))
        np.testing.assert_allclose(losses[True], losses[False],
                                   rtol=1e-5)

    def test_pallas_interpret_solver(self, rng):
        """use_pallas=True exercises the Pallas lattice solver in
        interpret mode on CPU (same path the TPU takes)."""
        from tsasr_tpu.ops import rnnt_loss_fused as mod

        enc, dec, w, b, labels, t_lens, u_lens = _make_problem(rng)
        ref = _unfused(enc, dec, w, b, labels, t_lens, u_lens)

        orig = mod._solve_lattice

        def interp_solver(lpb, lpl, tl, ul, use_pallas):
            from tsasr_tpu.ops.rnnt_loss_pallas import _pallas_lattice
            return _pallas_lattice(lpb, lpl, tl.astype(jnp.int32),
                                   ul.astype(jnp.int32), interpret=True)

        mod._solve_lattice = interp_solver
        try:
            got = rnnt_loss_fused(enc, dec, w, b, labels, t_lens, u_lens,
                                  chunk=4)
        finally:
            mod._solve_lattice = orig
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
