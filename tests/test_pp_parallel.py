"""Pipeline parallelism: GPipe-scheduled encoder == sequential encoder.

The reference has no pipeline-parallel capability at all (DDP only,
``core.py:1464-1490``); these pin the tsasr_tpu 'pipe' mesh axis
(``parallel/pp_parallel.py`` — layer blocks per device, microbatched
activation streaming over ppermute) to the unsharded computation on the
virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsasr_tpu.models.conformer import TSConformerEncoder
from tsasr_tpu.parallel.mesh import make_mesh
from tsasr_tpu.parallel.pp_parallel import pp_encoder_apply


def make_encoder(**over):
    kwargs = dict(d_model=16, nhead=2, num_layers=4, d_ffn=32,
                  kernel_size=5, dropout=0.0,
                  injection_mode="prod", injection_after=(0, 2))
    kwargs.update(over)
    return TSConformerEncoder(**kwargs)


def make_data(rng, B=8, T=12, F=20):
    src = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    rel = jnp.asarray([1.0, 0.8, 1.0, 0.6] * (B // 4), jnp.float32)
    spk = jnp.asarray(rng.normal(size=(B, 1, 16)), jnp.float32)
    return src, rel, spk


def valid_mask(rel, T):
    abs_len = jnp.round(rel * T).astype(jnp.int32)
    return (jnp.arange(T)[None, :] < abs_len[:, None])[..., None]


class TestPipelineParallelEncoder:
    def test_matches_sequential_forward(self, rng):
        enc = make_encoder()
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        ref = enc.apply(variables, src, rel, spk)

        mesh = make_mesh(dp=2, pp=4, tp=1)
        assert mesh.shape == {"data": 2, "pipe": 4, "model": 1}
        out = pp_encoder_apply(enc, variables, src, rel, mesh,
                               speaker_embs=spk)
        m = valid_mask(rel, src.shape[1])
        np.testing.assert_allclose(np.asarray(out * m),
                                   np.asarray(ref * m), atol=2e-5)

    def test_matches_sequential_forward_cat_injection_at_minus1(self, rng):
        enc = make_encoder(injection_mode="cat", injection_after=(-1,))
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        ref = enc.apply(variables, src, rel, spk)
        mesh = make_mesh(dp=2, pp=4, tp=1)
        out = pp_encoder_apply(enc, variables, src, rel, mesh,
                               speaker_embs=spk)
        m = valid_mask(rel, src.shape[1])
        np.testing.assert_allclose(np.asarray(out * m),
                                   np.asarray(ref * m), atol=2e-5)

    def test_more_microbatches_than_stages(self, rng):
        enc = make_encoder()
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        ref = enc.apply(variables, src, rel, spk)
        mesh = make_mesh(dp=1, pp=4, tp=1, devices=jax.devices()[:4])
        # 8 utterances on one data shard -> M=8 microbatches of 1
        out = pp_encoder_apply(enc, variables, src, rel, mesh,
                               speaker_embs=spk, n_micro=8)
        m = valid_mask(rel, src.shape[1])
        np.testing.assert_allclose(np.asarray(out * m),
                                   np.asarray(ref * m), atol=2e-5)

    def test_matches_sequential_gradients(self, rng):
        enc = make_encoder()
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        mesh = make_mesh(dp=2, pp=4, tp=1)
        m = valid_mask(rel, src.shape[1])

        def loss_plain(v):
            out = enc.apply(v, src, rel, spk)
            return jnp.sum((out * m).astype(jnp.float32) ** 2)

        def loss_pp(v):
            out = pp_encoder_apply(enc, v, src, rel, mesh,
                                   speaker_embs=spk)
            return jnp.sum((out * m).astype(jnp.float32) ** 2)

        g_plain = jax.grad(loss_plain)(variables)
        g_pp = jax.jit(jax.grad(loss_pp))(variables)
        flat_p = jax.tree_util.tree_leaves_with_path(g_plain)
        flat_s = jax.tree_util.tree_leaves(g_pp)   # same treedef
        for (path, gp), gs in zip(flat_p, flat_s):
            np.testing.assert_allclose(
                np.asarray(gs), np.asarray(gp), atol=5e-4,
                err_msg=str(path))

    def test_train_mode_finite_and_stochastic(self, rng):
        enc = make_encoder(dropout=0.3)
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        mesh = make_mesh(dp=2, pp=4, tp=1)
        out = pp_encoder_apply(
            enc, variables, src, rel, mesh, speaker_embs=spk,
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(5)})
        assert np.isfinite(np.asarray(out)).all()
        det = pp_encoder_apply(enc, variables, src, rel, mesh,
                               speaker_embs=spk)
        assert not np.allclose(np.asarray(out), np.asarray(det))

    def test_rejects_mid_stack_parameterized_injection(self, rng):
        enc = make_encoder(injection_mode="cat", injection_after=(1,))
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        mesh = make_mesh(dp=2, pp=4, tp=1)
        with pytest.raises(ValueError, match="elementwise"):
            pp_encoder_apply(enc, variables, src, rel, mesh,
                             speaker_embs=spk)

    def test_rejects_indivisible_layers(self, rng):
        enc = make_encoder(num_layers=3, injection_after=(0,))
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        mesh = make_mesh(dp=2, pp=4, tp=1)
        with pytest.raises(ValueError, match="num_layers"):
            pp_encoder_apply(enc, variables, src, rel, mesh,
                             speaker_embs=spk)
