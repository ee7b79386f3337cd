"""Sequence parallelism: halo-exchange encoder == unsharded encoder.

The reference has no sequence-parallel capability at all (DDP only,
``core.py:1464-1490``); these pin the tsasr_tpu 'seq' mesh axis
(``parallel/seq_parallel.py``) to the unsharded computation on the
virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsasr_tpu.models.conformer import TSConformerEncoder
from tsasr_tpu.parallel.mesh import make_mesh
from tsasr_tpu.parallel.seq_parallel import (
    required_halo,
    sp_encoder_apply,
)


def make_encoder(**over):
    kwargs = dict(d_model=16, nhead=2, num_layers=2, d_ffn=32,
                  kernel_size=5, dropout=0.0, causal=True,
                  att_context_size=4, injection_mode="cat",
                  injection_after=(0,))
    kwargs.update(over)
    return TSConformerEncoder(**kwargs)


def make_data(rng, B=4, T=32, F=20):
    src = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    rel = jnp.asarray([1.0, 0.8, 1.0, 0.6][:B], jnp.float32)
    spk = jnp.asarray(rng.normal(size=(B, 1, 16)), jnp.float32)
    return src, rel, spk


def valid_mask(rel, T):
    """(B, T, 1) float mask of valid frames. Rows beyond each utterance
    length are scratch in BOTH paths (different garbage is fine — every
    consumer masks by length), so comparisons restrict to valid rows."""
    abs_len = jnp.round(rel * T).astype(jnp.int32)
    return (jnp.arange(T)[None, :] < abs_len[:, None])[..., None]


class TestSeqParallelEncoder:
    def test_matches_unsharded_forward(self, rng):
        enc = make_encoder()
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        ref = enc.apply(variables, src, rel, spk)

        mesh = make_mesh(dp=2, sp=4, tp=1)
        assert mesh.shape == {"data": 2, "seq": 4, "model": 1}
        out = sp_encoder_apply(enc, variables, src, rel, mesh,
                               speaker_embs=spk)
        m = valid_mask(rel, src.shape[1])
        np.testing.assert_allclose(np.asarray(out * m),
                                   np.asarray(ref * m), atol=2e-5)

    def test_matches_unsharded_gradients(self, rng):
        enc = make_encoder()
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        mesh = make_mesh(dp=2, sp=4, tp=1)

        m = valid_mask(rel, src.shape[1])

        def loss_plain(v):
            out = enc.apply(v, src, rel, spk)
            return jnp.sum((out * m).astype(jnp.float32) ** 2)

        def loss_sp(v):
            out = sp_encoder_apply(enc, v, src, rel, mesh,
                                   speaker_embs=spk)
            return jnp.sum((out * m).astype(jnp.float32) ** 2)

        g_plain = jax.grad(loss_plain)(variables)
        g_sp = jax.jit(jax.grad(loss_sp))(variables)
        flat_p = jax.tree_util.tree_leaves_with_path(g_plain)
        flat_s = jax.tree_util.tree_leaves(g_sp)   # same treedef
        for (path, gp), gs in zip(flat_p, flat_s):
            np.testing.assert_allclose(
                np.asarray(gs), np.asarray(gp), atol=5e-4,
                err_msg=str(path))

    def test_train_mode_draws_independent_masks_per_shard(self, rng):
        enc = make_encoder(dropout=0.3)
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        mesh = make_mesh(dp=2, sp=4, tp=1)
        out = sp_encoder_apply(
            enc, variables, src, rel, mesh, speaker_embs=spk,
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(5)})
        assert np.isfinite(np.asarray(out)).all()
        # same key WITHOUT per-shard folding would repeat mask blocks;
        # the folded path must not equal the deterministic output
        det = sp_encoder_apply(enc, variables, src, rel, mesh,
                               speaker_embs=spk)
        assert not np.allclose(np.asarray(out), np.asarray(det))

    def test_requires_causal_banded(self, rng):
        src, rel, spk = make_data(rng)
        mesh = make_mesh(dp=2, sp=4, tp=1)
        enc = make_encoder(causal=False)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        with pytest.raises(ValueError, match="causal"):
            sp_encoder_apply(enc, variables, src, rel, mesh,
                             speaker_embs=spk)

    def test_halo_must_fit_one_block(self, rng):
        enc = make_encoder(att_context_size=16)   # halo 19 > T_loc 8
        src, rel, spk = make_data(rng)
        variables = enc.init(jax.random.PRNGKey(0), src, rel, spk)
        mesh = make_mesh(dp=2, sp=4, tp=1)
        with pytest.raises(ValueError, match="halo"):
            sp_encoder_apply(enc, variables, src, rel, mesh,
                             speaker_embs=spk)

    def test_required_halo(self):
        assert required_halo(4, 5) == 7
        assert required_halo(1, 1) == 0
