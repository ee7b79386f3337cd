"""Fused Pallas rel-pos attention vs the jnp oracle (interpret mode on
CPU; the compiled path is exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsasr_tpu.ops.attention_pallas import (
    fused_relpos_attention,
    relpos_attention_reference,
)


def make_case(rng, B=2, H=3, T=10, Dh=5, masked=True):
    qu = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    qv = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(H, 2 * T - 1, Dh)), jnp.float32)
    if masked:
        # one short sequence + a causal-style mask triangle
        kp = jnp.where(jnp.arange(T)[None, :]
                       < jnp.asarray([[T], [T - 4]])[:B], 0.0, -1e9)
        am = jnp.where(jnp.triu(jnp.ones((T, T)), 3) > 0, -1e9, 0.0)
    else:
        kp = jnp.zeros((B, T))
        am = jnp.zeros((T, T))
    return qu, qv, k, v, p, kp.astype(jnp.float32), am.astype(jnp.float32)


SEED = jnp.asarray(123.0, jnp.float32)
SCALE = 0.125


class TestFusedAttentionInterpret:
    @pytest.mark.parametrize("masked", [False, True])
    def test_forward_matches_reference(self, rng, masked):
        qu, qv, k, v, p, kp, am = make_case(rng, masked=masked)
        ref = relpos_attention_reference(qu, qv, k, v, p, kp, am, SCALE)
        got = fused_relpos_attention(qu, qv, k, v, p, kp, am, SEED,
                                     SCALE, 0.0, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_grads_match_reference(self, rng):
        qu, qv, k, v, p, kp, am = make_case(rng)
        w = jnp.asarray(np.random.default_rng(5).normal(
            size=qu.shape), jnp.float32)

        def loss_ref(args):
            return jnp.sum(relpos_attention_reference(
                *args, kp, am, SCALE) * w)

        def loss_fused(args):
            return jnp.sum(fused_relpos_attention(
                *args, kp, am, SEED, SCALE, 0.0, True) * w)

        g_ref = jax.grad(loss_ref)((qu, qv, k, v, p))
        g_fused = jax.grad(loss_fused)((qu, qv, k, v, p))
        for name, a, b in zip("qu qv k v p".split(), g_ref, g_fused):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5,
                err_msg=f"grad mismatch: {name}")

    def test_module_fused_path_matches_standard(self, rng, monkeypatch):
        """RelPosMHAXL(fused=True) == the standard XLA path
        (deterministic; interpret mode forced via env)."""
        from tsasr_tpu.models.attention import (
            RelPosMHAXL,
            rel_pos_encoding,
        )

        monkeypatch.setenv("TSASR_ATTN_INTERPRET", "1")
        B, T, D, H = 2, 11, 16, 4
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        pe = rel_pos_encoding(T, D)
        kp = jnp.arange(T)[None, :] >= jnp.asarray([[T], [T - 3]])[:B]
        am = jnp.triu(jnp.ones((T, T), bool), 2)

        std = RelPosMHAXL(embed_dim=D, num_heads=H)
        fus = RelPosMHAXL(embed_dim=D, num_heads=H, fused=True)
        params = std.init(jax.random.PRNGKey(0), x, pe)
        out_std, attn = std.apply(params, x, pe, key_padding_mask=kp,
                                  attn_mask=am)
        out_fus, attn_f = fus.apply(params, x, pe, key_padding_mask=kp,
                                    attn_mask=am)
        assert attn_f is None
        np.testing.assert_allclose(np.asarray(out_std),
                                   np.asarray(out_fus), atol=3e-5)

    def test_larger_odd_shapes(self, rng):
        # T spanning more roll bits, Dh not a divisor of the lane width
        qu, qv, k, v, p, kp, am = make_case(rng, B=1, H=2, T=37, Dh=12)
        ref = relpos_attention_reference(qu, qv, k, v, p, kp, am, SCALE)
        got = fused_relpos_attention(qu, qv, k, v, p, kp, am, SEED,
                                     SCALE, 0.0, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5)
