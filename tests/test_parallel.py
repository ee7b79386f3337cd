"""Parallelism correctness: TP-sharded loss == single-device loss,
DP batch sharding, gradient-accumulation equivalence.

The reference never tests its distributed paths (SURVEY.md §4.6); these
run on the virtual 8-device CPU mesh.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tsasr_tpu.models.transducer import TSTransducer, TSTransducerConfig
from tsasr_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    shard_batch,
)


def tiny_model():
    cfg = TSTransducerConfig(
        vocab_size=8, encoder_num_layers=2, d_model=32, nhead=4,
        d_ffn=64, joint_dim=48, decoder_neurons=24, dropout=0.0,
        injection_mode=None, use_speaker_encoder=False)
    return TSTransducer(cfg)


def make_inputs(rng, B=4):
    feats = jnp.asarray(rng.normal(size=(B, 16, 80)), jnp.float32)
    rel = jnp.ones(B)
    tokens_bos = jnp.asarray(rng.integers(0, 8, size=(B, 5)), jnp.int32)
    return feats, rel, tokens_bos


class TestTensorParallel:
    def test_tp_sharded_loss_matches_single_device(self, rng):
        model = tiny_model()
        feats, rel, tokens_bos = make_inputs(rng)
        params = model.init(jax.random.PRNGKey(0), feats, rel, tokens_bos)

        def loss_fn(p, f, r, tb):
            logits, _ = model.apply(p, f, r, tb)
            return jnp.sum(logits.astype(jnp.float32) ** 2)

        ref = jax.jit(loss_fn)(params, feats, rel, tokens_bos)

        mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
        shardings = param_shardings(params, mesh)
        # EXACT sharded-leaf set: every conformer layer contributes all 8
        # TP kernels (ffn1/2 x Dense_0/1, qkv/out_proj, pointwise in/out)
        from tsasr_tpu.parallel.mesh import (
            TP_KERNELS_PER_CONFORMER_LAYER,
            validate_tp_shardings,
        )
        sharded, _ = validate_tp_shardings(
            shardings, expected_layers=model.config.encoder_num_layers)
        assert len(sharded) == (model.config.encoder_num_layers
                                * TP_KERNELS_PER_CONFORMER_LAYER)
        params_sharded = jax.tree.map(jax.device_put, params, shardings)
        batch = shard_batch({"f": np.asarray(feats),
                             "r": np.asarray(rel),
                             "tb": np.asarray(tokens_bos)}, mesh)
        with mesh:
            got = jax.jit(loss_fn)(params_sharded, batch["f"],
                                   batch["r"], batch["tb"])
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)

    def test_name_drift_fails_loudly(self, rng):
        """Renaming a flax submodule must make validation raise instead
        of silently replicating its kernels (VERDICT r2 weak #6)."""
        import pytest
        from tsasr_tpu.parallel.mesh import validate_tp_shardings

        model = tiny_model()
        feats, rel, tokens_bos = make_inputs(rng)
        params = model.init(jax.random.PRNGKey(0), feats, rel, tokens_bos)
        mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])

        # simulate a flax auto-name drift: ffn1 -> some new name
        drifted = jax.tree.map(lambda x: x, params)
        for layer in list(drifted["params"]["encoder"]):
            node = drifted["params"]["encoder"][layer]
            if isinstance(node, dict) and "ffn1" in node:
                node["macaron_ffn"] = node.pop("ffn1")
        shardings = param_shardings(drifted, mesh)
        with pytest.raises(ValueError, match="drift"):
            validate_tp_shardings(shardings)

    def test_dp_grads_match_single_device(self, rng):
        model = tiny_model()
        feats, rel, tokens_bos = make_inputs(rng, B=8)
        params = model.init(jax.random.PRNGKey(0), feats, rel, tokens_bos)

        def loss_fn(p, f, r, tb):
            logits, _ = model.apply(p, f, r, tb)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        g_ref = jax.jit(jax.grad(loss_fn))(params, feats, rel, tokens_bos)

        mesh = make_mesh(dp=8, tp=1)
        batch = shard_batch({"f": np.asarray(feats),
                             "r": np.asarray(rel),
                             "tb": np.asarray(tokens_bos)}, mesh)
        with mesh:
            g_dp = jax.jit(jax.grad(loss_fn))(params, batch["f"],
                                              batch["r"], batch["tb"])
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestGradAccumulation:
    def test_multisteps_equals_full_batch(self, rng):
        """Two accumulated half-batches == one full-batch step (mean
        loss, identical lr)."""
        model = tiny_model()
        feats, rel, tokens_bos = make_inputs(rng, B=8)
        params = model.init(jax.random.PRNGKey(0), feats, rel, tokens_bos)

        def loss_fn(p, f, r, tb):
            logits, _ = model.apply(p, f, r, tb)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        base = optax.sgd(0.1)

        # full batch
        g = jax.grad(loss_fn)(params, feats, rel, tokens_bos)
        up, _ = base.update(g, base.init(params))
        p_full = optax.apply_updates(params, up)

        # two micro-batches through MultiSteps (averages grads)
        tx = optax.MultiSteps(base, every_k_schedule=2)
        state = tx.init(params)
        p_acc = params
        for lo, hi in ((0, 4), (4, 8)):
            g = jax.grad(loss_fn)(p_acc, feats[lo:hi], rel[lo:hi],
                                  tokens_bos[lo:hi])
            up, state = tx.update(g, state, p_acc)
            p_acc = optax.apply_updates(p_acc, up)

        for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_acc)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_pad_batch_weights(self, rng):
        """shard_batch pads B to the data-axis multiple by duplication;
        duplicated rows get weight 0 so weighted losses mask them."""
        from tsasr_tpu.parallel.mesh import pad_batch_to
        batch = {"x": np.arange(6, dtype=np.float32).reshape(6, 1),
                 "weight": np.ones(6, np.float32)}
        padded = pad_batch_to(batch, 8)
        assert padded["x"].shape[0] == 8
        # duplicated rows are a wrap-around of the start
        np.testing.assert_allclose(padded["x"][6:, 0], [0.0, 1.0])
        np.testing.assert_allclose(padded["weight"], [1] * 6 + [0, 0])

    def test_sharded_loss_matches_unsharded_on_nondivisible_batch(self,
                                                                  rng):
        """Weighted mean over a padded+sharded non-divisible batch ==
        the plain mean over the original batch."""
        from tsasr_tpu.parallel.mesh import shard_batch
        mesh = make_mesh(dp=8, tp=1)
        x = rng.normal(size=(6, 3)).astype(np.float32)

        def loss_fn(xs, w):
            per_ex = jnp.sum(xs.astype(jnp.float32) ** 2, axis=-1)
            return jnp.sum(per_ex * w) / jnp.sum(w)

        ref = float(jax.jit(loss_fn)(jnp.asarray(x), jnp.ones(6)))
        batch = shard_batch({"x": x, "weight": np.ones(6, np.float32)},
                            mesh)
        with mesh:
            got = float(jax.jit(loss_fn)(batch["x"], batch["weight"]))
        np.testing.assert_allclose(got, ref, rtol=1e-6)


class TestShardedCheckpoint:
    def test_sharded_save_restore_roundtrip(self, rng, tmp_path):
        """Params sharded over (data, model) save through the
        collective-safe path and restore bit-equal, re-laid-out on the
        mesh (round-2 verdict weak #5 / next-round item 3)."""
        from tsasr_tpu.training.checkpoints import (
            Checkpointer,
            PytreeRecoverable,
            gather_to_host,
        )

        model = tiny_model()
        feats, rel, tokens_bos = make_inputs(rng)
        params = model.init(jax.random.PRNGKey(0), feats, rel, tokens_bos)
        mesh = make_mesh(dp=4, tp=2)
        shardings = param_shardings(params, mesh)
        sharded = jax.tree.map(jax.device_put, params, shardings)

        # gather_to_host handles sharded jax.Arrays
        host = gather_to_host(sharded)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(host)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        state = {"p": sharded}
        ckptr = Checkpointer(str(tmp_path), recoverables={
            "model": PytreeRecoverable(
                lambda: state["p"],
                lambda v: state.__setitem__(
                    "p", jax.tree.map(jax.device_put, v, shardings)))})
        ckptr.save_checkpoint(meta={"WER": 1.0})
        state["p"] = jax.tree.map(jnp.zeros_like, state["p"])
        assert ckptr.recover_if_possible() is not None
        for a, b in zip(jax.tree.leaves(params),
                        jax.tree.leaves(state["p"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored leaves carry the mesh sharding again
        leaf = jax.tree.leaves(state["p"])[0]
        assert hasattr(leaf, "sharding")
