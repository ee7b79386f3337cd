"""Tests for the general losses, InputNormalization modes, augmenters,
hpopt glue, and dataio helpers."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsasr_tpu.data.dataio import merge_char, split_word
from tsasr_tpu.ops.augment import spec_augment, speed_perturb
from tsasr_tpu.ops.losses import (
    PitWrapper,
    bce_loss,
    ctc_loss,
    l1_loss,
    mse_loss,
    nll_loss,
)
from tsasr_tpu.ops.normalize import InputNormalization
from tsasr_tpu.utils import hpopt


class TestLosses:
    def test_nll_masked(self, rng):
        logp = jnp.log(jnp.full((2, 4, 3), 1 / 3))
        targets = jnp.zeros((2, 4), jnp.int32)
        # second element: only half the frames valid
        loss = nll_loss(logp, targets, length=jnp.asarray([1.0, 0.5]))
        np.testing.assert_allclose(loss, np.log(3), rtol=1e-6)

    def test_mse_l1(self):
        a = jnp.ones((2, 3, 4))
        b = jnp.zeros((2, 3, 4))
        assert float(mse_loss(a, b)) == pytest.approx(1.0)
        assert float(l1_loss(a, b)) == pytest.approx(1.0)

    def test_bce(self):
        logits = jnp.zeros((2, 3))
        targets = jnp.ones((2, 3))
        assert float(bce_loss(logits, targets)) == pytest.approx(
            np.log(2), rel=1e-5)

    def test_ctc_perfect_prediction(self):
        # strongly peaked logits on target-with-blanks should give ~0
        B, T, C = 1, 5, 4
        targets = jnp.asarray([[1, 2]], jnp.int32)
        path = [1, 0, 2, 0, 0]  # label blank label blank blank
        logits = np.full((B, T, C), -20.0, np.float32)
        for t, c in enumerate(path):
            logits[0, t, c] = 20.0
        loss = ctc_loss(jax.nn.log_softmax(jnp.asarray(logits)), targets,
                        jnp.asarray([1.0]), jnp.asarray([1.0]),
                        blank_index=0)
        assert float(loss) < 0.01

    def test_pit(self):
        # two sources swapped: PIT must find the permutation
        target = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 10, 2)), jnp.float32)
        pred = target[..., ::-1]

        def per_element_mse(p, t):
            return jnp.mean((p - t) ** 2, axis=(1, 2))

        pit = PitWrapper(per_element_mse)
        loss, best_idx = pit(pred, target)
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)
        reordered = pit.reorder_tensor(pred, best_idx)
        np.testing.assert_allclose(np.asarray(reordered),
                                   np.asarray(target), atol=1e-6)


class TestInputNormalization:
    def test_global_freezes_after_epoch(self, rng):
        norm = InputNormalization(norm_type="global",
                                  update_until_epoch=2)
        x1 = jnp.asarray(rng.normal(size=(2, 6, 3)) + 5, jnp.float32)
        rel = jnp.ones(2)
        norm(x1, rel, epoch=0)
        mean_after_1 = norm.glob_mean.copy()
        x2 = jnp.asarray(rng.normal(size=(2, 6, 3)) - 5, jnp.float32)
        norm(x2, rel, epoch=1)
        assert not np.allclose(norm.glob_mean, mean_after_1)
        frozen = norm.glob_mean.copy()
        norm(x1, rel, epoch=5)  # past update_until_epoch
        np.testing.assert_allclose(norm.glob_mean, frozen)

    def test_speaker_mode(self, rng):
        norm = InputNormalization(norm_type="speaker")
        x = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
        rel = jnp.ones(2)
        out = norm(x, rel, spk_ids=np.asarray([[1], [2]]))
        assert out.shape == x.shape
        assert 1 in norm.spk_dict_mean and 2 in norm.spk_dict_mean

    def test_checkpoint_roundtrip(self, rng, tmp_path):
        norm = InputNormalization(norm_type="global")
        x = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
        norm(x, jnp.ones(2), epoch=0)
        path = str(tmp_path / "norm.ckpt")
        norm.save(path)
        norm2 = InputNormalization(norm_type="global")
        norm2.load(path)
        np.testing.assert_allclose(norm2.glob_mean, norm.glob_mean)
        assert norm2.count == norm.count


class TestAugment:
    def test_spec_augment_masks(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 50, 20)) + 10, jnp.float32)
        out = spec_augment(x, jax.random.PRNGKey(0), time_warp=False,
                           replace_with_zero=True,
                           freq_mask_width=(5, 10),
                           time_mask_width=(5, 10))
        out = np.asarray(out)
        assert out.shape == x.shape
        assert (out == 0).any()  # something got masked

    def test_spec_augment_time_warp_shape(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 50, 20)), jnp.float32)
        out = spec_augment(x, jax.random.PRNGKey(1), freq_mask=False,
                           time_mask=False, time_warp=True)
        assert out.shape == x.shape

    def test_speed_perturb_shape_and_factor(self, rng):
        wav = jnp.asarray(rng.normal(size=(2, 8000)), jnp.float32)
        out, factor = speed_perturb(wav, jax.random.PRNGKey(0))
        assert out.shape == wav.shape
        assert 0.9 < float(factor) < 1.1


class TestHpopt:
    def test_generic_mode_reports(self, capsys):
        with hpopt.hyperparameter_optimization(
                objective_key="WER", mode="generic") as ctx:
            hpopt.report_result({"WER": 12.5, "loss": 1.0})
            hpopt.report_result({"WER": 11.0, "loss": 0.9})
        out = capsys.readouterr().out
        payload = json.loads(out.strip().splitlines()[-1])
        assert payload["objective"] == 11.0

    def test_disabled_is_noop(self, capsys):
        with hpopt.hyperparameter_optimization("WER", mode=None):
            hpopt.report_result({"WER": 1.0})
        assert capsys.readouterr().out == ""


class TestDataioHelpers:
    def test_merge_split_roundtrip(self):
        words = [["hello", "world"]]
        chars = split_word(words)
        assert chars == [list("hello") + ["_"] + list("world")]
        assert merge_char(chars) == words


class TestRecomputeDropout:
    """ops/dropout.py: backward regenerates the mask from the key."""

    def test_grad_matches_autodiff_of_plain_masking(self):
        import numpy as np
        from tsasr_tpu.ops.dropout import dropout

        key = jax.random.PRNGKey(7)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 32)),
                        jnp.float32)
        rate = 0.3

        def plain(x):
            keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
            return jnp.sum(jnp.where(keep, x / (1.0 - rate), 0.0) ** 2)

        def custom(x):
            return jnp.sum(dropout(x, key, rate) ** 2)

        v0, g0 = jax.value_and_grad(plain)(x)
        v1, g1 = jax.value_and_grad(custom)(x)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   atol=1e-6)

    def test_module_matches_flax_semantics(self):
        import numpy as np
        from flax import linen as nn
        from tsasr_tpu.ops.dropout import Dropout

        x = jnp.ones((4, 1000), jnp.float32)
        out = Dropout(0.25, key_only=True).apply(
            {}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)})
        vals = np.unique(np.asarray(out))
        # only 0 and 1/(1-rate) survive; drop fraction near rate
        np.testing.assert_allclose(
            sorted(vals), [0.0, 1.0 / 0.75], rtol=1e-6)
        assert abs(float((out == 0).mean()) - 0.25) < 0.03
        # deterministic passthrough
        np.testing.assert_array_equal(
            np.asarray(Dropout(0.25).apply({}, x, deterministic=True)),
            np.asarray(x))

    def test_default_module_bit_identical_to_nn_dropout(self):
        import numpy as np
        from flax import linen as nn
        from tsasr_tpu.ops.dropout import Dropout

        x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)),
                        jnp.float32)
        k = jax.random.PRNGKey(3)
        ours = Dropout(0.3).apply({}, x, deterministic=False,
                                  rngs={"dropout": k})
        flax = nn.Dropout(0.3, deterministic=False).apply(
            {}, x, rngs={"dropout": k})
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(flax))


class TestBitsDropout:
    """ops/dropout.py ``bits``: narrower random draws per mask element."""

    def test_u8_semantics_and_keep_fraction(self):
        import numpy as np
        from tsasr_tpu.ops.dropout import Dropout

        x = jnp.ones((4, 4000), jnp.float32)
        for bits in (8, 16):
            out = Dropout(0.25, bits=bits).apply(
                {}, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(3)})
            vals = np.unique(np.asarray(out))
            np.testing.assert_allclose(
                sorted(vals), [0.0, 1.0 / 0.75], rtol=1e-6)
            assert abs(float((out == 0).mean()) - 0.25) < 0.03, bits

    def test_keep_prob_threshold_clamped(self):
        # rate so small that round(keep * 256) == 256 must not wrap to 0
        import numpy as np
        from tsasr_tpu.ops.dropout import keep_mask

        m = keep_mask(jax.random.PRNGKey(0), 1.0 - 1e-4, (2000,), bits=8)
        assert float(jnp.mean(m)) > 0.98   # 255/256 keep, not all-drop

    def test_custom_vjp_grads_match_plain_autodiff_u8(self):
        import numpy as np
        from tsasr_tpu.ops.dropout import dropout, keep_mask

        key = jax.random.PRNGKey(7)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 32)),
                        jnp.float32)

        def plain(x):
            keep = keep_mask(key, 0.7, x.shape, bits=8)
            return jnp.sum(jnp.where(keep, x / 0.7, 0.0) ** 2)

        def custom(x):
            return jnp.sum(dropout(x, key, 0.3, bits=8) ** 2)

        v0, g0 = jax.value_and_grad(plain)(x)
        v1, g1 = jax.value_and_grad(custom)(x)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   atol=1e-6)

    def test_config_flows_through_model(self):
        # dropout_bits=8 must change the traced train-mode graph (bits
        # generator) while keeping the same param tree as bits=32
        import numpy as np
        from tsasr_tpu.models.transducer import (TSTransducer,
                                                 TSTransducerConfig)

        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(1, 20, 80)), jnp.float32)
        ef = jnp.asarray(rng.normal(size=(1, 24, 80)), jnp.float32)
        rel = jnp.ones((1,))
        tb = jnp.zeros((1, 3), jnp.int32)
        outs, trees = [], []
        for bits in (32, 8):
            cfg = TSTransducerConfig(
                vocab_size=8, encoder_num_layers=1, d_model=32, nhead=4,
                d_ffn=64, joint_dim=48, decoder_neurons=24, dropout=0.2,
                speaker_encoder_layers=1, injection_mode="cat",
                dropout_bits=bits)
            m = TSTransducer(cfg)
            p = m.init(jax.random.PRNGKey(0), feats, rel, tb, ef, rel)
            lg, _ = m.apply(p, feats, rel, tb, ef, rel,
                            deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
            assert np.isfinite(np.asarray(lg)).all()
            outs.append(np.asarray(lg))
            trees.append(jax.tree_util.tree_structure(p))
        assert trees[0] == trees[1]
        # different mask draws -> different train-mode outputs
        assert not np.array_equal(outs[0], outs[1])
