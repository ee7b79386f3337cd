"""FastSpeech2: length regulation (vs naive repeat), duration
averaging, teacher-forced training overfit, inference shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tsasr_tpu.models.fastspeech2 import (
    FastSpeech2,
    FastSpeech2Config,
    average_over_durations,
    fastspeech2_loss,
    length_regulate,
)


def tiny_cfg(**kw):
    kwargs = dict(n_vocab=12, d_model=32, enc_layers=1, dec_layers=1,
                  nhead=2, d_ffn=48, n_mels=8, postnet_channels=16,
                  postnet_layers=2, max_mel_len=40, dropout=0.0)
    kwargs.update(kw)
    return FastSpeech2Config(**kwargs)


class TestLengthRegulate:
    def test_matches_repeat_interleave(self):
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(2, 4, 3)), jnp.float32)
        durs = jnp.asarray([[2, 0, 3, 1], [1, 1, 1, 1]])
        out, lens = length_regulate(feats, durs, max_mel_len=8)
        assert list(np.asarray(lens)) == [6, 4]
        for b in range(2):
            expected = np.repeat(np.asarray(feats[b]),
                                 np.asarray(durs[b]), axis=0)
            np.testing.assert_allclose(
                np.asarray(out[b, :lens[b]]), expected, atol=1e-6)
            np.testing.assert_allclose(np.asarray(out[b, lens[b]:]), 0.0)

    def test_pace_scales(self):
        feats = jnp.ones((1, 2, 3))
        durs = jnp.asarray([[2, 2]])
        _, lens = length_regulate(feats, durs, 16, pace=2.0)
        assert int(lens[0]) == 8

    def test_average_over_durations(self):
        vals = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0, 0.0]])
        durs = jnp.asarray([[2, 3, 1]])
        avg = np.asarray(average_over_durations(vals, durs))[0]
        # token 0: mean(1,2)=1.5; token 1: mean(3,4,5)=4; token 2:
        # frame value 0 -> no nonzero elems -> 0
        np.testing.assert_allclose(avg, [1.5, 4.0, 0.0])


class TestModel:
    def make_batch(self, cfg, rng):
        tokens = jnp.asarray([[1, 3, 5, 2, 0, 0], [4, 2, 6, 1, 3, 7]])
        durs = jnp.asarray([[3, 2, 4, 1, 0, 0], [2, 2, 2, 2, 2, 2]])
        mel_lens = jnp.sum(durs, axis=1)
        L = cfg.max_mel_len
        mel = jnp.asarray(rng.normal(size=(2, L, cfg.n_mels)),
                          jnp.float32)
        mask = (jnp.arange(L)[None] < mel_lens[:, None])[..., None]
        mel = mel * mask
        pitch = jnp.asarray(rng.random((2, L)), jnp.float32) + 0.5
        energy = jnp.asarray(rng.random((2, L)), jnp.float32) + 0.5
        phon_lens = jnp.asarray([4, 6])
        return tokens, durs, mel, pitch, energy, phon_lens, mel_lens

    def test_teacher_forced_overfit(self):
        cfg = tiny_cfg()
        rng = np.random.default_rng(0)
        model = FastSpeech2(cfg)
        tokens, durs, mel, pitch, energy, phon_lens, mel_lens = \
            self.make_batch(cfg, rng)
        params = model.init(jax.random.PRNGKey(0), tokens, durs, pitch,
                            energy)
        tx = optax.adam(2e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                preds = model.apply(p, tokens, durs, pitch, energy)
                return fastspeech2_loss(
                    preds, (mel, durs, phon_lens, mel_lens))["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        params, opt_state, first = step(params, opt_state)
        for _ in range(120):
            params, opt_state, loss = step(params, opt_state)
        assert float(loss) < 0.6 * float(first)

    def test_inference_uses_predictions(self):
        cfg = tiny_cfg()
        model = FastSpeech2(cfg)
        tokens = jnp.asarray([[1, 3, 5, 2]])
        params = model.init(jax.random.PRNGKey(0), tokens,
                            jnp.asarray([[1, 1, 1, 1]]),
                            jnp.ones((1, cfg.max_mel_len)),
                            jnp.ones((1, cfg.max_mel_len)))
        out = model.apply(params, tokens)   # no teachers
        mel_post, postnet_mel, log_durs, pp, ap, pe, ae, lens = out
        assert mel_post.shape == (1, cfg.max_mel_len, cfg.n_mels)
        assert ap is None and ae is None
        assert int(lens[0]) >= 0
        # pace stretches predicted durations
        out2 = model.apply(params, tokens, pace=2.0)
        assert int(out2[-1][0]) >= int(lens[0])
