"""DiffWave vocoder: shapes, upsampler scale, training loss
improvement, fast-sampling inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tsasr_tpu.models.diffwave import (
    DiffWave,
    DiffWaveDiffusion,
    SpectrogramUpsampler,
    build_step_embedding,
)


def tiny_model(**kw):
    kwargs = dict(input_channels=8, residual_layers=3,
                  residual_channels=8, dilation_cycle_length=2,
                  total_steps=10)
    kwargs.update(kw)
    return DiffWave(**kwargs)


class TestModules:
    def test_step_embedding_table(self):
        table = build_step_embedding(50)
        assert table.shape == (50, 128)
        # sin/cos structure: row 0 is [0...0, 1...1]
        np.testing.assert_allclose(np.asarray(table)[0, :64], 0.0)
        np.testing.assert_allclose(np.asarray(table)[0, 64:], 1.0)

    def test_upsampler_256x(self):
        mel = jnp.zeros((2, 7, 8))
        model = SpectrogramUpsampler()
        params = model.init(jax.random.PRNGKey(0), mel)
        out = model.apply(params, mel)
        assert out.shape == (2, 7 * 256, 8)

    def test_forward_shapes_conditional(self):
        model = tiny_model()
        audio = jnp.zeros((2, 512))
        mel = jnp.zeros((2, 2, 8))
        params = model.init(jax.random.PRNGKey(0), audio,
                            jnp.asarray([0, 1]), mel)
        out = model.apply(params, audio, jnp.asarray([3, 4]), mel)
        assert out.shape == (2, 512)
        # fractional steps (fast sampling) work too
        out2 = model.apply(params, audio,
                           jnp.asarray([2.5, 3.25], jnp.float32), mel)
        assert np.isfinite(np.asarray(out2)).all()

    def test_forward_unconditional(self):
        model = tiny_model(unconditional=True)
        audio = jnp.zeros((1, 256))
        params = model.init(jax.random.PRNGKey(0), audio,
                            jnp.asarray([0]))
        out = model.apply(params, audio, jnp.asarray([5]))
        assert out.shape == (1, 256)


class TestDiffusion:
    def test_q_sample_interpolates(self):
        model = tiny_model()
        diff = DiffWaveDiffusion(model, timesteps=10)
        x0 = jnp.ones((1, 64))
        noise = jnp.zeros((1, 64))
        early = diff.q_sample(x0, jnp.asarray([0]), noise)
        late = diff.q_sample(x0, jnp.asarray([9]), noise)
        # signal decays as t grows
        assert float(jnp.abs(early).mean()) > float(jnp.abs(late).mean())

    def test_training_reduces_loss(self):
        model = tiny_model()
        diff = DiffWaveDiffusion(model, timesteps=10)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(np.sin(np.arange(512) / 10)[None],
                         jnp.float32).repeat(2, 0)
        mel = jnp.asarray(rng.random((2, 2, 8)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x0,
                            jnp.asarray([0, 0]), mel)
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, key):
            loss, grads = jax.value_and_grad(
                lambda p: diff.train_loss(p, x0, mel, key))(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for i in range(60):
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert np.mean(losses[-10:]) < np.mean(losses[:10])

    def test_inference_shapes(self):
        model = tiny_model(total_steps=5)
        diff = DiffWaveDiffusion(model, timesteps=5)
        mel = jnp.zeros((1, 3, 8))
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 768)),
                            jnp.asarray([0]), mel)
        out = diff.inference(params, condition=mel, scale=256)
        assert out.shape == (1, 768)
        assert float(jnp.max(jnp.abs(out))) <= 1.0
        fast = diff.inference(
            params, condition=mel, scale=256, fast_sampling=True,
            fast_sampling_noise_schedule=[1e-4, 1e-3, 1e-2, 5e-2])
        assert fast.shape == (1, 768)
