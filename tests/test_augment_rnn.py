"""Tests for time-domain augmenters and RNN variants."""

import numpy as np

import jax
import jax.numpy as jnp

from tsasr_tpu.models.rnn import GRU, VanillaRNN
from tsasr_tpu.ops.augment_time import (
    add_babble,
    add_noise,
    add_reverb,
    do_clip,
    drop_chunk,
    drop_freq,
    time_domain_spec_augment,
)


class TestTimeDomainAugment:
    def test_add_noise_snr(self, rng):
        wav = jnp.asarray(rng.normal(size=(2, 8000)), jnp.float32)
        noise = jnp.asarray(rng.normal(size=(2, 8000)), jnp.float32)
        noisy = add_noise(wav, noise, jax.random.PRNGKey(0),
                          snr_low=10.0, snr_high=10.0)
        added = np.asarray(noisy - wav)
        snr = 10 * np.log10(np.mean(np.asarray(wav) ** 2)
                            / np.mean(added ** 2))
        assert abs(snr - 10.0) < 0.5

    def test_add_reverb_identity_rir(self, rng):
        wav = jnp.asarray(rng.normal(size=(2, 1000)), jnp.float32)
        rir = jnp.zeros((2, 16)).at[:, 0].set(1.0)
        rev = add_reverb(wav, rir)
        np.testing.assert_allclose(np.asarray(rev), np.asarray(wav),
                                   atol=1e-3)

    def test_add_babble_changes_signal(self, rng):
        wav = jnp.asarray(rng.normal(size=(4, 1000)), jnp.float32)
        out = add_babble(wav, jax.random.PRNGKey(0), speaker_count=2)
        assert not np.allclose(np.asarray(out), np.asarray(wav))

    def test_drop_chunk_zeros_spans(self, rng):
        wav = jnp.asarray(np.ones((2, 4000), np.float32))
        out = drop_chunk(wav, jnp.ones(2), jax.random.PRNGKey(0),
                         drop_length_low=100, drop_length_high=200,
                         drop_count_low=1, drop_count_high=2)
        out = np.asarray(out)
        assert (out == 0).any() and (out == 1).any()

    def test_drop_freq_removes_tone(self, rng):
        sr = 16000
        t = np.arange(sr) / sr
        tone = np.sin(2 * np.pi * 4000 * t).astype(np.float32)[None]
        out = drop_freq(jnp.asarray(tone), jax.random.PRNGKey(3),
                        drop_count_low=1, drop_count_high=1,
                        drop_freq_low=0.49, drop_freq_high=0.51,
                        drop_width=0.1)
        # 4 kHz = 0.5 normalized; the notch must attenuate it
        assert float(np.abs(np.asarray(out)).mean()) < \
            0.5 * np.abs(tone).mean()

    def test_do_clip(self, rng):
        wav = jnp.asarray(rng.normal(size=(2, 1000)) * 3, jnp.float32)
        out = do_clip(wav, jax.random.PRNGKey(0), clip_low=0.5,
                      clip_high=0.5)
        assert float(jnp.abs(out).max()) <= 0.5 + 1e-6

    def test_time_domain_spec_augment_pipeline(self, rng):
        wav = jnp.asarray(rng.normal(size=(2, 8000)), jnp.float32)
        out, rel = time_domain_spec_augment(
            wav, jnp.ones(2), jax.random.PRNGKey(0))
        assert out.shape == wav.shape
        assert bool(jnp.isfinite(out).all())


class TestRNNVariants:
    def test_gru_step_matches_scan(self, rng):
        gru = GRU(hidden_size=12, in_features=6, num_layers=2)
        x = jnp.asarray(rng.normal(size=(2, 5, 6)), jnp.float32)
        params = gru.init(jax.random.PRNGKey(0), x)
        seq_out, h = gru.apply(params, x)
        state = gru.apply(params, 2, method=gru.initial_state)
        outs = []
        for t in range(5):
            out, state = gru.apply(params, x[:, t], state,
                                   method=gru.step)
            outs.append(out)
        np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                                   np.asarray(seq_out), atol=1e-5)
        np.testing.assert_allclose(np.asarray(state), np.asarray(h),
                                   atol=1e-5)

    def test_vanilla_rnn_shapes(self, rng):
        net = VanillaRNN(hidden_size=8, in_features=4)
        x = jnp.asarray(rng.normal(size=(3, 7, 4)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        out, h = net.apply(params, x)
        assert out.shape == (3, 7, 8)
        assert h.shape == (1, 3, 8)


class TestDeviceResampler:
    def test_matches_host_resampler(self, rng):
        import jax.numpy as jnp
        from tsasr_tpu.data.audio import resample as host_resample
        from tsasr_tpu.ops.augment import resample_device

        x = rng.normal(size=4000).astype("float32")
        dev = resample_device(jnp.asarray(x)[None], 8000, 16000)[0]
        host = host_resample(x, 8000, 16000)
        assert dev.shape[0] == len(host)
        import numpy as np
        np.testing.assert_allclose(np.asarray(dev), host, atol=1e-4)

    def test_speed_perturb_slows_and_speeds(self, rng):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from tsasr_tpu.ops.augment import speed_perturb

        wav = jnp.asarray(rng.normal(size=(2, 8000)), jnp.float32)
        factors = set()
        for seed in range(12):
            _, factor = speed_perturb(wav, jax.random.PRNGKey(seed))
            factors.add(round(float(factor), 3))
        # all three speeds should appear over a few seeds
        assert len(factors) >= 2
        assert all(0.9 < f <= 1.06 for f in factors)
