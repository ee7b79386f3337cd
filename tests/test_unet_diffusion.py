"""Tests for UNet family, DDPM/latent diffusion, wordemb and fetching
(reference C13 tail: ``nnet/{unet,diffusion}.py``, ``wordemb/``,
``pretrained/fetching.py``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tsasr_tpu.models.unet import (
    DecoderUNetModel,
    EncoderUNetModel,
    UNetModel,
    UNetNormalizingAutoencoder,
    downsampling_padding,
    timestep_embedding,
)
from tsasr_tpu.ops.diffusion import (
    DenoisingDiffusion,
    LatentDiffusion,
    gaussian_noise,
    length_masked_gaussian_noise,
    sample_timesteps,
)
from tsasr_tpu.data.wordemb import expand_to_chars
from tsasr_tpu.utils.fetching import FetchError, fetch


# ---------------------------------------------------------------------------
# unet
# ---------------------------------------------------------------------------

def test_timestep_embedding_shape_and_range():
    emb = timestep_embedding(jnp.asarray([0, 10, 500]), 32)
    assert emb.shape == (3, 32)
    assert float(jnp.abs(emb).max()) <= 1.0 + 1e-6


def test_unet_model_shape():
    """Mirrors the reference doctest (``unet.py:760-773``) in
    channels-last: (4, 16, 32, 3) -> (4, 16, 32, 1)."""
    model = UNetModel(in_channels=3, model_channels=32, out_channels=1,
                      num_res_blocks=1, attention_resolutions=[1],
                      channel_mult=(1, 2), norm_num_groups=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16, 32, 3)),
                    jnp.float32)
    ts = jnp.asarray([10, 100, 50, 25])
    p = model.init(jax.random.PRNGKey(0), x, ts)
    out = model.apply(p, x, ts)
    assert out.shape == (4, 16, 32, 1)
    # zero-init output conv: initial prediction is exactly zero
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_unet_conditional_embedding():
    model = UNetModel(in_channels=1, model_channels=8, out_channels=1,
                      num_res_blocks=1, channel_mult=(1, 2),
                      norm_num_groups=2,
                      cond_emb={"speaker": {"emb_dim": 6}})
    x = jnp.zeros((2, 8, 8, 1))
    ts = jnp.asarray([1, 2])
    cond = {"speaker": jnp.ones((2, 6))}
    p = model.init(jax.random.PRNGKey(0), x, ts, cond)
    assert model.apply(p, x, ts, cond).shape == (2, 8, 8, 1)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), x, ts, None)


def test_encoder_decoder_unet_shapes():
    """Reference doctests: encoder (4,16,32,3) -> (4,2,4,1) with
    channel_mult len 4; decoder inverts."""
    enc = EncoderUNetModel(in_channels=3, model_channels=8,
                           out_channels=1, num_res_blocks=1,
                           channel_mult=(1, 1, 2, 2), norm_num_groups=2)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 16, 32, 3)),
                    jnp.float32)
    p = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(p, x)
    assert z.shape == (4, 2, 4, 1)
    dec = DecoderUNetModel(in_channels=1, model_channels=8,
                           out_channels=3, num_res_blocks=1,
                           channel_mult=(1, 1, 2, 2), norm_num_groups=2)
    pd = dec.init(jax.random.PRNGKey(1), z)
    assert dec.apply(pd, z).shape == (4, 16, 32, 3)


def test_unet_normalizing_autoencoder_roundtrip():
    """Reference doctest (``unet.py:1726-1744``): (4,32,32,1) ->
    latent (4,4,4,3) -> (4,32,32,1)."""
    ae = UNetNormalizingAutoencoder(
        in_channels=1, model_channels=4, encoder_out_channels=16,
        latent_channels=3, channel_mult=(1, 2, 4, 8),
        norm_num_groups=2)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 32, 32, 1)),
                    jnp.float32)
    p = ae.init(jax.random.PRNGKey(0), x,
                method=lambda m, x: m.train_sample(x))
    z = ae.apply(p, x)
    assert z.shape == (4, 4, 4, 3)
    # normalised latent
    assert abs(float(z.mean())) < 0.1
    rec = ae.apply(p, z, method=lambda m, z: m.decode(z))
    assert rec.shape == x.shape


def test_downsampling_padding():
    x = jnp.ones((2, 13, 5))
    xp, rel = downsampling_padding(x, 8, len_dims=(1,),
                                   rel_lengths=jnp.asarray([1.0, 0.5]))
    assert xp.shape == (2, 16, 5)
    np.testing.assert_allclose(np.asarray(rel),
                               [13 / 16, 0.5 * 13 / 16], atol=1e-6)


# ---------------------------------------------------------------------------
# diffusion
# ---------------------------------------------------------------------------

def test_ddpm_schedule_matches_reference_formulas():
    d = DenoisingDiffusion(timesteps=10, beta_start=0.01, beta_end=0.5)
    betas = np.linspace(0.01, 0.5, 10)
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(d.alphas_cumprod), acp,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d.signal_coefficients) ** 2
                               + np.asarray(d.noise_coefficients) ** 2,
                               1.0, atol=1e-5)


def test_ddpm_distort_statistics():
    d = DenoisingDiffusion(timesteps=50, beta_start=1e-4, beta_end=0.02)
    x = jnp.ones((8, 64, 64))
    t = jnp.full((8,), 49, jnp.int32)
    noisy, noise, t_out = d.distort(jax.random.PRNGKey(0), x,
                                    timesteps=t)
    assert noisy.shape == x.shape and noise.shape == x.shape
    sc = float(d.signal_coefficients[49])
    nc = float(d.noise_coefficients[49])
    # E[noisy] = sc * 1; Var = nc^2
    assert float(noisy.mean()) == pytest.approx(sc, abs=0.02)
    assert float(noisy.std()) == pytest.approx(nc, abs=0.02)


def test_ddpm_train_sample_and_sampling_runs():
    d = DenoisingDiffusion(timesteps=5, sample_min=-3, sample_max=3)

    def model_fn(x, t):   # fake eps-predictor
        return 0.1 * x

    out = d.train_sample(model_fn, jax.random.PRNGKey(0),
                         jnp.zeros((2, 8, 8)))
    assert out.pred.shape == (2, 8, 8)
    sample = d.sample(model_fn, jax.random.PRNGKey(1), (2, 8, 8))
    assert sample.shape == (2, 8, 8)
    assert bool(jnp.isfinite(sample).all())
    assert float(jnp.abs(sample).max()) <= 3.0


def test_ddpm_overfits_constant_noise_direction():
    """A linear eps-model must learn to predict noise from x_t: train on
    a fixed dataset and check the denoising loss drops."""
    d = DenoisingDiffusion(timesteps=20)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 10)), jnp.float32)
    w = jnp.zeros((10, 10))

    def loss_fn(w, key):
        out = d.train_sample(lambda z, t: z @ w, key, x)
        return ((out.pred - out.noise) ** 2).mean()

    tx = optax.adam(1e-2)
    opt = tx.init(w)
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(60):
        key, sub = jax.random.split(key)
        loss, g = jax.value_and_grad(loss_fn)(w, sub)
        up, opt = tx.update(g, opt)
        w = optax.apply_updates(w, up)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_latent_diffusion_pads_and_samples():
    d = DenoisingDiffusion(timesteps=4)
    ld = LatentDiffusion(encode_fn=lambda x: x[:, :, :3],
                         diffusion=d, latent_downsample_factor=4,
                         latent_pad_dims=(1,))
    x = jnp.ones((2, 10, 5))
    out = ld.train_sample(lambda z, t: jnp.zeros_like(z),
                          jax.random.PRNGKey(0), x)
    assert out.noisy_sample.shape == (2, 12, 3)   # padded to mult of 4
    dec = ld.sample(lambda z, t: jnp.zeros_like(z),
                    lambda z: z * 2.0, jax.random.PRNGKey(1), (2, 12, 3))
    assert dec.shape == (2, 12, 3)


def test_noise_helpers():
    t = sample_timesteps(jax.random.PRNGKey(0), 100, 7)
    assert t.shape == (100,) and int(t.min()) >= 0 and int(t.max()) < 7
    n = gaussian_noise(jax.random.PRNGKey(1), (4, 8))
    assert n.shape == (4, 8)
    masked = length_masked_gaussian_noise(
        jax.random.PRNGKey(2), (2, 10, 3), jnp.asarray([0.5, 1.0]))
    np.testing.assert_allclose(np.asarray(masked[0, 5:]), 0.0)
    assert float(jnp.abs(masked[1]).min()) > 0.0


# ---------------------------------------------------------------------------
# wordemb + fetching
# ---------------------------------------------------------------------------

def test_expand_to_chars_matches_reference_doctest():
    emb = jnp.asarray([[[1., 2., 3.], [3., 1., 2.], [0., 0., 0.]],
                       [[1., 3., 2.], [3., 2., 1.], [2., 3., 1.]]])
    seq = jnp.asarray([[1, 2, 0, 2, 1, 0], [1, 0, 1, 2, 0, 2]])
    seq_len = jnp.asarray([4, 5])     # reference doctest values
    out = np.asarray(expand_to_chars(emb, seq, seq_len, 0))
    expect = np.asarray([
        [[1., 2., 3.], [1., 2., 3.], [0., 0., 0.],
         [3., 1., 2.], [3., 1., 2.], [0., 0., 0.]],
        [[1., 3., 2.], [0., 0., 0.], [3., 2., 1.],
         [3., 2., 1.], [0., 0., 0.], [2., 3., 1.]]])
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_fetch_local_dir_and_file_url(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "model.bin").write_bytes(b"weights")
    # local dir: returned in place
    p = fetch("model.bin", str(src), savedir=tmp_path / "save")
    assert p == (src / "model.bin").absolute()
    # file:// URL: copied into savedir
    p2 = fetch("model.bin", f"file://{src}", savedir=tmp_path / "save2")
    assert p2.read_bytes() == b"weights"
    # cached short-circuit
    (src / "model.bin").write_bytes(b"changed")
    p3 = fetch("model.bin", f"file://{src}", savedir=tmp_path / "save2")
    assert p3.read_bytes() == b"weights"   # not overwritten
    p4 = fetch("model.bin", f"file://{src}", savedir=tmp_path / "save2",
               overwrite=True)
    assert p4.read_bytes() == b"changed"


def test_fetch_missing_local_raises(tmp_path):
    with pytest.raises(ValueError):
        fetch("missing.bin", str(tmp_path), savedir=tmp_path / "s")


def test_fetch_url_no_egress_raises(tmp_path):
    with pytest.raises(FetchError):
        fetch("f.bin", "http://10.255.255.1:9", savedir=tmp_path / "s",
              timeout=0.5)
