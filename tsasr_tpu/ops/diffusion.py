"""Denoising diffusion (DDPM) + latent diffusion machinery.

TPU-native equivalent of ``vendor/speechbrain/speechbrain/nnet/diffusion.py``:

- ``DenoisingDiffusion``  (:135-363) — forward distortion, training
  sample, ancestral sampling with the exact posterior coefficients the
  reference precomputes (beta schedule scaled by timestep count).
- ``LatentDiffusion``     (:365-592) — diffusion over an autoencoder's
  normalised latent space (optionally jointly trained).
- ``sample_timesteps``    (:593-604), Gaussian / length-masked noise
  (:606-665).

TPU-first design: everything is a pure function of explicit PRNG keys
(jit-safe inside a training step); the ancestral sampling loop is a
``lax.scan`` over the reversed timesteps — ONE compiled program instead
of the reference's Python loop of T model dispatches. Model apply
functions are passed in as ``fn(x, timesteps) -> eps`` closures over
params, which keeps this module framework-agnostic (works with the
UNet family in models/unet.py and with DiffWave, models/diffwave.py).
"""

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DDPM_REF_TIMESTEPS = 1000
DDPM_DEFAULT_BETA_START = 0.0001
DDPM_DEFAULT_BETA_END = 0.02


def sample_timesteps(key, batch, num_timesteps):
    """Uniform random timestep per batch element
    (``diffusion.py:593-604``)."""
    return jax.random.randint(key, (batch,), 0, num_timesteps)


def gaussian_noise(key, shape, dtype=jnp.float32):
    """Standard Gaussian noise (``diffusion.py:606-616``)."""
    return jax.random.normal(key, shape, dtype)


def length_masked_gaussian_noise(key, shape, rel_lengths, length_dim=1,
                                 dtype=jnp.float32):
    """Gaussian noise zeroed on padding positions
    (``diffusion.py:619-665``)."""
    noise = jax.random.normal(key, shape, dtype)
    size = shape[length_dim]
    lens = jnp.round(rel_lengths * size).astype(jnp.int32)
    pos = jnp.arange(size)
    mask = pos[None, :] < lens[:, None]
    mask = jnp.moveaxis(
        mask.reshape(mask.shape + (1,) * (len(shape) - 2)), 1, length_dim)
    return noise * mask.astype(dtype)


class DiffusionTrainSample(NamedTuple):
    pred: jnp.ndarray           # model's noise prediction
    noise: jnp.ndarray          # the true noise target
    noisy_sample: jnp.ndarray   # the distorted input fed to the model


class DenoisingDiffusion:
    """Classic DDPM (arXiv 2006.11239; reference
    ``diffusion.py:135-363``). Stateless: all schedule coefficients are
    precomputed constants; randomness comes from explicit keys.
    """

    def __init__(self, timesteps=None, beta_start=None, beta_end=None,
                 sample_min=None, sample_max=None):
        if timesteps is None:
            timesteps = DDPM_REF_TIMESTEPS
        # the reference rescales the default betas when using fewer
        # steps (diffusion.py:203-208)
        scale = DDPM_REF_TIMESTEPS / timesteps
        if beta_start is None:
            beta_start = scale * DDPM_DEFAULT_BETA_START
        if beta_end is None:
            beta_end = scale * DDPM_DEFAULT_BETA_END
        self.timesteps = timesteps
        self.sample_min, self.sample_max = sample_min, sample_max

        # clamp to (0, 0.999]: the reference's timestep rescaling can
        # push beta past 1 at small step counts (alpha < 0 -> NaN
        # lattice, visible in nnet/diffusion.py's own doctest config);
        # standard DDPM practice caps beta instead
        betas = np.clip(
            np.linspace(beta_start, beta_end, timesteps,
                        dtype=np.float64), 1e-8, 0.999)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.concatenate([[1.0], acp[:-1]])
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas = jnp.asarray(alphas, jnp.float32)
        self.alphas_cumprod = jnp.asarray(acp, jnp.float32)
        self.signal_coefficients = jnp.asarray(np.sqrt(acp), jnp.float32)
        self.noise_coefficients = jnp.asarray(np.sqrt(1.0 - acp),
                                              jnp.float32)
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        self.posterior_variance = jnp.asarray(post_var, jnp.float32)
        # post_var[0] == 0 (no noise injected at the final step); floor
        # it for the log so exp(0.5*log_var) underflows to 0 silently
        self.posterior_log_variance = jnp.asarray(
            np.log(np.maximum(post_var, 1e-20)), jnp.float32)
        self.posterior_mean_weight_start = jnp.asarray(
            betas * np.sqrt(acp_prev) / (1.0 - acp), jnp.float32)
        self.posterior_mean_weight_step = jnp.asarray(
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp), jnp.float32)
        self.sample_pred_model_coefficient = jnp.asarray(
            np.sqrt(1.0 / acp), jnp.float32)
        self.sample_pred_noise_coefficient = jnp.asarray(
            np.sqrt(1.0 / acp - 1.0), jnp.float32)

    # ------------------------------------------------------------ train
    def _bc(self, coeff, timesteps, like):
        return coeff[timesteps].reshape(
            (like.shape[0],) + (1,) * (like.ndim - 1))

    def distort(self, key, x, noise=None, timesteps=None):
        """Forward diffusion q(x_t | x_0) (``diffusion.py:259-291``)."""
        k_t, k_n = jax.random.split(key)
        if timesteps is None:
            timesteps = sample_timesteps(k_t, x.shape[0], self.timesteps)
        if noise is None:
            noise = gaussian_noise(k_n, x.shape, x.dtype)
        noisy = (self._bc(self.signal_coefficients, timesteps, x) * x
                 + self._bc(self.noise_coefficients, timesteps, x)
                 * noise)
        return noisy, noise, timesteps

    def train_sample(self, model_fn, key, x, noise=None, timesteps=None):
        """(pred, noise, noisy_sample) for the denoising loss
        (``diffusion.py:71-104``). ``model_fn(x_t, t) -> eps_hat``."""
        noisy, noise, timesteps = self.distort(key, x, noise, timesteps)
        return DiffusionTrainSample(model_fn(noisy, timesteps), noise,
                                    noisy)

    # ---------------------------------------------------------- sample
    def sample_step(self, model_fn, key, sample, timestep):
        """One ancestral p(x_{t-1} | x_t) step (``diffusion.py:323-363``)."""
        t = jnp.full((sample.shape[0],), timestep, jnp.int32) \
            if jnp.ndim(timestep) == 0 else timestep
        eps = model_fn(sample, t)
        noise = gaussian_noise(key, sample.shape, sample.dtype)
        x0_hat = (self._bc(self.sample_pred_model_coefficient, t, sample)
                  * sample
                  - self._bc(self.sample_pred_noise_coefficient, t, eps)
                  * eps)
        mean = (self._bc(self.posterior_mean_weight_start, t, x0_hat)
                * x0_hat
                + self._bc(self.posterior_mean_weight_step, t, sample)
                * sample)
        log_var = self._bc(self.posterior_log_variance, t, sample)
        out = mean + jnp.exp(0.5 * log_var) * noise
        if self.sample_min is not None or self.sample_max is not None:
            out = jnp.clip(out, self.sample_min, self.sample_max)
        return out

    def sample(self, model_fn, key, shape):
        """Full ancestral sampling from pure noise as one lax.scan
        (``diffusion.py:293-321``)."""
        k_init, k_loop = jax.random.split(key)
        sample = gaussian_noise(k_init, shape)

        def body(carry, t):
            s, k = carry
            k, sub = jax.random.split(k)
            return (self.sample_step(model_fn, sub, s, t), k), None

        ts = jnp.arange(self.timesteps - 1, -1, -1)
        (sample, _), _ = jax.lax.scan(body, (sample, k_loop), ts)
        return sample


class LatentDiffusionTrainSample(NamedTuple):
    diffusion: DiffusionTrainSample
    autoencoder: object


class LatentDiffusion:
    """Diffusion over an autoencoder latent space
    (``diffusion.py:365-592``).

    ``encode_fn(x) -> latent`` and (optionally)
    ``ae_train_sample_fn(x) -> AutoencoderOutput`` are closures over the
    autoencoder's params (e.g. models/autoencoders.py or
    models/unet.py::UNetNormalizingAutoencoder).
    """

    def __init__(self, encode_fn, diffusion: DenoisingDiffusion,
                 latent_downsample_factor: Optional[int] = None,
                 latent_pad_dims: Sequence[int] = (1,)):
        self.encode_fn = encode_fn
        self.diffusion = diffusion
        self.latent_downsample_factor = latent_downsample_factor
        self.latent_pad_dims = tuple(latent_pad_dims)

    def _pad_latent(self, latent):
        f = self.latent_downsample_factor
        if not f or f <= 1:
            return latent
        pads = [(0, 0)] * latent.ndim
        for d in self.latent_pad_dims:
            pads[d] = (0, (-latent.shape[d]) % f)
        return jnp.pad(latent, pads)

    def train_sample(self, model_fn, key, x, **kw):
        latent = self._pad_latent(self.encode_fn(x))
        return self.diffusion.train_sample(model_fn, key, latent, **kw)

    def train_sample_latent(self, model_fn, ae_train_sample_fn, key, x):
        """Joint diffusion + autoencoder training sample
        (``diffusion.py:525-548``)."""
        ae_out = ae_train_sample_fn(x)
        latent = self._pad_latent(ae_out.latent)
        diff = self.diffusion.train_sample(model_fn, key, latent)
        return LatentDiffusionTrainSample(diff, ae_out)

    def distort(self, key, x):
        latent = self._pad_latent(self.encode_fn(x))
        return self.diffusion.distort(key, latent)

    def sample(self, model_fn, decode_fn, key, latent_shape):
        """Sample a latent, then decode it (``diffusion.py:575-591``)."""
        return decode_fn(self.diffusion.sample(model_fn, key,
                                               latent_shape))
