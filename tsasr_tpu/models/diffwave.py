"""DiffWave diffusion vocoder.

TPU-native re-implementation of the reference
``lobes/models/DiffWave.py:116-666``: diffusion-step embedding (with
fractional-step lerp), transposed-conv spectrogram upsampler (x256),
dilated gated residual blocks, and the DDPM machinery (forward noising
for training + the DiffWave fast-sampling inference loop with schedule
retargeting). Channels-last layouts: audio (B, L), mel (B, T_mel,
n_mels).
"""

import math
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def build_step_embedding(max_steps):
    """(max_steps, 128) sin/cos table (reference ``_build_embedding``)."""
    steps = np.arange(max_steps)[:, None]
    dims = np.arange(64)[None, :]
    table = steps * 10.0 ** (dims * 4.0 / 63.0)
    return jnp.asarray(np.concatenate([np.sin(table), np.cos(table)],
                                      axis=1), jnp.float32)


class DiffusionEmbedding(nn.Module):
    """Step index (int or fractional) -> (B, 512) embedding."""

    max_steps: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, diffusion_step):
        table = build_step_embedding(self.max_steps)
        t = jnp.asarray(diffusion_step)
        if t.ndim == 0:
            t = t[None]
        if jnp.issubdtype(t.dtype, jnp.integer):
            x = table[t]
        else:
            lo = jnp.floor(t).astype(jnp.int32)
            hi = jnp.ceil(t).astype(jnp.int32)
            frac = (t - lo)[:, None]
            x = table[lo] + (table[hi] - table[lo]) * frac
        x = nn.silu(nn.Dense(512, dtype=self.dtype)(x.astype(self.dtype)))
        return nn.silu(nn.Dense(512, dtype=self.dtype)(x))


class SpectrogramUpsampler(nn.Module):
    """Mel (B, T_mel, n_mels) -> (B, 256*T_mel, n_mels): two
    ConvTranspose2d (3, 32) stride (1, 16) over the (mel, time) image
    (reference :192-237)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        x = jnp.swapaxes(mel, 1, 2)[..., None]   # (B, n_mels, T, 1)
        for _ in range(2):
            # torch ConvTranspose2d padding=(1, 8) CROPS the output;
            # emulate with VALID + explicit crop
            x = nn.ConvTranspose(1, (3, 32), strides=(1, 16),
                                 padding="VALID", dtype=self.dtype)(x)
            x = x[:, 1:-1, 8:-8, :]
            x = nn.leaky_relu(x, 0.4)
        return jnp.swapaxes(x[..., 0], 1, 2)     # (B, 256*T, n_mels)


class ResidualBlock(nn.Module):
    """Dilated gated residual block (reference :238-342)."""

    n_mels: int
    residual_channels: int
    dilation: int
    uncond: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, step_emb, conditioner=None):
        """x (B, L, C); step_emb (B, 512); conditioner (B, L, n_mels)."""
        C = self.residual_channels
        step = nn.Dense(C, dtype=self.dtype,
                        name="diffusion_projection")(step_emb)
        y = x + step[:, None, :]
        y = nn.Conv(2 * C, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME", dtype=self.dtype,
                    name="dilated_conv")(y)
        if not self.uncond:
            cond = nn.Conv(2 * C, (1,), dtype=self.dtype,
                           name="conditioner_projection")(conditioner)
            y = y + cond
        gate, filt = jnp.split(y, 2, axis=-1)
        y = nn.sigmoid(gate) * nn.tanh(filt)
        y = nn.Conv(2 * C, (1,), dtype=self.dtype,
                    name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class DiffWave(nn.Module):
    """Noise-prediction network (reference :344-480).

    ``__call__(audio (B, L), diffusion_step, mel (B, T_mel, n_mels))``
    -> predicted noise (B, L).
    """

    input_channels: int = 80
    residual_layers: int = 30
    residual_channels: int = 64
    dilation_cycle_length: int = 10
    total_steps: int = 50
    unconditional: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio, diffusion_step, spectrogram=None):
        C = self.residual_channels
        x = nn.relu(nn.Conv(C, (1,), dtype=self.dtype,
                            name="input_projection")(audio[..., None]))
        step_emb = DiffusionEmbedding(self.total_steps,
                                      dtype=self.dtype)(diffusion_step)
        cond = None
        if not self.unconditional:
            cond = SpectrogramUpsampler(dtype=self.dtype)(spectrogram)
            cond = cond[:, : x.shape[1], :]
        skip_total = 0.0
        for i in range(self.residual_layers):
            x, skip = ResidualBlock(
                self.input_channels, C,
                2 ** (i % self.dilation_cycle_length),
                uncond=self.unconditional, dtype=self.dtype,
                name=f"res_{i}")(x, step_emb, cond)
            skip_total = skip_total + skip
        y = skip_total / math.sqrt(self.residual_layers)
        y = nn.relu(nn.Conv(C, (1,), dtype=self.dtype,
                            name="skip_projection")(y))
        y = nn.Conv(1, (1,), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    name="output_projection")(y)
        return y[..., 0]


@dataclass
class DiffWaveDiffusion:
    """DDPM wrapper: forward noising for training + the DiffWave
    fast-sampling inference loop (reference :481-666)."""

    model: DiffWave
    timesteps: int = 50
    beta_start: float = 1e-4
    beta_end: float = 0.05

    def __post_init__(self):
        self.betas = np.linspace(self.beta_start, self.beta_end,
                                 self.timesteps)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = np.cumprod(self.alphas)

    # ------------------------------------------------------------ training
    def q_sample(self, x0, t, noise):
        """Noisy sample at step t: sqrt(acum) x0 + sqrt(1-acum) eps."""
        acum = jnp.asarray(self.alphas_cumprod)[t]
        while acum.ndim < x0.ndim:
            acum = acum[..., None]
        return jnp.sqrt(acum) * x0 + jnp.sqrt(1 - acum) * noise

    def train_loss(self, params, x0, mel, rng):
        """Standard DDPM noise-prediction MSE."""
        k_t, k_n = jax.random.split(rng)
        B = x0.shape[0]
        t = jax.random.randint(k_t, (B,), 0, self.timesteps)
        noise = jax.random.normal(k_n, x0.shape, x0.dtype)
        noisy = self.q_sample(x0, t, noise)
        pred = self.model.apply(params, noisy, t, mel)
        return jnp.mean((pred - noise) ** 2)

    # ----------------------------------------------------------- inference
    def _retarget_schedule(self, schedule):
        """Map a fast-sampling noise schedule onto fractional training
        steps (reference ``inference``, :600-628)."""
        inf_alphas = 1 - np.asarray(schedule)
        inf_acum = np.cumprod(inf_alphas)
        steps = []
        for s in range(len(schedule)):
            for t in range(self.timesteps - 1):
                if self.alphas_cumprod[t + 1] <= inf_acum[s] <= \
                        self.alphas_cumprod[t]:
                    tw = (self.alphas_cumprod[t] ** 0.5
                          - inf_acum[s] ** 0.5) / \
                        (self.alphas_cumprod[t] ** 0.5
                         - self.alphas_cumprod[t + 1] ** 0.5)
                    steps.append(t + tw)
                    break
            else:
                steps.append(0.0)
        return np.asarray(schedule), inf_alphas, inf_acum, \
            np.asarray(steps)

    def inference(self, params, condition=None, scale=256, rng=None,
                  unconditional=False, fast_sampling=False,
                  fast_sampling_noise_schedule=None):
        """-> generated audio (B, L). ``scale`` = hop length for
        conditional vocoding (L = scale * T_mel), or the raw length for
        unconditional generation."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if fast_sampling:
            betas, alphas, acum, steps = self._retarget_schedule(
                fast_sampling_noise_schedule)
        else:
            betas, alphas, acum = self.betas, self.alphas, \
                self.alphas_cumprod
            steps = np.arange(self.timesteps, dtype=np.float64)
        if unconditional:
            B, L = 1, scale
        else:
            B, L = condition.shape[0], scale * condition.shape[1]
        k0, rng = jax.random.split(rng)
        audio = jax.random.normal(k0, (B, L))

        @jax.jit
        def denoise(audio, step):
            return self.model.apply(params, audio, step, condition)

        for n in range(len(alphas) - 1, -1, -1):
            c1 = 1 / alphas[n] ** 0.5
            c2 = betas[n] / (1 - acum[n]) ** 0.5
            pred = denoise(audio, jnp.asarray([steps[n]], jnp.float32))
            audio = c1 * (audio - c2 * pred)
            if n > 0:
                kn, rng = jax.random.split(rng)
                sigma = ((1.0 - acum[n - 1]) / (1.0 - acum[n])
                         * betas[n]) ** 0.5
                audio = audio + sigma * jax.random.normal(
                    kn, audio.shape)
            audio = jnp.clip(audio, -1.0, 1.0)
        return audio
