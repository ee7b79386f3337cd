"""Autoencoders (variational + normalizing) for latent-space modelling.

TPU-native equivalents of the reference autoencoder surface
(``vendor/speechbrain/speechbrain/nnet/autoencoders.py:15-482``):

- ``VariationalAutoencoder`` — encoder -> (mean, log_var) heads,
  reparameterised latent sample, decoder; ``train_sample`` returns the
  reconstruction plus everything the ELBO loss needs.
- ``NormalizingAutoencoder`` — non-variational; the latent space is
  constrained by an ordinary normalisation instead of a KL term.

Differences from the reference, by design:
- flax modules with explicit RNG streams (``"latent"``) instead of
  global torch RNG — the whole train_sample is jit-safe.
- Length masking uses the repo-wide relative-length convention
  (``(lens * T).round()``, see ops/masks.py) rather than torch
  ``clean_padding``; semantics are identical (padded frames set to a
  mask value).
- ``NormalizingAutoencoder``'s default norm is a stateless per-batch
  standardisation (the stateful running-stats variant lives in
  ops/normalize.py and can be composed outside the module).
"""

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.ops.masks import length_to_mask, relative_to_absolute_lengths


class VariationalAutoencoderOutput(NamedTuple):
    rec: jnp.ndarray
    latent: jnp.ndarray
    mean: jnp.ndarray
    log_var: jnp.ndarray
    latent_sample: jnp.ndarray
    latent_length: Optional[jnp.ndarray]


class AutoencoderOutput(NamedTuple):
    rec: jnp.ndarray
    latent: jnp.ndarray
    latent_length: Optional[jnp.ndarray]


def _mask_time(x, rel_lengths, mask_value=0.0):
    """Zero (or fill) padded frames along axis 1, (B, T, ...) layout."""
    if rel_lengths is None:
        return x
    lens = relative_to_absolute_lengths(rel_lengths, x.shape[1])
    mask = length_to_mask(lens, x.shape[1])
    mask = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
    return jnp.where(mask, x, jnp.asarray(mask_value, x.dtype))


class VariationalAutoencoder(nn.Module):
    """VAE (arXiv 1312.6114) over (B, T, F) features.

    ``encoder``/``decoder`` are arbitrary flax modules; ``latent_dim``
    sizes the mean/log-var heads (the reference takes separate head
    modules — here they are Dense layers owned by the VAE, the common
    case, keeping the object graph YAML-constructible).
    """

    encoder: nn.Module
    decoder: nn.Module
    latent_dim: int
    mask_latent: bool = True
    mask_out: bool = True
    out_mask_value: float = 0.0
    latent_mask_value: float = 0.0
    latent_stochastic: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.mean_head = nn.Dense(self.latent_dim, dtype=self.dtype,
                                  name="mean")
        self.log_var_head = nn.Dense(self.latent_dim, dtype=self.dtype,
                                     name="log_var")

    def encode(self, x, rel_lengths=None):
        """Deterministic encoding = the posterior mean
        (reference ``autoencoders.py:219-234``)."""
        return self.mean_head(self.encoder(x))

    def decode(self, latent):
        return self.decoder(latent)

    def reparameterize(self, mean, log_var):
        eps = jax.random.normal(self.make_rng("latent"), log_var.shape,
                                jnp.float32).astype(mean.dtype)
        return mean + eps * jnp.exp(0.5 * log_var)

    def train_sample(self, x, rel_lengths=None):
        """Reconstruction + latent stats for the ELBO
        (reference ``autoencoders.py:269-328``)."""
        enc = self.encoder(x)
        mean = self.mean_head(enc)
        log_var = self.log_var_head(enc)
        latent_sample = self.reparameterize(mean, log_var)
        if self.mask_latent:
            latent_sample = _mask_time(latent_sample, rel_lengths,
                                       self.latent_mask_value)
        rec = self.decode(latent_sample)
        rec = rec[:, : x.shape[1]]
        if self.mask_out:
            rec = _mask_time(rec, rel_lengths, self.out_mask_value)
        latent = latent_sample if self.latent_stochastic else mean
        return VariationalAutoencoderOutput(
            rec, latent, mean, log_var, latent_sample, rel_lengths)

    def __call__(self, x, rel_lengths=None):
        return self.encode(x, rel_lengths)


class NormalizingAutoencoder(nn.Module):
    """Classical autoencoder with a normalised latent space
    (reference ``autoencoders.py:341-482``)."""

    encoder: nn.Module
    decoder: nn.Module
    norm: Optional[Callable] = None
    mask_latent: bool = True
    mask_out: bool = True
    out_mask_value: float = 0.0
    latent_mask_value: float = 0.0

    def encode(self, x, rel_lengths=None):
        latent = self.encoder(x)
        if self.norm is not None:
            return self.norm(latent)
        # default: standardise over (time, feature) per example — the
        # stateless analogue of the reference's GlobalNorm default
        mean = latent.mean(axis=tuple(range(1, latent.ndim)),
                           keepdims=True)
        std = latent.std(axis=tuple(range(1, latent.ndim)),
                         keepdims=True)
        return (latent - mean) / (std + 1e-8)

    def decode(self, latent):
        return self.decoder(latent)

    def train_sample(self, x, rel_lengths=None):
        latent = self.encode(x, rel_lengths)
        if self.mask_latent:
            latent = _mask_time(latent, rel_lengths,
                                self.latent_mask_value)
        rec = self.decode(latent)
        rec = rec[:, : x.shape[1]]
        if self.mask_out:
            rec = _mask_time(rec, rel_lengths, self.out_mask_value)
        return AutoencoderOutput(rec, latent, rel_lengths)

    def __call__(self, x, rel_lengths=None):
        return self.encode(x, rel_lengths)


def vae_elbo_loss(output: VariationalAutoencoderOutput, x,
                  rel_lengths=None, kl_weight: float = 1.0):
    """Masked ELBO: MSE reconstruction + KL(q || N(0, I)).

    Loss companion to ``train_sample`` (the reference leaves the loss to
    recipes; provided here so the module is usable end-to-end).
    """
    diff = (output.rec - x) ** 2
    kl = -0.5 * (1 + output.log_var - output.mean ** 2
                 - jnp.exp(output.log_var))
    if rel_lengths is not None:
        lens = relative_to_absolute_lengths(rel_lengths, x.shape[1])
        mask = length_to_mask(lens, x.shape[1])
        m_x = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
        m_z = mask.reshape(mask.shape + (1,) * (kl.ndim - 2))
        rec_loss = (diff * m_x).sum() / jnp.maximum(
            m_x.sum() * x.shape[-1], 1)
        kl_loss = (kl * m_z).sum() / jnp.maximum(
            m_z.sum() * kl.shape[-1], 1)
    else:
        rec_loss = diff.mean()
        kl_loss = kl.mean()
    return rec_loss + kl_weight * kl_loss, (rec_loss, kl_loss)
