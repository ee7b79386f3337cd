"""Gumbel-softmax vector quantiser (wav2vec2-style, multi-group).

TPU-native re-implementation of the reference quantiser
(``vendor/speechbrain/speechbrain/nnet/quantisers.py:13-127``): project
features to per-group codebook logits, sample a hard code with the
straight-through Gumbel-softmax estimator at train time (argmax one-hot
at eval), and concatenate the per-group codewords.

Design notes (TPU-first):
- The reference materialises ``onehot[..., None] * vars`` (N, G*V, D)
  and reduces it; here the codebook lookup is a single einsum over the
  (num_vars) axis per group — a batched matmul the MXU tiles directly.
- Sampling noise comes from an explicit flax RNG stream (``"gumbel"``)
  instead of global RNG state, so the quantiser is jit-safe and
  reproducible.
- The temperature is an argument (annealed by the caller per step, the
  equivalent of the reference's ``update_temp``) so the module stays
  stateless inside the compiled step.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def gumbel_softmax(logits, key, tau=1.0, hard=True, axis=-1):
    """Gumbel-softmax sample with optional straight-through hard output.

    Equivalent to ``torch.nn.functional.gumbel_softmax``: the forward
    value of the hard path is the one-hot argmax of the perturbed
    logits; its gradient is that of the soft sample.
    """
    gumbel = jax.random.gumbel(key, logits.shape, jnp.float32)
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + gumbel) / tau,
                            axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], axis=axis,
                            dtype=y_soft.dtype)
    return y_soft + jax.lax.stop_gradient(y_hard - y_soft)


def anneal_temperature(step, max_temp=2.0, min_temp=0.25,
                       temp_decay=0.999995):
    """Reference temperature schedule: ``max(max*decay**step, min)``
    (``nnet/quantisers.py:70-74``). jit-safe (works on traced steps)."""
    return jnp.maximum(max_temp * temp_decay ** step, min_temp)


class GumbelVectorQuantizer(nn.Module):
    """Multi-group Gumbel vector quantisation.

    Returns a dict with the quantised output ``x`` (B, T, vq_dim), the
    code/prob perplexities (codebook-usage diagnostics used by the
    wav2vec2 diversity loss), ``num_vars`` and ``temp`` — the same
    result surface as the reference module.
    """

    num_vars: int
    groups: int
    vq_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temp: float = 1.0,
                 deterministic: bool = False) -> Dict[str, Any]:
        if self.vq_dim % self.groups:
            raise ValueError(
                f"vq_dim {self.vq_dim} must be divisible by groups "
                f"{self.groups}")
        var_dim = self.vq_dim // self.groups
        b, t, _ = x.shape
        n, g, v = b * t, self.groups, self.num_vars

        # codebook: uniform [0,1) like the reference's nn.init.uniform_
        codebook = self.param(
            "vars", lambda key: jax.random.uniform(key, (g, v, var_dim)),
        ).astype(self.dtype)
        logits = nn.Dense(
            g * v, dtype=self.dtype, name="weight_proj",
            kernel_init=nn.initializers.normal(1.0),
        )(x).reshape(n, g, v)

        flat = logits.astype(jnp.float32)
        hard = jax.nn.one_hot(jnp.argmax(flat, -1), v)
        hard_probs = hard.mean(0)                       # (g, v)
        code_perplexity = jnp.exp(
            -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), -1)).sum()
        avg_probs = jax.nn.softmax(flat, -1).mean(0)
        prob_perplex = jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), -1)).sum()

        if deterministic:
            onehot = hard.astype(self.dtype)
        else:
            onehot = gumbel_softmax(
                logits, self.make_rng("gumbel"), tau=temp,
                hard=True).astype(self.dtype)

        # (n,g,v) @ (g,v,d) -> (n,g,d): one batched matmul per group
        quantised = jnp.einsum("ngv,gvd->ngd", onehot, codebook)
        return {
            "x": quantised.reshape(b, t, self.vq_dim),
            "code_perplexity": code_perplexity,
            "prob_perplex": prob_perplex,
            "num_vars": v * g,
            "temp": temp,
        }
