"""Dropout whose backward pass regenerates the mask from the PRNG key
instead of saving it.

Why: the production train step has ~72 dropout sites (the two
(B*T, d_ffn) inner-FFN masks per conformer layer dominating). Under
plain ``nn.Dropout`` the mask is a residual of the forward pass — XLA
stores it in HBM and reads it back in the backward, several hundred MB
per step at the bench config. Profiling (`reports/perf_r3.md` 4b) puts
the total dropout cost at ~17 ms of a 96 ms step.

This implementation is a ``jax.custom_vjp`` whose only residual is the
(tiny) PRNG key: the backward re-runs the bit generator to rebuild the
mask. JAX PRNGs are deterministic functions of the key, so forward and
backward masks are bit-identical; with the hardware ``rbg`` generator
(the production default, see ``training/brain.py``) regeneration is far
cheaper than the HBM round-trip it replaces. Unlike a remat policy
(measured regression, perf_r3.md 4b) this recomputes ONLY the mask —
every other residual is kept.

Semantics match ``flax.linen.Dropout`` exactly: keep probability
``1 - rate``, kept elements scaled by ``1/(1 - rate)``, mask drawn with
``jax.random.bernoulli`` at the input's shape.
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


def _mask_scale(x, key, rate):
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dropout(x, key, rate):
    """Apply dropout; backward regenerates the mask from ``key``."""
    return _mask_scale(x, key, rate)


def _dropout_fwd(x, key, rate):
    return _mask_scale(x, key, rate), key


def _dropout_bwd(rate, key, g):
    # Same key, same bernoulli call -> bit-identical mask.
    return _mask_scale(g, key, rate), None


dropout.defvjp(_dropout_fwd, _dropout_bwd)


class Dropout(nn.Module):
    """Drop-in ``nn.Dropout`` replacement with key-only residuals.

    Uses the same ``'dropout'`` rng stream and the same
    constructor/call signature (``deterministic`` as attribute or call
    argument); only the backward-pass memory behavior differs (mask
    recomputed, never stored).
    """

    rate: float
    deterministic: bool = None

    # NOT @nn.compact: no params/submodules, and plain methods may be
    # called any number of times on one instance (rnn.py reuses one
    # Dropout across layers, like nn.Dropout allows)
    def __call__(self, x, deterministic=None):
        det = (deterministic if deterministic is not None
               else self.deterministic)
        if det is None:
            det = True
        if det or self.rate == 0.0:
            return x
        return dropout(x, self.make_rng("dropout"), self.rate)
