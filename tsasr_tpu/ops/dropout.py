"""Dropout ops: reduced-width random bits and key-only residuals.

Two orthogonal knobs over ``flax.linen.Dropout`` semantics, both
motivated by profiling the production train step (~72 dropout sites, the
two (B*T, d_ffn) inner-FFN masks per conformer layer dominating;
``reports/perf_r3.md`` 4b puts the total dropout cost at ~17 ms of a
96 ms step):

1. ``bits`` — the width of the random draw per mask element.

   ``bits=32`` (default) is ``jax.random.bernoulli``: a 32-bit draw
   converted to float and compared — exactly ``nn.Dropout``.
   ``bits=8`` / ``bits=16`` draw raw uint8/uint16 bits and compare
   against an integer threshold: 4x / 2x fewer random bits from the
   generator and an integer (VPU-cheap) compare instead of a float
   convert+compare. The keep probability is quantized to 1/2**bits
   resolution (e.g. keep=0.9 at bits=8 becomes 230/256 = 0.8984) —
   irrelevant for regularization noise, so the production config uses
   bits=8 (measured: see reports/perf_r3.md); every parity/equivalence
   test keeps the exact bits=32 path.

2. ``key_only`` — a ``jax.custom_vjp`` whose only backward residual is
   the (tiny) PRNG key: the backward re-runs the bit generator to
   rebuild the mask instead of reading it back from HBM. JAX PRNGs are
   deterministic functions of the key, so forward and backward masks
   are bit-identical. Measured perf-neutral at production shapes (XLA
   already avoids the mask round-trip), kept as the guaranteed-
   memory-free variant for long-T configs. Unlike a remat policy
   (measured regression, perf_r3.md 4b) this recomputes ONLY the mask.

Semantics match ``flax.linen.Dropout``: keep probability ``1 - rate``,
kept elements scaled by ``1/(1 - rate)``, mask drawn at the input's
shape from the ``'dropout'`` rng stream.
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


def keep_mask(key, keep_prob, shape, bits=32):
    """Boolean keep-mask; ``bits`` selects the random-draw width."""
    if bits == 32:
        return jax.random.bernoulli(key, keep_prob, shape)
    dtype = {8: jnp.uint8, 16: jnp.uint16}[bits]
    # threshold on raw uint bits: keep iff bits < round(keep * 2**bits).
    # Clamp to the dtype max so keep_prob ~ 1.0 cannot wrap to 0.
    thr = min(int(round(keep_prob * (1 << bits))), (1 << bits) - 1)
    return jax.random.bits(key, shape, dtype=dtype) < dtype(thr)


def _mask_scale(x, key, rate, bits):
    keep = keep_mask(key, 1.0 - rate, x.shape, bits)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dropout(x, key, rate, bits):
    return _mask_scale(x, key, rate, bits)


def _dropout_fwd(x, key, rate, bits):
    return _mask_scale(x, key, rate, bits), key


def _dropout_bwd(rate, bits, key, g):
    # Same key, same bit draw -> bit-identical mask.
    return _mask_scale(g, key, rate, bits), None


_dropout.defvjp(_dropout_fwd, _dropout_bwd)


def dropout(x, key, rate, bits=32):
    """Apply dropout; backward regenerates the mask from ``key``."""
    return _dropout(x, key, rate, bits)


class Dropout(nn.Module):
    """Drop-in ``nn.Dropout`` replacement with ``bits``/``key_only``.

    Defaults (``bits=32, key_only=False``) reproduce ``nn.Dropout``
    exactly (same rng stream, same mask, same lowering). ``bits=8/16``
    draws narrower random bits (above); ``key_only=True`` switches to
    the custom-vjp op whose only residual is the PRNG key.
    """

    rate: float
    deterministic: bool = None
    bits: int = 32
    key_only: bool = False

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
        key = self.make_rng("dropout")
        if self.key_only:
            return dropout(x, key, self.rate, self.bits)
        return _mask_scale(x, key, self.rate, self.bits)
