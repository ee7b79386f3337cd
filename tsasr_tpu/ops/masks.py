"""Length / attention mask utilities.

TPU-native equivalents of the reference's mask helpers:
- ``length_to_mask`` — ``/root/reference/vendor/speechbrain/speechbrain/dataio/dataio.py:758-800``
- ``get_lookahead_mask`` — ``/root/reference/vendor/speechbrain/speechbrain/lobes/models/transformer/Transformer.py:890-914``

All functions are shape-static and jit-safe.
"""

import jax.numpy as jnp


def relative_to_absolute_lengths(rel_lengths, padded_size):
    """Convert relative lengths in (0, 1] to absolute frame counts.

    Reproduces the reference's rounding convention
    ``(lens * shape).round()`` used consistently for loss masking
    (``nnet/losses.py:58-59``) and normalization
    (``processing/features.py:1014``).

    Arguments
    ---------
    rel_lengths : jnp.ndarray (B,)
        Relative lengths in (0, 1].
    padded_size : int
        The padded time dimension.

    Returns
    -------
    jnp.ndarray (B,) int32 absolute lengths.
    """
    return jnp.round(rel_lengths * padded_size).astype(jnp.int32)


def length_to_mask(lengths, max_len):
    """Boolean mask (B, max_len): True for valid steps, False for padding.

    Arguments
    ---------
    lengths : jnp.ndarray (B,)
        Absolute lengths (int or float; compared with ``<``).
    max_len : int
        Static padded length.
    """
    positions = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return positions < jnp.asarray(lengths)[:, None].astype(jnp.int32)


def lookahead_mask(size, dtype=jnp.bool_):
    """Causal (no-lookahead) mask of shape (size, size).

    True entries are *masked* (future positions), matching the reference's
    convention where ``get_lookahead_mask`` marks disallowed positions
    (there with -inf; here boolean, applied with a large negative fill).
    """
    mask = jnp.triu(jnp.ones((size, size), dtype=jnp.bool_), k=1)
    return mask.astype(dtype)
