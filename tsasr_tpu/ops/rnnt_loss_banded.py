"""Banded (pruned) RNN-T loss: the joint is evaluated only on a diagonal
band of W label positions per encoder frame, so nothing of size
(B, T, U+1, ·) is ever materialized.

This removes the reference recipe's peak-memory ceiling (the full
(B, T, U+1, joint_dim) joint activations + (B, T, U+1, V) logits for
60 s utterances — SURVEY.md §7 hard-part 1). It is the k2-style
"pruned transducer" idea with a fixed monotonic band instead of learned
pruning bounds: for each frame t the band covers label positions

    u in [c(t), c(t) + W),  c(t) = clip(round(t·U/(T-1)) - W//2,
                                        0, max(U+1-W, 0))

which always contains u=0 at t=0 and u=U at t=T-1, so the loss is EXACT
whenever W >= U+1 (the band then covers the whole lattice; tests pin
this) and a tight lower bound on path mass otherwise — alignments are
monotonic, so a band a few dozen labels wide loses negligible
probability for speech.

The lattice recurrence runs as a ``lax.scan`` over rows (frames); the
in-row dependency is solved with the same parallel log-cumsum-exp
factorization as the fused Pallas kernel (``rnnt_loss_pallas.py``), and
gradients come from plain autodiff through the scan (O(B·W) carry).
Reference loss semantics (lengths, blank, reductions) match
``nnet/losses.py:29-87``.
"""

import jax
import jax.numpy as jnp

from tsasr_tpu.ops.rnnt_loss import NEG, _logaddexp


def band_centers(t_lens, u_lens, T, W):
    """Band start positions c (B, T) for per-example lengths.

    ``t_lens``/``u_lens`` are absolute lengths; T is the padded frame
    count. Monotonic nondecreasing in t; c(0) = 0; the band at frame
    t_len-1 always contains u = u_len.
    """
    t = jnp.arange(T)[None, :]
    tl = jnp.maximum(t_lens[:, None] - 1, 1)
    ul = u_lens[:, None]
    ideal = jnp.round(t * ul / tl).astype(jnp.int32) - W // 2
    hi = jnp.maximum(ul + 1 - W, 0)
    return jnp.clip(ideal, 0, hi)


def _shift_left_neg(x, d):
    """out[b, j] = x[b, j + d[b]] with NEG fill (d >= 0, per batch)."""
    B, W = x.shape
    j = jnp.arange(W)[None, :]
    idx = j + d[:, None]
    valid = idx < W
    gathered = jnp.take_along_axis(x, jnp.minimum(idx, W - 1), axis=1)
    return jnp.where(valid, gathered, NEG)


def _logcumsumexp(x):
    """Inclusive left-to-right log-cumsum-exp along the last axis."""
    n = x.shape[-1]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(shift, 0)],
                          constant_values=NEG)[..., :-shift]
        x = _logaddexp(x, shifted)
        shift *= 2
    return x


def rnnt_loss_banded(logits_band, labels, centers, logit_lengths,
                     label_lengths, blank=0, reduction="mean"):
    """Banded RNN-T negative log-likelihood.

    Arguments
    ---------
    logits_band : (B, T, W, V) joint logits on the band (see
        ``band_centers`` / ``TSTransducer.joint_logits_banded``).
    labels : (B, U) int32 targets (no blanks).
    centers : (B, T) int32 band start positions (from ``band_centers``).
    logit_lengths / label_lengths : (B,) absolute lengths.
    """
    logits_band = logits_band.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    centers = centers.astype(jnp.int32)
    logit_lengths = logit_lengths.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)

    B, T, W, V = logits_band.shape
    U = labels.shape[1]
    log_probs = jax.nn.log_softmax(logits_band, axis=-1)
    lpb = log_probs[..., blank]                             # (B, T, W)

    j = jnp.arange(W)[None, None, :]
    u_abs = centers[:, :, None] + j                         # (B, T, W)
    Ul = label_lengths[:, None, None]
    lab_ids = jnp.take_along_axis(
        jnp.broadcast_to(labels[:, None, :], (B, T, U)) if U > 0 else
        jnp.zeros((B, T, 1), jnp.int32),
        jnp.clip(u_abs, 0, max(U - 1, 0)), axis=2)
    lpl = jnp.take_along_axis(log_probs, lab_ids[..., None],
                              axis=-1)[..., 0]
    lpl = jnp.where(u_abs < Ul, lpl, NEG)                   # (B, T, W)

    jj = jnp.arange(W)[None, :]
    Tl = logit_lengths[:, None]
    Ulb = label_lengths[:, None]

    def row_step(carry, xs):
        a_prev, logz, c_prev = carry
        lpb_row, lpl_row, lpb_prev, c_t, t = xs
        # blank transitions arrive from row t-1, re-aligned to this
        # row's band offset
        d = c_t - c_prev
        seed = _shift_left_neg(a_prev + lpb_prev, d)
        # row 0 seeds the lattice at u = 0 (band starts at 0 there)
        seed = jnp.where(t == 0,
                         jnp.where(jj == 0, 0.0, NEG), seed)
        u_row = c_t[:, None] + jj
        seed = jnp.where(u_row <= Ulb, seed, NEG)
        # in-row label recurrence as a parallel log-cumsum-exp
        p = jnp.where(u_row < Ulb, lpl_row, 0.0)
        cum_p = jnp.cumsum(p, axis=1) - p                   # exclusive
        row = cum_p + _logcumsumexp(seed - cum_p)
        row = jnp.where(u_row <= Ulb, row, NEG)
        # logZ = alpha[Tl-1, Ul] + blank[Tl-1, Ul]
        terminal = jnp.sum(
            jnp.where((u_row == Ulb) & (t == Tl - 1), row + lpb_row, 0.0),
            axis=1)
        logz = jnp.where(t[:, 0] == Tl[:, 0] - 1, terminal, logz)
        return (row, logz, c_t), None

    lpb_prev_rows = jnp.concatenate(
        [jnp.full((B, 1, W), NEG), lpb[:, :-1]], axis=1)
    t_bcast = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    xs = (jnp.moveaxis(lpb, 1, 0), jnp.moveaxis(lpl, 1, 0),
          jnp.moveaxis(lpb_prev_rows, 1, 0),
          jnp.moveaxis(centers, 1, 0),
          jnp.moveaxis(t_bcast[..., None], 1, 0))
    init = (jnp.full((B, W), NEG), jnp.full((B,), NEG),
            jnp.zeros((B,), jnp.int32))
    (_, logz, _), _ = jax.lax.scan(row_step, init, xs)
    losses = -logz

    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "batchmean":
        return jnp.sum(losses) / losses.shape[0]
    if reduction == "sum":
        return jnp.sum(losses)
    if reduction == "none":
        return losses
    raise ValueError(f"Unknown reduction: {reduction}")
