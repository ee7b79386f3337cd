"""General loss functions (beyond the transducer loss).

Equivalents of the reference's general loss library
(``vendor/speechbrain/speechbrain/nnet/losses.py``): nll / mse / l1 / bce
with relative-length masking, CTC, knowledge-distillation losses, and the
permutation-invariant-training (PIT) wrapper. All jit-safe, lengths
follow the ``(lens * shape).round()`` convention.
"""

import itertools

import jax
import jax.numpy as jnp
import optax

from tsasr_tpu.ops.masks import length_to_mask


def _masked_reduce(losses, lengths, reduction="mean"):
    """Reduce per-step losses (B, T, ...) with relative-length masking."""
    if losses.ndim > 2:
        losses = losses.reshape(losses.shape[0], losses.shape[1], -1)
        losses = losses.mean(axis=-1)
    B, T = losses.shape
    if lengths is not None:
        counts = jnp.round(lengths * T).astype(jnp.int32)
        mask = length_to_mask(counts, T).astype(losses.dtype)
    else:
        mask = jnp.ones_like(losses)
    if reduction == "mean":
        return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    if reduction == "batchmean":
        per = jnp.sum(losses * mask, axis=1) / \
            jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        return jnp.mean(per)
    if reduction == "batch":
        return jnp.sum(losses * mask, axis=1) / \
            jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    if reduction == "sum":
        return jnp.sum(losses * mask)
    if reduction == "none":
        return losses * mask
    raise ValueError(f"reduction={reduction}")


def nll_loss(log_probs, targets, length=None, label_smoothing=0.0,
             reduction="mean"):
    """Negative log-likelihood over (B, T, C) log-probs + (B, T) ids."""
    picked = jnp.take_along_axis(log_probs,
                                 targets[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    loss = -picked
    if label_smoothing > 0:
        uniform = -jnp.mean(log_probs, axis=-1)
        loss = (1 - label_smoothing) * loss + label_smoothing * uniform
    return _masked_reduce(loss, length, reduction)


def mse_loss(predictions, targets, length=None, reduction="mean"):
    return _masked_reduce((predictions - targets) ** 2, length, reduction)


def l1_loss(predictions, targets, length=None, reduction="mean"):
    return _masked_reduce(jnp.abs(predictions - targets), length,
                          reduction)


def bce_loss(logits, targets, length=None, weight=None, pos_weight=None,
             reduction="mean"):
    """Binary cross-entropy with logits."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pos = targets * log_p
    if pos_weight is not None:
        pos = pos * pos_weight
    loss = -(pos + (1 - targets) * log_not_p)
    if weight is not None:
        loss = loss * weight
    if loss.ndim == 1:
        loss = loss[:, None]
    return _masked_reduce(loss, length, reduction)


def ctc_loss(log_probs, targets, input_lens, target_lens, blank_index=0,
             reduction="mean"):
    """CTC loss over (B, T, C) log-probs; relative lengths.

    Uses optax's CTC (an XLA lattice) with the reference's
    blank/length conventions (``nnet/losses.py`` ctc wrapper).
    """
    T = log_probs.shape[1]
    U = targets.shape[1]
    in_abs = jnp.round(input_lens * T).astype(jnp.int32)
    tg_abs = jnp.round(target_lens * U).astype(jnp.int32)
    logit_padding = (jnp.arange(T)[None, :] >= in_abs[:, None]
                     ).astype(jnp.float32)
    label_padding = (jnp.arange(U)[None, :] >= tg_abs[:, None]
                     ).astype(jnp.float32)
    losses = optax.ctc_loss(log_probs, logit_padding,
                            targets.astype(jnp.int32), label_padding,
                            blank_id=blank_index)
    if reduction == "mean":
        return jnp.mean(losses / jnp.maximum(tg_abs, 1))
    if reduction == "batchmean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    if reduction in ("none", "batch"):
        return losses
    raise ValueError(f"reduction={reduction}")


def kldiv_loss(log_probs, targets, length=None, label_smoothing=0.0,
               reduction="mean", pad_idx=0):
    """KL divergence between target distribution and predicted log-probs
    (the reference uses it for label-smoothed seq training)."""
    if targets.ndim == log_probs.ndim:          # soft targets
        loss = jnp.sum(
            jnp.where(targets > 0,
                      targets * (jnp.log(jnp.maximum(targets, 1e-10))
                                 - log_probs), 0.0), axis=-1)
        return _masked_reduce(loss, length, reduction)
    return nll_loss(log_probs, targets, length, label_smoothing,
                    reduction)


def distillation_loss(student_log_probs, teacher_probs, length=None,
                      reduction="mean"):
    """Cross-entropy against teacher posteriors (kd loss family)."""
    loss = -jnp.sum(teacher_probs * student_log_probs, axis=-1)
    return _masked_reduce(loss, length, reduction)


class PitWrapper:
    """Permutation-invariant training over the sources axis.

    Functional equivalent of the reference ``PitWrapper``
    (``nnet/losses.py:91-225``): evaluates the base loss under every
    source permutation (sources = last axis) and keeps the best one per
    batch element. ``base_loss(pred, target) -> (B,)`` per-element loss.
    Jit-safe: returns the winning permutation as indices into the static
    permutation table (``PitWrapper.permutations(n)``).
    """

    def __init__(self, base_loss):
        self.base_loss = base_loss

    @staticmethod
    def permutations(n_sources):
        return list(itertools.permutations(range(n_sources)))

    def __call__(self, predictions, targets):
        perms = self.permutations(predictions.shape[-1])
        losses = jnp.stack([
            self.base_loss(predictions[..., jnp.asarray(p)], targets)
            for p in perms])                                   # (P, B)
        best_idx = jnp.argmin(losses, axis=0)                  # (B,)
        return jnp.min(losses, axis=0), best_idx

    def reorder_tensor(self, tensor, best_idx):
        """Apply the winning permutation per batch element."""
        perms = jnp.asarray(self.permutations(tensor.shape[-1]))
        chosen = perms[best_idx]                               # (B, S)
        return jnp.take_along_axis(
            tensor, chosen.reshape(chosen.shape[0],
                                   *(1,) * (tensor.ndim - 2),
                                   chosen.shape[-1]), axis=-1)


def si_snr_loss(predictions, targets, eps=1e-8):
    """Negative scale-invariant SNR per (batch, source).

    predictions/targets: (B, L, S). Matches the reference
    ``cal_si_snr`` convention (``nnet/losses.py`` get_si_snr_with_pitwrapper
    path): zero-mean, project estimate onto target, -10 log10 ratio.
    Returns (B, S); pair with :class:`PitWrapper` (sources = last axis)
    by reducing over sources in the wrapped base loss.
    """
    predictions = predictions - jnp.mean(predictions, axis=1,
                                         keepdims=True)
    targets = targets - jnp.mean(targets, axis=1, keepdims=True)
    dot = jnp.sum(predictions * targets, axis=1, keepdims=True)
    energy = jnp.sum(targets ** 2, axis=1, keepdims=True) + eps
    s_target = dot / energy * targets
    e_noise = predictions - s_target
    ratio = (jnp.sum(s_target ** 2, axis=1)
             / (jnp.sum(e_noise ** 2, axis=1) + eps))
    return -10.0 * jnp.log10(ratio + eps)                   # (B, S)


def si_snr_pit_loss(predictions, targets):
    """Permutation-invariant mean negative SI-SNR -> ((B,), best_idx)."""
    pit = PitWrapper(
        lambda p, t: jnp.mean(si_snr_loss(p, t), axis=-1))
    return pit(predictions, targets)
