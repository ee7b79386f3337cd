"""TTS training losses: Tacotron2 loss + guided attention.

Re-implementation of the reference ``lobes/models/Tacotron2.py::Loss``
(:1578-1720) and ``nnet/loss/guidedattn_loss.py::GuidedAttentionLoss``
(:17-180): mel MSE (pre + postnet) + weighted gate BCE + scheduled
near-diagonal guided-attention penalty.
"""

from typing import NamedTuple

import jax.numpy as jnp


class TacotronLoss(NamedTuple):
    loss: jnp.ndarray
    mel_loss: jnp.ndarray
    gate_loss: jnp.ndarray
    attn_loss: jnp.ndarray
    attn_weight: jnp.ndarray


def guided_attention_weights(input_lengths, target_lengths,
                             max_input_len, max_target_len, sigma=0.2):
    """Soft near-diagonal penalty matrix (B, max_in, max_tgt)
    (reference ``guided_attentions``): 1 - exp(-(i/I - t/T)^2 / 2s^2),
    zero outside the valid lengths."""
    i_mesh = jnp.arange(max_input_len)[None, :, None]
    t_mesh = jnp.arange(max_target_len)[None, None, :]
    I = jnp.reshape(input_lengths, (-1, 1, 1))
    T = jnp.reshape(target_lengths, (-1, 1, 1))
    w = 1.0 - jnp.exp(-((i_mesh / I - t_mesh / T) ** 2)
                      / (2 * sigma ** 2))
    outside = (i_mesh >= I) | (t_mesh >= T)
    return jnp.where(outside, 0.0, w)


def guided_attention_loss(attention, input_lengths, target_lengths,
                          sigma=0.2):
    """Mean penalty over a padded (B, targets, inputs) attention
    (reference ``GuidedAttentionLoss.forward``; doctest value 0.1142
    pinned in tests)."""
    B, max_t, max_i = attention.shape
    w = guided_attention_weights(input_lengths, target_lengths,
                                 max_i, max_t, sigma)
    return jnp.mean(attention * jnp.swapaxes(w, -1, -2))


def tacotron2_loss(model_output, targets, input_lengths,
                   target_lengths, epoch=1, gate_loss_weight=1.0,
                   guided_attention_sigma=0.2,
                   guided_attention_weight=1.0,
                   guided_attention_decay=None,
                   guided_attention_hard_stop=None):
    """Full Tacotron2 training loss (reference ``Loss.forward``).

    model_output: (mel_out (B, n_mel, T), mel_out_postnet, gate_out
    (B, T), alignments (B, T, S)); targets: (mel_target, gate_target).
    ``guided_attention_decay`` optionally multiplies the attention
    weight by decay^epoch; ``hard_stop`` zeroes it past that epoch.
    """
    mel_target, gate_target = targets
    mel_out, mel_out_postnet, gate_out, alignments = model_output

    mel_loss = jnp.mean((mel_out - mel_target) ** 2) + \
        jnp.mean((mel_out_postnet - mel_target) ** 2)

    gate_logits = jnp.reshape(gate_out, (-1,))
    gate_t = jnp.reshape(gate_target, (-1,))
    # BCE-with-logits, mean
    gate_loss = gate_loss_weight * jnp.mean(
        jnp.maximum(gate_logits, 0) - gate_logits * gate_t
        + jnp.log1p(jnp.exp(-jnp.abs(gate_logits))))

    attn_weight = jnp.asarray(guided_attention_weight or 0.0,
                              jnp.float32)
    if guided_attention_decay is not None:
        attn_weight = attn_weight * (guided_attention_decay
                                     ** jnp.maximum(epoch - 1, 0))
    if guided_attention_hard_stop is not None:
        attn_weight = jnp.where(epoch > guided_attention_hard_stop,
                                0.0, attn_weight)
    attn_loss = attn_weight * guided_attention_loss(
        alignments, input_lengths, target_lengths,
        guided_attention_sigma)

    total = mel_loss + gate_loss + attn_loss
    return TacotronLoss(total, mel_loss, gate_loss, attn_loss,
                        attn_weight)
