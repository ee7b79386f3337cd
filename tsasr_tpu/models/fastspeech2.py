"""FastSpeech2 non-autoregressive text-to-mel model.

TPU-native re-implementation of the reference
``lobes/models/FastSpeech2.py:24-1243``: token prenet, transformer
encoder, variance adaptor (duration / pitch / energy predictors +
embeddings), length regulation, transformer decoder, postnet, and the
training loss.

Redesign — the length regulator: the reference upsamples with
per-utterance ``repeat_interleave`` + pad (dynamic shapes, host loop).
Here the output length is STATIC (``max_mel_len``): frame t maps to the
token whose cumulative duration covers t (a batched searchsorted +
gather), with frames past the total duration masked. Same result,
jit-compilable, no recompiles across batches.
"""

import math
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclass(frozen=True)
class FastSpeech2Config:
    n_vocab: int = 40
    blank_id: int = 0
    d_model: int = 128
    enc_layers: int = 2
    dec_layers: int = 2
    nhead: int = 2
    d_ffn: int = 256
    kernel_size: int = 3
    variance_kernel: int = 3
    n_mels: int = 80
    postnet_channels: int = 128
    postnet_layers: int = 3
    max_mel_len: int = 1000
    dropout: float = 0.1
    pitch_embed_kernel: int = 3
    dtype: Any = jnp.float32


def sinusoidal_positions(T, D, dtype=jnp.float32):
    pos = jnp.arange(T, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, D, 2, dtype=jnp.float32)
                  * -(math.log(10000.0) / D))
    pe = jnp.zeros((T, D), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: (D + 1) // 2]))
    return pe.astype(dtype)


class FFTBlock(nn.Module):
    """Transformer block with conv FFN (FastSpeech's FFT block)."""

    d_model: int
    nhead: int
    d_ffn: int
    kernel_size: int = 3
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic=True):
        attn_mask = None
        if pad_mask is not None:
            attn_mask = (~pad_mask)[:, None, None, :]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=deterministic)(
            x, mask=attn_mask)
        x = nn.LayerNorm(dtype=self.dtype)(x + h)
        h = nn.Conv(self.d_ffn, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.d_model, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = nn.LayerNorm(dtype=self.dtype)(x + h)
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], 0.0, x)
        return x


class VariancePredictor(nn.Module):
    """conv -> LN -> conv -> LN -> linear (reference
    ``DurationPredictor``, :197-266)."""

    channels: int
    kernel_size: int = 3
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        m = (~mask)[..., None].astype(x.dtype)
        h = nn.relu(nn.Conv(self.channels, (self.kernel_size,),
                            padding="SAME", dtype=self.dtype)(x * m))
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.relu(nn.Conv(self.channels, (self.kernel_size,),
                            padding="SAME", dtype=self.dtype)(h * m))
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(1, dtype=self.dtype)(h * m)[..., 0]


def average_over_durations(values, durs):
    """Per-token average of frame-level values (B, T_frames) given
    integer token durations (B, T_tokens) (reference :806-845)."""
    ends = jnp.cumsum(durs, axis=1)
    starts = jnp.concatenate([jnp.zeros_like(ends[:, :1]),
                              ends[:, :-1]], axis=1)
    cums = jnp.concatenate(
        [jnp.zeros_like(values[:, :1]), jnp.cumsum(values, axis=1)],
        axis=1)
    nonzero = jnp.concatenate(
        [jnp.zeros_like(values[:, :1]),
         jnp.cumsum((values != 0).astype(values.dtype), axis=1)], axis=1)
    T = values.shape[1]
    e = jnp.clip(ends, 0, T)
    s = jnp.clip(starts, 0, T)
    sums = jnp.take_along_axis(cums, e, axis=1) - \
        jnp.take_along_axis(cums, s, axis=1)
    counts = jnp.take_along_axis(nonzero, e, axis=1) - \
        jnp.take_along_axis(nonzero, s, axis=1)
    return jnp.where(counts == 0, 0.0, sums / jnp.maximum(counts, 1))


def length_regulate(feats, durs, max_mel_len, pace=1.0):
    """Static-shape length regulator.

    feats (B, T_tok, D); durs (B, T_tok) (float ok; scaled by pace and
    floored like the reference). Returns (frames (B, max_mel_len, D),
    mel_lens (B,)).
    """
    durs = jnp.floor(durs.astype(jnp.float32) * pace).astype(jnp.int32)
    ends = jnp.cumsum(durs, axis=1)                  # (B, T_tok)
    mel_lens = ends[:, -1]
    t = jnp.arange(max_mel_len)
    # token index for frame t: first token whose cumulative end > t
    idx = jax.vmap(lambda e: jnp.searchsorted(e, t, side="right"))(ends)
    idx = jnp.clip(idx, 0, feats.shape[1] - 1)
    frames = jnp.take_along_axis(feats, idx[..., None], axis=1)
    valid = t[None, :] < mel_lens[:, None]
    return jnp.where(valid[..., None], frames, 0.0), mel_lens


class PostNet(nn.Module):
    """Conv postnet with tanh hidden activations (reference
    :109-196)."""

    n_mels: int
    channels: int = 512
    layers: int = 5
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = x
        for i in range(self.layers - 1):
            h = nn.Conv(self.channels, (self.kernel_size,),
                        padding="SAME", dtype=self.dtype)(h)
            h = jnp.tanh(nn.LayerNorm(dtype=self.dtype)(h))
        return nn.Conv(self.n_mels, (self.kernel_size,),
                       padding="SAME", dtype=self.dtype)(h)


class FastSpeech2(nn.Module):
    """Full model (reference :412-806).

    ``__call__(tokens, durations=None, pitch=None, energy=None, ...)``
    -> (mel_post (B, L, n_mels), postnet_mel, log_durations,
    predicted_pitch, avg_pitch, predicted_energy, avg_energy,
    mel_lens). Teacher values (durations/pitch/energy) drive training;
    None at inference (predictions are used).
    """

    config: FastSpeech2Config = field(
        default_factory=FastSpeech2Config)  # type: ignore

    @nn.compact
    def __call__(self, tokens, durations=None, pitch=None, energy=None,
                 pace=1.0, pitch_rate=1.0, energy_rate=1.0,
                 deterministic=True):
        c = self.config
        pad = tokens == c.blank_id                   # (B, T_tok)
        emb = nn.Embed(c.n_vocab, c.d_model, dtype=c.dtype,
                       name="token_embedding")(tokens)
        x = emb + sinusoidal_positions(tokens.shape[1], c.d_model,
                                       emb.dtype)[None]
        x = jnp.where(pad[..., None], 0.0, x)
        for i in range(c.enc_layers):
            x = FFTBlock(c.d_model, c.nhead, c.d_ffn, c.kernel_size,
                         c.dropout, dtype=c.dtype,
                         name=f"enc_{i}")(x, pad, deterministic)

        log_durs = VariancePredictor(
            c.d_model, c.variance_kernel, c.dropout, dtype=c.dtype,
            name="duration_predictor")(x, pad, deterministic)
        if durations is None:
            durations_used = jnp.clip(jnp.exp(log_durs) - 1, 0)
        else:
            durations_used = durations

        pred_pitch = VariancePredictor(
            c.d_model, c.variance_kernel, c.dropout, dtype=c.dtype,
            name="pitch_predictor")(x, pad, deterministic) * pitch_rate
        avg_pitch = None
        if pitch is not None:
            avg_pitch = average_over_durations(pitch, durations)
            pitch_in = avg_pitch
        else:
            pitch_in = pred_pitch
        x = x + nn.Conv(c.d_model, (c.pitch_embed_kernel,),
                        padding="SAME", dtype=c.dtype,
                        name="pitch_embed")(pitch_in[..., None])

        pred_energy = VariancePredictor(
            c.d_model, c.variance_kernel, c.dropout, dtype=c.dtype,
            name="energy_predictor")(x, pad, deterministic) * energy_rate
        avg_energy = None
        if energy is not None:
            avg_energy = average_over_durations(energy, durations)
            energy_in = avg_energy
        else:
            energy_in = pred_energy
        x = x + nn.Conv(c.d_model, (c.pitch_embed_kernel,),
                        padding="SAME", dtype=c.dtype,
                        name="energy_embed")(energy_in[..., None])

        frames, mel_lens = length_regulate(x, durations_used,
                                           c.max_mel_len, pace)
        frame_pad = jnp.arange(c.max_mel_len)[None] >= mel_lens[:, None]
        y = frames + sinusoidal_positions(c.max_mel_len, c.d_model,
                                          frames.dtype)[None]
        y = jnp.where(frame_pad[..., None], 0.0, y)
        for i in range(c.dec_layers):
            y = FFTBlock(c.d_model, c.nhead, c.d_ffn, c.kernel_size,
                         c.dropout, dtype=c.dtype,
                         name=f"dec_{i}")(y, frame_pad, deterministic)

        mel_post = nn.Dense(c.n_mels, dtype=c.dtype, name="mel_linear")(y)
        mel_post = jnp.where(frame_pad[..., None], 0.0, mel_post)
        postnet_mel = mel_post + PostNet(
            c.n_mels, c.postnet_channels, c.postnet_layers,
            dtype=c.dtype, name="postnet")(mel_post, deterministic)
        return (mel_post, postnet_mel, log_durs, pred_pitch, avg_pitch,
                pred_energy, avg_energy, mel_lens)


def fastspeech2_loss(predictions, targets, log_scale_durations=True,
                     dur_weight=1.0, pitch_weight=1.0,
                     energy_weight=1.0):
    """Masked training loss (reference ``Loss``, :987-1243, without the
    optional SSIM term — documented deviation): mel L1 (decoder +
    postnet) + duration MSE in log space + per-token pitch/energy MSE.

    predictions: the model's output tuple; targets: (mel_target
    (B, L, n_mels), durations (B, T_tok), phon_lens (B,),
    mel_lens (B,)).
    """
    (mel_post, postnet_mel, log_durs, pred_pitch, avg_pitch,
     pred_energy, avg_energy, _) = predictions
    mel_target, durations, phon_lens, mel_lens = targets

    L = mel_post.shape[1]
    frame_mask = (jnp.arange(L)[None] < mel_lens[:, None])[..., None]
    tok_mask = jnp.arange(log_durs.shape[1])[None] < phon_lens[:, None]
    denom_f = jnp.maximum(jnp.sum(frame_mask), 1)
    denom_t = jnp.maximum(jnp.sum(tok_mask), 1)

    mel_t = mel_target[:, :L]
    mel_loss = jnp.sum(jnp.abs(mel_post - mel_t) * frame_mask) / \
        (denom_f * mel_post.shape[-1])
    postnet_loss = jnp.sum(jnp.abs(postnet_mel - mel_t) * frame_mask) / \
        (denom_f * mel_post.shape[-1])

    if log_scale_durations:
        target_durs = jnp.log(durations.astype(jnp.float32) + 1)
    else:
        target_durs = durations.astype(jnp.float32)
    dur_loss = jnp.sum(((log_durs - target_durs) ** 2) * tok_mask) / \
        denom_t
    pitch_loss = jnp.sum(((pred_pitch - avg_pitch) ** 2) * tok_mask) / \
        denom_t
    energy_loss = jnp.sum(((pred_energy - avg_energy) ** 2)
                          * tok_mask) / denom_t
    total = mel_loss + postnet_loss + dur_weight * dur_loss + \
        pitch_weight * pitch_loss + energy_weight * energy_loss
    return {"loss": total, "mel_loss": mel_loss,
            "postnet_mel_loss": postnet_loss, "dur_loss": dur_loss,
            "pitch_loss": pitch_loss, "energy_loss": energy_loss}
