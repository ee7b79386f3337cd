"""Whisper encoder-decoder: JAX/flax port of the HF architecture.

Reference surface: ``vendor/speechbrain/speechbrain/lobes/models/
huggingface_whisper.py`` (:1-337) — a torch wrapper around HF
``WhisperModel`` providing ``forward`` / ``forward_encoder`` /
``forward_decoder`` plus whisper's exact log-mel frontend
(``_get_mel``/``_log_mel_spectrogram``/``_pad_or_trim``, :217-300).

TPU-first design (the ``models/wavlm.py`` pattern):
- the architecture is ported to flax so the whole encode (and any
  fine-tuning) runs inside the jit program on device — the reference
  calls a frozen torch module on host per batch;
- the log-mel frontend is jnp (matmul mel projection on the MXU),
  numerically matching HF's ``WhisperFeatureExtractor``;
- ``load_hf_whisper_params`` converts an HF torch state dict to this
  module's parameter tree; parity is pinned against a random-init HF
  ``WhisperModel`` in ``tests/test_whisper.py`` (no weights can be
  downloaded on this host — zero egress; with a local checkpoint dir
  the same converter loads real weights).
"""

import math
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.ops.masks import lookahead_mask

Dtype = Any
NEG = -1e9


@dataclass(frozen=True)
class WhisperJAXConfig:
    """Mirrors HF ``WhisperConfig`` (the fields the model uses)."""

    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 512
    encoder_layers: int = 6
    encoder_attention_heads: int = 8
    decoder_layers: int = 6
    decoder_attention_heads: int = 8
    encoder_ffn_dim: int = 2048
    decoder_ffn_dim: int = 2048
    max_source_positions: int = 1500
    max_target_positions: int = 448
    dtype: Any = jnp.float32

    @classmethod
    def from_hf_dict(cls, d):
        keys = {f for f in cls.__dataclass_fields__ if f != "dtype"}
        return cls(**{k: v for k, v in d.items() if k in keys})


class WhisperAttention(nn.Module):
    """HF ``WhisperAttention``: q scaled by head_dim**-0.5, k_proj has
    no bias."""

    embed_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None, attn_mask=None):
        kv = x if kv is None else kv
        D, H = self.embed_dim, self.num_heads
        Dh = D // H
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(x) * Dh ** -0.5
        k = nn.Dense(D, use_bias=False, dtype=self.dtype,
                     name="k_proj")(kv)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(kv)
        B, Tq = x.shape[:2]
        Tk = kv.shape[1]
        q = q.reshape(B, Tq, H, Dh)
        k = k.reshape(B, Tk, H, Dh)
        v = v.reshape(B, Tk, H, Dh)
        scores = jnp.einsum("bthd,bshd->bhts", q, k)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[None, None], NEG, scores)
        attn = nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, Tq, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class _WhisperFFN(nn.Module):
    ffn_dim: int
    d_model: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(self.d_model, dtype=self.dtype,
                        name="fc2")(nn.gelu(h, approximate=False))


class WhisperEncoderLayer(nn.Module):
    config: WhisperJAXConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="self_attn_layer_norm")(x)
        x = x + WhisperAttention(c.d_model, c.encoder_attention_heads,
                                 c.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="final_layer_norm")(x)
        return x + _WhisperFFN(c.encoder_ffn_dim, c.d_model, c.dtype,
                               name="ffn")(h)


class WhisperDecoderLayer(nn.Module):
    config: WhisperJAXConfig

    @nn.compact
    def __call__(self, x, enc):
        c = self.config
        causal = lookahead_mask(x.shape[1])
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="self_attn_layer_norm")(x)
        x = x + WhisperAttention(c.d_model, c.decoder_attention_heads,
                                 c.dtype, name="self_attn")(
            h, attn_mask=causal)
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype,
                         name="encoder_attn_layer_norm")(x)
        x = x + WhisperAttention(c.d_model, c.decoder_attention_heads,
                                 c.dtype, name="encoder_attn")(h, enc)
        h = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="final_layer_norm")(x)
        return x + _WhisperFFN(c.decoder_ffn_dim, c.d_model, c.dtype,
                               name="ffn")(h)


class WhisperJAX(nn.Module):
    """HF ``WhisperModel`` forward parity: ``encode`` takes log-mel
    (B, num_mel_bins, 2 * max_source_positions) and returns
    (B, max_source_positions, d_model); ``decode`` is teacher-forced
    over decoder input ids."""

    config: WhisperJAXConfig

    def setup(self):
        c = self.config
        self.conv1 = nn.Conv(c.d_model, (3,), padding=((1, 1),),
                             dtype=c.dtype, name="conv1")
        self.conv2 = nn.Conv(c.d_model, (3,), strides=(2,),
                             padding=((1, 1),), dtype=c.dtype,
                             name="conv2")
        self.enc_pos = self.param(
            "enc_pos", nn.initializers.normal(0.02),
            (c.max_source_positions, c.d_model))
        self.encoder_layers_ = [
            WhisperEncoderLayer(c, name=f"enc_layer_{i}")
            for i in range(c.encoder_layers)]
        self.encoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="enc_norm")
        self.embed_tokens = nn.Embed(c.vocab_size, c.d_model,
                                     dtype=c.dtype, name="embed_tokens")
        self.dec_pos = self.param(
            "dec_pos", nn.initializers.normal(0.02),
            (c.max_target_positions, c.d_model))
        self.decoder_layers_ = [
            WhisperDecoderLayer(c, name=f"dec_layer_{i}")
            for i in range(c.decoder_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="dec_norm")

    def encode(self, mel):
        """mel (B, num_mel_bins, T_frames) — HF channel-first layout."""
        x = mel.swapaxes(1, 2)                       # (B, T, n_mels)
        x = nn.gelu(self.conv1(x), approximate=False)
        x = nn.gelu(self.conv2(x), approximate=False)
        x = x + self.enc_pos[: x.shape[1]][None]
        for layer in self.encoder_layers_:
            x = layer(x)
        return self.encoder_norm(x)

    def decode(self, decoder_input_ids, encoder_out):
        x = self.embed_tokens(decoder_input_ids)
        x = x + self.dec_pos[: x.shape[1]][None]
        for layer in self.decoder_layers_:
            x = layer(x, encoder_out)
        return self.decoder_norm(x)

    def __call__(self, mel, decoder_input_ids=None):
        enc = self.encode(mel)
        if decoder_input_ids is None:
            return enc
        return enc, self.decode(decoder_input_ids, enc)

    def decode_logits(self, decoder_input_ids, encoder_out):
        """LM logits via the tied token embedding (HF
        WhisperForConditionalGeneration.proj_out)."""
        h = self.decode(decoder_input_ids, encoder_out)
        return h @ self.embed_tokens.embedding.T


# ---------------------------------------------------------------- frontend
def whisper_mel_filters(n_mels=80, n_fft=400, sample_rate=16000):
    """Slaney-normalized mel filterbank, numerically matching HF's
    ``WhisperFeatureExtractor.mel_filters`` (librosa convention)."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        log_step = 27.0 / np.log(6.4)
        return np.where(f >= 1000.0,
                        15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                        * log_step, mel)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        log_step = np.log(6.4) / 27.0
        return np.where(m >= 15.0, 1000.0 * np.exp(log_step * (m - 15.0)),
                        200.0 * m / 3.0)

    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0),
                                    n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2: n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)          # (n_mels, n_freqs)


def log_mel_spectrogram(wav, mel_filters=None, n_fft=400, hop=160,
                        n_samples=480000):
    """Whisper's exact log-mel frontend (the reference's
    ``_pad_or_trim`` + ``_log_mel_spectrogram``, huggingface_whisper.py
    :253-300): pad/trim to 30 s, hann STFT, |.|^2 dropping the last
    frame, mel, log10 clamp, dynamic-range clamp at max-8, (x+4)/4.

    wav (B, L) float32 -> (B, n_mels, n_samples//hop).
    """
    if mel_filters is None:
        mel_filters = whisper_mel_filters(n_fft=n_fft)
    L = wav.shape[-1]
    if L < n_samples:
        wav = jnp.pad(wav, ((0, 0), (0, n_samples - L)))
    else:
        wav = wav[:, :n_samples]
    window = jnp.hanning(n_fft + 1)[:-1].astype(jnp.float32)
    # centered frames (reflect pad n_fft//2), matmul DFT on the MXU
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])
    frames = x[:, idx] * window                     # (B, F, n_fft)
    k = jnp.arange(n_fft // 2 + 1)
    ang = -2 * math.pi * k[None, :] * jnp.arange(n_fft)[:, None] / n_fft
    real = frames @ jnp.cos(ang)
    imag = frames @ jnp.sin(ang)
    mag2 = (real ** 2 + imag ** 2)[:, :-1]          # drop last frame
    mel = mag2 @ jnp.asarray(mel_filters).T         # (B, F-1, n_mels)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(
        log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0)
    return ((log_spec + 4.0) / 4.0).swapaxes(1, 2)


# ------------------------------------------------------------ HF weights
def _t(w):
    return jnp.asarray(np.asarray(w).T)


def load_hf_whisper_params(state_dict, config):
    """HF ``WhisperModel.state_dict()`` -> this module's params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def attn(prefix):
        out = {}
        for name in ("q_proj", "v_proj", "out_proj"):
            out[name] = {"kernel": _t(sd[f"{prefix}.{name}.weight"]),
                         "bias": jnp.asarray(sd[f"{prefix}.{name}.bias"])}
        out["k_proj"] = {"kernel": _t(sd[f"{prefix}.k_proj.weight"])}
        return out

    def ln(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def ffn(prefix):
        return {"fc1": {"kernel": _t(sd[f"{prefix}.fc1.weight"]),
                        "bias": jnp.asarray(sd[f"{prefix}.fc1.bias"])},
                "fc2": {"kernel": _t(sd[f"{prefix}.fc2.weight"]),
                        "bias": jnp.asarray(sd[f"{prefix}.fc2.bias"])}}

    params = {
        # torch conv1d weight (out, in, k) -> flax (k, in, out)
        "conv1": {"kernel": jnp.asarray(
            sd["encoder.conv1.weight"].transpose(2, 1, 0)),
            "bias": jnp.asarray(sd["encoder.conv1.bias"])},
        "conv2": {"kernel": jnp.asarray(
            sd["encoder.conv2.weight"].transpose(2, 1, 0)),
            "bias": jnp.asarray(sd["encoder.conv2.bias"])},
        "enc_pos": jnp.asarray(sd["encoder.embed_positions.weight"]),
        "enc_norm": ln("encoder.layer_norm"),
        "embed_tokens": {"embedding": jnp.asarray(
            sd["decoder.embed_tokens.weight"])},
        "dec_pos": jnp.asarray(sd["decoder.embed_positions.weight"]),
        "dec_norm": ln("decoder.layer_norm"),
    }
    for i in range(config.encoder_layers):
        p = f"encoder.layers.{i}"
        params[f"enc_layer_{i}"] = {
            "self_attn": attn(f"{p}.self_attn"),
            "self_attn_layer_norm": ln(f"{p}.self_attn_layer_norm"),
            "final_layer_norm": ln(f"{p}.final_layer_norm"),
            "ffn": ffn(p),
        }
    for i in range(config.decoder_layers):
        p = f"decoder.layers.{i}"
        params[f"dec_layer_{i}"] = {
            "self_attn": attn(f"{p}.self_attn"),
            "self_attn_layer_norm": ln(f"{p}.self_attn_layer_norm"),
            "encoder_attn": attn(f"{p}.encoder_attn"),
            "encoder_attn_layer_norm": ln(f"{p}.encoder_attn_layer_norm"),
            "final_layer_norm": ln(f"{p}.final_layer_norm"),
            "ffn": ffn(p),
        }
    return {"params": params}
