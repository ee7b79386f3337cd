"""Transformer encoder-decoder ASR + decoder-only LM lobes.

Reference surface:
``vendor/speechbrain/speechbrain/lobes/models/transformer/TransformerASR.py``
(:22-370 — TransformerASR with forward/make_masks/decode/encode and the
EncoderWrapper) and ``.../transformer/TransformerLM.py`` (:1-169).
TPU-first redesign:

- one flax module per lobe; the whole forward (masks included) traces
  into a single jit program — the reference builds masks in Python per
  call (``make_masks``, :229-257);
- fixed sinusoidal absolute positional encoding computed as a closed
  form at trace time (no registered buffer / max_length precompute);
- the encoder stack is selectable: ``encoder_module='transformer'``
  (post/pre-norm vanilla) or ``'conformer'`` (reuses this repo's
  ``ConformerEncoderLayer`` — the reference imports its Conformer
  encoder the same way, TransformerASR.py:139-156);
- the decoder is always a causal Transformer (reference behavior).

``TransformerASR.decode`` runs teacher-forced over the full (B, U)
prefix (jit-friendly static shapes) — the searchers in
``tsasr_tpu.decoding.seq2seq`` drive incremental decoding instead of a
per-step cache, the same trade the repo's other decoders make.
"""

import math
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.models.attention import CrossAttention
from tsasr_tpu.ops.dropout import Dropout
from tsasr_tpu.ops.masks import length_to_mask, lookahead_mask

Dtype = Any


def sinusoidal_positional_encoding(seq_len, d_model, dtype=jnp.float32):
    """Fixed absolute sine/cosine table (Vaswani et al.; the reference's
    ``PositionalEncoding``, transformer/Transformer.py)."""
    pos = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((seq_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


class NormalizedEmbedding(nn.Module):
    """Token embedding scaled by sqrt(d_model) (reference
    ``NormalizedEmbedding``, transformer/Transformer.py)."""

    vocab: int
    d_model: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        emb = nn.Embed(self.vocab, self.d_model, dtype=self.dtype,
                       name="emb")(tokens)
        return emb * math.sqrt(self.d_model)


class _FFN(nn.Module):
    d_ffn: int
    d_model: int
    dropout: float
    activation: str
    dtype: Dtype

    @nn.compact
    def __call__(self, x, deterministic):
        act = {"relu": nn.relu, "gelu": nn.gelu, "swish": nn.swish,
               "leaky_relu": nn.leaky_relu}[self.activation]
        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="ffn_in")(x)
        h = Dropout(self.dropout, deterministic=deterministic)(act(h))
        return nn.Dense(self.d_model, dtype=self.dtype, name="ffn_out")(h)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask=None, attn_mask=None,
                 deterministic=True):
        ln1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        ln2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        attn = CrossAttention(embed_dim=self.d_model, num_heads=self.nhead,
                              dropout=self.dropout, dtype=self.dtype,
                              name="self_attn")
        ffn = _FFN(self.d_ffn, self.d_model, self.dropout,
                   self.activation, self.dtype, name="ffn")
        drop = Dropout(self.dropout, deterministic=deterministic)
        if self.normalize_before:
            h = ln1(x)
            x = x + drop(attn(h, h, key_padding_mask, deterministic,
                              attn_mask))
            x = x + drop(ffn(ln2(x), deterministic))
        else:
            x = ln1(x + drop(attn(x, x, key_padding_mask, deterministic,
                                  attn_mask)))
            x = ln2(x + drop(ffn(x, deterministic)))
        return x


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_key_padding_mask=None,
                 memory_key_padding_mask=None, deterministic=True):
        causal = lookahead_mask(tgt.shape[1])
        ln1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        ln2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        ln3 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")
        self_attn = CrossAttention(embed_dim=self.d_model,
                                   num_heads=self.nhead,
                                   dropout=self.dropout, dtype=self.dtype,
                                   name="self_attn")
        cross = CrossAttention(embed_dim=self.d_model,
                               num_heads=self.nhead,
                               dropout=self.dropout, dtype=self.dtype,
                               name="cross_attn")
        ffn = _FFN(self.d_ffn, self.d_model, self.dropout,
                   self.activation, self.dtype, name="ffn")
        drop = Dropout(self.dropout, deterministic=deterministic)
        if self.normalize_before:
            h = ln1(tgt)
            tgt = tgt + drop(self_attn(h, h, tgt_key_padding_mask,
                                       deterministic, causal))
            tgt = tgt + drop(cross(ln2(tgt), memory,
                                   memory_key_padding_mask,
                                   deterministic))
            tgt = tgt + drop(ffn(ln3(tgt), deterministic))
        else:
            tgt = ln1(tgt + drop(self_attn(tgt, tgt,
                                           tgt_key_padding_mask,
                                           deterministic, causal)))
            tgt = ln2(tgt + drop(cross(tgt, memory,
                                       memory_key_padding_mask,
                                       deterministic)))
            tgt = ln3(tgt + drop(ffn(tgt, deterministic)))
        return tgt


@dataclass(frozen=True)
class TransformerASRConfig:
    """Mirrors the reference constructor surface
    (TransformerASR.py:98-161)."""

    tgt_vocab: int
    input_size: int
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    encoder_module: str = "transformer"   # "transformer" | "conformer"
    kernel_size: int = 31                 # conformer encoder only
    causal: bool = False
    dtype: Any = jnp.float32


class TransformerASR(nn.Module):
    """Encoder-decoder Transformer for AED ASR
    (reference TransformerASR.py:22-336)."""

    config: TransformerASRConfig

    def setup(self):
        c = self.config
        self.input_proj = nn.Dense(c.d_model, dtype=c.dtype,
                                   name="input_proj")
        if c.encoder_module == "conformer":
            from tsasr_tpu.models.conformer import TSConformerEncoder
            self.encoder = TSConformerEncoder(
                d_model=c.d_model, nhead=c.nhead,
                num_layers=c.num_encoder_layers, d_ffn=c.d_ffn,
                kernel_size=c.kernel_size, dropout=c.dropout,
                causal=c.causal, injection_mode=None, dtype=c.dtype)
        else:
            self.encoder_layers = [
                TransformerEncoderLayer(
                    d_model=c.d_model, nhead=c.nhead, d_ffn=c.d_ffn,
                    dropout=c.dropout, activation=c.activation,
                    normalize_before=c.normalize_before, dtype=c.dtype,
                    name=f"enc_layer_{i}")
                for i in range(c.num_encoder_layers)]
            self.encoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype,
                                             name="enc_norm")
        self.tgt_emb = NormalizedEmbedding(c.tgt_vocab, c.d_model,
                                           dtype=c.dtype, name="tgt_emb")
        self.decoder_layers = [
            TransformerDecoderLayer(
                d_model=c.d_model, nhead=c.nhead, d_ffn=c.d_ffn,
                dropout=c.dropout, activation=c.activation,
                normalize_before=c.normalize_before, dtype=c.dtype,
                name=f"dec_layer_{i}")
            for i in range(c.num_decoder_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype,
                                         name="dec_norm")

    # masks (reference make_masks, :229-257): True = masked out
    def _src_kp_mask(self, src, wav_len):
        if wav_len is None:
            return None
        abs_len = jnp.round(wav_len * src.shape[1]).astype(jnp.int32)
        return ~length_to_mask(abs_len, src.shape[1])

    def encode(self, src, wav_len=None, deterministic=True):
        """(B, T, input_size) [or (B, T, F, C)] -> (B, T, d_model)
        (reference :297-331)."""
        c = self.config
        if src.ndim == 4:
            b, t, f, ch = src.shape
            src = src.reshape(b, t, f * ch)
        if c.encoder_module == "conformer":
            return self.encoder(src, wav_len,
                                deterministic=deterministic)
        kp = self._src_kp_mask(src, wav_len)
        x = self.input_proj(src)
        x = x + sinusoidal_positional_encoding(
            x.shape[1], c.d_model, c.dtype)[None]
        causal = lookahead_mask(x.shape[1]) if c.causal else None
        for layer in self.encoder_layers:
            x = layer(x, kp, causal, deterministic)
        return self.encoder_norm(x)

    def decode(self, tgt, encoder_out, enc_len=None, pad_idx=0,
               deterministic=True):
        """Teacher-forced decoder pass (reference :259-296):
        tgt (B, U) int tokens -> (B, U, d_model)."""
        c = self.config
        kp_tgt = tgt == pad_idx
        kp_mem = None
        if enc_len is not None:
            abs_len = jnp.round(
                enc_len * encoder_out.shape[1]).astype(jnp.int32)
            kp_mem = ~length_to_mask(abs_len, encoder_out.shape[1])
        x = self.tgt_emb(tgt)
        x = x + sinusoidal_positional_encoding(
            x.shape[1], c.d_model, c.dtype)[None]
        for layer in self.decoder_layers:
            x = layer(x, encoder_out, kp_tgt, kp_mem, deterministic)
        return self.decoder_norm(x)

    def __call__(self, src, tgt, wav_len=None, pad_idx=0,
                 deterministic=True):
        """(enc_out (B, T, d), dec_out (B, U, d)) — reference
        forward (:162-228)."""
        enc_out = self.encode(src, wav_len, deterministic=deterministic)
        dec_out = self.decode(tgt, enc_out, wav_len, pad_idx,
                              deterministic=deterministic)
        return enc_out, dec_out


@dataclass(frozen=True)
class TransformerLMConfig:
    """Reference TransformerLM constructor (TransformerLM.py:20-100)."""

    vocab: int
    d_model: int = 768
    nhead: int = 12
    num_layers: int = 12
    d_ffn: int = 3072
    dropout: float = 0.0
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: Any = jnp.float32


class TransformerLM(nn.Module):
    """Decoder-only (causal-encoder) Transformer LM
    (reference TransformerLM.py:103-169): tokens (B, U) -> logits
    (B, U, vocab)."""

    config: TransformerLMConfig

    @nn.compact
    def __call__(self, tokens, pad_idx=0, deterministic=True):
        c = self.config
        x = NormalizedEmbedding(c.vocab, c.d_model, dtype=c.dtype,
                                name="emb")(tokens)
        x = x + sinusoidal_positional_encoding(
            x.shape[1], c.d_model, c.dtype)[None]
        kp = tokens == pad_idx
        causal = lookahead_mask(tokens.shape[1])
        for i in range(c.num_layers):
            x = TransformerEncoderLayer(
                d_model=c.d_model, nhead=c.nhead, d_ffn=c.d_ffn,
                dropout=c.dropout, activation=c.activation,
                normalize_before=c.normalize_before, dtype=c.dtype,
                name=f"layer_{i}")(x, kp, causal, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="norm")(x)
        return nn.Dense(c.vocab, dtype=c.dtype, name="head")(x)


@dataclass(frozen=True)
class CNNTransformerSEConfig:
    """Reference ``CNNTransformerSE`` constructor surface
    (transformer/TransformerSE.py:50-78): encoder-only Transformer that
    maps (B, T, d_model)-shaped features to an (B, T, output_size) mask
    or spectrum for speech enhancement."""

    d_model: int
    output_size: int
    output_activation: str = "relu"       # applied to the output layer
    nhead: int = 8
    num_layers: int = 8
    d_ffn: int = 512
    dropout: float = 0.1
    activation: str = "leaky_relu"        # FFN activation
    causal: bool = True                   # SE default IS causal (:62)
    normalize_before: bool = False
    dtype: Any = jnp.float32


class CNNTransformerSE(nn.Module):
    """Transformer speech-enhancement lobe (reference
    ``lobes/models/transformer/TransformerSE.py:15-100``).

    TPU-first notes: the reference builds the lookahead mask per call in
    Python (:82-85) and mutates ``self.attn_mask``; here the mask is a
    trace-time constant so the whole forward jits to one program. The
    optional CNN pre-encoder (``custom_emb_module``, :60-61) is a flax
    submodule field, so any (B, T, F) -> (B, T, d_model) module slots
    in — e.g. this repo's ``models.frontend.ConvolutionFrontEnd``.
    """

    config: CNNTransformerSEConfig
    custom_emb_module: Any = None

    @nn.compact
    def __call__(self, x, wav_len=None, deterministic=True):
        """(B, T, F) [or (B, T, d_model) when no pre-encoder] ->
        (B, T, output_size); ``wav_len`` is relative lengths in [0, 1]
        (the repo-wide convention; the reference takes a precomputed
        ``src_key_padding_mask`` instead, :80)."""
        c = self.config
        if self.custom_emb_module is not None:
            x = self.custom_emb_module(x)
        kp = None
        if wav_len is not None:
            abs_len = jnp.round(wav_len * x.shape[1]).astype(jnp.int32)
            kp = ~length_to_mask(abs_len, x.shape[1])
        attn_mask = lookahead_mask(x.shape[1]) if c.causal else None
        for i in range(c.num_layers):
            x = TransformerEncoderLayer(
                d_model=c.d_model, nhead=c.nhead, d_ffn=c.d_ffn,
                dropout=c.dropout, activation=c.activation,
                normalize_before=c.normalize_before, dtype=c.dtype,
                name=f"enc_layer_{i}")(x, kp, attn_mask, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="enc_norm")(x)
        out = nn.Dense(c.output_size, use_bias=False, dtype=c.dtype,
                       name="output_layer")(x)
        act = {"relu": nn.relu, "sigmoid": nn.sigmoid,
               "none": lambda v: v}[c.output_activation]
        return act(out)


@dataclass(frozen=True)
class TransformerSTConfig(TransformerASRConfig):
    """Reference ``TransformerST`` constructor tail
    (transformer/TransformerST.py:104-147): the ASR config plus the
    multi-task speech-translation weights/vocabs."""

    ctc_weight: float = 0.0
    asr_weight: float = 0.0
    mt_weight: float = 0.0
    asr_tgt_vocab: int = 0
    mt_src_vocab: int = 0


class TransformerST(TransformerASR):
    """Speech-translation Transformer (reference
    ``lobes/models/transformer/TransformerST.py:28-343``): the ASR
    encoder/decoder plus (a) an auxiliary ASR decoder over the shared
    speech encoder (``forward_asr``, :205-250) and (b) an auxiliary MT
    branch with its own source embedding and text encoder feeding the
    shared translation decoder (``forward_mt``, :252-304).

    TPU-first: every branch is a pure function of the params with
    static shapes; the multi-task loss weighting (ctc/asr/mt) stays in
    the recipe, exactly as in the reference.
    """

    def setup(self):
        super().setup()
        c = self.config
        if c.ctc_weight < 1 and c.asr_weight > 0:
            self.asr_tgt_emb = NormalizedEmbedding(
                c.asr_tgt_vocab, c.d_model, dtype=c.dtype,
                name="asr_tgt_emb")
            # always a regular-attention causal Transformer decoder
            # (reference :159 — "always use regular attention")
            self.asr_decoder_layers = [
                TransformerDecoderLayer(
                    d_model=c.d_model, nhead=c.nhead, d_ffn=c.d_ffn,
                    dropout=c.dropout, activation=c.activation,
                    normalize_before=c.normalize_before, dtype=c.dtype,
                    name=f"asr_dec_layer_{i}")
                for i in range(c.num_decoder_layers)]
            self.asr_decoder_norm = nn.LayerNorm(
                epsilon=1e-6, dtype=c.dtype, name="asr_dec_norm")
        if c.mt_weight > 0:
            self.mt_src_emb = NormalizedEmbedding(
                c.mt_src_vocab, c.d_model, dtype=c.dtype,
                name="mt_src_emb")
            self.mt_encoder_layers = [
                TransformerEncoderLayer(
                    d_model=c.d_model, nhead=c.nhead, d_ffn=c.d_ffn,
                    dropout=c.dropout, activation=c.activation,
                    normalize_before=c.normalize_before, dtype=c.dtype,
                    name=f"mt_enc_layer_{i}")
                for i in range(c.num_encoder_layers)]
            self.mt_encoder_norm = nn.LayerNorm(
                epsilon=1e-6, dtype=c.dtype, name="mt_enc_norm")

    def init_all(self, src, tgt, asr_tgt=None, mt_src=None,
                 wav_len=None, pad_idx=0):
        """Initialization entry that touches every enabled branch —
        flax only materializes parameters for submodules that are
        actually called, whereas the reference allocates them in
        ``__init__`` (:148-165). Use
        ``model.init(rng, ..., method=model.init_all)``."""
        c = self.config
        enc_out, dec_out = self(src, tgt, wav_len, pad_idx)
        if c.ctc_weight < 1 and c.asr_weight > 0:
            if asr_tgt is None:
                asr_tgt = jnp.zeros_like(tgt)
            self.forward_asr(enc_out, asr_tgt, wav_len, pad_idx)
        if c.mt_weight > 0:
            if mt_src is None:
                mt_src = jnp.zeros_like(tgt)
            self.forward_mt(mt_src, tgt, pad_idx)
        return enc_out, dec_out

    def forward_asr(self, encoder_out, tgt, enc_len=None, pad_idx=0,
                    deterministic=True):
        """Auxiliary ASR decoding step over the shared speech encoder
        output (reference ``forward_asr``, :205-250): tgt (B, U) int
        transcription tokens -> (B, U, d_model)."""
        c = self.config
        kp_tgt = tgt == pad_idx
        kp_mem = None
        if enc_len is not None:
            abs_len = jnp.round(
                enc_len * encoder_out.shape[1]).astype(jnp.int32)
            kp_mem = ~length_to_mask(abs_len, encoder_out.shape[1])
        x = self.asr_tgt_emb(tgt)
        x = x + sinusoidal_positional_encoding(
            x.shape[1], c.d_model, c.dtype)[None]
        for layer in self.asr_decoder_layers:
            x = layer(x, encoder_out, kp_tgt, kp_mem, deterministic)
        return self.asr_decoder_norm(x)

    def forward_mt(self, src, tgt, pad_idx=0, deterministic=True):
        """Auxiliary MT step (reference ``forward_mt``, :252-304):
        src (B, S) int source-text tokens, tgt (B, U) int translation
        tokens -> (enc_out (B, S, d), dec_out (B, U, d)). The text
        encoder is this lobe's own; the decoder is the SHARED
        translation decoder (reference :295-302)."""
        c = self.config
        kp_src = src == pad_idx
        x = self.mt_src_emb(src)
        x = x + sinusoidal_positional_encoding(
            x.shape[1], c.d_model, c.dtype)[None]
        for layer in self.mt_encoder_layers:
            x = layer(x, kp_src, None, deterministic)
        enc_out = self.mt_encoder_norm(x)

        kp_tgt = tgt == pad_idx
        y = self.tgt_emb(tgt)
        y = y + sinusoidal_positional_encoding(
            y.shape[1], c.d_model, c.dtype)[None]
        for layer in self.decoder_layers:
            y = layer(y, enc_out, kp_tgt, kp_src, deterministic)
        return enc_out, self.decoder_norm(y)

    def forward_mt_decoder_only(self, src, tgt, pad_idx=0,
                                deterministic=True):
        """MT step against precomputed encoder features (reference
        ``forward_mt_decoder_only``, :306-343 — the wav2vec-encoder
        variant): src (B, S, d_model) float memory, tgt (B, U) int
        tokens -> (B, U, d_model)."""
        c = self.config
        kp_tgt = tgt == pad_idx
        y = self.tgt_emb(tgt)
        y = y + sinusoidal_positional_encoding(
            y.shape[1], c.d_model, c.dtype)[None]
        for layer in self.decoder_layers:
            y = layer(y, src, kp_tgt, None, deterministic)
        return self.decoder_norm(y)
