"""Grapheme-to-phoneme (G2P) model lobes.

Reference surface: ``vendor/speechbrain/speechbrain/lobes/models/g2p/
model.py`` — ``AttentionSeq2Seq`` (:20-143, an attentional RNN
encoder-decoder over grapheme tokens) and ``TransformerG2P`` (:216-420).
TPU-first redesign:

- the reference composes 6 separately-YAML'd torch modules
  (enc/encoder_emb/emb/dec/lin/out) and loops the decoder per step;
  here each lobe is ONE flax module whose teacher-forced pass is a
  single lifted ``lax.scan`` (via ``Seq2SeqDecoder``) / one dense
  decoder pass (Transformer) — the whole G2P forward jits;
- greedy decoding reuses ``tsasr_tpu.decoding.seq2seq`` searchers via
  ``Seq2SeqDecoder.make_step_fn`` rather than a bespoke loop.

The reference's homograph SubsequenceLoss (g2p/homograph.py) is a
curriculum utility for its interactive trainer, out of scope here —
the core G2P training objective (per-position NLL over phonemes, the
``out`` log-softmax) is what these lobes provide.
"""

from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.models.rnn import BiLSTM
from tsasr_tpu.models.seq2seq import Seq2SeqDecoder, Seq2SeqDecoderConfig
from tsasr_tpu.models.transformer_asr import (
    NormalizedEmbedding,
    TransformerASR,
    TransformerASRConfig,
)

Dtype = Any


@dataclass(frozen=True)
class AttentionG2PConfig:
    grapheme_vocab: int = 60
    phoneme_vocab: int = 45
    emb_dim: int = 128
    enc_hidden: int = 256
    enc_layers: int = 2
    dec: Seq2SeqDecoderConfig = field(default=None)
    dtype: Any = jnp.float32


class AttentionG2P(nn.Module):
    """Attentional RNN G2P (reference ``AttentionSeq2Seq``):
    graphemes (B, G) + phoneme BOS tokens (B, U) ->
    (log_probs (B, U, P), encoder_out (B, G, 2H), attn (B, U, G))."""

    config: AttentionG2PConfig

    def setup(self):
        c = self.config
        self.encoder_emb = nn.Embed(c.grapheme_vocab, c.emb_dim,
                                    dtype=c.dtype, name="encoder_emb")
        self.enc = BiLSTM(hidden_size=c.enc_hidden,
                          in_features=c.emb_dim,
                          num_layers=c.enc_layers, dtype=c.dtype)
        dec_cfg = c.dec or Seq2SeqDecoderConfig(
            vocab_size=c.phoneme_vocab, enc_dim=2 * c.enc_hidden,
            attn_type="content", dtype=c.dtype)
        self.dec = Seq2SeqDecoder(dec_cfg)

    def encode(self, graphemes, grapheme_rel_lens=None):
        emb = self.encoder_emb(graphemes)
        return self.enc(emb)

    def __call__(self, graphemes, phn_bos, grapheme_rel_lens=None,
                 deterministic=True):
        enc_out = self.encode(graphemes, grapheme_rel_lens)
        logits, attn = self.dec(phn_bos, enc_out, grapheme_rel_lens,
                                deterministic=deterministic)
        return nn.log_softmax(logits), enc_out, attn


@dataclass(frozen=True)
class TransformerG2PConfig:
    grapheme_vocab: int = 60
    phoneme_vocab: int = 45
    d_model: int = 256
    nhead: int = 4
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    d_ffn: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32


class TransformerG2P(nn.Module):
    """Transformer G2P (reference ``TransformerG2P``): grapheme tokens
    in, phoneme log-probs out. Token inputs are embedded with
    ``NormalizedEmbedding`` and flow through the shared
    ``TransformerASR`` encoder/decoder stack."""

    config: TransformerG2PConfig

    def setup(self):
        c = self.config
        self.grapheme_emb = NormalizedEmbedding(
            c.grapheme_vocab, c.d_model, dtype=c.dtype,
            name="grapheme_emb")
        self.backbone = TransformerASR(TransformerASRConfig(
            tgt_vocab=c.phoneme_vocab, input_size=c.d_model,
            d_model=c.d_model, nhead=c.nhead,
            num_encoder_layers=c.num_encoder_layers,
            num_decoder_layers=c.num_decoder_layers, d_ffn=c.d_ffn,
            dropout=c.dropout, dtype=c.dtype))
        self.head = nn.Dense(c.phoneme_vocab, dtype=c.dtype, name="head")

    def __call__(self, graphemes, phn_bos, grapheme_rel_lens=None,
                 deterministic=True):
        src = self.grapheme_emb(graphemes)
        enc_out, dec_out = self.backbone(
            src, phn_bos, grapheme_rel_lens,
            deterministic=deterministic)
        return nn.log_softmax(self.head(dec_out)), enc_out
