"""Attention-based encoder-decoder (AED) decoder modules.

Reference surface: ``vendor/speechbrain/speechbrain/nnet/attention.py``
(ContentBasedAttention :23-110, LocationAwareAttention :113-230) and
``nnet/RNN.py::AttentionalRNNDecoder`` (:714-960) — the decoder half of
SpeechBrain's seq2seq ASR models. TPU-native design:

- attention is batched matmuls over the full (B, T, E) encoder states
  with length masking (no per-step host logic);
- the teacher-forced training pass runs as ONE ``lax.scan`` over target
  positions (the reference loops in Python per step);
- ``make_step_fn`` adapts the decoder to the searchers in
  ``tsasr_tpu.decoding.seq2seq`` (greedy + batched beam), with the
  hypothesis-stream axis at -2 in every state leaf so beam gathers work.

``Seq2SeqDecoder`` bundles embedding + attentional RNN + output head
(the reference composes Embedding / AttentionalRNNDecoder / Linear in
YAML; one module keeps the step closure self-contained).
"""

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.models.rnn import GRU, LSTM

Dtype = Any
NEG = -1e30


@dataclass(frozen=True)
class Seq2SeqDecoderConfig:
    vocab_size: int = 29
    enc_dim: int = 256
    embedding_dim: int = 128
    hidden_size: int = 256
    num_layers: int = 1
    attn_dim: int = 256
    attn_type: str = "location"     # "content" | "location"
    conv_channels: int = 10         # location attention
    kernel_size: int = 100          # location attention (half-width)
    scaling: float = 1.0
    rnn_type: str = "gru"           # "gru" | "lstm"
    dropout: float = 0.0
    dtype: Any = jnp.float32


class Seq2SeqDecoder(nn.Module):
    """Embedding -> attentional RNN -> vocab logits."""

    config: Seq2SeqDecoderConfig = field(
        default_factory=Seq2SeqDecoderConfig)

    def setup(self):
        c = self.config
        self.embedding = nn.Embed(c.vocab_size, c.embedding_dim,
                                  dtype=c.dtype)
        rnn_cls = GRU if c.rnn_type == "gru" else LSTM
        self.rnn = rnn_cls(hidden_size=c.hidden_size,
                           in_features=c.embedding_dim + c.attn_dim,
                           num_layers=c.num_layers, dtype=c.dtype)
        # attention projections (reference attention.py:50-60,158-171)
        self.mlp_enc = nn.Dense(c.attn_dim, dtype=c.dtype, name="mlp_enc")
        self.mlp_dec = nn.Dense(c.attn_dim, dtype=c.dtype, name="mlp_dec")
        self.mlp_attn = nn.Dense(1, use_bias=False, dtype=c.dtype,
                                 name="mlp_attn")
        self.mlp_out = nn.Dense(c.attn_dim, dtype=c.dtype, name="mlp_out")
        if c.attn_type == "location":
            self.conv_loc = nn.Conv(c.conv_channels,
                                    (2 * c.kernel_size + 1,),
                                    padding=[(c.kernel_size,
                                              c.kernel_size)],
                                    use_bias=False, dtype=c.dtype,
                                    name="conv_loc")
            self.mlp_loc = nn.Dense(c.attn_dim, use_bias=False,
                                    dtype=c.dtype, name="mlp_loc")
        self.drop = nn.Dropout(c.dropout)
        # dec_out = proj([context, cell_out]) (reference RNN.py:911-913)
        self.proj = nn.Dense(c.hidden_size, dtype=c.dtype, name="proj")
        self.head = nn.Dense(c.vocab_size, dtype=c.dtype, name="head")

    # ---------------------------------------------------------- attention
    def _attend(self, enc_out, enc_proj, enc_mask, dec_h, prev_attn):
        """-> (context (B, attn_dim), weights (B, T))."""
        c = self.config
        score_in = enc_proj + self.mlp_dec(dec_h)[:, None, :]
        if c.attn_type == "location":
            loc = self.conv_loc(prev_attn[:, :, None])     # (B, T, C)
            score_in = score_in + self.mlp_loc(loc)
        scores = self.mlp_attn(jnp.tanh(score_in))[..., 0]  # (B, T)
        scores = jnp.where(enc_mask, scores / c.scaling, NEG)
        weights = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,bte->be", weights, enc_out)
        return self.mlp_out(context), weights

    def _cell_step(self, emb, state, enc_out, enc_proj, enc_mask,
                   deterministic=True):
        rnn_state, context, prev_attn = state
        cell_in = jnp.concatenate([emb, context], axis=-1)
        cell_in = self.drop(cell_in, deterministic=deterministic)
        cell_out, rnn_state = self.rnn.step(cell_in, rnn_state)
        context, weights = self._attend(enc_out, enc_proj, enc_mask,
                                        cell_out, prev_attn)
        dec_out = self.proj(jnp.concatenate([context, cell_out], -1))
        return dec_out, (rnn_state, context, weights)

    def _enc_inputs(self, enc_out, rel_lens):
        T = enc_out.shape[1]
        if rel_lens is None:
            mask = jnp.ones(enc_out.shape[:2], bool)
        else:
            abs_len = jnp.round(rel_lens * T).astype(jnp.int32)
            mask = jnp.arange(T)[None, :] < abs_len[:, None]
        return self.mlp_enc(enc_out), mask

    def _initial(self, batch_size, T):
        c = self.config
        return (self.rnn.initial_state(batch_size, dtype=c.dtype),
                jnp.zeros((batch_size, c.attn_dim), c.dtype),
                jnp.zeros((batch_size, T), c.dtype))

    # ----------------------------------------------------------- training
    def __call__(self, tokens_bos, enc_out, rel_lens=None,
                 deterministic=True):
        """Teacher-forced decode: (B, U) inputs -> (B, U, V) logits +
        (B, U, T) attention maps, as one lifted scan over U."""
        B, T = enc_out.shape[0], enc_out.shape[1]
        enc_proj, enc_mask = self._enc_inputs(enc_out, rel_lens)
        embs = self.embedding(tokens_bos)                 # (B, U, D)

        def body(mdl, state, emb_t):
            dec_out, state = mdl._cell_step(
                emb_t, state, enc_out, enc_proj, enc_mask,
                deterministic=deterministic)
            return state, (dec_out, state[2])

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        _, (dec_outs, attns) = scan(self, self._initial(B, T), embs)
        return self.head(dec_outs), attns

    # ------------------------------------------------------------ decode
    def decode_step(self, token, state, enc_out, enc_proj, enc_mask):
        """One search step: (N,) token -> ((N, V) log-probs, state)."""
        emb = self.embedding(token)
        dec_out, state = self._cell_step(emb, state, enc_out, enc_proj,
                                         enc_mask, deterministic=True)
        return jax.nn.log_softmax(self.head(dec_out), axis=-1), state

    def decode_inputs(self, enc_out, rel_lens=None):
        return self._enc_inputs(enc_out, rel_lens)

    def decode_initial_state(self, batch_size, T):
        return self._initial(batch_size, T)


def make_step_fn(decoder, variables, enc_out, rel_lens=None,
                 n_streams=None):
    """-> (step_fn, state0) for the searchers in
    ``tsasr_tpu.decoding.seq2seq``. With ``n_streams`` = B*K the encoder
    states are tiled per hypothesis stream (beam search).

    State leaves: RNN state (L, N, H) and context/prev_attn reshaped to
    keep the stream axis at -2 for the beam's gather machinery.
    """
    B, T = enc_out.shape[0], enc_out.shape[1]
    n = n_streams or B
    reps = n // B
    enc_out_t = jnp.repeat(enc_out, reps, axis=0)
    rel_t = None if rel_lens is None else jnp.repeat(rel_lens, reps,
                                                     axis=0)
    enc_proj, enc_mask = decoder.apply(variables, enc_out_t, rel_t,
                                       method=decoder.decode_inputs)
    state0 = decoder.apply(variables, n, T,
                           method=decoder.decode_initial_state)
    # stream-axis contract for the beam's gathers (axis -2 holds N):
    # RNN state leaves are (L, N, H); context (N, A) and prev_attn
    # (N, T) are 2D, where axis 0 == axis -2. All satisfied as-is.

    def step_fn(tokens, state):
        return decoder.apply(variables, tokens, state, enc_out_t,
                             enc_proj, enc_mask,
                             method=decoder.decode_step)

    return step_fn, state0
