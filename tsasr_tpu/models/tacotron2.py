"""Tacotron2 text-to-mel model (flax port).

Reference: ``vendor/speechbrain/speechbrain/lobes/models/Tacotron2.py``
(:49-1550, the NVIDIA Tacotron2 port SpeechBrain vendors). Mirrored
exactly:

- Encoder: 3x [zero-pad Conv1d -> BatchNorm -> relu -> dropout] over
  symbol embeddings + a 1-layer BiLSTM;
- Decoder: always-on-dropout Prenet, attention LSTMCell, location-
  sensitive attention (conv over [prev, cumulative] weights), decoder
  LSTMCell, linear projection to mel frames + stop gate;
- Postnet: 5 zero-pad convs with BatchNorm, tanh on all but the last,
  residual added to the coarse mel.

The teacher-forced decode runs as ONE ``lax.scan`` over output frames
(the reference loops in Python); ``infer`` scans to
``max_decoder_steps`` with gate-threshold finish masking (static
shapes; early stopping = frames beyond the gate are masked and
``mel_lengths`` reports the stop step, exactly the reference's
accounting). Layouts are channels-last (B, T, C); the parity test
transposes at the boundary.

Vocoding pairs with :mod:`tsasr_tpu.models.hifigan`. Training losses /
TextMelCollate are recipe-side machinery, out of scope here.
"""

from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
NEG = -1e30


@dataclass(frozen=True)
class Tacotron2Config:
    n_symbols: int = 148
    symbols_embedding_dim: int = 512
    mask_padding: bool = True
    n_mel_channels: int = 80
    encoder_kernel_size: int = 5
    encoder_n_convolutions: int = 3
    encoder_embedding_dim: int = 512
    attention_rnn_dim: int = 1024
    attention_dim: int = 128
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31
    n_frames_per_step: int = 1
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    prenet_dropout: float = 0.5
    max_decoder_steps: int = 1000
    gate_threshold: float = 0.5
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5
    dtype: Any = jnp.float32


def _lstm_cell_params(mod, name, in_dim, hidden):
    bound = 1.0 / jnp.sqrt(hidden)

    def uniform(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return (mod.param(f"{name}_w_ih", uniform, (in_dim, 4 * hidden)),
            mod.param(f"{name}_w_hh", uniform, (hidden, 4 * hidden)),
            mod.param(f"{name}_b", uniform, (4 * hidden,)))


def _lstm_cell(x, h, c, w_ih, w_hh, b):
    gates = x @ w_ih + h @ w_hh + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    return jax.nn.sigmoid(o) * jnp.tanh(c), c


class Tacotron2Encoder(nn.Module):
    config: Tacotron2Config

    @nn.compact
    def __call__(self, embedded, input_abs_lens=None, train=False):
        """(B, L, E) symbol embeddings -> (B, L, E) encodings. Lengths
        reproduce the reference's pack_padded_sequence semantics."""
        from tsasr_tpu.models.rnn import BiLSTM

        c = self.config
        x = embedded
        k = c.encoder_kernel_size
        for i in range(c.encoder_n_convolutions):
            x = nn.Conv(c.encoder_embedding_dim, (k,),
                        padding=[(k // 2, k // 2)], dtype=c.dtype,
                        name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=c.dtype,
                             name=f"norm_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return BiLSTM(hidden_size=c.encoder_embedding_dim // 2,
                      in_features=c.encoder_embedding_dim,
                      num_layers=1, dtype=c.dtype, name="lstm")(
                          x, abs_lengths=input_abs_lens)


class Prenet(nn.Module):
    """Two bias-free linears with ALWAYS-ON dropout (the reference
    applies F.dropout with training=True even in eval — the famous
    Tacotron inference-noise quirk, Tacotron2.py:433)."""

    sizes: Sequence[int]
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, size in enumerate(self.sizes):
            x = jax.nn.relu(nn.Dense(size, use_bias=False,
                                     dtype=self.dtype,
                                     name=f"linear_{i}")(x))
            if self.dropout > 0:
                keep = 1.0 - self.dropout
                mask = jax.random.bernoulli(
                    self.make_rng("prenet"), keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
        return x


class Postnet(nn.Module):
    config: Tacotron2Config

    @nn.compact
    def __call__(self, x, train=False):
        """(B, T, n_mel) -> (B, T, n_mel) residual refinement."""
        c = self.config
        k = c.postnet_kernel_size
        n = c.postnet_n_convolutions
        for i in range(n):
            out_ch = c.n_mel_channels if i == n - 1 \
                else c.postnet_embedding_dim
            x = nn.Conv(out_ch, (k,), padding=[(k // 2, k // 2)],
                        dtype=c.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=c.dtype,
                             name=f"norm_{i}")(x)
            if i < n - 1:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return x


class Tacotron2Decoder(nn.Module):
    config: Tacotron2Config

    def setup(self):
        c = self.config
        frame = c.n_mel_channels * c.n_frames_per_step
        self.prenet = Prenet([c.prenet_dim, c.prenet_dim],
                             dropout=c.prenet_dropout, dtype=c.dtype)
        self.attn_rnn = _lstm_cell_params(
            self, "attention_rnn",
            c.prenet_dim + c.encoder_embedding_dim, c.attention_rnn_dim)
        self.query_layer = nn.Dense(c.attention_dim, use_bias=False,
                                    dtype=c.dtype, name="query_layer")
        self.memory_layer = nn.Dense(c.attention_dim, use_bias=False,
                                     dtype=c.dtype, name="memory_layer")
        self.v = nn.Dense(1, use_bias=False, dtype=c.dtype, name="v")
        kl = c.attention_location_kernel_size
        self.location_conv = nn.Conv(
            c.attention_location_n_filters, (kl,),
            padding=[((kl - 1) // 2, (kl - 1) // 2)], use_bias=False,
            dtype=c.dtype, name="location_conv")
        self.location_dense = nn.Dense(c.attention_dim, use_bias=False,
                                       dtype=c.dtype,
                                       name="location_dense")
        self.dec_rnn = _lstm_cell_params(
            self, "decoder_rnn",
            c.attention_rnn_dim + c.encoder_embedding_dim,
            c.decoder_rnn_dim)
        self.linear_projection = nn.Dense(frame, dtype=c.dtype,
                                          name="linear_projection")
        self.gate_layer = nn.Dense(1, dtype=c.dtype, name="gate_layer")
        self.attn_dropout = nn.Dropout(c.p_attention_dropout)
        self.dec_dropout = nn.Dropout(c.p_decoder_dropout)

    def _attend(self, query, memory, processed_memory, weights,
                weights_cum, enc_mask):
        cat = jnp.stack([weights, weights_cum], axis=-1)   # (B, L, 2)
        loc = self.location_dense(self.location_conv(cat))
        energies = self.v(jnp.tanh(
            self.query_layer(query)[:, None] + loc
            + processed_memory))[..., 0]                   # (B, L)
        energies = jnp.where(enc_mask, energies, NEG)
        new_weights = jax.nn.softmax(energies, axis=-1)
        context = jnp.einsum("bl,ble->be", new_weights, memory)
        return context, new_weights

    def _step(self, prenet_out, state, memory, processed_memory,
              enc_mask, train):
        (ah, ac, dh, dc, weights, weights_cum, context) = state
        cell_in = jnp.concatenate([prenet_out, context], -1)
        ah, ac = _lstm_cell(cell_in, ah, ac, *self.attn_rnn)
        ah = self.attn_dropout(ah, deterministic=not train)
        context, weights = self._attend(ah, memory, processed_memory,
                                        weights, weights_cum, enc_mask)
        weights_cum = weights_cum + weights
        dec_in = jnp.concatenate([ah, context], -1)
        dh, dc = _lstm_cell(dec_in, dh, dc, *self.dec_rnn)
        dh = self.dec_dropout(dh, deterministic=not train)
        proj_in = jnp.concatenate([dh, context], -1)
        mel = self.linear_projection(proj_in)
        gate = self.gate_layer(proj_in)[..., 0]
        return mel, gate, (ah, ac, dh, dc, weights, weights_cum, context)

    def _initial_state(self, memory):
        c = self.config
        B, L, _ = memory.shape
        z = lambda d: jnp.zeros((B, d), c.dtype)  # noqa: E731
        return (z(c.attention_rnn_dim), z(c.attention_rnn_dim),
                z(c.decoder_rnn_dim), z(c.decoder_rnn_dim),
                jnp.zeros((B, L), c.dtype), jnp.zeros((B, L), c.dtype),
                z(c.encoder_embedding_dim))

    def _enc_mask(self, memory, memory_abs_lens):
        L = memory.shape[1]
        return jnp.arange(L)[None, :] < memory_abs_lens[:, None]

    def __call__(self, memory, targets, memory_abs_lens, train=False):
        """Teacher-forced decode. targets: (B, T_out, n_mel) ->
        (mels (B, T_out, frame), gates (B, T_out), align (B, T_out, L))."""
        c = self.config
        B, T_out, _ = targets.shape
        frame = c.n_mel_channels * c.n_frames_per_step
        steps = T_out // c.n_frames_per_step
        go = jnp.zeros((B, 1, frame), c.dtype)
        parsed = targets.reshape(B, steps, frame)
        dec_inputs = jnp.concatenate([go, parsed[:, :-1]], axis=1)
        prenet_out = self.prenet(dec_inputs)               # (B, S, P)

        processed_memory = self.memory_layer(memory)
        enc_mask = self._enc_mask(memory, memory_abs_lens)

        def body(mdl, state, pn_t):
            mel, gate, state = mdl._step(pn_t, state, memory,
                                         processed_memory, enc_mask,
                                         train)
            return state, (mel, gate, state[4])

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True,
                                   "prenet": True},
                       in_axes=1, out_axes=1)
        _, (mels, gates, aligns) = scan(self, self._initial_state(memory),
                                        prenet_out)
        return mels.reshape(B, T_out, c.n_mel_channels), gates, aligns

    def infer(self, memory, memory_abs_lens):
        """Gate-thresholded free-running decode to max_decoder_steps
        (static shapes; finished frames are masked and mel_lengths
        counts steps before the gate fired, matching the reference)."""
        c = self.config
        B = memory.shape[0]
        frame = c.n_mel_channels * c.n_frames_per_step
        processed_memory = self.memory_layer(memory)
        enc_mask = self._enc_mask(memory, memory_abs_lens)

        def body(mdl, carry, _):
            state, prev_mel, not_finished, length = carry
            pn = mdl.prenet(prev_mel)
            mel, gate, state = mdl._step(pn, state, memory,
                                         processed_memory, enc_mask,
                                         False)
            # reference order (Tacotron2.py infer loop): the gate-firing
            # frame is NOT counted in mel_lengths
            not_finished = not_finished * (
                jax.nn.sigmoid(gate) <= c.gate_threshold).astype(
                    jnp.int32)
            length = length + not_finished
            return ((state, mel, not_finished, length),
                    (mel, gate, state[4], not_finished))

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "prenet": True},
                       in_axes=0, out_axes=1, length=c.max_decoder_steps)
        carry0 = (self._initial_state(memory),
                  jnp.zeros((B, frame), c.dtype),
                  jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
        (_, _, _, mel_lengths), (mels, gates, aligns, live) = scan(
            self, carry0, None)
        mels = mels.reshape(B, -1, c.n_mel_channels)
        return mels, gates, aligns, mel_lengths


class Tacotron2(nn.Module):
    """Text tokens -> (mel, mel+postnet, gates, alignments)."""

    config: Tacotron2Config = field(default_factory=Tacotron2Config)

    def setup(self):
        c = self.config
        self.embedding = nn.Embed(c.n_symbols, c.symbols_embedding_dim,
                                  dtype=c.dtype)
        self.encoder = Tacotron2Encoder(c, name="encoder")
        self.decoder = Tacotron2Decoder(c, name="decoder")
        self.postnet = Postnet(c, name="postnet")

    def __call__(self, inputs, input_abs_lens, targets,
                 output_abs_lens=None, train=False):
        """Teacher-forced training forward.

        inputs: (B, L) tokens; targets: (B, T_out, n_mel).
        Returns (mel, mel_postnet, gates, alignments), padding-masked
        like the reference parse_output (mel zeros, gate 1e3).
        """
        c = self.config
        memory = self.encoder(self.embedding(inputs), input_abs_lens,
                              train=train)
        mels, gates, aligns = self.decoder(memory, targets,
                                           input_abs_lens, train=train)
        mels_post = mels + self.postnet(mels, train=train)
        if c.mask_padding and output_abs_lens is not None:
            T = mels.shape[1]
            mask = (jnp.arange(T)[None, :]
                    < output_abs_lens[:, None])        # (B, T)
            # reference quirk reproduced: parse_output masks a
            # DISCARDED clone of mel_outputs (Tacotron2.py
            # `mel_outputs.clone().masked_fill_`), so only the postnet
            # output and gates are actually masked
            mels_post = jnp.where(mask[..., None], mels_post, 0.0)
            gates = jnp.where(mask, gates, 1e3)
        return mels, mels_post, gates, aligns

    def infer(self, inputs, input_abs_lens):
        """-> (mel_postnet (B, T, n_mel), mel_lengths (B,), alignments)."""
        memory = self.encoder(self.embedding(inputs), input_abs_lens,
                              train=False)
        mels, gates, aligns, mel_lengths = self.decoder.infer(
            memory, input_abs_lens)
        mels_post = mels + self.postnet(mels, train=False)
        return mels_post, mel_lengths, aligns
