"""Conformer encoder with target-speaker embedding injection.

TPU-native re-implementation of:
- ``ConvolutionModule`` / ``ConformerEncoderLayer``
  (``vendor/speechbrain/speechbrain/lobes/models/transformer/Conformer.py:24-261``):
  macaron half-FFN -> rel-pos MHSA -> conv module -> half-FFN -> LayerNorm,
  conv module = LN -> pointwise(2D) -> GLU -> depthwise conv (causal =
  left-pad, equivalent to the reference's pad+chomp) -> LN -> act ->
  pointwise -> dropout, output zeroed at padded frames.
- the recipe-level ``ConformerEncoder`` with speaker-embedding injection
  (``/root/reference/models/conformer.py:31-288``): input projection,
  injection modes prod/sum/cat(+2D->D proj)/cross_attention/None at
  configurable layers (-1 = before layer 0), causal lookahead masks,
  4D->3D input flattening, xavier_normal init, final LayerNorm(eps=1e-6).

Layout is batch-time-feature throughout; sequence masking follows the
reference's relative-length convention (``(wav_len * T).round()``).
"""

from typing import Any, Callable, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.models.attention import (
    CrossAttention,
    RelPosMHAXL,
    rel_pos_encoding,
)
from tsasr_tpu.ops.dropout import Dropout
from tsasr_tpu.ops.masks import length_to_mask, lookahead_mask

Dtype = Any
xavier_normal = nn.initializers.xavier_normal


class FeedForward(nn.Module):
    """Positionwise FFN: Dense(d_ffn) -> act -> dropout -> Dense(d_model).

    Equivalent of ``PositionalwiseFeedForward``
    (``nnet/attention.py:778-836``).
    """

    d_ffn: int
    d_model: int
    dropout: float = 0.0
    dropout_bits: int = 32
    activation: Callable = nn.swish
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.d_ffn, kernel_init=xavier_normal(),
                     dtype=self.dtype)(x)
        x = self.activation(x)
        x = Dropout(self.dropout, bits=self.dropout_bits,
                    deterministic=deterministic)(x)
        x = nn.Dense(self.d_model, kernel_init=xavier_normal(),
                     dtype=self.dtype)(x)
        return x


class ConvolutionModule(nn.Module):
    """Conformer convolution module (depthwise, causal-capable)."""

    d_model: int
    kernel_size: int = 31
    causal: bool = False
    dropout: float = 0.0
    dropout_bits: int = 32
    activation: Callable = nn.swish
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic=True,
                 conv_cache=None, mask_conv_input=False):
        """x: (B, T, D); pad_mask: (B, T) bool, True = padding.

        Streaming: ``conv_cache`` is the last kernel_size-1 input frames
        (zero-initialized, which equals the offline causal left-pad);
        returns (out, new_cache) when given.

        ``mask_conv_input`` additionally zeroes masked rows in GLU space
        BEFORE the depthwise conv (the reference zeroes only the output,
        ``Conformer.py:113-114``). For a causal conv this cannot change
        any valid row (windows never look right), and it makes masked
        left-neighbor rows exactly equal to the offline zero left-pad —
        required by the sequence-parallel halo exchange
        (``parallel/seq_parallel.py``).
        """
        streaming = conv_cache is not None
        if streaming:
            Q = x.shape[1]
            x_in = jnp.concatenate([conv_cache.astype(x.dtype), x],
                                   axis=1)
        else:
            x_in = x
        out = nn.LayerNorm(dtype=self.dtype)(x_in)
        out = nn.Dense(2 * self.d_model, kernel_init=xavier_normal(),
                       dtype=self.dtype, name="pointwise_in")(out)
        a, b = jnp.split(out, 2, axis=-1)
        out = a * nn.sigmoid(b)                         # GLU
        if mask_conv_input and pad_mask is not None:
            out = jnp.where(pad_mask[..., None], 0.0, out)
        if streaming:
            padding = [(0, 0)]       # the cache IS the left context
        elif self.causal:
            padding = [(self.kernel_size - 1, 0)]
        else:
            padding = [((self.kernel_size - 1) // 2,
                        (self.kernel_size - 1) // 2)]
        out = nn.Conv(self.d_model, kernel_size=(self.kernel_size,),
                      feature_group_count=self.d_model, padding=padding,
                      kernel_init=xavier_normal(), dtype=self.dtype,
                      name="depthwise")(out)
        out = nn.LayerNorm(dtype=self.dtype)(out)
        out = self.activation(out)
        out = nn.Dense(self.d_model, kernel_init=xavier_normal(),
                       dtype=self.dtype, name="pointwise_out")(out)
        out = Dropout(self.dropout, bits=self.dropout_bits,
                      deterministic=deterministic)(out)
        if pad_mask is not None:
            out = jnp.where(pad_mask[..., None], 0.0, out)
        if streaming:
            new_cache = x_in[:, -(self.kernel_size - 1):]
            return out, new_cache
        return out


class ConformerEncoderLayer(nn.Module):
    """One Conformer block (macaron structure, reference layer order)."""

    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    dropout: float = 0.0
    dropout_bits: int = 32
    causal: bool = False
    att_context_size: int = 0
    fused_attention: bool = False   # Pallas kernel (TPU, no attn probs)
    activation: Callable = nn.swish
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, key_padding_mask=None, attn_mask=None,
                 deterministic=True, layer_state=None,
                 mask_conv_input=False):
        """Streaming: ``layer_state = {"attn": kv_cache, "conv": frames}``
        processes x as NEW frames appended to the cached history; returns
        (x, attn_w, new_state)."""
        streaming = layer_state is not None
        # Macaron FFN (1/2)
        ff1 = nn.LayerNorm(dtype=self.dtype)(x)
        ff1 = FeedForward(self.d_ffn, self.d_model, self.dropout,
                          self.dropout_bits, self.activation,
                          dtype=self.dtype, name="ffn1")(ff1, deterministic)
        ff1 = Dropout(self.dropout, bits=self.dropout_bits,
                      deterministic=deterministic)(ff1)
        x = x + 0.5 * ff1

        # Self-attention
        skip = x
        attn_in = nn.LayerNorm(dtype=self.dtype, name="norm_mha")(x)
        mha = RelPosMHAXL(
            embed_dim=self.d_model, num_heads=self.nhead,
            dropout=self.dropout, dropout_bits=self.dropout_bits,
            mask_pos_future=self.causal,
            att_context_size=self.att_context_size,
            fused=self.fused_attention and not streaming,
            dtype=self.dtype, name="mha")
        if streaming:
            (attn_out, attn_w), new_attn_state = mha(
                attn_in, pos_emb, deterministic=deterministic,
                kv_cache=layer_state["attn"])
        else:
            attn_out, attn_w = mha(
                attn_in, pos_emb, key_padding_mask=key_padding_mask,
                attn_mask=attn_mask, deterministic=deterministic)
        x = skip + attn_out

        # Convolution module
        conv = ConvolutionModule(
            self.d_model, self.kernel_size, causal=self.causal,
            dropout=self.dropout, dropout_bits=self.dropout_bits,
            activation=self.activation, dtype=self.dtype, name="conv")
        if streaming:
            conv_out, new_conv_cache = conv(
                x, deterministic=deterministic,
                conv_cache=layer_state["conv"])
            x = x + conv_out
        else:
            x = x + conv(x, pad_mask=key_padding_mask,
                         deterministic=deterministic,
                         mask_conv_input=mask_conv_input)

        # Macaron FFN (2/2) + final norm
        ff2 = nn.LayerNorm(dtype=self.dtype)(x)
        ff2 = FeedForward(self.d_ffn, self.d_model, self.dropout,
                          self.dropout_bits, self.activation,
                          dtype=self.dtype, name="ffn2")(ff2, deterministic)
        ff2 = Dropout(self.dropout, bits=self.dropout_bits,
                      deterministic=deterministic)(ff2)
        x = nn.LayerNorm(dtype=self.dtype, name="norm_out")(x + 0.5 * ff2)
        if streaming:
            return x, attn_w, {"attn": new_attn_state,
                               "conv": new_conv_cache}
        return x, attn_w


class TSConformerEncoder(nn.Module):
    """Conformer encoder with speaker-embedding injection.

    ``injection_after`` lists the layer indices after which the speaker
    embedding is injected; -1 injects before layer 0 (matching the
    reference semantics, ``models/conformer.py:206-239``).
    """

    d_model: int = 256
    nhead: int = 4
    num_layers: int = 12
    d_ffn: int = 2048
    kernel_size: int = 31
    dropout: float = 0.0
    dropout_bits: int = 32      # random-bit width per dropout mask elem
    causal: bool = False
    att_context_size: int = 0   # >0: bounded left attention context
    activation: Callable = jax.nn.leaky_relu
    injection_mode: Union[str, None] = None
    injection_after: Sequence[int] = (0,)
    remat: bool = False    # rematerialize layers (memory for long T)
    # remat granularity: "full" recomputes everything in bwd (max memory
    # saving); "dots" saves matmul outputs and recomputes only the
    # elementwise chains — incl. dropout masks, which are otherwise the
    # single largest residual HBM stream of the train step
    remat_policy: str = "full"
    # fused Pallas attention (TPU; auto-disabled when attention probs
    # are requested, which the kernel does not materialize)
    fused_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, rel_lengths=None, speaker_embs=None,
                 speaker_embs_length=None, deterministic=True,
                 return_attn=False, stream_states=None):
        """
        Arguments
        ---------
        src : (B, T, F) or (B, T, F1, F2) input features (4D flattened).
        rel_lengths : (B,) relative lengths in (0, 1].
        speaker_embs : (B, 1, D) pooled (or (B, S, D) for cross_attention).
        speaker_embs_length : (B,) relative lengths of speaker_embs
            (cross_attention mode only).
        stream_states : per-layer streaming caches (causal models only):
            src is then the NEW frames and the call returns
            (out, new_stream_states).
        """
        if src.ndim == 4:
            b, t, c1, c2 = src.shape
            src = src.reshape(b, t, c1 * c2)
        B, T, _ = src.shape
        streaming = stream_states is not None

        key_padding_mask = None
        if rel_lengths is not None and not streaming:
            abs_len = jnp.round(rel_lengths * T).astype(jnp.int32)
            key_padding_mask = ~length_to_mask(abs_len, T)
        attn_mask = lookahead_mask(T) \
            if (self.causal and not streaming) else None

        x = nn.Dense(self.d_model, kernel_init=xavier_normal(),
                     dtype=self.dtype, name="input_proj")(src)
        x = Dropout(self.dropout, bits=self.dropout_bits,
                    deterministic=deterministic)(x)

        inject = self._make_injector(speaker_embs, speaker_embs_length)
        injection_after = tuple(self.injection_after) \
            if isinstance(self.injection_after, (list, tuple)) \
            else (self.injection_after,)

        if -1 in injection_after and speaker_embs is not None:
            x = inject(x, deterministic)

        pos_emb = rel_pos_encoding(T, self.d_model, dtype=self.dtype)

        layer_cls = ConformerEncoderLayer
        if self.remat and not streaming:
            # trade recompute for activation memory (jax.checkpoint):
            # long-utterance training (T up to 1500 frames) fits HBM
            kwargs = {}
            if self.remat_policy == "dots":
                kwargs["policy"] = jax.checkpoint_policies.dots_saveable
            layer_cls = nn.remat(ConformerEncoderLayer,
                                 static_argnums=(5,), **kwargs)

        attns = []
        new_states = []
        for i in range(self.num_layers):
            layer = layer_cls(
                d_model=self.d_model, d_ffn=self.d_ffn, nhead=self.nhead,
                kernel_size=self.kernel_size, dropout=self.dropout,
                dropout_bits=self.dropout_bits, causal=self.causal,
                att_context_size=self.att_context_size,
                fused_attention=(self.fused_attention
                                 and not return_attn),
                activation=self.activation,
                dtype=self.dtype, name=f"layer_{i}")
            if streaming:
                x, attn_w, state = layer(x, pos_emb, None, None,
                                         deterministic,
                                         stream_states[i])
                new_states.append(state)
            else:
                x, attn_w = layer(x, pos_emb, key_padding_mask,
                                  attn_mask, deterministic)
            if return_attn:
                attns.append(attn_w)
            if i in injection_after and speaker_embs is not None:
                x = inject(x, deterministic)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if streaming:
            return x, new_states
        if return_attn:
            return x, attns
        return x

    def _make_injector(self, speaker_embs, speaker_embs_length):
        """Build the injection closure for the configured mode.

        Injection submodules are instantiated once here so that multiple
        injection points share the same parameters, as in the reference
        (a single ``cat_proj`` / ``speaker_attn`` per encoder,
        ``models/conformer.py:158-166``).
        """
        mode = self.injection_mode
        cat_proj = None
        speaker_attn = None
        if mode == "cat":
            cat_proj = nn.Dense(self.d_model, kernel_init=xavier_normal(),
                                dtype=self.dtype, name="cat_proj")
        elif mode == "cross_attention":
            speaker_attn = CrossAttention(
                embed_dim=self.d_model, num_heads=self.nhead,
                dropout=self.dropout, dropout_bits=self.dropout_bits,
                dtype=self.dtype, name="speaker_attn")

        def inject(x, deterministic):
            if mode == "prod":
                return x * speaker_embs
            if mode == "sum":
                return x + speaker_embs
            if mode == "cat":
                expanded = jnp.broadcast_to(
                    speaker_embs,
                    (x.shape[0], x.shape[1], speaker_embs.shape[-1]))
                cat = jnp.concatenate([x, expanded], axis=-1)
                return cat_proj(cat)
            if mode == "cross_attention":
                kp_mask = None
                if speaker_embs_length is not None:
                    S = speaker_embs.shape[1]
                    abs_len = jnp.round(
                        speaker_embs_length * S).astype(jnp.int32)
                    kp_mask = ~length_to_mask(abs_len, S)
                return speaker_attn(x, speaker_embs,
                                    key_padding_mask=kp_mask,
                                    deterministic=deterministic)
            if mode is None:
                return x
            raise NotImplementedError(f"injection_mode={mode}")

        return inject
