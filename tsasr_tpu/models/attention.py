"""Transformer-XL style relative-position multi-head attention.

TPU-native re-implementation of the reference attention stack:
- ``RelPosEncXL`` (``nnet/attention.py:312-359``): bidirectional sinusoidal
  positional encoding of shape (1, 2T-1, D). Note the reference's encoding
  is symmetric in distance (cos(-x) == cos(x) and it reuses the same
  sinusoids for past and future); we reproduce that exactly:
  pe[j] = enc(|j - (T-1)|).
- ``RelPosMHAXL`` (``nnet/attention.py:364-639``): fused qkv projection
  (no bias), learned pos biases u/v, the rel-shift trick, causal masking of
  future positions, and the reference's quirk of scaling scores by
  1/sqrt(embed_dim) (not head_dim).

All masking uses a large negative fill instead of -inf so bf16 softmax
stays finite (mirrors the reference's fp16 fill of -65000,
``nnet/attention.py:446-449``).
"""

import math

import jax.numpy as jnp
from flax import linen as nn

ATTN_FILL = -1e9


def rel_pos_encoding(seq_len, emb_dim, dtype=jnp.float32):
    """Relative positional encoding (1, 2*seq_len-1, emb_dim).

    Index j corresponds to relative position (T-1) - j; the encoding is
    distance-symmetric, matching the reference ``RelPosEncXL``.
    """
    inv_freq = jnp.exp(jnp.arange(0, emb_dim, 2, dtype=jnp.float32)
                       * -(math.log(10000.0) / emb_dim))
    j = jnp.arange(2 * seq_len - 1, dtype=jnp.float32)
    dist = jnp.abs(j - (seq_len - 1))[:, None]               # (2T-1, 1)
    angles = dist * inv_freq[None, :]                        # (2T-1, D/2)
    pe = jnp.zeros((2 * seq_len - 1, emb_dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe[None].astype(dtype)


def _rel_shift(x, klen, causal=False):
    """The Transformer-XL relative-shift trick.

    x: (B, H, T, 2S-1) scores against relative positions; returns
    (B, H, T, klen) aligned so that column k holds the score for key
    position k. Mirrors ``RelPosMHAXL.rel_shift``
    (``nnet/attention.py:468-483``), including the causal zeroing of
    future-position scores.
    """
    b, h, qlen, pos_len = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, pos_len + 1, qlen)
    x = x[:, :, 1:, :].reshape(b, h, qlen, pos_len)
    if causal:
        tri = jnp.tril(jnp.ones((qlen, pos_len), x.dtype), pos_len - qlen)
        x = x * tri[None, None]
    return x[..., :pos_len // 2 + 1][..., :klen]


class RelPosMHAXL(nn.Module):
    """Relative-position multi-head self-attention (Transformer-XL style)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    mask_pos_future: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, key_padding_mask=None, attn_mask=None,
                 deterministic=True):
        """
        Arguments
        ---------
        x : (B, T, D) input (self-attention: query = key = value).
        pos_emb : (1, 2T-1, D) relative positional encoding.
        key_padding_mask : (B, T) bool, True = masked (padding).
        attn_mask : (T, T) bool, True = masked (e.g. lookahead).
        """
        B, T, D = x.shape
        H = self.num_heads
        Dh = D // H
        assert D == self.embed_dim and D % H == 0

        xavier = nn.initializers.xavier_normal()
        qkv = nn.Dense(3 * D, use_bias=False, kernel_init=xavier,
                       dtype=self.dtype, name="qkv_proj")(x)
        q, k, v = jnp.split(qkv.reshape(B, T, H, 3 * Dh), 3, axis=-1)

        p_k = nn.Dense(D, use_bias=False, kernel_init=xavier,
                       dtype=self.dtype, name="pos_proj")(pos_emb)
        p_k = p_k.reshape(1, -1, H, Dh)                      # (1, 2T-1, H, Dh)

        pos_bias_u = self.param("pos_bias_u", xavier, (H, Dh))
        pos_bias_v = self.param("pos_bias_v", xavier, (H, Dh))

        q_u = q + pos_bias_u[None, None].astype(q.dtype)
        q_v = q + pos_bias_v[None, None].astype(q.dtype)

        # content scores (B, H, T, T)
        ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
        # positional scores (B, H, T, 2T-1) -> shifted (B, H, T, T)
        bd = jnp.einsum("bthd,bshd->bhts", q_v,
                        jnp.broadcast_to(p_k, (B,) + p_k.shape[1:]))
        bd = _rel_shift(bd, klen=T, causal=self.mask_pos_future)

        # The reference scales by 1/sqrt(embed_dim), not head_dim
        # (nnet/attention.py:454) — reproduced for training parity.
        scores = (ac + bd) * (1.0 / math.sqrt(self.embed_dim))

        if attn_mask is not None:
            scores = jnp.where(attn_mask[None, None], ATTN_FILL, scores)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :],
                               ATTN_FILL, scores)

        attn = nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = attn.astype(self.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)

        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, D)
        out = nn.Dense(D, kernel_init=xavier, dtype=self.dtype,
                       name="out_proj")(out)
        return out, attn


class CrossAttention(nn.Module):
    """Standard multi-head cross-attention, used by the
    ``cross_attention`` speaker-injection mode (equivalent of the
    reference's torch ``nn.MultiheadAttention`` wrapper,
    ``nnet/attention.py:642-775``)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key_value, key_padding_mask=None,
                 deterministic=True):
        B, Tq, D = query.shape
        H = self.num_heads
        Dh = D // H
        xavier = nn.initializers.xavier_normal()
        q = nn.Dense(D, kernel_init=xavier, dtype=self.dtype,
                     name="q_proj")(query).reshape(B, Tq, H, Dh)
        k = nn.Dense(D, kernel_init=xavier, dtype=self.dtype,
                     name="k_proj")(key_value)
        v = nn.Dense(D, kernel_init=xavier, dtype=self.dtype,
                     name="v_proj")(key_value)
        Tk = key_value.shape[1]
        k = k.reshape(B, Tk, H, Dh)
        v = v.reshape(B, Tk, H, Dh)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(Dh)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :],
                               ATTN_FILL, scores)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = attn.astype(self.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, Tq, D)
        return nn.Dense(D, kernel_init=xavier, dtype=self.dtype,
                        name="out_proj")(out)
