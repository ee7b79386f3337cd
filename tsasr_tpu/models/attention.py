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
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.ops.dropout import Dropout

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
    """Relative-position multi-head self-attention (Transformer-XL style).

    Streaming: pass ``kv_cache = {"k": (B,C,H,Dh), "v": (B,C,H,Dh),
    "count": (B,) int32}`` (a fixed-capacity buffer of past keys/values)
    to attend causally over cache + new frames in O(Q·(C+Q)); the
    returned dict holds the updated cache. The relative-position scores
    use a direct distance lookup (the square rel-shift trick assumes
    qlen == klen).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dropout_bits: int = 32       # random-bit width per mask element
    mask_pos_future: bool = False
    att_context_size: int = 0    # >0: attend only this many past keys
    # fused=True routes the non-streaming path through the Pallas
    # kernel (ops/attention_pallas.py): scores + rel-shift + masking +
    # softmax + dropout + @V in one VMEM-resident kernel per (batch,
    # head); attention probs are then not returned (None). TPU only.
    fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, key_padding_mask=None, attn_mask=None,
                 deterministic=True, kv_cache=None):
        """
        Arguments
        ---------
        x : (B, T, D) input (self-attention: query = key = value).
        pos_emb : (1, 2T-1, D) relative positional encoding.
        key_padding_mask : (B, T) bool, True = masked (padding).
        attn_mask : (T, T) bool, True = masked (e.g. lookahead).
        kv_cache : streaming state (see class docstring) or None.
        """
        B, T, D = x.shape
        H = self.num_heads
        Dh = D // H
        assert D == self.embed_dim and D % H == 0

        xavier = nn.initializers.xavier_normal()
        qkv = nn.Dense(3 * D, use_bias=False, kernel_init=xavier,
                       dtype=self.dtype, name="qkv_proj")(x)
        q, k, v = jnp.split(qkv.reshape(B, T, H, 3 * Dh), 3, axis=-1)

        pos_proj = nn.Dense(D, use_bias=False, kernel_init=xavier,
                            dtype=self.dtype, name="pos_proj")

        pos_bias_u = self.param("pos_bias_u", xavier, (H, Dh))
        pos_bias_v = self.param("pos_bias_v", xavier, (H, Dh))

        q_u = q + pos_bias_u[None, None].astype(q.dtype)
        q_v = q + pos_bias_v[None, None].astype(q.dtype)

        if kv_cache is not None:
            return self._streaming_attention(
                q_u, q_v, k, v, kv_cache, pos_proj, deterministic)

        p_k = pos_proj(pos_emb)
        p_k = p_k.reshape(1, -1, H, Dh)                  # (1, 2T-1, H, Dh)

        # TSASR_ATTN_INTERPRET=1 runs the kernel in interpret mode so
        # the fused MODEL path is testable on CPU
        interp = os.environ.get("TSASR_ATTN_INTERPRET", "0") != "0"
        if self.fused and (interp or jax.default_backend() != "cpu"):
            from tsasr_tpu.ops.attention_pallas import (
                fused_attention_applicable,
                fused_relpos_attention,
            )
            if fused_attention_applicable(T, Dh):
                out = self._fused_attention(
                    q_u, q_v, k, v, p_k, key_padding_mask, attn_mask,
                    deterministic, interp)
                out = nn.Dense(D, kernel_init=xavier, dtype=self.dtype,
                               name="out_proj")(out)
                return out, None

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
        if self.att_context_size > 0:
            # bounded left context: key j visible to query i only when
            # i - j < att_context_size (and j <= i if causal)
            i_idx = jnp.arange(T)[:, None]
            j_idx = jnp.arange(T)[None, :]
            too_far = (i_idx - j_idx) >= self.att_context_size
            scores = jnp.where(too_far[None, None], ATTN_FILL, scores)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :],
                               ATTN_FILL, scores)

        attn = nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = attn.astype(self.dtype)
        attn = Dropout(self.dropout, bits=self.dropout_bits,
                       deterministic=deterministic)(attn)

        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, D)
        out = nn.Dense(D, kernel_init=xavier, dtype=self.dtype,
                       name="out_proj")(out)
        return out, attn

    def _fused_attention(self, q_u, q_v, k, v, p_k, key_padding_mask,
                         attn_mask, deterministic, interpret=False):
        """Route through the fused Pallas kernel; returns (B, T, D)."""
        from tsasr_tpu.ops.attention_pallas import fused_relpos_attention

        B, T, H, Dh = q_u.shape
        to_bhtd = lambda x: jnp.swapaxes(x, 1, 2)        # noqa: E731
        p = jnp.swapaxes(p_k[0], 0, 1)                   # (H, 2T-1, Dh)

        if key_padding_mask is not None:
            kp_add = jnp.where(key_padding_mask, ATTN_FILL,
                               0.0).astype(jnp.float32)
        else:
            kp_add = jnp.zeros((B, T), jnp.float32)
        am = jnp.zeros((T, T), jnp.float32)
        if attn_mask is not None:
            am = jnp.where(attn_mask, ATTN_FILL, am)
        if self.att_context_size > 0:
            too_far = ((jnp.arange(T)[:, None] - jnp.arange(T)[None, :])
                       >= self.att_context_size)
            am = jnp.where(too_far, ATTN_FILL, am)

        rate = 0.0 if deterministic else float(self.dropout)
        if rate > 0.0:
            # in-kernel PRNG seed (reseeded identically in the backward
            # so the mask is regenerated, never stored); float-typed so
            # custom_vjp cotangents stay trivial
            seed = jax.random.randint(self.make_rng("dropout"), (),
                                      0, 1 << 23).astype(jnp.float32)
        else:
            seed = jnp.zeros((), jnp.float32)

        out = fused_relpos_attention(
            to_bhtd(q_u), to_bhtd(q_v), to_bhtd(k), to_bhtd(v), p,
            kp_add, am, seed, 1.0 / math.sqrt(self.embed_dim), rate,
            interpret)
        return jnp.swapaxes(out, 1, 2).reshape(B, T, H * Dh)

    def _streaming_attention(self, q_u, q_v, k_new, v_new, kv_cache,
                             pos_proj, deterministic):
        """Causal attention of Q new frames over cache + new frames."""
        B, Q, H, Dh = q_u.shape
        D = H * Dh
        k_cache, v_cache = kv_cache["k"], kv_cache["v"]
        count = kv_cache["count"]                        # (B,)
        C = k_cache.shape[1]

        # write the new keys/values into the buffer (per-batch offsets
        # are identical in practice; use the max for the static slice)
        def write(buf, new):
            return jax.lax.dynamic_update_slice(
                buf, new.astype(buf.dtype),
                (0, jnp.max(count), 0, 0))

        k_all = write(k_cache, k_new)
        v_all = write(v_cache, v_new)
        new_count = count + Q

        # distances d = (count + i) - j for query i, key j in [0, C)
        j_idx = jnp.arange(C)[None, None, :]             # (1, 1, C)
        i_idx = jnp.arange(Q)[None, :, None]             # (1, Q, 1)
        dist = count[:, None, None] + i_idx - j_idx      # (B, Q, C)
        valid = (dist >= 0) & (j_idx < new_count[:, None, None])
        if self.att_context_size > 0:
            valid = valid & (dist < self.att_context_size)

        # positional table for distances 0..C-1: enc(d)
        max_d = C
        pe = _past_pos_encoding(max_d, D, self.dtype)    # (max_d, D)
        p = pos_proj(pe).reshape(max_d, H, Dh)

        ac = jnp.einsum("bqhd,bshd->bhqs", q_u, k_all)   # (B, H, Q, C)
        bd_all = jnp.einsum("bqhd,rhd->bhqr", q_v, p)    # (B, H, Q, R)
        dist_c = jnp.clip(dist, 0, max_d - 1)            # (B, Q, C)
        bd = jnp.take_along_axis(
            bd_all, jnp.broadcast_to(dist_c[:, None], (B, H, Q, C)),
            axis=-1)
        scores = (ac + bd) * (1.0 / math.sqrt(self.embed_dim))
        scores = jnp.where(valid[:, None], scores, ATTN_FILL)

        attn = nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = attn.astype(self.dtype)
        out = jnp.einsum("bhqs,bshd->bqhd", attn, v_all).reshape(B, Q, D)
        out = nn.Dense(D, kernel_init=nn.initializers.xavier_normal(),
                       dtype=self.dtype, name="out_proj")(out)
        new_cache = {"k": k_all, "v": v_all, "count": new_count}
        return (out, attn), new_cache


def _past_pos_encoding(n, emb_dim, dtype=jnp.float32):
    """enc(d) for distances d = 0..n-1 (the 'past' half of the
    reference's symmetric relative encoding)."""
    inv_freq = jnp.exp(jnp.arange(0, emb_dim, 2, dtype=jnp.float32)
                       * -(math.log(10000.0) / emb_dim))
    d = jnp.arange(n, dtype=jnp.float32)[:, None]
    angles = d * inv_freq[None, :]
    pe = jnp.zeros((n, emb_dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe.astype(dtype)


class CrossAttention(nn.Module):
    """Standard multi-head cross-attention, used by the
    ``cross_attention`` speaker-injection mode (equivalent of the
    reference's torch ``nn.MultiheadAttention`` wrapper,
    ``nnet/attention.py:642-775``)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dropout_bits: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key_value, key_padding_mask=None,
                 deterministic=True, attn_mask=None):
        """``attn_mask``: optional (Tq, Tk) bool, True = disallowed
        (e.g. ``ops.masks.lookahead_mask`` for causal self-attention —
        pass ``key_value=query`` for self-attention use)."""
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
        if attn_mask is not None:
            scores = jnp.where(attn_mask[None, None, :, :], ATTN_FILL,
                               scores)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = attn.astype(self.dtype)
        attn = Dropout(self.dropout, bits=self.dropout_bits,
                       deterministic=deterministic)(attn)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, Tq, D)
        return nn.Dense(D, kernel_init=xavier, dtype=self.dtype,
                        name="out_proj")(out)
