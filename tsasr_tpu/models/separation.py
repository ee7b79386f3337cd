"""Source-separation models: SepFormer (dual-path transformer) and
Conv-TasNet.

TPU-native re-implementation of the reference lobes
``lobes/models/dual_path.py:163-1441`` (Encoder / Dual_Path_Model /
Decoder, the SepFormer composition) and ``lobes/models/conv_tasnet.py``
(TCN mask network). Redesign notes:

- time-major (B, T, C) layout everywhere (flax convention) instead of
  the reference's (B, C, L); chunking for the dual path is a reshape to
  (B*S, K, C) for the intra pass and (B*K, S, C) for the inter pass, so
  both passes are plain batched transformer calls — XLA sees two big
  attention matmuls per block, no per-chunk Python loops;
- 50%-overlap segmentation/overlap-add as pad + reshape + add (static
  shapes, jit-safe);
- masks via the reference's gated output (tanh x sigmoid) + ReLU.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class TransformerBlock(nn.Module):
    """Small pre-LN transformer encoder used for intra/inter processing
    (reference ``SBTransformerBlock``)."""

    d_model: int
    nhead: int = 8
    d_ffn: int = 1024
    num_layers: int = 1
    dropout: float = 0.0
    use_positional_encoding: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        B, T, C = x.shape
        if self.use_positional_encoding:
            pos = _abs_positional_encoding(T, C, x.dtype)
            x = x + pos[None]
        for _ in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                dropout_rate=self.dropout,
                deterministic=deterministic)(h)
            x = x + h
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = nn.Dense(self.d_ffn, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Dense(C, dtype=self.dtype)(h)
            x = x + h
        return x


def _abs_positional_encoding(T, C, dtype):
    pos = jnp.arange(T, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, C, 2, dtype=jnp.float32)
                  * -(math.log(10000.0) / C))
    pe = jnp.zeros((T, C), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: (C + 1) // 2]))
    return pe.astype(dtype)


def segment(x, K):
    """(B, T, C) -> (B, S, K, C) chunks with 50% overlap (hop K//2),
    plus the padded length for inverse. Mirrors the reference's
    ``_Segmentation`` (dual_path.py) as pure reshapes."""
    B, T, C = x.shape
    hop = K // 2
    rest = K - (hop + T % K) % K
    x = jnp.pad(x, ((0, 0), (hop, rest + hop), (0, 0)))
    Tp = x.shape[1]
    seg1 = x[:, : Tp - hop].reshape(B, -1, K, C)
    seg2 = x[:, hop:].reshape(B, -1, K, C)
    # interleave: chunks at hop offsets
    chunks = jnp.stack([seg1, seg2], axis=2).reshape(B, -1, K, C)
    return chunks, rest


def overlap_add(chunks, rest, T_out):
    """Inverse of :func:`segment`."""
    B, S, K, C = chunks.shape
    hop = K // 2
    seg1 = chunks[:, 0::2].reshape(B, -1, C)
    seg2 = chunks[:, 1::2].reshape(B, -1, C)
    Tp = seg1.shape[1] + hop
    out = jnp.zeros((B, Tp, C), chunks.dtype)
    out = out.at[:, :Tp - hop].add(seg1)
    out = out.at[:, hop:].add(seg2)
    out = out[:, hop: Tp - rest - hop]
    return out[:, :T_out] / 2.0


class DualComputationBlock(nn.Module):
    """Intra-chunk then inter-chunk processing with norms + residuals
    (reference ``Dual_Computation_Block``)."""

    d_model: int
    nhead: int = 8
    d_ffn: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        B, S, K, C = x.shape
        intra = TransformerBlock(self.d_model, self.nhead, self.d_ffn,
                                 dtype=self.dtype, name="intra")(
            x.reshape(B * S, K, C), deterministic)
        intra = nn.Dense(C, dtype=self.dtype)(intra)
        intra = nn.LayerNorm(dtype=self.dtype)(intra)
        x = x + intra.reshape(B, S, K, C)

        inter_in = jnp.swapaxes(x, 1, 2).reshape(B * K, S, C)
        inter = TransformerBlock(self.d_model, self.nhead, self.d_ffn,
                                 dtype=self.dtype, name="inter")(
            inter_in, deterministic)
        inter = nn.Dense(C, dtype=self.dtype)(inter)
        inter = nn.LayerNorm(dtype=self.dtype)(inter)
        inter = jnp.swapaxes(inter.reshape(B, K, S, C), 1, 2)
        return x + inter


class MaskNet(nn.Module):
    """Dual-path mask network -> (num_spks, B, T, N) masks
    (reference ``Dual_Path_Model``)."""

    in_channels: int                    # encoder channels N
    out_channels: int = 64              # bottleneck C
    num_layers: int = 2
    K: int = 50
    num_spks: int = 2
    nhead: int = 8
    d_ffn: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        B, T, N = x.shape
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.out_channels, use_bias=False,
                     dtype=self.dtype)(h)
        chunks, rest = segment(h, self.K)
        for i in range(self.num_layers):
            chunks = DualComputationBlock(
                self.out_channels, self.nhead, self.d_ffn,
                dtype=self.dtype, name=f"dual_{i}")(chunks,
                                                    deterministic)
        S = chunks.shape[1]
        h = _prelu(chunks, self.param("prelu_alpha", nn.initializers
                                      .constant(0.25), ()))
        h = nn.Dense(self.out_channels * self.num_spks,
                     dtype=self.dtype, name="spk_expand")(h)
        h = h.reshape(B, S, self.K, self.num_spks, self.out_channels)
        h = jnp.moveaxis(h, 3, 1).reshape(
            B * self.num_spks, S, self.K, self.out_channels)
        h = overlap_add(h, rest, T)
        gate = nn.tanh(nn.Dense(self.out_channels, dtype=self.dtype,
                                name="output")(h)) * \
            nn.sigmoid(nn.Dense(self.out_channels, dtype=self.dtype,
                                name="output_gate")(h))
        mask = nn.Dense(self.in_channels, use_bias=False,
                        dtype=self.dtype, name="end_conv")(gate)
        mask = nn.relu(mask)
        return mask.reshape(B, self.num_spks, T, N).swapaxes(0, 1)


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


class SepFormer(nn.Module):
    """Full separation model: conv encoder -> dual-path masks ->
    transposed-conv decoder (reference SepFormer composition,
    ``dual_path.py`` Example / ``pretrained.SepformerSeparation``)."""

    num_spks: int = 2
    enc_channels: int = 64
    enc_kernel: int = 16
    bottleneck: int = 64
    num_layers: int = 2
    K: int = 50
    nhead: int = 8
    d_ffn: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mix, deterministic=True):
        """mix (B, L) -> est_sources (B, L, num_spks)."""
        B, L = mix.shape
        stride = self.enc_kernel // 2
        feats = nn.Conv(self.enc_channels, (self.enc_kernel,),
                        strides=(stride,), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        name="encoder")(mix[..., None])
        feats = nn.relu(feats)                          # (B, T, N)
        masks = MaskNet(self.enc_channels, self.bottleneck,
                        self.num_layers, self.K, self.num_spks,
                        self.nhead, self.d_ffn, dtype=self.dtype,
                        name="masknet")(feats, deterministic)
        sep = feats[None] * masks                       # (spk, B, T, N)
        dec = nn.ConvTranspose(1, (self.enc_kernel,), strides=(stride,),
                               padding="SAME", use_bias=False,
                               dtype=self.dtype, name="decoder")
        outs = []
        for s in range(self.num_spks):
            w = dec(sep[s])[..., 0]
            outs.append(w[:, :L])
        out = jnp.stack(outs, axis=-1)
        pad = L - out.shape[1]
        if pad > 0:
            out = jnp.pad(out, ((0, 0), (0, pad), (0, 0)))
        return out


class TCNBlock(nn.Module):
    """One Conv-TasNet temporal block: 1x1 -> PReLU -> norm -> dilated
    depthwise -> PReLU -> norm -> (residual 1x1, skip 1x1)."""

    bn_channels: int
    hidden: int
    kernel_size: int
    dilation: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype)(x)
        h = _prelu(h, self.param("a1", nn.initializers.constant(0.25),
                                 ()))
        h = nn.LayerNorm(dtype=self.dtype)(h)
        pad = (self.kernel_size - 1) * self.dilation // 2
        h = nn.Conv(self.hidden, (self.kernel_size,),
                    kernel_dilation=(self.dilation,),
                    feature_group_count=self.hidden,
                    padding=[(pad, pad)], dtype=self.dtype,
                    name="depthwise")(h)
        h = _prelu(h, self.param("a2", nn.initializers.constant(0.25),
                                 ()))
        h = nn.LayerNorm(dtype=self.dtype)(h)
        res = nn.Dense(self.bn_channels, dtype=self.dtype,
                       name="res_proj")(h)
        skip = nn.Dense(self.bn_channels, dtype=self.dtype,
                        name="skip_proj")(h)
        return x + res, skip


class ConvTasNet(nn.Module):
    """Conv-TasNet: conv encoder -> stacked dilated TCN mask network ->
    transposed-conv decoder (reference ``lobes/models/conv_tasnet.py``)."""

    num_spks: int = 2
    enc_channels: int = 64
    enc_kernel: int = 16
    bn_channels: int = 32
    hidden: int = 64
    kernel_size: int = 3
    num_blocks: int = 4
    num_repeats: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mix, deterministic=True):
        B, L = mix.shape
        stride = self.enc_kernel // 2
        feats = nn.Conv(self.enc_channels, (self.enc_kernel,),
                        strides=(stride,), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        name="encoder")(mix[..., None])
        feats = nn.relu(feats)
        h = nn.LayerNorm(dtype=self.dtype)(feats)
        h = nn.Dense(self.bn_channels, dtype=self.dtype)(h)
        skips = 0.0
        for r in range(self.num_repeats):
            for b in range(self.num_blocks):
                h, skip = TCNBlock(
                    self.bn_channels, self.hidden, self.kernel_size,
                    dilation=2 ** b, dtype=self.dtype,
                    name=f"tcn_{r}_{b}")(h)
                skips = skips + skip
        m = _prelu(skips, self.param("prelu_alpha",
                                     nn.initializers.constant(0.25), ()))
        m = nn.Dense(self.enc_channels * self.num_spks,
                     dtype=self.dtype)(m)
        T = m.shape[1]
        masks = nn.relu(m).reshape(B, T, self.num_spks,
                                   self.enc_channels)
        masks = jnp.moveaxis(masks, 2, 0)
        sep = feats[None] * masks
        dec = nn.ConvTranspose(1, (self.enc_kernel,), strides=(stride,),
                               padding="SAME", use_bias=False,
                               dtype=self.dtype, name="decoder")
        outs = []
        for s in range(self.num_spks):
            w = dec(sep[s])[..., 0]
            outs.append(w[:, :L])
        out = jnp.stack(outs, axis=-1)
        pad = L - out.shape[1]
        if pad > 0:
            out = jnp.pad(out, ((0, 0), (0, pad), (0, 0)))
        return out


class RESepFormerSeparator(nn.Module):
    """RE-SepFormer mask estimator (reference ``lobes/models/
    resepformer.py``: ResourceEfficientSeparationPipeline :448-606 +
    ResourceEfficientSeparator :609-719).

    Resource-efficient alternative to the dual-path ``MaskNet``: the
    O((S*K)^2) inter-chunk attention is replaced by a per-block MEMORY
    pass — each segment is summarized (mean over its K frames, the
    reference's ``mem_type='av'``), a small transformer runs over the S
    summaries, and the result is broadcast back into the next block's
    segments. Per block: O(S*K^2 + S^2) attention instead of
    O(S*K^2 + K*S^2).

    TPU-first notes / documented deviations:
    - everything is static-shape; the T -> ceil(T/K)*K pad happens once
      at entry (reference ``_padfeature``);
    - the reference's 'av' memory attends over a (1, B*S, D) tensor —
      attention LEAKS across batch items (an artifact of its ESPnet
      SkiM adaptation). Here memory attention runs over (B, S, D):
      segments of the same utterance only;
    - the LSTM-based SkiM variants (``mem_type`` 'hc'/'h'/'c'/'id' with
      SegLSTM/MemLSTM) are out of scope — RE-SepFormer's published
      configuration is transformer blocks + 'av' (or no) memory.

    Input (B, T, N) encoded features -> (num_spk, B, T, N) masks.
    """

    input_dim: int
    num_spk: int = 2
    num_blocks: int = 3
    segment_size: int = 20
    nhead: int = 8
    d_ffn: int = 1024
    mem_type: str = "av"            # "av" | None
    nonlinear: str = "relu"         # "relu" | "sigmoid" | "tanh"
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.mem_type not in ("av", None):
            raise ValueError(
                f"mem_type {self.mem_type!r}: only 'av' (RE-SepFormer) "
                "and None are supported; the SegLSTM/MemLSTM SkiM "
                "variants are out of scope (see class docstring)")
        B, T, N = x.shape
        K = self.segment_size
        pad = (-T) % K
        h = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        S = h.shape[1] // K
        h = h.reshape(B * S, K, N)
        mem = jnp.zeros((B * S, 1, N), h.dtype)
        for i in range(self.num_blocks):
            h = TransformerBlock(
                d_model=N, nhead=self.nhead, d_ffn=self.d_ffn,
                dropout=self.dropout, dtype=self.dtype,
                name=f"seg_block_{i}")(h + mem, deterministic)
            if self.mem_type == "av" and i < self.num_blocks - 1:
                summaries = h.mean(axis=1).reshape(B, S, N)
                summaries = TransformerBlock(
                    d_model=N, nhead=self.nhead, d_ffn=self.d_ffn,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"mem_block_{i}")(summaries, deterministic)
                mem = summaries.reshape(B * S, 1, N)
        h = h.reshape(B, S * K, N)[:, :T]
        h = _prelu(h, self.param("prelu_alpha",
                                 nn.initializers.constant(0.25), ()))
        h = nn.Dense(N * self.num_spk, dtype=self.dtype,
                     name="output_fc")(h)
        nonlin = {"relu": nn.relu, "sigmoid": nn.sigmoid,
                  "tanh": nn.tanh}[self.nonlinear]
        masks = nonlin(h.reshape(B, T, N, self.num_spk))
        return jnp.moveaxis(masks, 3, 0)
