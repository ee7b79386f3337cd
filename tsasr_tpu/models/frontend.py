"""Convolutional feature frontend (2D conv subsampling blocks).

TPU-native equivalent of the reference ``ConvolutionFrontEnd``
(``vendor/speechbrain/speechbrain/lobes/models/convolution.py:103-267``):
N blocks of [Conv2d -> LayerNorm(channels) -> act -> dropout] x layers,
stride applied on the *last* conv of each block, plus an optional 1x1-conv
residual branch (conv stride s -> LayerNorm, added before a final block
dropout). The recipe uses 2 blocks, kernel 3, stride (2,2), residual=True
=> 4x time subsampling and (B, T/4, F/4, C) output.

Padding semantics reproduce the reference exactly
(``nnet/CNN.py:640-716,1478-1499``):
- ``same`` with stride>1 pads floor(k/2) on both sides of each spatial
  dim (so out_len = ceil(in_len / stride) for k=3) with REFLECT values
  (``CNN.py:578`` padding_mode="reflect") — pinned bit-close by the
  full-model parity test;
- ``causal`` left-pads (k-1) on the *time* dim and same-pads the freq
  dim. Deviation: causal pads with zeros (reference reflects) so the
  streaming cache (zero-init) is exactly the offline computation; the
  recipe's causal yaml accepts this documented difference.

Layout is (B, T, F, C) channels-last, the native layout for TPU convs.
"""

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.ops.dropout import Dropout

Dtype = Any


def _pad_amounts(kernel, stride, causal_time=False):
    """Per-dim (lo, hi) paddings matching the reference conventions."""
    k_t, k_f = kernel
    if causal_time:
        pad_t = (k_t - 1, 0)
    else:
        pad_t = (k_t // 2, k_t // 2) if stride[0] > 1 else \
            ((k_t - 1) // 2, (k_t - 1) // 2)
    pad_f = (k_f // 2, k_f // 2) if stride[1] > 1 else \
        ((k_f - 1) // 2, (k_f - 1) // 2)
    return [pad_t, pad_f]


class ConvBlock(nn.Module):
    """One frontend block with optional strided residual branch."""

    out_channels: int
    num_layers: int = 1
    kernel_size: int = 3
    stride: int = 1
    residual: bool = True
    dropout: float = 0.1
    dropout_bits: int = 32
    causal: bool = False
    activation: Callable = nn.leaky_relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, block_cache=None):
        """Streaming (causal only): ``block_cache`` holds the last
        kernel_size-1 input time-rows (zero-init == the offline causal
        left-pad); x is the NEW rows (count divisible by the stride).
        Returns (out, new_cache)."""
        streaming = block_cache is not None
        k = (self.kernel_size, self.kernel_size)
        if streaming:
            x_ext = jnp.concatenate([block_cache.astype(x.dtype), x],
                                    axis=1)
        else:
            x_ext = x
        out = x_ext
        for i in range(self.num_layers):
            s = (self.stride, self.stride) if i == self.num_layers - 1 \
                else (1, 1)
            if streaming:
                pad = [(0, 0), _pad_amounts(k, s, True)[1]]
            else:
                pad = _pad_amounts(k, s, self.causal)
            if not streaming and not self.causal:
                # the reference 'same' convs REFLECT-pad
                # (nnet/CNN.py:578 padding_mode="reflect", :640-716)
                out = jnp.pad(out, [(0, 0), pad[0], pad[1], (0, 0)],
                              mode="reflect")
                pad = "VALID"
            out = nn.Conv(self.out_channels, kernel_size=k, strides=s,
                          padding=pad,
                          dtype=self.dtype, name=f"conv_{i}")(out)
            # the reference LayerNorm normalizes over (freq, channels)
            # jointly with per-(F,C) affine (normalization.py:206-212:
            # input_size = input_shape[2:] on a (B,T,F,C) input)
            out = nn.LayerNorm(reduction_axes=(-2, -1),
                               feature_axes=(-2, -1), epsilon=1e-5,
                               dtype=self.dtype, name=f"norm_{i}")(out)
            out = self.activation(out)
            out = Dropout(self.dropout, bits=self.dropout_bits,
                          deterministic=deterministic)(out)
        if self.residual:
            res = nn.Conv(self.out_channels, kernel_size=(1, 1),
                          strides=(self.stride, self.stride),
                          padding="VALID", dtype=self.dtype,
                          name="residual_conv")(x)
            res = nn.LayerNorm(reduction_axes=(-2, -1),
                               feature_axes=(-2, -1), epsilon=1e-5,
                               dtype=self.dtype, name="residual_norm")(res)
            out = out + res
            out = Dropout(self.dropout, bits=self.dropout_bits,
                          deterministic=deterministic)(out)
        if streaming:
            return out, x_ext[:, -(self.kernel_size - 1):]
        return out


class ConvolutionFrontEnd(nn.Module):
    """Stack of ConvBlocks; input (B, T, F) gains a channel dim."""

    out_channels: Sequence[int] = (128, 128)
    kernel_sizes: Sequence[int] = (3, 3)
    strides: Sequence[int] = (2, 2)
    residuals: Sequence[bool] = (True, True)
    num_layers_per_block: int = 1
    dropout: float = 0.1
    dropout_bits: int = 32
    causal: bool = False
    activation: Callable = nn.leaky_relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, stream_caches=None):
        """x: (B, T, F) features -> (B, T', F', C) subsampled maps.

        Streaming (causal frontends): ``stream_caches`` is a per-block
        list of cached input rows; x holds the NEW feature frames (count
        divisible by the total stride product); returns (out, caches).
        """
        streaming = stream_caches is not None
        if streaming and self.num_layers_per_block != 1:
            raise NotImplementedError(
                "streaming frontend supports num_layers_per_block == 1")
        if x.ndim == 3:
            x = x[..., None]
        new_caches = []
        for i, (ch, k, s, r) in enumerate(zip(
                self.out_channels, self.kernel_sizes, self.strides,
                self.residuals)):
            block = ConvBlock(out_channels=ch, kernel_size=k, stride=s,
                              residual=r,
                              num_layers=self.num_layers_per_block,
                              dropout=self.dropout,
                              dropout_bits=self.dropout_bits,
                              causal=self.causal,
                              activation=self.activation,
                              dtype=self.dtype, name=f"block_{i}")
            if streaming:
                x, cache = block(x, deterministic, stream_caches[i])
                new_caches.append(cache)
            else:
                x = block(x, deterministic)
        if streaming:
            return x, new_caches
        return x

    @staticmethod
    def output_length(in_length, strides=(2, 2)):
        """Subsampled length for 'same' padding (ceil division chain)."""
        out = in_length
        for s in strides:
            out = -(-out // s)
        return out
