"""HiFi-GAN vocoder generator (flax port).

Reference: ``vendor/speechbrain/speechbrain/lobes/models/HifiGAN.py``
(:124-470) — mel-spectrogram -> waveform generator with
Multi-Receptive-Field Fusion. Mirrored exactly:

- conv_pre (k=7, reflect same) -> per stage [leaky_relu ->
  ConvTranspose1d(k, stride=u, padding=(k-u)//2) -> mean over
  num_kernels ResBlocks] -> leaky_relu -> conv_post (k=7) -> tanh;
- ResBlock1: two-conv pairs with dilations (leaky_relu -> dilated conv
  -> leaky_relu -> conv, residual); ResBlock2: single dilated convs;
- weight-normed convs fold to effective weights at porting time
  (inference path; the GAN discriminators/losses are training-time
  machinery out of scope for this framework — documented gap).

Everything is feed-forward convs: XLA fuses the whole generator into a
few MXU/VPU kernels. Layout (B, T, C) channels-last.
Parity: ``tests/test_reference_parity.py::TestHifiGANParity``.
"""

from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
LRELU_SLOPE = 0.1


def _reflect_pad_time(x, pad):
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="reflect")


class _SameConv(nn.Module):
    """sb Conv1d(skip_transpose, padding='same') — reflect padded."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.kernel_size - 1) // 2
        x = _reflect_pad_time(x, pad)
        return nn.Conv(self.features, (self.kernel_size,),
                       kernel_dilation=(self.dilation,), padding="VALID",
                       use_bias=self.use_bias, dtype=self.dtype,
                       name="conv")(x)


class ConvTranspose1dTorch(nn.Module):
    """torch ``ConvTranspose1d(stride, padding)`` semantics on (B,T,C):
    fractional-stride conv via lhs_dilation with the kernel flipped.
    Kernel parameter layout: (k, out, in) = torch (in, out, k) with the
    k axis LAST-to-first (ported weights transpose (2, 1, 0))."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, self.features, in_ch))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,))
        # y = full-conv(zero-upsampled x, w) cropped by p:
        # conv_general_dilated with lhs_dilation=s, padding k-1-p each
        # side, kernel flipped along k, contracted over in_ch
        flipped = jnp.flip(kernel, axis=0)           # (k, out, in)
        rhs = flipped.transpose(0, 2, 1)             # (k, in, out)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), rhs.astype(self.dtype),
            window_strides=(1,), padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y + bias


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = _SameConv(self.channels, self.kernel_size, d,
                           dtype=self.dtype, name=f"convs1_{i}")(xt)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = _SameConv(self.channels, self.kernel_size, 1,
                           dtype=self.dtype, name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = _SameConv(self.channels, self.kernel_size, d,
                           dtype=self.dtype, name=f"convs_{i}")(xt)
            x = xt + x
        return x


@dataclass(frozen=True)
class HifiganConfig:
    in_channels: int = 80
    out_channels: int = 1
    resblock_type: str = "1"
    resblock_dilation_sizes: Sequence[Sequence[int]] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    upsample_factors: Sequence[int] = (8, 8, 2, 2)
    inference_padding: int = 5
    conv_post_bias: bool = True
    dtype: Any = jnp.float32


class HifiganGenerator(nn.Module):
    """(B, T, mel) -> (B, T * prod(upsample_factors), 1) waveform."""

    config: HifiganConfig = field(default_factory=HifiganConfig)

    @nn.compact
    def __call__(self, x):
        c = self.config
        res_cls = ResBlock1 if c.resblock_type == "1" else ResBlock2
        o = _SameConv(c.upsample_initial_channel, 7, dtype=c.dtype,
                      name="conv_pre")(x)
        num_kernels = len(c.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(c.upsample_factors,
                                       c.upsample_kernel_sizes)):
            o = jax.nn.leaky_relu(o, LRELU_SLOPE)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            o = ConvTranspose1dTorch(ch, k, u, (k - u) // 2,
                                     dtype=c.dtype, name=f"ups_{i}")(o)
            z = 0.0
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                z = z + res_cls(ch, rk, tuple(rd), dtype=c.dtype,
                                name=f"resblocks_{i * num_kernels + j}")(o)
            o = z / num_kernels
        o = jax.nn.leaky_relu(o)
        o = _SameConv(c.out_channels, 7, use_bias=c.conv_post_bias,
                      dtype=c.dtype, name="conv_post")(o)
        return jnp.tanh(o)

    def inference(self, x):
        pad = self.config.inference_padding
        x = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="edge")
        return self(x)
