"""ECAPA-TDNN speaker embedding model (flax port).

Reference: ``vendor/speechbrain/speechbrain/lobes/models/ECAPA_TDNN.py``
(:31-560) — the de-facto standard speaker verification/diarization
embedding model (arXiv:2005.07143) and a natural alternative speaker
encoder for the TS-ASR recipe. Architecture mirrored exactly:

- TDNN blocks = reflect-same dilated Conv1d -> ReLU -> BatchNorm;
- SE-Res2Net blocks (1x1 TDNN -> Res2Net cascade -> 1x1 TDNN ->
  squeeze-excitation with mask-aware pooling, residual/shortcut);
- multi-layer feature aggregation -> attentive statistics pooling
  (global-context mean/std, -inf masked softmax, eps-clamped std) ->
  BatchNorm -> 1x1 conv to the embedding;
- the cosine ``Classifier`` head (normalized features x normalized
  class weights) for AAM-softmax training.

Layout is (B, T, C) channels-last (TPU native); weights port from the
torch module by transposing convs — pinned by
``tests/test_reference_parity.py::TestECAPAParity``.

Also here: the classic :class:`Xvector` TDNN
(``lobes/models/Xvector.py``) with statistics pooling, parity-pinned.
"""

from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
NEG = -1e30


class TDNNBlock(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.dilation * (self.kernel_size - 1) // 2
        if pad:
            x = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="reflect")
        x = nn.Conv(self.out_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    feature_group_count=self.groups, dtype=self.dtype,
                    name="conv")(x)
        x = jax.nn.relu(x)
        return nn.BatchNorm(use_running_average=not train,
                            momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            name="norm")(x)


class Res2NetBlock(nn.Module):
    out_channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        chunks = jnp.split(x, self.scale, axis=-1)
        hidden = self.out_channels // self.scale
        outs = [chunks[0]]
        y = None
        for i in range(1, self.scale):
            inp = chunks[i] if i == 1 else chunks[i] + y
            y = TDNNBlock(hidden, self.kernel_size, self.dilation,
                          dtype=self.dtype, name=f"block_{i - 1}")(
                              inp, train=train)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


def _masked_mean(x, rel_lengths):
    """(B, T, C) mean over valid frames; rel_lengths like the reference
    (mask = length_to_mask(rel * L))."""
    T = x.shape[1]
    if rel_lengths is None:
        return x.mean(axis=1, keepdims=True), None
    abs_len = jnp.round(rel_lengths * T).astype(jnp.int32)
    mask = (jnp.arange(T)[None, :] < abs_len[:, None])[..., None]
    total = jnp.maximum(mask.sum(axis=1, keepdims=True), 1)
    mean = (x * mask).sum(axis=1, keepdims=True) / total
    return mean, mask


class SEBlock(nn.Module):
    se_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_lengths=None, train=False):
        s, _ = _masked_mean(x, rel_lengths)                # (B, 1, C)
        s = jax.nn.relu(nn.Conv(self.se_channels, (1,), dtype=self.dtype,
                                name="conv1")(s))
        s = jax.nn.sigmoid(nn.Conv(self.out_channels, (1,),
                                   dtype=self.dtype, name="conv2")(s))
        return s * x


class AttentiveStatisticsPooling(nn.Module):
    attention_channels: int = 128
    global_context: bool = True
    dtype: Dtype = jnp.float32
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, rel_lengths=None, train=False):
        B, T, C = x.shape
        if rel_lengths is None:
            rel_lengths = jnp.ones((B,), x.dtype)
        abs_len = jnp.round(rel_lengths * T).astype(jnp.int32)
        mask = (jnp.arange(T)[None, :] < abs_len[:, None])[..., None]

        def stats(values, weights):
            mean = (weights * values).sum(axis=1)           # (B, C)
            var = (weights * jnp.square(values - mean[:, None])).sum(
                axis=1)
            return mean, jnp.sqrt(jnp.clip(var, self.eps))

        if self.global_context:
            total = jnp.maximum(mask.sum(axis=1, keepdims=True), 1)
            mean, std = stats(x, mask / total)
            attn_in = jnp.concatenate(
                [x, jnp.broadcast_to(mean[:, None], x.shape),
                 jnp.broadcast_to(std[:, None], x.shape)], axis=-1)
        else:
            attn_in = x
        attn = TDNNBlock(self.attention_channels, 1, 1, dtype=self.dtype,
                         name="tdnn")(attn_in, train=train)
        attn = nn.Conv(C, (1,), dtype=self.dtype, name="conv")(
            jnp.tanh(attn))
        attn = jnp.where(mask, attn, NEG)
        attn = jax.nn.softmax(attn, axis=1)
        mean, std = stats(x, attn)
        return jnp.concatenate([mean, std], axis=-1)[:, None, :]


class SERes2NetBlock(nn.Module):
    out_channels: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 1
    dilation: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_lengths=None, train=False):
        residual = x
        if x.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1,), dtype=self.dtype,
                               name="shortcut")(x)
        x = TDNNBlock(self.out_channels, 1, 1, self.groups,
                      dtype=self.dtype, name="tdnn1")(x, train=train)
        x = Res2NetBlock(self.out_channels, self.res2net_scale,
                         self.kernel_size, self.dilation,
                         dtype=self.dtype, name="res2net")(x, train=train)
        x = TDNNBlock(self.out_channels, 1, 1, self.groups,
                      dtype=self.dtype, name="tdnn2")(x, train=train)
        x = SEBlock(self.se_channels, self.out_channels,
                    dtype=self.dtype, name="se")(x, rel_lengths,
                                                 train=train)
        return x + residual


@dataclass(frozen=True)
class ECAPAConfig:
    input_size: int = 80
    lin_neurons: int = 192
    channels: Sequence[int] = (512, 512, 512, 512, 1536)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    dtype: Any = jnp.float32


class ECAPA_TDNN(nn.Module):
    """Features (B, T, F) + relative lengths -> embeddings (B, 1, E)."""

    config: ECAPAConfig = field(default_factory=ECAPAConfig)

    @nn.compact
    def __call__(self, x, rel_lengths=None, train=False):
        c = self.config
        outs = []
        x = TDNNBlock(c.channels[0], c.kernel_sizes[0], c.dilations[0],
                      dtype=c.dtype, name="block_0")(x, train=train)
        outs.append(x)
        for i in range(1, len(c.channels) - 1):
            x = SERes2NetBlock(
                c.channels[i], res2net_scale=c.res2net_scale,
                se_channels=c.se_channels, kernel_size=c.kernel_sizes[i],
                dilation=c.dilations[i], dtype=c.dtype,
                name=f"block_{i}")(x, rel_lengths, train=train)
            outs.append(x)
        x = jnp.concatenate(outs[1:], axis=-1)
        x = TDNNBlock(c.channels[-1], c.kernel_sizes[-1], c.dilations[-1],
                      dtype=c.dtype, name="mfa")(x, train=train)
        x = AttentiveStatisticsPooling(
            c.attention_channels, c.global_context, dtype=c.dtype,
            name="asp")(x, rel_lengths, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=c.dtype, name="asp_bn")(x)
        return nn.Conv(c.lin_neurons, (1,), dtype=c.dtype, name="fc")(x)


class CosineClassifier(nn.Module):
    """Reference ECAPA ``Classifier`` (:506-560): optional BN+Linear
    blocks, then cosine similarity against xavier class weights."""

    out_neurons: int
    lin_blocks: int = 0
    lin_neurons: int = 192
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.lin_blocks):
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"norm_{i}")(x)
            x = nn.Dense(self.lin_neurons, dtype=self.dtype,
                         name=f"linear_{i}")(x)
        weight = self.param("weight", nn.initializers.xavier_uniform(),
                            (self.out_neurons, x.shape[-1]))
        x_n = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w_n = weight / jnp.maximum(
            jnp.linalg.norm(weight, axis=-1, keepdims=True), 1e-12)
        return x_n @ w_n.T


@dataclass(frozen=True)
class XvectorConfig:
    in_channels: int = 40
    tdnn_blocks: int = 5
    tdnn_channels: Sequence[int] = (512, 512, 512, 512, 1500)
    tdnn_kernel_sizes: Sequence[int] = (5, 3, 3, 1, 1)
    tdnn_dilations: Sequence[int] = (1, 2, 3, 1, 1)
    lin_neurons: int = 512
    dtype: Any = jnp.float32


class Xvector(nn.Module):
    """Classic x-vector TDNN (reference ``lobes/models/Xvector.py``:
    TDNN blocks of [reflect-same dilated conv -> LeakyReLU ->
    BatchNorm], statistics pooling (masked mean + unbiased std + 1e-5
    eps; the reference also adds Gaussian noise to the mean — pass
    ``noise_rng`` to reproduce, omitted for deterministic inference),
    and a final Linear. (B, T, F) -> (B, 1, lin_neurons)."""

    config: XvectorConfig = field(default_factory=XvectorConfig)

    @nn.compact
    def __call__(self, x, rel_lengths=None, train=False, noise_rng=None):
        c = self.config
        for i in range(c.tdnn_blocks):
            k, d = c.tdnn_kernel_sizes[i], c.tdnn_dilations[i]
            pad = d * (k - 1) // 2
            if pad:
                x = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)],
                            mode="reflect")
            x = nn.Conv(c.tdnn_channels[i], (k,), kernel_dilation=(d,),
                        padding="VALID", dtype=c.dtype,
                        name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=c.dtype,
                             name=f"norm_{i}")(x)
        # statistics pooling (nnet/pooling.py StatisticsPooling)
        T = x.shape[1]
        if rel_lengths is None:
            mean = x.mean(axis=1)
            std = jnp.std(x, axis=1, ddof=1)
        else:
            abs_len = jnp.round(rel_lengths * T).astype(jnp.int32)
            mask = (jnp.arange(T)[None, :] < abs_len[:, None])[..., None]
            cnt = jnp.maximum(mask.sum(axis=1), 1).astype(x.dtype)
            mean = (x * mask).sum(axis=1) / cnt
            var = (jnp.square(x - mean[:, None]) * mask).sum(axis=1) \
                / jnp.maximum(cnt - 1.0, 1.0)
            std = jnp.sqrt(var)
        if noise_rng is not None:
            mean = mean + jax.random.normal(noise_rng, mean.shape,
                                            mean.dtype) * 1e-5 \
                + 0.0  # small gaussian like the reference gnoise
        std = std + 1e-5
        stats = jnp.concatenate([mean, std], axis=-1)[:, None, :]
        return nn.Dense(c.lin_neurons, dtype=c.dtype, name="out")(stats)
