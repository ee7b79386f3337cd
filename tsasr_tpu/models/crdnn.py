"""CRDNN encoder (CNN + RNN + DNN), flax port.

Reference: ``vendor/speechbrain/speechbrain/lobes/models/CRDNN.py``
(:14-315) — SpeechBrain's classic seq2seq/CTC ASR encoder. Structure
mirrored exactly:

- N CNN blocks: [reflect-same Conv2d -> LayerNorm(F,C) -> act] x2 ->
  max-pool over the frequency axis (or 2D pooling) -> channel dropout;
- optional time max-pooling;
- optional projection (Linear over flattened (F', C) -> LayerNorm ->
  act);
- the RNN: bidirectional multi-layer LSTM (torch ``bidirectional``
  semantics via :class:`tsasr_tpu.models.rnn.BiLSTM`) or the reference
  default LiGRU (:class:`tsasr_tpu.models.rnn.LiGRU`, parity-pinned);
- M DNN blocks: Linear -> BatchNorm -> act -> dropout.

Combine with the attentional decoder (``models/seq2seq.py``) and the
AED searchers (``decoding/seq2seq.py``) for a full encoder-decoder ASR
stack; parity is pinned with ported torch weights in
``tests/test_reference_parity.py::TestCRDNNParity``.
"""

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.models.rnn import BiLSTM, LSTM, LiGRU

Dtype = Any


@dataclass(frozen=True)
class CRDNNConfig:
    input_size: int = 80
    activation: Callable = jax.nn.leaky_relu
    dropout: float = 0.15
    cnn_blocks: int = 2
    cnn_channels: Sequence[int] = (128, 256)
    cnn_kernelsize: Sequence[int] = (3, 3)
    time_pooling: bool = False
    time_pooling_size: int = 2
    inter_layer_pooling_size: Sequence[int] = (2, 2)
    using_2d_pooling: bool = False
    rnn_layers: int = 4
    rnn_neurons: int = 512
    rnn_bidirectional: bool = True
    rnn_type: str = "lstm"          # "lstm" | "ligru"
    dnn_blocks: int = 2
    dnn_neurons: int = 512
    projection_dim: int = -1
    dtype: Any = jnp.float32


class CNNBlock(nn.Module):
    channels: int
    kernel_size: Sequence[int] = (3, 3)
    pooling_size: int = 2
    using_2d_pool: bool = False
    dropout: float = 0.15
    activation: Callable = jax.nn.leaky_relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        kt, kf = self.kernel_size
        for i in (1, 2):
            # sb Conv2d 'same' REFLECT-pads (CNN.py:578)
            x = jnp.pad(x, [(0, 0), (kt // 2, kt // 2),
                            (kf // 2, kf // 2), (0, 0)], mode="reflect")
            x = nn.Conv(self.channels, (kt, kf), padding="VALID",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.LayerNorm(reduction_axes=(-2, -1),
                             feature_axes=(-2, -1), epsilon=1e-5,
                             dtype=self.dtype, name=f"norm_{i}")(x)
            x = self.activation(x)
        p = self.pooling_size
        if self.using_2d_pool:
            x = nn.max_pool(x, window_shape=(p, p), strides=(p, p))
        else:
            x = nn.max_pool(x, window_shape=(1, p), strides=(1, p))
        # reference Dropout2d drops whole channels
        x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                       deterministic=deterministic)(x)
        return x


class CRDNN(nn.Module):
    """(B, T, F) features -> (B, T', dnn_neurons) encodings."""

    config: CRDNNConfig = field(default_factory=CRDNNConfig)

    @nn.compact
    def __call__(self, x, deterministic=True, train=False):
        c = self.config
        if x.ndim == 3:
            x = x[..., None]                         # (B, T, F, 1)
        for i in range(c.cnn_blocks):
            x = CNNBlock(channels=c.cnn_channels[i],
                         kernel_size=tuple(c.cnn_kernelsize),
                         pooling_size=c.inter_layer_pooling_size[i],
                         using_2d_pool=c.using_2d_pooling,
                         dropout=c.dropout, activation=c.activation,
                         dtype=c.dtype, name=f"block_{i}")(
                             x, deterministic=deterministic)
        if c.time_pooling:
            x = nn.max_pool(x, window_shape=(c.time_pooling_size, 1),
                            strides=(c.time_pooling_size, 1))
        B, T = x.shape[0], x.shape[1]
        x = x.reshape(B, T, -1)
        if c.projection_dim != -1:
            x = nn.Dense(c.projection_dim, dtype=c.dtype,
                         name="projection")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype,
                             name="projection_norm")(x)
            x = c.activation(x)
        if c.rnn_layers > 0:
            if c.rnn_type == "ligru":
                x, _ = LiGRU(hidden_size=c.rnn_neurons,
                             in_features=x.shape[-1],
                             num_layers=c.rnn_layers,
                             bidirectional=c.rnn_bidirectional,
                             dtype=c.dtype, name="rnn")(x, train=train)
            elif c.rnn_bidirectional:
                x = BiLSTM(hidden_size=c.rnn_neurons,
                           in_features=x.shape[-1],
                           num_layers=c.rnn_layers, dropout=c.dropout,
                           dtype=c.dtype, name="rnn")(
                               x, deterministic=deterministic)
            else:
                x, _ = LSTM(hidden_size=c.rnn_neurons,
                            in_features=x.shape[-1],
                            num_layers=c.rnn_layers, dropout=c.dropout,
                            dtype=c.dtype, name="rnn")(x)
        for i in range(c.dnn_blocks):
            x = nn.Dense(c.dnn_neurons, dtype=c.dtype,
                         name=f"dnn_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=c.dtype,
                             name=f"dnn_norm_{i}")(x)
            x = c.activation(x)
            x = nn.Dropout(c.dropout,
                           deterministic=deterministic)(x)
        return x
