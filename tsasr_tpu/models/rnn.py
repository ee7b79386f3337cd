"""LSTM via ``lax.scan`` — the TPU-native replacement for cuDNN LSTM.

The reference prediction network is a torch (cuDNN) LSTM
(``vendor/speechbrain/speechbrain/nnet/RNN.py:170``). On TPU the input
projection for the whole sequence is computed as one big batched matmul
(MXU-friendly), and only the small recurrent matmul runs inside the scan.
A single-step cell is exposed for on-device decoding.

Gate order is torch's (i, f, g, o) and initialization matches torch's
LSTM default (uniform(-1/sqrt(H), 1/sqrt(H))) so warm-started checkpoints
convert one-to-one.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _torch_lstm_init(hidden_size):
    bound = 1.0 / math.sqrt(hidden_size)
    return nn.initializers.uniform(scale=2 * bound)


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM over (B, U, F) sequences."""

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def _layer_params(self, layer, input_size):
        H = self.hidden_size
        init = _torch_lstm_init(H)
        shift = 1.0 / math.sqrt(H)

        def uniform_shifted(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - shift

        w_ih = self.param(f"l{layer}_w_ih", uniform_shifted,
                          (input_size, 4 * H))
        w_hh = self.param(f"l{layer}_w_hh", uniform_shifted, (H, 4 * H))
        b = self.param(f"l{layer}_b", uniform_shifted, (4 * H,))
        return w_ih, w_hh, b

    @nn.compact
    def __call__(self, x, initial_state=None):
        """Run the full sequence; returns (output (B, U, H), final_state).

        ``initial_state`` is a tuple (h, c) each (num_layers, B, H).
        """
        B, U, _ = x.shape
        H = self.hidden_size
        if initial_state is None:
            h0 = jnp.zeros((self.num_layers, B, H), x.dtype)
            c0 = jnp.zeros((self.num_layers, B, H), x.dtype)
        else:
            h0, c0 = initial_state

        out = x
        h_fin, c_fin = [], []
        for layer in range(self.num_layers):
            w_ih, w_hh, b = self._layer_params(layer, out.shape[-1])
            # One big MXU matmul for the input projection of all steps.
            x_proj = jnp.einsum("buf,fg->bug", out, w_ih) + b

            def step(carry, xp, w_hh=w_hh):
                h, c = carry
                gates = xp + h @ w_hh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
                h = nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            (h_l, c_l), ys = jax.lax.scan(
                step, (h0[layer], c0[layer]), jnp.swapaxes(x_proj, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
            h_fin.append(h_l)
            c_fin.append(c_l)
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = nn.Dropout(self.dropout, deterministic=True)(out)
        return out, (jnp.stack(h_fin), jnp.stack(c_fin))

    def step(self, x, state):
        """Single decode step: x (B, F) with state (h, c) -> (out, state).

        Used by the on-device greedy/beam searchers (the reference instead
        re-runs the torch LSTM per emitted token,
        ``decoders/transducer.py:195-211``).
        """
        h_all, c_all = state
        out = x
        h_new, c_new = [], []
        for layer in range(self.num_layers):
            w_ih, w_hh, b = self._layer_params(layer, out.shape[-1])
            gates = out @ w_ih + b + h_all[layer] @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = nn.sigmoid(f) * c_all[layer] + nn.sigmoid(i) * jnp.tanh(g)
            h = nn.sigmoid(o) * jnp.tanh(c)
            h_new.append(h)
            c_new.append(c)
            out = h
        return out, (jnp.stack(h_new), jnp.stack(c_new))

    def initial_state(self, batch_size, dtype=jnp.float32):
        shape = (self.num_layers, batch_size, self.hidden_size)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
