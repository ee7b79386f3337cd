"""LSTM via ``lax.scan`` — the TPU-native replacement for cuDNN LSTM.

The reference prediction network is a torch (cuDNN) LSTM
(``vendor/speechbrain/speechbrain/nnet/RNN.py:170``). On TPU the input
projection for the whole sequence is computed as one big batched matmul
(MXU-friendly), and only the small recurrent matmul runs inside the scan.
A single-step cell is exposed for on-device decoding.

Gate order is torch's (i, f, g, o) and initialization matches torch's
LSTM default (uniform(-1/sqrt(H), 1/sqrt(H))); the two torch biases
(b_ih, b_hh) are fused into one (sum-equivalent), so checkpoint
conversion sums them.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.ops.dropout import Dropout

Dtype = Any


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM over (B, U, F) sequences.

    Parameters are created in ``setup`` (``in_features`` must be given)
    so that both the full-sequence ``__call__`` and the single-step
    ``step`` method share them — flax only allows lazy shape inference
    inside one compact method.
    """

    hidden_size: int
    in_features: int
    num_layers: int = 1
    dropout: float = 0.0
    dropout_bits: int = 32
    dtype: Dtype = jnp.float32

    def setup(self):
        H = self.hidden_size
        bound = 1.0 / math.sqrt(H)

        def uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        weights = []
        size = self.in_features
        for layer in range(self.num_layers):
            weights.append((
                self.param(f"l{layer}_w_ih", uniform, (size, 4 * H)),
                self.param(f"l{layer}_w_hh", uniform, (H, 4 * H)),
                self.param(f"l{layer}_b", uniform, (4 * H,)),
            ))
            size = H
        self.weights = weights
        self.inter_dropout = Dropout(self.dropout,
                                     bits=self.dropout_bits)

    def __call__(self, x, initial_state=None):
        """Run the full sequence; returns (output (B, U, H), final state
        (h, c) each (num_layers, B, H))."""
        B = x.shape[0]
        H = self.hidden_size
        if initial_state is None:
            initial_state = self.initial_state(B, self.dtype)
        h0, c0 = initial_state
        h0 = h0.astype(self.dtype)
        c0 = c0.astype(self.dtype)

        out = x
        h_fin, c_fin = [], []
        for layer, (w_ih, w_hh, b) in enumerate(self.weights):
            w_ih, w_hh, b = (w.astype(self.dtype)
                             for w in (w_ih, w_hh, b))
            # One big MXU matmul for the input projection of all steps.
            x_proj = jnp.einsum("buf,fg->bug", out.astype(self.dtype),
                                w_ih) + b

            def step(carry, xp, w_hh=w_hh):
                h, c = carry
                h, c = _lstm_cell(xp + h @ w_hh, c)
                return (h, c), h

            (h_l, c_l), ys = jax.lax.scan(
                step, (h0[layer], c0[layer]), jnp.swapaxes(x_proj, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
            h_fin.append(h_l)
            c_fin.append(c_l)
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = self.inter_dropout(out, deterministic=True)
        return out, (jnp.stack(h_fin), jnp.stack(c_fin))

    def step(self, x, state):
        """Single decode step: x (B, F), state (h, c) -> (out, state)."""
        h_all, c_all = state
        h_all = h_all.astype(self.dtype)
        c_all = c_all.astype(self.dtype)
        out = x.astype(self.dtype)
        h_new, c_new = [], []
        for layer, (w_ih, w_hh, b) in enumerate(self.weights):
            w_ih, w_hh, b = (w.astype(self.dtype)
                             for w in (w_ih, w_hh, b))
            gates = out @ w_ih + b + h_all[layer] @ w_hh
            h, c = _lstm_cell(gates, c_all[layer])
            h_new.append(h)
            c_new.append(c)
            out = h
        return out, (jnp.stack(h_new), jnp.stack(c_new))

    def initial_state(self, batch_size, dtype=jnp.float32):
        shape = (self.num_layers, batch_size, self.hidden_size)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _lstm_cell(gates, c):
    """Torch gate order: input, forget, cell, output."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
    h = nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _lstm_layer(x, w_ih, w_hh, b, h0, c0, dtype):
    """One LSTM direction over (B, U, F): bulk input matmul + scan."""
    x_proj = jnp.einsum("buf,fg->bug", x.astype(dtype),
                        w_ih.astype(dtype)) + b.astype(dtype)

    def step(carry, xp):
        h, c = carry
        h, c = _lstm_cell(xp + h @ w_hh.astype(dtype), c)
        return (h, c), h

    (h, c), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h, c


class BiLSTM(nn.Module):
    """Multi-layer bidirectional LSTM (torch ``bidirectional=True``
    semantics: each layer consumes the concat of both directions of the
    previous layer). Full-sequence only — decoding never runs bidir."""

    hidden_size: int
    in_features: int
    num_layers: int = 1
    dropout: float = 0.0
    dropout_bits: int = 32
    dtype: Dtype = jnp.float32

    def setup(self):
        H = self.hidden_size
        bound = 1.0 / math.sqrt(H)

        def uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        weights = []
        size = self.in_features
        for layer in range(self.num_layers):
            per_dir = []
            for tag in ("", "_rev"):
                per_dir.append((
                    self.param(f"l{layer}_w_ih{tag}", uniform,
                               (size, 4 * H)),
                    self.param(f"l{layer}_w_hh{tag}", uniform,
                               (H, 4 * H)),
                    self.param(f"l{layer}_b{tag}", uniform, (4 * H,)),
                ))
            weights.append(per_dir)
            size = 2 * H
        self.weights = weights
        self.inter_dropout = Dropout(self.dropout,
                                     bits=self.dropout_bits)

    def __call__(self, x, deterministic=True, abs_lengths=None):
        """``abs_lengths`` reproduces torch ``pack_padded_sequence``
        semantics: the reverse direction starts at each sample's last
        VALID frame, and outputs beyond the length are zeroed."""
        B, T = x.shape[0], x.shape[1]
        H = self.hidden_size
        zeros = jnp.zeros((B, H), self.dtype)
        if abs_lengths is not None:
            t = jnp.arange(T)[None, :]
            valid = t < abs_lengths[:, None]                   # (B, T)
            # reverse the valid prefix in place, keep the tail
            rev_idx = jnp.where(valid, abs_lengths[:, None] - 1 - t, t)
        out = x
        for layer, (fwd, rev) in enumerate(self.weights):
            y_f, _, _ = _lstm_layer(out, *fwd, zeros, zeros, self.dtype)
            if abs_lengths is None:
                y_r, _, _ = _lstm_layer(out[:, ::-1], *rev, zeros, zeros,
                                        self.dtype)
                y_r = y_r[:, ::-1]
            else:
                x_rev = jnp.take_along_axis(out, rev_idx[..., None],
                                            axis=1)
                y_r, _, _ = _lstm_layer(x_rev, *rev, zeros, zeros,
                                        self.dtype)
                y_r = jnp.take_along_axis(y_r, rev_idx[..., None],
                                          axis=1)
            out = jnp.concatenate([y_f, y_r], axis=-1)
            if abs_lengths is not None:
                out = jnp.where(valid[..., None], out, 0.0)
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = self.inter_dropout(out,
                                         deterministic=deterministic)
        return out


class GRU(nn.Module):
    """Multi-layer unidirectional GRU (torch gate order r, z, n),
    reference ``nnet/RNN.py`` GRU equivalent."""

    hidden_size: int
    in_features: int
    num_layers: int = 1
    dtype: Dtype = jnp.float32

    def setup(self):
        H = self.hidden_size
        bound = 1.0 / math.sqrt(H)

        def uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        weights = []
        size = self.in_features
        for layer in range(self.num_layers):
            weights.append((
                self.param(f"l{layer}_w_ih", uniform, (size, 3 * H)),
                self.param(f"l{layer}_w_hh", uniform, (H, 3 * H)),
                self.param(f"l{layer}_b_ih", uniform, (3 * H,)),
                self.param(f"l{layer}_b_hh", uniform, (3 * H,)),
            ))
            size = H
        self.weights = weights

    def __call__(self, x, initial_state=None):
        B = x.shape[0]
        if initial_state is None:
            initial_state = self.initial_state(B, self.dtype)
        h0 = initial_state.astype(self.dtype)
        out = x.astype(self.dtype)
        h_fin = []
        for layer, (w_ih, w_hh, b_ih, b_hh) in enumerate(self.weights):
            w_ih, w_hh, b_ih, b_hh = (w.astype(self.dtype) for w in
                                      (w_ih, w_hh, b_ih, b_hh))
            x_proj = jnp.einsum("buf,fg->bug", out, w_ih) + b_ih

            def step(h, xp, w_hh=w_hh, b_hh=b_hh):
                h = _gru_cell(xp, h @ w_hh + b_hh, h)
                return h, h

            h_l, ys = jax.lax.scan(step, h0[layer],
                                   jnp.swapaxes(x_proj, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
            h_fin.append(h_l)
        return out, jnp.stack(h_fin)

    def step(self, x, state):
        h_all = state.astype(self.dtype)
        out = x.astype(self.dtype)
        h_new = []
        for layer, (w_ih, w_hh, b_ih, b_hh) in enumerate(self.weights):
            w_ih, w_hh, b_ih, b_hh = (w.astype(self.dtype) for w in
                                      (w_ih, w_hh, b_ih, b_hh))
            h = _gru_cell(out @ w_ih + b_ih,
                          h_all[layer] @ w_hh + b_hh, h_all[layer])
            h_new.append(h)
            out = h
        return out, jnp.stack(h_new)

    def initial_state(self, batch_size, dtype=jnp.float32):
        return jnp.zeros((self.num_layers, batch_size,
                          self.hidden_size), dtype)


def _gru_cell(xg, hg, h):
    """Torch GRU: n uses r-gated hidden projection."""
    xr, xz, xn = jnp.split(xg, 3, axis=-1)
    hr, hz, hn = jnp.split(hg, 3, axis=-1)
    r = nn.sigmoid(xr + hr)
    z = nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1 - z) * n + z * h


class VanillaRNN(nn.Module):
    """Simple tanh/relu recurrent layer stack (reference ``RNN``)."""

    hidden_size: int
    in_features: int
    num_layers: int = 1
    nonlinearity: str = "tanh"
    dtype: Dtype = jnp.float32

    def setup(self):
        H = self.hidden_size
        bound = 1.0 / math.sqrt(H)

        def uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        weights = []
        size = self.in_features
        for layer in range(self.num_layers):
            weights.append((
                self.param(f"l{layer}_w_ih", uniform, (size, H)),
                self.param(f"l{layer}_w_hh", uniform, (H, H)),
                self.param(f"l{layer}_b", uniform, (H,)),
            ))
            size = H
        self.weights = weights

    def __call__(self, x, initial_state=None):
        act = jnp.tanh if self.nonlinearity == "tanh" else nn.relu
        B = x.shape[0]
        if initial_state is None:
            initial_state = jnp.zeros(
                (self.num_layers, B, self.hidden_size), self.dtype)
        h0 = initial_state.astype(self.dtype)
        out = x.astype(self.dtype)
        h_fin = []
        for layer, (w_ih, w_hh, b) in enumerate(self.weights):
            x_proj = jnp.einsum("buf,fg->bug", out,
                                w_ih.astype(self.dtype)) \
                + b.astype(self.dtype)

            def step(h, xp, w_hh=w_hh.astype(self.dtype)):
                h = act(xp + h @ w_hh)
                return h, h

            h_l, ys = jax.lax.scan(step, h0[layer],
                                   jnp.swapaxes(x_proj, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
            h_fin.append(h_l)
        return out, jnp.stack(h_fin)


class LiGRU(nn.Module):
    """Light-Gated Recurrent Unit (reference ``nnet/RNN.py`` LiGRU,
    :1000-1330; Ravanelli et al. 2018) — the CRDNN default RNN.

    Per layer: bias-free input projection to (a, z) gates, batch/layer
    norm on the projection (computed for ALL steps as one matmul + one
    norm), then the scan ``h = sigmoid(z) * h + (1 - sigmoid(z)) *
    act(a)`` — no reset gate, ReLU candidate. Bidirectional mode stacks
    the flipped sequence on the batch axis and runs the SAME weights in
    both directions (an sb quirk, reproduced), concatenating features.
    """

    hidden_size: int
    in_features: int
    num_layers: int = 1
    nonlinearity: str = "relu"
    normalization: str = "batchnorm"
    bidirectional: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        H = self.hidden_size
        bound = 1.0 / math.sqrt(H)

        def uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        ws, us, norms = [], [], []
        size = self.in_features
        for layer in range(self.num_layers):
            ws.append(nn.Dense(2 * H, use_bias=False, dtype=self.dtype,
                               name=f"l{layer}_w"))
            us.append(self.param(f"l{layer}_u", uniform, (H, 2 * H)))
            if self.normalization == "batchnorm":
                norms.append(nn.BatchNorm(
                    momentum=0.95, epsilon=1e-5, dtype=self.dtype,
                    name=f"l{layer}_norm"))
            else:
                norms.append(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                          name=f"l{layer}_norm"))
            size = 2 * H if self.bidirectional else H
        self.ws, self.us, self.norms = ws, us, norms

    def _act(self, x):
        if self.nonlinearity == "tanh":
            return jnp.tanh(x)
        if self.nonlinearity == "leaky_relu":
            return jax.nn.leaky_relu(x)
        if self.nonlinearity == "sin":
            return jnp.sin(x)
        return jax.nn.relu(x)

    def __call__(self, x, train=False):
        """``train=True`` updates BatchNorm batch statistics (apply with
        ``mutable=['batch_stats']``); default eval uses running stats."""
        H = self.hidden_size
        out = x
        h_last = []
        for layer in range(self.num_layers):
            if self.bidirectional:
                stacked = jnp.concatenate([out, out[:, ::-1]], axis=0)
            else:
                stacked = out
            w = self.ws[layer](stacked)
            if self.normalization == "batchnorm":
                w = self.norms[layer](w, use_running_average=not train)
            else:
                w = self.norms[layer](w)
            u = self.us[layer].astype(self.dtype)
            h0 = jnp.zeros((stacked.shape[0], H), self.dtype)

            def step(h, w_t, u=u):
                gates = w_t + h @ u
                a, z = jnp.split(gates, 2, axis=-1)
                z = jax.nn.sigmoid(z)
                h = z * h + (1 - z) * self._act(a)
                return h, h

            h_fin, ys = jax.lax.scan(step, h0, jnp.swapaxes(w, 0, 1))
            h = jnp.swapaxes(ys, 0, 1)
            if self.bidirectional:
                B = out.shape[0]
                h = jnp.concatenate([h[:B], h[B:, ::-1]], axis=-1)
            out = h
            h_last.append(h_fin)
        return out, h_last
