"""Quaternion-valued neural networks (QLinear / QConv / QRNN family).

TPU-native equivalent of the reference quaternion surface
(``vendor/speechbrain/speechbrain/nnet/quaternion_networks/``):

- ``q_ops.py:179-232``   quaternion (Hamilton-product) linear op
- ``q_ops.py:234-363``   rotation (spinor) linear op
- ``q_ops.py:604-721``   quaternion / unitary initialisation
- ``q_linear.py:22-221`` QLinear (optional spinor mode)
- ``q_CNN.py:24-602``    QConv1d / QConv2d
- ``q_RNN.py``           QLSTM / QRNN / QLiGRU
- ``q_normalization.py`` QBatchNorm

A quaternion feature vector of real size ``N`` (``N % 4 == 0``) is
stored component-major: ``[r | i | j | k]``, each of size ``N/4`` — the
reference convention.

TPU-first design: the Hamilton product with a quaternion weight matrix
is expressed as ONE real matmul against a structured ``(4·in_q, 4·out_q)``
kernel assembled from the four component matrices (exactly the algebra
the reference builds, ``q_ops.py:203-218``) — a single large MXU matmul,
with the 4× parameter sharing living in the kernel construction, which
XLA fuses into the producers. Convolutions likewise lower to one real
convolution with a block-structured kernel. The RNNs follow this repo's
scan discipline (models/rnn.py): whole-sequence input projection as one
batched matmul outside the scan, small recurrent matmul inside.

Eval-mode QBatchNorm divides by ``sqrt(var + eps)``; the reference
divides by the raw variance in eval only (``q_normalization.py:146-153``),
an upstream inconsistency we do not reproduce.
"""

import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


# ---------------------------------------------------------------------------
# core algebra
# ---------------------------------------------------------------------------

def hamilton_kernel(r, i, j, k):
    """Real (4·in_q, 4·out_q) matrix K such that ``x @ K`` is the
    Hamilton product ``W ⊗ x`` for component-major ``x``.

    Layout matches the reference construction (``q_ops.py:203-218``):
    block columns (outputs) r/i/j/k; block rows (inputs) carry the
    quaternion sign structure.
    """
    col_r = jnp.concatenate([r, -i, -j, -k], 0)
    col_i = jnp.concatenate([i, r, -k, j], 0)
    col_j = jnp.concatenate([j, k, r, -i], 0)
    col_k = jnp.concatenate([k, -j, i, r], 0)
    return jnp.concatenate([col_r, col_i, col_j, col_k], 1)


def quaternion_dense(x, r, i, j, k, bias=None):
    """``x (…, 4·in_q) @ hamilton_kernel -> (…, 4·out_q)``."""
    out = x @ hamilton_kernel(r, i, j, k)
    if bias is not None:
        out = out + bias
    return out


def rotation_kernel(r, i, j, k, scale=None):
    """Real (4·in_q, 4·out_q) rotation matrix R(W) x for unit-normalised
    quaternion weights (``q_ops.py:234-363``). Rotations only affect the
    vector (i, j, k) part; the real output block is zero."""
    norm = jnp.sqrt(r * r + i * i + j * j + k * k) + 1e-4
    rn, in_, jn, kn = r / norm, i / norm, j / norm, k / norm

    sq_i, sq_j, sq_k = 2.0 * in_ * in_, 2.0 * jn * jn, 2.0 * kn * kn
    ri, rj, rk = 2.0 * rn * in_, 2.0 * rn * jn, 2.0 * rn * kn
    ij, ik, jk = 2.0 * in_ * jn, 2.0 * in_ * kn, 2.0 * jn * kn

    s = scale if scale is not None else 1.0
    zero = jnp.zeros_like(r)
    rot_1 = jnp.concatenate(
        [zero, s * (1.0 - (sq_j + sq_k)), s * (ij - rk), s * (ik + rj)], 1)
    rot_2 = jnp.concatenate(
        [zero, s * (ij + rk), s * (1.0 - (sq_i + sq_k)), s * (jk - ri)], 1)
    rot_3 = jnp.concatenate(
        [zero, s * (ik - rj), s * (jk + ri), s * (1.0 - (sq_i + sq_j))], 1)
    zero_row = jnp.concatenate([zero, zero, zero, zero], 1)
    return jnp.concatenate([zero_row, rot_1, rot_2, rot_3], 0)


# ---------------------------------------------------------------------------
# initialisation (q_ops.py:604-721)
# ---------------------------------------------------------------------------

def quaternion_init(key, in_q, out_q, kernel_size=None, criterion="glorot"):
    """Polar quaternion init (Parcollet et al., QRNN paper): chi(4)
    modulus, uniform unit vector axis, uniform phase."""
    receptive = int(np.prod(kernel_size)) if kernel_size else 1
    fan_in, fan_out = in_q * receptive, out_q * receptive
    if criterion == "glorot":
        s = 1.0 / math.sqrt(2.0 * (fan_in + fan_out))
    else:
        s = 1.0 / math.sqrt(2.0 * fan_in)
    shape = (in_q, out_q) if not kernel_size else \
        (in_q, out_q) + tuple(np.atleast_1d(kernel_size))
    k_mod, k_axis, k_phase = jax.random.split(key, 3)
    # chi(4)-distributed modulus = norm of a 4-dim standard normal
    modulus = s * jnp.linalg.norm(
        jax.random.normal(k_mod, shape + (4,)), axis=-1)
    axis = jax.random.uniform(k_axis, shape + (3,), minval=-1.0, maxval=1.0)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-4)
    phase = jax.random.uniform(k_phase, shape, minval=-math.pi,
                               maxval=math.pi)
    w_r = modulus * jnp.cos(phase)
    sin = modulus * jnp.sin(phase)
    return w_r, sin * axis[..., 0], sin * axis[..., 1], sin * axis[..., 2]


def unitary_quaternion_init(key, in_q, out_q, kernel_size=None):
    """Unit quaternions, uniform on the 3-sphere (``q_ops.py:676-721``)."""
    shape = (in_q, out_q) if not kernel_size else \
        (in_q, out_q) + tuple(np.atleast_1d(kernel_size))
    v = jax.random.uniform(key, shape + (4,), minval=-1.0, maxval=1.0)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-4)
    return v[..., 0], v[..., 1], v[..., 2], v[..., 3]


def _make_qweights(module, name, in_q, out_q, weight_init,
                   kernel_size=None):
    def make(k):
        if weight_init == "unitary":
            comps = unitary_quaternion_init(k, in_q, out_q, kernel_size)
        else:
            comps = quaternion_init(k, in_q, out_q, kernel_size,
                                    criterion=weight_init)
        return jnp.stack(comps, 0)

    stacked = module.param(name, make)   # (4, in_q, out_q[, *ks])
    return stacked[0], stacked[1], stacked[2], stacked[3]


def check_quaternion_dim(n, what="features"):
    if n % 4:
        raise ValueError(
            f"quaternion layers need {what} divisible by 4, got {n}")


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

class QLinear(nn.Module):
    """Quaternion fully-connected layer (``q_linear.py:22-221``).

    ``spinor=True`` applies the rotation form R(W)·x (for 3-D-rotation
    equivariant nets); ``vector_scale`` adds the learnable gate the
    reference uses to stabilise deep spinor stacks.
    """

    n_neurons: int
    bias: bool = True
    spinor: bool = False
    vector_scale: bool = False
    weight_init: str = "glorot"   # "glorot" | "he" | "unitary"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        check_quaternion_dim(self.n_neurons, "n_neurons")
        check_quaternion_dim(x.shape[-1], "input features")
        in_q, out_q = x.shape[-1] // 4, self.n_neurons // 4
        wi = "unitary" if self.weight_init == "unitary" else self.weight_init
        r, i, j, k = _make_qweights(self, "weight", in_q, out_q, wi)
        if self.spinor:
            scale = self.param("scale", nn.initializers.xavier_uniform(),
                               (in_q, out_q)) if self.vector_scale else None
            kernel = rotation_kernel(r, i, j, k, scale)
        else:
            kernel = hamilton_kernel(r, i, j, k)
        out = x @ kernel.astype(self.dtype)
        if self.bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.n_neurons,)).astype(self.dtype)
        return out


def _conv_pad(pad, kernel_size, dilation):
    eff = (kernel_size - 1) * dilation + 1
    if pad == "same":
        lo = (eff - 1) // 2
        return (lo, eff - 1 - lo)
    if pad == "causal":
        return (eff - 1, 0)
    if pad == "valid":
        return (0, 0)
    raise ValueError(f"unknown padding {pad!r}")


class QConv1d(nn.Module):
    """Quaternion 1-D convolution over (B, T, C) with same/causal/valid
    padding (``q_CNN.py:24-306``). Lowered to one real convolution with
    the Hamilton-structured kernel."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    bias: bool = True
    weight_init: str = "glorot"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        check_quaternion_dim(self.out_channels, "out_channels")
        check_quaternion_dim(x.shape[-1], "input channels")
        in_q, out_q = x.shape[-1] // 4, self.out_channels // 4
        r, i, j, k = _make_qweights(
            self, "weight", in_q, out_q, self.weight_init,
            kernel_size=(self.kernel_size,))
        # (in_q, out_q, ks) -> per-tap Hamilton kernel (ks, 4in_q, 4out_q)
        kern = jax.vmap(hamilton_kernel, in_axes=(2, 2, 2, 2))(r, i, j, k)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kern.astype(self.dtype),
            window_strides=(self.stride,),
            padding=[_conv_pad(self.padding, self.kernel_size,
                               self.dilation)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        if self.bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_channels,)).astype(self.dtype)
        return out


class QConv2d(nn.Module):
    """Quaternion 2-D convolution over (B, H, W, C)
    (``q_CNN.py:308-602``)."""

    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: str = "same"
    bias: bool = True
    weight_init: str = "glorot"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        check_quaternion_dim(self.out_channels, "out_channels")
        check_quaternion_dim(x.shape[-1], "input channels")
        in_q, out_q = x.shape[-1] // 4, self.out_channels // 4
        kh, kw = self.kernel_size
        r, i, j, k = _make_qweights(
            self, "weight", in_q, out_q, self.weight_init,
            kernel_size=(kh, kw))
        kern = jax.vmap(jax.vmap(hamilton_kernel, in_axes=(2, 2, 2, 2)),
                        in_axes=(3, 3, 3, 3))(r, i, j, k)  # (kw,kh,4i,4o)
        kern = jnp.transpose(kern, (1, 0, 2, 3))           # (kh,kw,4i,4o)
        pads = [_conv_pad(self.padding, kh, self.dilation[0]),
                _conv_pad("same" if self.padding == "causal" else
                          self.padding, kw, self.dilation[1])]
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kern.astype(self.dtype),
            window_strides=self.stride, padding=pads,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_channels,)).astype(self.dtype)
        return out


class QBatchNorm(nn.Module):
    """Quaternion batch norm (``q_normalization.py:11-163``): centre by
    the full quaternion mean, scale by the shared quaternion variance
    (one scalar per quaternion, tiled over the four components)."""

    momentum: float = 0.1
    eps: float = 1e-4
    use_running_stats: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        check_quaternion_dim(x.shape[-1], "features")
        dim, dim_q = x.shape[-1], x.shape[-1] // 4
        gamma = self.param("gamma", nn.initializers.ones, (dim_q,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((dim,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((dim_q,)))

        axes = tuple(range(x.ndim - 1))
        if deterministic and self.use_running_stats:
            mu, q_var = ra_mean.value, ra_var.value
        else:
            mu = x.mean(axes)
            delta = (x - mu).reshape(x.shape[:-1] + (4, dim_q))
            q_var = (delta ** 2).sum(-2).mean(axes)
            if self.use_running_stats and not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mu
                ra_var.value = (1 - m) * ra_var.value + m * q_var

        denom = jnp.sqrt(q_var + self.eps)
        out = (x - mu) / jnp.tile(denom, 4)
        return jnp.tile(gamma, 4) * out + beta


# ---------------------------------------------------------------------------
# recurrent family (q_RNN.py) — scan cells with Hamilton matmuls
# ---------------------------------------------------------------------------

def _split_gates(y, gates, hidden_q):
    """Component-major (…, 4·gates·hidden_q) -> (…, gates, 4·hidden_q)
    quaternion vectors per gate."""
    lead = y.shape[:-1]
    y = y.reshape(lead + (4, gates, hidden_q))
    y = jnp.swapaxes(y, -3, -2)
    return y.reshape(lead + (gates, 4 * hidden_q))


class _QRecurrentBase(nn.Module):
    """Shared parameter/scan plumbing for quaternion RNNs."""

    hidden_size: int
    in_features: int
    num_layers: int = 1
    weight_init: str = "glorot"
    dtype: Dtype = jnp.float32

    n_gates: int = 1

    def _layer_weights(self, layer, in_size):
        in_q, h_q = in_size // 4, self.hidden_size // 4
        g = self.n_gates
        w = _make_qweights(self, f"w_ih_{layer}", in_q, h_q * g,
                           self.weight_init)
        u = _make_qweights(self, f"w_hh_{layer}", h_q, h_q * g,
                           self.weight_init)
        b = self.param(f"bias_{layer}", nn.initializers.zeros,
                       (g * self.hidden_size,))
        return (hamilton_kernel(*w).astype(self.dtype),
                hamilton_kernel(*u).astype(self.dtype),
                b.astype(self.dtype))


class QLSTM(_QRecurrentBase):
    """Quaternion LSTM over (B, T, F) (``q_RNN.py:17-417``): a standard
    LSTM cell whose input/recurrent transforms are Hamilton products.
    Gate nonlinearities act elementwise on the real storage, as in the
    reference."""

    n_gates: int = 4

    @nn.compact
    def __call__(self, x, initial_state=None):
        check_quaternion_dim(self.hidden_size, "hidden_size")
        check_quaternion_dim(self.in_features, "in_features")
        b_sz, h_q = x.shape[0], self.hidden_size // 4
        out = x.astype(self.dtype)
        states = []
        for layer in range(self.num_layers):
            in_size = self.in_features if layer == 0 else self.hidden_size
            k_ih, k_hh, bias = self._layer_weights(layer, in_size)
            xg = out @ k_ih + bias          # whole sequence, one matmul
            if initial_state is None:
                h0 = jnp.zeros((b_sz, self.hidden_size), self.dtype)
                c0 = jnp.zeros((b_sz, self.hidden_size), self.dtype)
            else:
                h0, c0 = initial_state[layer]

            def step(carry, xt, k_hh=k_hh):
                h, c = carry
                gates = _split_gates(xt + h @ k_hh, 4, h_q)
                i_g = jax.nn.sigmoid(gates[:, 0])
                f_g = jax.nn.sigmoid(gates[:, 1])
                g_g = jnp.tanh(gates[:, 2])
                o_g = jax.nn.sigmoid(gates[:, 3])
                c = f_g * c + i_g * g_g
                h = o_g * jnp.tanh(c)
                return (h, c), h

            (hT, cT), ys = jax.lax.scan(step, (h0, c0),
                                        jnp.swapaxes(xg, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
            states.append((hT, cT))
        return out, states


class QRNN(_QRecurrentBase):
    """Vanilla quaternion RNN with tanh (``q_RNN.py:420-800``)."""

    n_gates: int = 1

    @nn.compact
    def __call__(self, x, initial_state=None):
        check_quaternion_dim(self.hidden_size, "hidden_size")
        b_sz = x.shape[0]
        out = x.astype(self.dtype)
        states = []
        for layer in range(self.num_layers):
            in_size = self.in_features if layer == 0 else self.hidden_size
            k_ih, k_hh, bias = self._layer_weights(layer, in_size)
            xg = out @ k_ih + bias
            h0 = (jnp.zeros((b_sz, self.hidden_size), self.dtype)
                  if initial_state is None else initial_state[layer])

            def step(h, xt, k_hh=k_hh):
                h = jnp.tanh(xt + h @ k_hh)
                return h, h

            hT, ys = jax.lax.scan(step, h0, jnp.swapaxes(xg, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
            states.append(hT)
        return out, states


class QLiGRU(_QRecurrentBase):
    """Quaternion light GRU (``q_RNN.py:803-1175``): two gates (update,
    candidate), ReLU candidate activation."""

    n_gates: int = 2

    @nn.compact
    def __call__(self, x, initial_state=None):
        check_quaternion_dim(self.hidden_size, "hidden_size")
        b_sz, h_q = x.shape[0], self.hidden_size // 4
        out = x.astype(self.dtype)
        states = []
        for layer in range(self.num_layers):
            in_size = self.in_features if layer == 0 else self.hidden_size
            k_ih, k_hh, bias = self._layer_weights(layer, in_size)
            xg = out @ k_ih + bias
            h0 = (jnp.zeros((b_sz, self.hidden_size), self.dtype)
                  if initial_state is None else initial_state[layer])

            def step(h, xt, k_hh=k_hh):
                gates = _split_gates(xt + h @ k_hh, 2, h_q)
                z = jax.nn.sigmoid(gates[:, 0])
                hcand = jax.nn.relu(gates[:, 1])
                h = z * h + (1.0 - z) * hcand
                return h, h

            hT, ys = jax.lax.scan(step, h0, jnp.swapaxes(xg, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
            states.append(hT)
        return out, states
