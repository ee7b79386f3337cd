"""Complex-valued neural networks (CLinear / CConv / CRNN family).

TPU-native equivalent of the reference complex surface
(``vendor/speechbrain/speechbrain/nnet/complex_networks/``):

- ``c_ops.py:114-181``   complex linear / conv ops (structured real matmul)
- ``c_ops.py:183-268``   unitary / trabelsi complex initialisation
- ``c_linear.py:20-160`` CLinear
- ``c_CNN.py:21-420``    CConv1d / CConv2d
- ``c_RNN.py``           CLSTM / CRNN / CLiGRU
- ``c_normalization.py`` CBatchNorm (full 2x2 whitening) / CLayerNorm

A complex feature vector of real size ``N`` (``N % 2 == 0``) is stored
``[re | im]``, each of size ``N/2`` — the reference convention.

TPU-first: the complex product lowers to one real matmul against the
structured ``[[R, I], [-I, R]]`` kernel (exactly the reference algebra,
``c_ops.py:129-131``); convs lower to one real convolution. Batch-norm
whitening uses the analytic inverse square root of the per-feature
2x2 covariance (Trabelsi et al., Deep Complex Networks).
"""

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


# ---------------------------------------------------------------------------
# core algebra + init
# ---------------------------------------------------------------------------

def complex_kernel(real, imag):
    """Real (2·in_c, 2·out_c) matrix K such that ``x @ K`` is complex
    multiplication for ``[re | im]`` storage (``c_ops.py:129-131``)."""
    col_r = jnp.concatenate([real, -imag], 0)
    col_i = jnp.concatenate([imag, real], 0)
    return jnp.concatenate([col_r, col_i], 1)


def complex_dense(x, real, imag, bias=None):
    out = x @ complex_kernel(real, imag)
    if bias is not None:
        out = out + bias
    return out


def complex_init(key, in_c, out_c, kernel_size=None, criterion="glorot"):
    """Trabelsi complex init (``c_ops.py:224-268``): Rayleigh modulus,
    uniform phase."""
    receptive = int(np.prod(kernel_size)) if kernel_size else 1
    fan_in, fan_out = in_c * receptive, out_c * receptive
    if criterion == "glorot":
        s = 1.0 / (fan_in + fan_out)
    else:
        s = 1.0 / fan_in
    shape = (in_c, out_c) if not kernel_size else \
        (in_c, out_c) + tuple(np.atleast_1d(kernel_size))
    k_mod, k_phase = jax.random.split(key)
    # Rayleigh(scale=sqrt(s)) = norm of a 2-dim normal with var s
    modulus = jnp.linalg.norm(
        math.sqrt(s) * jax.random.normal(k_mod, shape + (2,)), axis=-1)
    phase = jax.random.uniform(k_phase, shape, minval=-math.pi,
                               maxval=math.pi)
    return modulus * jnp.cos(phase), modulus * jnp.sin(phase)


def unitary_complex_init(key, in_c, out_c, kernel_size=None):
    """Unit-modulus complex weights (``c_ops.py:183-222``)."""
    shape = (in_c, out_c) if not kernel_size else \
        (in_c, out_c) + tuple(np.atleast_1d(kernel_size))
    v = jax.random.uniform(key, shape + (2,), minval=-1.0, maxval=1.0)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-4)
    return v[..., 0], v[..., 1]


def _make_cweights(module, name, in_c, out_c, weight_init,
                   kernel_size=None):
    def make(k):
        if weight_init == "unitary":
            comps = unitary_complex_init(k, in_c, out_c, kernel_size)
        else:
            comps = complex_init(k, in_c, out_c, kernel_size,
                                 criterion=weight_init)
        return jnp.stack(comps, 0)

    stacked = module.param(name, make)   # (2, in_c, out_c[, *ks])
    return stacked[0], stacked[1]


def check_complex_dim(n, what="features"):
    if n % 2:
        raise ValueError(
            f"complex layers need {what} divisible by 2, got {n}")


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

class CLinear(nn.Module):
    """Complex fully-connected layer (``c_linear.py:20-160``)."""

    n_neurons: int
    bias: bool = True
    weight_init: str = "glorot"   # "glorot" | "he" | "unitary"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        check_complex_dim(self.n_neurons, "n_neurons")
        check_complex_dim(x.shape[-1], "input features")
        in_c, out_c = x.shape[-1] // 2, self.n_neurons // 2
        r, i = _make_cweights(self, "weight", in_c, out_c,
                              self.weight_init)
        out = x @ complex_kernel(r, i).astype(self.dtype)
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


class CConv1d(nn.Module):
    """Complex 1-D convolution over (B, T, C) (``c_CNN.py:21-236``)."""

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
        check_complex_dim(self.out_channels, "out_channels")
        check_complex_dim(x.shape[-1], "input channels")
        in_c, out_c = x.shape[-1] // 2, self.out_channels // 2
        r, i = _make_cweights(self, "weight", in_c, out_c,
                              self.weight_init,
                              kernel_size=(self.kernel_size,))
        kern = jax.vmap(complex_kernel, in_axes=(2, 2))(r, i)
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


class CConv2d(nn.Module):
    """Complex 2-D convolution over (B, H, W, C) (``c_CNN.py:238-475``)."""

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
        check_complex_dim(self.out_channels, "out_channels")
        check_complex_dim(x.shape[-1], "input channels")
        in_c, out_c = x.shape[-1] // 2, self.out_channels // 2
        kh, kw = self.kernel_size
        r, i = _make_cweights(self, "weight", in_c, out_c,
                              self.weight_init, kernel_size=(kh, kw))
        kern = jax.vmap(jax.vmap(complex_kernel, in_axes=(2, 2)),
                        in_axes=(3, 3))(r, i)      # (kw, kh, 2i, 2o)
        kern = jnp.transpose(kern, (1, 0, 2, 3))   # (kh, kw, 2i, 2o)
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


# ---------------------------------------------------------------------------
# normalisation (c_normalization.py)
# ---------------------------------------------------------------------------

def complex_whiten(x, vrr, vii, vri, gamma_rr, gamma_ri, gamma_ii, beta):
    """Whiten ``[re | im]`` features with the analytic inverse square
    root of the 2x2 covariance, then apply the complex affine transform
    (Trabelsi et al.; reference ``c_normalization.py:478-607``)."""
    dim_c = x.shape[-1] // 2
    # inverse sqrt of [[vrr, vri], [vri, vii]]
    s = jnp.sqrt(vrr * vii - vri * vri)
    t = jnp.sqrt(vrr + vii + 2.0 * s)
    inv = 1.0 / (s * t)
    wrr, wii, wri = (vii + s) * inv, (vrr + s) * inv, -vri * inv
    xr, xi = x[..., :dim_c], x[..., dim_c:]
    nr = wrr * xr + wri * xi
    ni = wri * xr + wii * xi
    yr = gamma_rr * nr + gamma_ri * ni
    yi = gamma_ri * nr + gamma_ii * ni
    return jnp.concatenate([yr, yi], -1) + beta


class CBatchNorm(nn.Module):
    """Complex batch norm with full covariance whitening
    (``c_normalization.py:13-329``). gamma_rr/ii init 1/sqrt(2) so the
    initial output variance matches the input scale convention."""

    momentum: float = 0.1
    eps: float = 1e-4
    use_running_stats: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        check_complex_dim(x.shape[-1], "features")
        dim, dim_c = x.shape[-1], x.shape[-1] // 2
        inv_sqrt2 = 1.0 / math.sqrt(2.0)
        gamma_rr = self.param("gamma_rr",
                              nn.initializers.constant(inv_sqrt2), (dim_c,))
        gamma_ii = self.param("gamma_ii",
                              nn.initializers.constant(inv_sqrt2), (dim_c,))
        gamma_ri = self.param("gamma_ri", nn.initializers.zeros, (dim_c,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((dim,)))
        ra_vrr = self.variable("batch_stats", "vrr",
                               lambda: jnp.full((dim_c,), inv_sqrt2))
        ra_vii = self.variable("batch_stats", "vii",
                               lambda: jnp.full((dim_c,), inv_sqrt2))
        ra_vri = self.variable("batch_stats", "vri",
                               lambda: jnp.zeros((dim_c,)))

        axes = tuple(range(x.ndim - 1))
        if deterministic and self.use_running_stats:
            mu = ra_mean.value
            vrr, vii, vri = ra_vrr.value, ra_vii.value, ra_vri.value
        else:
            mu = x.mean(axes)
            cen = x - mu
            cr, ci = cen[..., :dim_c], cen[..., dim_c:]
            vrr = (cr ** 2).mean(axes) + self.eps
            vii = (ci ** 2).mean(axes) + self.eps
            vri = (cr * ci).mean(axes)
            if self.use_running_stats and not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mu
                ra_vrr.value = (1 - m) * ra_vrr.value + m * vrr
                ra_vii.value = (1 - m) * ra_vii.value + m * vii
                ra_vri.value = (1 - m) * ra_vri.value + m * vri
        return complex_whiten(x - mu, vrr, vii, vri,
                              gamma_rr, gamma_ri, gamma_ii, beta)


class CLayerNorm(nn.Module):
    """Complex layer norm: the same 2x2 whitening with statistics over
    the feature axes of each example (``c_normalization.py:331-476``)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        check_complex_dim(x.shape[-1], "features")
        dim, dim_c = x.shape[-1], x.shape[-1] // 2
        inv_sqrt2 = 1.0 / math.sqrt(2.0)
        gamma_rr = self.param("gamma_rr",
                              nn.initializers.constant(inv_sqrt2), (dim_c,))
        gamma_ii = self.param("gamma_ii",
                              nn.initializers.constant(inv_sqrt2), (dim_c,))
        gamma_ri = self.param("gamma_ri", nn.initializers.zeros, (dim_c,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        mu = x.mean(-1, keepdims=True)
        cen = x - mu
        cr, ci = cen[..., :dim_c], cen[..., dim_c:]
        vrr = (cr ** 2).mean(-1, keepdims=True) + self.eps
        vii = (ci ** 2).mean(-1, keepdims=True) + self.eps
        vri = (cr * ci).mean(-1, keepdims=True)
        return complex_whiten(cen, vrr, vii, vri,
                              gamma_rr, gamma_ri, gamma_ii, beta)


# ---------------------------------------------------------------------------
# recurrent family (c_RNN.py)
# ---------------------------------------------------------------------------

def _split_gates(y, gates, hidden_c):
    """Component-major (…, 2·gates·hidden_c) -> (…, gates, 2·hidden_c)."""
    lead = y.shape[:-1]
    y = y.reshape(lead + (2, gates, hidden_c))
    y = jnp.swapaxes(y, -3, -2)
    return y.reshape(lead + (gates, 2 * hidden_c))


class _CRecurrentBase(nn.Module):
    hidden_size: int
    in_features: int
    num_layers: int = 1
    weight_init: str = "glorot"
    dtype: Dtype = jnp.float32

    n_gates: int = 1

    def _layer_weights(self, layer, in_size):
        in_c, h_c = in_size // 2, self.hidden_size // 2
        g = self.n_gates
        w = _make_cweights(self, f"w_ih_{layer}", in_c, h_c * g,
                           self.weight_init)
        u = _make_cweights(self, f"w_hh_{layer}", h_c, h_c * g,
                           self.weight_init)
        b = self.param(f"bias_{layer}", nn.initializers.zeros,
                       (g * self.hidden_size,))
        return (complex_kernel(*w).astype(self.dtype),
                complex_kernel(*u).astype(self.dtype),
                b.astype(self.dtype))


class CLSTM(_CRecurrentBase):
    """Complex LSTM over (B, T, F) (``c_RNN.py:18-391``)."""

    n_gates: int = 4

    @nn.compact
    def __call__(self, x, initial_state=None):
        check_complex_dim(self.hidden_size, "hidden_size")
        check_complex_dim(self.in_features, "in_features")
        b_sz, h_c = x.shape[0], self.hidden_size // 2
        out = x.astype(self.dtype)
        states = []
        for layer in range(self.num_layers):
            in_size = self.in_features if layer == 0 else self.hidden_size
            k_ih, k_hh, bias = self._layer_weights(layer, in_size)
            xg = out @ k_ih + bias
            if initial_state is None:
                h0 = jnp.zeros((b_sz, self.hidden_size), self.dtype)
                c0 = jnp.zeros((b_sz, self.hidden_size), self.dtype)
            else:
                h0, c0 = initial_state[layer]

            def step(carry, xt, k_hh=k_hh):
                h, c = carry
                gates = _split_gates(xt + h @ k_hh, 4, h_c)
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


class CRNN(_CRecurrentBase):
    """Vanilla complex RNN with tanh (``c_RNN.py:394-767``)."""

    n_gates: int = 1

    @nn.compact
    def __call__(self, x, initial_state=None):
        check_complex_dim(self.hidden_size, "hidden_size")
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


class CLiGRU(_CRecurrentBase):
    """Complex light GRU (``c_RNN.py:770-1306``)."""

    n_gates: int = 2

    @nn.compact
    def __call__(self, x, initial_state=None):
        check_complex_dim(self.hidden_size, "hidden_size")
        b_sz, h_c = x.shape[0], self.hidden_size // 2
        out = x.astype(self.dtype)
        states = []
        for layer in range(self.num_layers):
            in_size = self.in_features if layer == 0 else self.hidden_size
            k_ih, k_hh, bias = self._layer_weights(layer, in_size)
            xg = out @ k_ih + bias
            h0 = (jnp.zeros((b_sz, self.hidden_size), self.dtype)
                  if initial_state is None else initial_state[layer])

            def step(h, xt, k_hh=k_hh):
                gates = _split_gates(xt + h @ k_hh, 2, h_c)
                z = jax.nn.sigmoid(gates[:, 0])
                hcand = jax.nn.relu(gates[:, 1])
                h = z * h + (1.0 - z) * hcand
                return h, h

            hT, ys = jax.lax.scan(step, h0, jnp.swapaxes(xg, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
            states.append(hT)
        return out, states
