"""Tests for the quaternion / complex network families, autoencoders
and the Gumbel vector quantiser (reference C13 tail:
``nnet/{quaternion_networks,complex_networks,autoencoders,quantisers}``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tsasr_tpu.models.autoencoders import (
    NormalizingAutoencoder,
    VariationalAutoencoder,
    vae_elbo_loss,
)
from tsasr_tpu.models.complex_nets import (
    CBatchNorm,
    CConv1d,
    CConv2d,
    CLayerNorm,
    CLinear,
    CLiGRU,
    CLSTM,
    CRNN,
    complex_kernel,
)
from tsasr_tpu.models.quantisers import (
    GumbelVectorQuantizer,
    anneal_temperature,
    gumbel_softmax,
)
from tsasr_tpu.models.quaternion import (
    QBatchNorm,
    QConv1d,
    QConv2d,
    QLinear,
    QLiGRU,
    QLSTM,
    QRNN,
    hamilton_kernel,
    rotation_kernel,
)
from flax import linen as nn


# ---------------------------------------------------------------------------
# algebra: pinned against brute-force quaternion/complex arithmetic
# ---------------------------------------------------------------------------

def _qmul(a, b):
    r1, i1, j1, k1 = a
    r2, i2, j2, k2 = b
    return np.array([
        r1 * r2 - i1 * i2 - j1 * j2 - k1 * k2,
        r1 * i2 + i1 * r2 + j1 * k2 - k1 * j2,
        r1 * j2 - i1 * k2 + j1 * r2 + k1 * i2,
        r1 * k2 + i1 * j2 - j1 * i2 + k1 * r2,
    ])


def test_hamilton_kernel_matches_quaternion_product():
    rng = np.random.default_rng(0)
    for _ in range(5):
        w, x = rng.normal(size=4), rng.normal(size=4)
        K = np.asarray(hamilton_kernel(
            *[jnp.full((1, 1), c) for c in w]))
        out = np.asarray(x)[None, :] @ K
        np.testing.assert_allclose(out[0], _qmul(w, x), atol=1e-5)


def test_hamilton_kernel_matrix_case():
    """Multi-quaternion matrix: compare against per-entry Hamilton sums."""
    rng = np.random.default_rng(1)
    in_q, out_q = 3, 2
    comps = rng.normal(size=(4, in_q, out_q))
    x = rng.normal(size=(4, in_q))   # one quaternion vector (4 comps)
    K = np.asarray(hamilton_kernel(*[jnp.asarray(c) for c in comps]))
    # [r|i|j|k] component-major input layout
    got = np.concatenate([x[c] for c in range(4)])[None, :] @ K
    expect = np.zeros((4, out_q))
    for o in range(out_q):
        acc = np.zeros(4)
        for i in range(in_q):
            acc += _qmul(comps[:, i, o], x[:, i])
        expect[:, o] = acc
    np.testing.assert_allclose(got[0], expect.reshape(-1), atol=1e-5)


def test_rotation_kernel_preserves_vector_norm():
    rng = np.random.default_rng(2)
    r, i, j, k = [jnp.full((1, 1), c) for c in rng.normal(size=4)]
    R = rotation_kernel(r, i, j, k)
    xv = np.array([0.0, *rng.normal(size=3)])
    y = np.asarray(jnp.asarray(xv)[None, :] @ R)
    assert y[0, 0] == pytest.approx(0.0, abs=1e-6)   # stays pure vector
    assert np.linalg.norm(y) == pytest.approx(np.linalg.norm(xv), rel=1e-3)


def test_complex_kernel_matches_complex_matmul():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(3, 5)) + 1j * rng.normal(size=(3, 5))
    x = rng.normal(size=(7, 3)) + 1j * rng.normal(size=(7, 3))
    with jax.default_matmul_precision("float32"):
        K = complex_kernel(jnp.asarray(w.real), jnp.asarray(w.imag))
        xs = jnp.concatenate([jnp.asarray(x.real), jnp.asarray(x.imag)],
                             -1)
        out = np.asarray(xs @ K)
    expect = x @ w
    np.testing.assert_allclose(out[:, :5], expect.real, atol=1e-4)
    np.testing.assert_allclose(out[:, 5:], expect.imag, atol=1e-4)


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("spinor", [False, True])
def test_qlinear_shapes_and_grad(spinor):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 8)),
                    jnp.float32)
    m = QLinear(n_neurons=16, spinor=spinor, vector_scale=spinor)
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == (2, 6, 16)
    g = jax.grad(lambda p: (m.apply(p, x) ** 2).sum())(p)
    assert all(jnp.isfinite(leaf).all() for leaf in jax.tree.leaves(g))


def test_qconv1d_causal_does_not_see_future():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 10, 8)), jnp.float32)
    m = QConv1d(out_channels=8, kernel_size=3, padding="causal")
    p = m.init(jax.random.PRNGKey(0), x)
    y1 = m.apply(p, x)
    x2 = x.at[:, 5:].set(99.0)   # perturb the future
    y2 = m.apply(p, x2)
    np.testing.assert_allclose(y1[:, :5], y2[:, :5], atol=1e-5)


def test_qconv2d_shape():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 9, 7, 4)),
                    jnp.float32)
    m = QConv2d(out_channels=8, kernel_size=(3, 3), stride=(2, 2))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 5, 4, 8)


def test_qbatchnorm_normalizes_quaternion_variance():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 5, 8)) * 3.0 + 1.0, jnp.float32)
    bn = QBatchNorm()
    p = bn.init(jax.random.PRNGKey(0), x)
    out, vars_ = bn.apply(p, x, mutable=["batch_stats"])
    # per-quaternion norm variance ~1 => per-component std ~0.5
    assert float(out.mean()) == pytest.approx(0.0, abs=1e-2)
    assert float(out.std()) == pytest.approx(0.5, abs=0.05)
    # eval path uses (partially updated) running stats and stays finite
    out_eval = bn.apply({"params": p["params"],
                         "batch_stats": vars_["batch_stats"]}, x,
                        deterministic=True)
    assert jnp.isfinite(out_eval).all()


@pytest.mark.parametrize("cls,n_states", [(QLSTM, 2), (QRNN, 2),
                                          (QLiGRU, 2)])
def test_quaternion_rnn_shapes(cls, n_states):
    x = jnp.asarray(np.random.default_rng(4).normal(size=(3, 7, 8)),
                    jnp.float32)
    m = cls(hidden_size=12, in_features=8, num_layers=2)
    p = m.init(jax.random.PRNGKey(0), x)
    y, states = m.apply(p, x)
    assert y.shape == (3, 7, 12)
    assert len(states) == n_states


def test_clinear_matches_complex_reference():
    """CLinear == explicit complex matmul with the same weights."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
    m = CLinear(n_neurons=8, bias=False)
    p = m.init(jax.random.PRNGKey(0), x)
    w = np.asarray(p["params"]["weight"])   # (2, in_c, out_c)
    xc = np.asarray(x[:, :3]) + 1j * np.asarray(x[:, 3:])
    wc = w[0] + 1j * w[1]
    expect = xc @ wc
    with jax.default_matmul_precision("float32"):
        out = np.asarray(m.apply(p, x))
    np.testing.assert_allclose(out[:, :4], expect.real, atol=1e-4)
    np.testing.assert_allclose(out[:, 4:], expect.imag, atol=1e-4)


def test_cconv_shapes():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 10, 6)), jnp.float32)
    m = CConv1d(out_channels=4, kernel_size=3, padding="causal")
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10, 4)
    x4 = jnp.asarray(rng.normal(size=(2, 8, 6, 4)), jnp.float32)
    m2 = CConv2d(out_channels=6, kernel_size=(3, 3))
    p2 = m2.init(jax.random.PRNGKey(1), x4)
    assert m2.apply(p2, x4).shape == (2, 8, 6, 6)


def test_cbatchnorm_whitens():
    rng = np.random.default_rng(7)
    # correlated re/im parts: whitening must decorrelate them
    re = rng.normal(size=(256, 4))
    im = 0.8 * re + 0.2 * rng.normal(size=(256, 4))
    x = jnp.asarray(np.concatenate([re, im], -1), jnp.float32)
    bn = CBatchNorm()
    p = bn.init(jax.random.PRNGKey(0), x)
    out, _ = bn.apply(p, x, mutable=["batch_stats"])
    cr, ci = np.asarray(out[:, :4]), np.asarray(out[:, 4:])
    assert (cr ** 2).mean() == pytest.approx(0.5, abs=0.05)
    assert (ci ** 2).mean() == pytest.approx(0.5, abs=0.05)
    assert abs((cr * ci).mean()) < 0.05   # decorrelated


def test_clayernorm_shape_and_finite():
    x = jnp.asarray(np.random.default_rng(8).normal(size=(3, 5, 8)),
                    jnp.float32)
    ln = CLayerNorm()
    p = ln.init(jax.random.PRNGKey(0), x)
    out = ln.apply(p, x)
    assert out.shape == x.shape and jnp.isfinite(out).all()


@pytest.mark.parametrize("cls", [CLSTM, CRNN, CLiGRU])
def test_complex_rnn_shapes(cls):
    x = jnp.asarray(np.random.default_rng(9).normal(size=(3, 7, 6)),
                    jnp.float32)
    m = cls(hidden_size=8, in_features=6, num_layers=2)
    p = m.init(jax.random.PRNGKey(0), x)
    y, states = m.apply(p, x)
    assert y.shape == (3, 7, 8)
    assert len(states) == 2


# ---------------------------------------------------------------------------
# quantiser
# ---------------------------------------------------------------------------

def test_gumbel_softmax_straight_through():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(5, 7)),
                         jnp.float32)
    y = gumbel_softmax(logits, jax.random.PRNGKey(0), tau=0.5, hard=True)
    # forward value is exactly one-hot
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)
    assert ((np.asarray(y) > 0.999) | (np.asarray(y) < 1e-3)).all()
    # but it carries gradients (straight-through)
    g = jax.grad(lambda l: (gumbel_softmax(
        l, jax.random.PRNGKey(0), 0.5) ** 2).sum())(logits)
    assert float(jnp.abs(g).sum()) > 0


def test_anneal_temperature():
    assert float(anneal_temperature(0)) == pytest.approx(2.0)
    assert float(anneal_temperature(10_000_000)) == pytest.approx(0.25)


def test_gumbel_vector_quantizer():
    """Matches the reference doctest contract
    (``nnet/quantisers.py:29-34``): (10, 12, 128) -> x (10, 12, 50)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(10, 12, 128)), jnp.float32)
    q = GumbelVectorQuantizer(num_vars=100, groups=2, vq_dim=50)
    p = q.init({"params": jax.random.PRNGKey(0),
                "gumbel": jax.random.PRNGKey(1)}, x)
    out = q.apply(p, x, temp=2.0, rngs={"gumbel": jax.random.PRNGKey(2)})
    assert out["x"].shape == (10, 12, 50)
    assert out["num_vars"] == 200
    assert 1.0 <= float(out["code_perplexity"]) <= 200.0
    assert 1.0 <= float(out["prob_perplex"]) <= 200.0
    # eval: deterministic, no rng needed
    out_det = q.apply(p, x, deterministic=True)
    assert out_det["x"].shape == (10, 12, 50)
    # each time-step output is a concatenation of codebook rows: check
    # membership for the first group block
    codes = np.asarray(p["params"]["vars"])[0]          # (100, 25)
    got = np.asarray(out_det["x"][0, 0, :25])
    dists = np.abs(codes - got).max(-1)
    assert dists.min() < 1e-5


# ---------------------------------------------------------------------------
# autoencoders
# ---------------------------------------------------------------------------

class _Enc(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(16)(nn.tanh(nn.Dense(32)(x)))


class _Dec(nn.Module):
    out: int = 12

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out)(nn.tanh(nn.Dense(32)(x)))


def test_vae_train_sample_and_overfit():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 6, 12)), jnp.float32)
    rel = jnp.asarray([1.0, 0.5] * 4, jnp.float32)
    vae = VariationalAutoencoder(encoder=_Enc(), decoder=_Dec(),
                                 latent_dim=4)
    p = vae.init({"params": jax.random.PRNGKey(0),
                  "latent": jax.random.PRNGKey(1)}, x,
                 method=lambda m, x: m.train_sample(x))
    out = vae.apply(p, x, rel, rngs={"latent": jax.random.PRNGKey(2)},
                    method=lambda m, x, r: m.train_sample(x, r))
    assert out.rec.shape == x.shape
    assert out.mean.shape == (8, 6, 4)
    # padded frames masked
    np.testing.assert_allclose(np.asarray(out.rec[1, 3:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.latent[1, 3:]), 0.0,
                               atol=1e-6)

    # a few steps of ELBO descent
    tx = optax.adam(1e-2)
    opt = tx.init(p)

    def loss_fn(p, key):
        out = vae.apply(p, x, rel, rngs={"latent": key},
                        method=lambda m, x, r: m.train_sample(x, r))
        loss, _ = vae_elbo_loss(out, x, rel, kl_weight=1e-3)
        return loss

    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        loss, g = jax.value_and_grad(loss_fn)(p, sub)
        up, opt = tx.update(g, opt)
        p = optax.apply_updates(p, up)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7


def test_normalizing_autoencoder_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 5, 12)), jnp.float32)
    ae = NormalizingAutoencoder(encoder=_Enc(), decoder=_Dec())
    p = ae.init(jax.random.PRNGKey(0), x,
                method=lambda m, x: m.train_sample(x))
    out = ae.apply(p, x, method=lambda m, x: m.train_sample(x))
    assert out.rec.shape == x.shape
    # encode() output is normalised
    z = ae.apply(p, x)
    assert float(jnp.abs(z.mean())) < 0.1
    dec = ae.apply(p, z, method=lambda m, z: m.decode(z))
    assert dec.shape == x.shape
