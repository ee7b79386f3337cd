"""Pure-numpy RNN-T loss with analytic gradients, wrapped for torch.

The north-star cross-framework run (``tools/northstar/run_northstar.py``)
executes the UNMODIFIED reference recipe (torch CPU); the reference's
loss is ``torchaudio.functional.rnnt_loss`` (a C++ kernel,
``/root/reference/vendor/speechbrain/speechbrain/nnet/losses.py:61-80``)
which is not installed on this host. This module provides a drop-in
replacement used by the ``torchaudio`` shim: a float64 anti-diagonal
forward/backward lattice in numpy plus the standard analytic gradient,
exposed as a ``torch.autograd.Function``.

Before every north-star run it is value-pinned against this repo's JAX
oracle (``tsasr_tpu/ops/rnnt_loss.py``) at rtol 1e-5 — see
``selfcheck()`` — so the shimmed reference optimizes the same objective
the real torchaudio kernel would.

Semantics follow ``torchaudio.functional.rnnt_loss``:
logits (B, T, U+1, V) raw (pre-log-softmax), targets (B, U) int,
logit_lengths (B,), target_lengths (B,), ``blank`` index, reduction
"none" | "mean" | "sum" (mean = mean over batch).
"""

import numpy as np
import torch


def _log_softmax(x):
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def rnnt_loss_numpy(logits, targets, logit_lengths, target_lengths,
                    blank=0):
    """-> (losses (B,), dlogits (B, T, U+1, V)) in float64."""
    B, T, U1, V = logits.shape
    U = U1 - 1
    lp = _log_softmax(np.asarray(logits, np.float64))
    tl = np.asarray(target_lengths, np.int64)
    il = np.asarray(logit_lengths, np.int64)
    y = np.asarray(targets, np.int64)

    neg_inf = -1e30
    # blank[t, u] = lp[t, u, blank]; emit[t, u] = lp[t, u, y_u]
    lp_blank = lp[..., blank]                                   # (B,T,U+1)
    idx = np.clip(y, 0, V - 1)                                  # (B,U)
    lp_emit = np.take_along_axis(
        lp[:, :, :U, :],
        np.broadcast_to(idx[:, None, :, None], (B, T, U, 1)),
        axis=-1)[..., 0]                                        # (B,T,U)

    alpha = np.full((B, T, U1), neg_inf)
    alpha[:, 0, 0] = 0.0
    bi = np.arange(B)

    def lse(a, b):
        m = np.maximum(a, b)
        m = np.where(m <= neg_inf, 0.0, m)  # keep -inf + -inf stable
        out = m + np.log(np.exp(a - m) + np.exp(b - m))
        return np.where((a <= neg_inf) & (b <= neg_inf), neg_inf, out)

    # anti-diagonal sweep: entries (t, u) with t + u = d
    for d in range(1, T + U1 - 1):
        t_lo = max(0, d - U)
        t_hi = min(T - 1, d)
        ts = np.arange(t_lo, t_hi + 1)
        us = d - ts
        from_blank = np.where(
            ts[None, :] > 0,
            alpha[:, np.maximum(ts - 1, 0), us]
            + lp_blank[:, np.maximum(ts - 1, 0), us], neg_inf)
        from_emit = np.where(
            us[None, :] > 0,
            alpha[:, ts, np.maximum(us - 1, 0)]
            + np.where(us[None, :] > 0,
                       lp_emit[:, ts, np.maximum(us - 1, 0)], neg_inf),
            neg_inf)
        alpha[:, ts, us] = lse(from_blank, from_emit)

    last_t = np.maximum(il - 1, 0)
    losses = -(alpha[bi, last_t, tl] + lp_blank[bi, last_t, tl])

    # beta lattice (valid-region masked)
    beta = np.full((B, T, U1), neg_inf)
    beta[bi, last_t, tl] = lp_blank[bi, last_t, tl]
    valid_t = np.arange(T)[None, :] < il[:, None]               # (B,T)
    valid_u = np.arange(U1)[None, :] <= tl[:, None]             # (B,U+1)
    for d in range(T + U1 - 3, -1, -1):
        t_lo = max(0, d - U)
        t_hi = min(T - 1, d)
        ts = np.arange(t_lo, t_hi + 1)
        us = d - ts
        via_blank = np.where(
            (ts[None, :] + 1 < il[:, None]),
            beta[:, np.minimum(ts + 1, T - 1), us]
            + lp_blank[:, ts, us], neg_inf)
        via_emit = np.where(
            (us[None, :] < tl[:, None]),
            beta[:, ts, np.minimum(us + 1, U)]
            + np.where(us[None, :] < U1 - 1,
                       lp_emit[:, ts, np.minimum(us, U - 1)]
                       if U > 0 else neg_inf, neg_inf), neg_inf)
        cur = lse(via_blank, via_emit)
        final = (ts[None, :] == last_t[:, None]) & \
                (us[None, :] == tl[:, None])
        cur = np.where(final, beta[:, ts, us], cur)
        ok = valid_t[:, ts] & valid_u[:, us]
        beta[:, ts, us] = np.where(ok, cur, neg_inf)

    # occupancy gamma[t,u] = alpha + beta - logZ; transition posteriors
    logZ = -losses                                              # (B,)
    with np.errstate(over="ignore", under="ignore"):
        # blank transition (t,u) -> (t+1,u)
        g_blank = alpha + np.concatenate(
            [beta[:, 1:], np.full((B, 1, U1), neg_inf)], axis=1) \
            - logZ[:, None, None]
        # final blank at (il-1, tl)
        fin = np.zeros((B, T, U1), bool)
        fin[bi, last_t, tl] = True
        g_blank = np.where(fin, alpha - logZ[:, None, None], g_blank)
        post_blank = np.exp(np.minimum(g_blank + lp_blank, 0.0))
        post_blank = np.where(g_blank <= neg_inf / 2, 0.0, post_blank)
        # emit transition (t,u) -> (t,u+1) with label y_u
        g_emit = alpha[:, :, :U] + beta[:, :, 1:] - logZ[:, None, None]
        post_emit = np.exp(np.minimum(g_emit + lp_emit, 0.0))
        post_emit = np.where(g_emit <= neg_inf / 2, 0.0, post_emit)

    # d(-logZ)/d lp[t,u,v] = -posterior of taking transition with label v
    g_lp = np.zeros((B, T, U1, V))
    g_lp[..., blank] = -post_blank
    np.add.at(g_lp, (bi[:, None, None],
                     np.arange(T)[None, :, None],
                     np.arange(U)[None, None, :], idx[:, None, :]),
              -post_emit)
    # through log_softmax: dL/dlogit = g - softmax * sum(g)
    p = np.exp(lp)
    dlogits = g_lp - p * g_lp.sum(axis=-1, keepdims=True)
    return losses, dlogits


class _RnntLoss(torch.autograd.Function):
    @staticmethod
    def forward(ctx, logits, targets, logit_lengths, target_lengths,
                blank, reduction):
        losses, dlogits = rnnt_loss_numpy(
            logits.detach().cpu().numpy(), targets.cpu().numpy(),
            logit_lengths.cpu().numpy(), target_lengths.cpu().numpy(),
            blank=blank)
        ctx.save_for_backward(
            torch.as_tensor(dlogits, dtype=logits.dtype))
        ctx.reduction = reduction
        ctx.batch = logits.shape[0]
        out = torch.as_tensor(losses, dtype=logits.dtype)
        if reduction == "mean":
            return out.mean()
        if reduction == "sum":
            return out.sum()
        return out

    @staticmethod
    def backward(ctx, grad_output):
        (dlogits,) = ctx.saved_tensors
        g = grad_output
        if ctx.reduction == "mean":
            dlogits = dlogits * (g / ctx.batch)
        elif ctx.reduction == "sum":
            dlogits = dlogits * g
        else:
            dlogits = dlogits * g.view(-1, 1, 1, 1)
        return dlogits, None, None, None, None, None


def rnnt_loss(logits, targets, logit_lengths, target_lengths, blank=-1,
              clamp=-1.0, reduction="mean", fused_log_softmax=True):
    """torchaudio.functional.rnnt_loss drop-in (see module docstring)."""
    if blank < 0:
        blank = logits.shape[-1] + blank
    return _RnntLoss.apply(logits, targets.int(), logit_lengths.int(),
                           target_lengths.int(), int(blank), reduction)


def selfcheck(rtol=1e-5):
    """Pin the numpy lattice + analytic grads against the repo's JAX
    oracle (``tsasr_tpu.ops.rnnt_loss.rnnt_loss_reference``) and torch
    autograd numerics. Raises on mismatch; called by run_northstar
    before any reference training starts."""
    import jax
    import jax.numpy as jnp
    from tsasr_tpu.ops.rnnt_loss import rnnt_loss as jax_rnnt_loss

    rng = np.random.default_rng(0)
    B, T, U, V = 3, 7, 4, 6
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, U)).astype(np.int32)
    il = np.array([7, 5, 6], np.int32)
    tl = np.array([4, 2, 3], np.int32)

    losses, dlogits = rnnt_loss_numpy(logits, targets, il, tl, blank=0)

    jl = jax_rnnt_loss(jnp.asarray(logits), jnp.asarray(targets),
                       jnp.asarray(il), jnp.asarray(tl), blank=0,
                       reduction="none", use_pallas=False)
    np.testing.assert_allclose(losses, np.asarray(jl), rtol=rtol)

    jg = jax.grad(lambda lg: jnp.sum(jax_rnnt_loss(
        lg, jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl),
        blank=0, reduction="none", use_pallas=False)))(jnp.asarray(logits))
    np.testing.assert_allclose(dlogits, np.asarray(jg), rtol=1e-4,
                               atol=1e-6)

    # torch wrapper round-trip incl. reduction/backward plumbing
    lt = torch.tensor(logits, requires_grad=True)
    loss = rnnt_loss(lt, torch.tensor(targets), torch.tensor(il),
                     torch.tensor(tl), blank=0, reduction="mean")
    loss.backward()
    np.testing.assert_allclose(float(loss), losses.mean(), rtol=rtol)
    np.testing.assert_allclose(lt.grad.numpy(), dlogits / B, rtol=1e-4,
                               atol=1e-6)
    return True


if __name__ == "__main__":
    selfcheck()
    print("rnnt_loss_torch selfcheck OK (pinned to JAX oracle)")
