"""RNN-T (transducer) loss: forward-backward lattice with analytic gradients.

TPU-native replacement for the reference's native loss kernels:
- torchaudio ``rnnt_loss`` (C++/CUDA, the recipe default — see
  ``/root/reference/vendor/speechbrain/speechbrain/nnet/losses.py:61-77``)
- SpeechBrain's Numba CUDA wavefront kernel
  (``nnet/loss/transducer_loss.py:31-236``).

Three implementations, fastest applicable one picked by ``rnnt_loss``:

1. ``rnnt_loss_reference`` — a plain nested-scan lattice used as the
   correctness oracle in tests (differentiable via JAX autodiff).
2. ``_rnnt_forward_backward`` — a vectorized anti-diagonal wavefront scan
   (the lock-based wavefront of the Numba kernel maps to a ``lax.scan``
   over t+u diagonals), wrapped in ``jax.custom_vjp`` with the analytic
   gradient. Runs everywhere (CPU/TPU) under jit.
3. ``tsasr_tpu.ops.rnnt_loss_pallas`` — fused Pallas TPU kernel (same
   wavefront, whole lattice in VMEM, loss+grads in one pass).

Semantics match the reference wrapper ``transducer_loss``
(``nnet/losses.py:29-87``): relative lengths are converted with
``(lens * shape).round()``; ``reduction`` in {mean, batchmean, sum, none}.

The lattice recurrence (log space), with T_b = logit length and U_b =
label length of batch element b, lattice over (t, u) in [0,T_b) x [0,U_b]:

    alpha[0,0] = 0
    alpha[t,u] = LSE(alpha[t-1,u] + blank[t-1,u], alpha[t,u-1] + lab[t,u-1])
    beta[t,u]  = LSE(beta[t+1,u] + blank[t,u],  beta[t,u+1] + lab[t,u])
    beta[T-1,U] = blank[T-1,U]        (the mandatory final blank)
    loss = -beta[0,0] = -(alpha[T-1,U] + blank[T-1,U])

Gradients w.r.t. the label/blank log-probs are the usual occupancies:

    d(-logZ)/d blank[t,u] = -exp(alpha[t,u] + blank[t,u] + beta[t+1,u] - logZ)
    d(-logZ)/d lab[t,u]   = -exp(alpha[t,u] + lab[t,u]  + beta[t,u+1] - logZ)

(with beta[T,U] := 0 for the terminal blank transition).

KNOWN HARDWARE DEFECT (round 5, measured): the wavefront solver (2),
when traced into one large XLA program on a TPU v5e — e.g. inside the
fused-loss custom_vjp with ``use_pallas=False`` — produces gradients
with up to ~74-99% relative error at some long-T shapes (observed at
T=408/U1=145; nearly correct at T=832/U1=298), while (a) the identical
code is correct on CPU (pinned against brute force in the suite),
(b) the identical code is correct on TPU when its pieces are
dispatched as separate programs, and (c) the Pallas slab/resident
kernels match an independent autodiff oracle to <=0.6% at the same
shapes (``reports/rnnt_slab_tpu_r5.json``). Production is unaffected —
on TPU ``use_pallas="auto"`` always selects a Pallas variant (the slab
geometry admits any T and U1 up to ~2800) — but do NOT use the
wavefront as a TPU parity yardstick inside a fused program; compare
against autodiff instead (see ``tools/prove_rnnt_slab.py``).
"""

import functools

import jax
import jax.numpy as jnp

# Large negative stand-in for -inf that is safe under arithmetic
# (avoids inf - inf = nan in masked logaddexp chains).
NEG = -1e30


def _logaddexp(a, b):
    """Numerically-stable log(exp(a) + exp(b)) tolerant of NEG fillers."""
    mx = jnp.maximum(a, b)
    mx_safe = jnp.maximum(mx, NEG / 2)
    return jnp.where(
        mx <= NEG / 2, NEG,
        mx_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx_safe)))


def _gather_label_blank_logprobs(log_probs, labels, blank):
    """Split (B,T,U1,V) log-probs into blank (B,T,U1) and label (B,T,U1).

    lab[:, :, u] is the log-prob of emitting labels[u] from lattice row u
    (only u < U is meaningful; column U is filled with NEG).
    """
    lpb = log_probs[..., blank]
    U = labels.shape[1]
    V = log_probs.shape[-1]
    # one-hot contraction instead of take_along_axis: a (V -> 1) matmul
    # the MXU eats, where the equivalent gather lowers to a slow TPU
    # scatter/gather loop (measured ~2x on the full loss step)
    onehot = jax.nn.one_hot(labels, V, dtype=log_probs.dtype)  # (B,U,V)
    lpl = jnp.einsum("btuv,buv->btu", log_probs[:, :, :U, :], onehot)
    lpl = jnp.pad(lpl, ((0, 0), (0, 0), (0, 1)), constant_values=NEG)
    return lpb, lpl


def _diag_column(x, k, t_range):
    """Gather x[b, t, k - t] for all t -> (B, T); NEG outside the lattice."""
    B, T, U1 = x.shape
    u = k - t_range                                          # (T,)
    valid = (u >= 0) & (u < U1)
    u_clip = jnp.clip(u, 0, U1 - 1)
    idx = jnp.broadcast_to(u_clip[None, :, None], (B, T, 1))
    col = jnp.take_along_axis(x, idx, axis=2)[..., 0]
    return jnp.where(valid[None, :], col, NEG)


def _alpha_scan(lpb, lpl):
    """Wavefront alpha lattice -> (B, T, U1) via scan over diagonals."""
    B, T, U1 = lpb.shape
    K = T + U1 - 1
    t_range = jnp.arange(T)

    init = jnp.full((B, T), NEG).at[:, 0].set(0.0)

    def step(carry, k):
        a_prev = carry                                       # diag k-1
        lb_prev = _diag_column(lpb, k - 1, t_range)
        ll_prev = _diag_column(lpl, k - 1, t_range)
        # alpha[t-1, u] term: shift previous diagonal down by one t
        from_blank = jnp.pad(a_prev + lb_prev, ((0, 0), (1, 0)),
                             constant_values=NEG)[:, :-1]
        from_label = a_prev + ll_prev
        a_new = _logaddexp(from_blank, from_label)
        return a_new, a_new

    _, diags = jax.lax.scan(step, init, jnp.arange(1, K))
    diags = jnp.concatenate([init[None], diags], axis=0)     # (K, B, T)
    return _unskew(diags, T, U1)


def _beta_scan(lpb, lpl, logit_lengths, label_lengths):
    """Wavefront beta lattice -> (B, T, U1), masked by per-batch lengths."""
    B, T, U1 = lpb.shape
    K = T + U1 - 1
    t_range = jnp.arange(T)
    Tl = logit_lengths[:, None]                              # (B,1)
    Ul = label_lengths[:, None]

    def step(carry, k):
        b_next = carry                                       # diag k+1
        u = k - t_range[None, :]                             # (1,T) -> bcast
        lb = _diag_column(lpb, k, t_range)
        ll = _diag_column(lpl, k, t_range)
        in_region = (u >= 0) & (u <= Ul) & (t_range[None, :] < Tl)
        # beta[t+1, u]: diag k+1 shifted up by one t
        bn_t1 = jnp.pad(b_next, ((0, 0), (0, 1)),
                        constant_values=NEG)[:, 1:]
        term_blank = jnp.where(t_range[None, :] + 1 < Tl, bn_t1 + lb, NEG)
        term_label = jnp.where(u + 1 <= Ul, b_next + ll, NEG)
        terminal = (t_range[None, :] == Tl - 1) & (u == Ul)
        term_seed = jnp.where(terminal, lb, NEG)
        b_new = _logaddexp(_logaddexp(term_blank, term_label), term_seed)
        b_new = jnp.where(in_region, b_new, NEG)
        return b_new, b_new

    init = jnp.full((B, T), NEG)
    _, diags = jax.lax.scan(step, init, jnp.arange(K - 1, -1, -1))
    diags = diags[::-1]                                      # (K, B, T)
    return _unskew(diags, T, U1)


def _unskew(diags, T, U1):
    """(K, B, T) diagonals -> (B, T, U1) lattice: out[b,t,u]=diags[t+u,b,t]."""
    d2 = jnp.moveaxis(diags, 1, 0)                           # (B, K, T)
    t_range = jnp.arange(T)
    k_idx = t_range[:, None] + jnp.arange(U1)[None, :]       # (T, U1)
    # Adjacent advanced indices broadcast to (T, U1) -> result (B, T, U1).
    return d2[:, k_idx, t_range[:, None]]


def _lattice_grads(lpb, lpl, alpha, beta, logit_lengths, label_lengths,
                   neg_logz):
    """Analytic occupancies d loss / d {blank,label} log-probs."""
    B, T, U1 = lpb.shape
    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    Tl = logit_lengths[:, None, None]
    Ul = label_lengths[:, None, None]
    logz = -neg_logz[:, None, None]

    # beta[t+1, u] with beta[T_b, U_b] := 0 (terminal blank leaves lattice)
    beta_t1 = jnp.pad(beta, ((0, 0), (0, 1), (0, 0)),
                      constant_values=NEG)[:, 1:, :]
    beta_t1 = jnp.where((t_idx == Tl - 1) & (u_idx == Ul), 0.0, beta_t1)
    valid_b = (t_idx < Tl) & (u_idx <= Ul)
    dlpb = -jnp.exp(
        jnp.where(valid_b, alpha + lpb + beta_t1 - logz, NEG))

    beta_u1 = jnp.pad(beta, ((0, 0), (0, 0), (0, 1)),
                      constant_values=NEG)[:, :, 1:]
    valid_l = (t_idx < Tl) & (u_idx < Ul)
    dlpl = -jnp.exp(
        jnp.where(valid_l, alpha + lpl + beta_u1 - logz, NEG))
    return dlpb, dlpl


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rnnt_forward_backward(logits, labels, logit_lengths, label_lengths,
                           blank):
    """Per-utterance RNN-T negative log-likelihood (B,)."""
    loss, _ = _rnnt_fwd(logits, labels, logit_lengths, label_lengths, blank)
    return loss


def _rnnt_fwd(logits, labels, logit_lengths, label_lengths, blank):
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    lpb, lpl = _gather_label_blank_logprobs(log_probs, labels, blank)
    alpha = _alpha_scan(lpb, lpl)
    beta = _beta_scan(lpb, lpl, logit_lengths, label_lengths)
    loss = -beta[:, 0, 0]
    dlpb, dlpl = _lattice_grads(lpb, lpl, alpha, beta, logit_lengths,
                                label_lengths, loss)
    return loss, (log_probs, dlpb, dlpl, labels)


def _rnnt_bwd(blank, residuals, g):
    log_probs, dlpb, dlpl, labels, = residuals
    B, T, U1, V = log_probs.shape
    U = labels.shape[1]
    # Sparse d loss / d log_probs, built with broadcast one-hots instead
    # of scatter-adds (TPU scatters serialize; this stays elementwise):
    # dlogp[b,t,u,v] = dlpb*(v==blank) + dlpl*(labels[b,u]==v)
    v_iota = jnp.arange(V)
    lab_onehot = (labels[:, None, :, None] == v_iota).astype(jnp.float32)
    dlogp = dlpb[..., None] * (v_iota == blank).astype(jnp.float32)
    dlogp = dlogp.at[:, :, :U, :].add(
        dlpl[:, :, :U, None] * lab_onehot)
    # Through log_softmax: dlogits = dlogp - softmax * sum_v dlogp
    row_sum = (dlpb + dlpl)[..., None]
    dlogits = dlogp - jnp.exp(log_probs) * row_sum
    dlogits = dlogits * g[:, None, None, None]
    return (dlogits, None, None, None)


_rnnt_forward_backward.defvjp(_rnnt_fwd, _rnnt_bwd)


def rnnt_loss_reference(logits, labels, logit_lengths, label_lengths,
                        blank=0):
    """Readable nested-scan lattice; the correctness oracle for tests.

    Differentiable via plain JAX autodiff (slow, memory heavy). Returns
    per-utterance losses (B,).
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lpb, lpl = _gather_label_blank_logprobs(log_probs, labels, blank)
    B, T, U1 = lpb.shape

    def per_batch(lpb_b, lpl_b, T_b, U_b):
        def row_step(alpha_prev, t):
            # within-row recurrence over u (sequential)
            def u_step(carry, u):
                left = jnp.where(u > 0, carry + lpl_b[t, u - 1], NEG)
                up = jnp.where(t > 0, alpha_prev[u] + lpb_b[t - 1, u], NEG)
                first = jnp.where((t == 0) & (u == 0), 0.0, NEG)
                a = _logaddexp(_logaddexp(left, up), first)
                return a, a
            _, row = jax.lax.scan(u_step, NEG, jnp.arange(U1))
            return row, row
        _, rows = jax.lax.scan(row_step, jnp.full((U1,), NEG), jnp.arange(T))
        final = rows[T_b - 1, U_b] + lpb_b[T_b - 1, U_b]
        return -final

    return jax.vmap(per_batch)(lpb, lpl, logit_lengths, label_lengths)


def rnnt_loss(logits, labels, logit_lengths, label_lengths, blank=0,
              reduction="mean", use_pallas="auto", mesh=None,
              data_axis="data"):
    """RNN-T loss over absolute lengths. API mirrors torchaudio's
    ``rnnt_loss`` (the reference recipe's default backend).

    Arguments
    ---------
    logits : (B, T, U+1, V) unnormalized scores (any float dtype; the
        lattice runs in float32).
    labels : (B, U) int32 target labels (no blanks).
    logit_lengths / label_lengths : (B,) int32 absolute lengths.
    blank : int, blank label index.
    reduction : 'mean' | 'batchmean' | 'sum' | 'none'.
    use_pallas : 'auto' uses the fused Pallas TPU kernel when running on
        TPU and the lattice fits VMEM; True forces it; False forces the
        XLA wavefront scan.
    mesh / data_axis : when a multi-device mesh is given, the Pallas
        kernel runs per data shard under ``shard_map`` (the batch must
        divide the data-axis size); the XLA path needs no wrapping (it
        partitions automatically).
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    logit_lengths = logit_lengths.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)

    chosen = False
    if use_pallas != False:  # noqa: E712  ('auto' or True)
        from tsasr_tpu.ops import rnnt_loss_pallas as rp
        chosen = rp.pallas_applicable(logits.shape, force=use_pallas == True)  # noqa: E712
    if chosen:
        from tsasr_tpu.ops import rnnt_loss_pallas as rp
        if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
            losses = rp.rnnt_loss_pallas_sharded(
                logits, labels, logit_lengths, label_lengths, blank,
                mesh=mesh, data_axis=data_axis)
        else:
            losses = rp.rnnt_loss_pallas(logits, labels, logit_lengths,
                                         label_lengths, blank)
    else:
        losses = _rnnt_forward_backward(logits, labels, logit_lengths,
                                        label_lengths, blank)

    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "batchmean":
        # torchaudio semantics: sum / batch size
        return jnp.sum(losses) / losses.shape[0]
    if reduction == "sum":
        return jnp.sum(losses)
    if reduction == "none":
        return losses
    raise ValueError(f"Unknown reduction: {reduction}")


def transducer_loss(logits, targets, input_lens, target_lens, blank_index=0,
                    reduction="mean", use_pallas="auto"):
    """Relative-length wrapper matching the reference public interface
    ``speechbrain.nnet.losses.transducer_loss`` (``nnet/losses.py:29-87``):
    lengths arrive as relative fractions and are converted with
    ``(lens * shape).round()``.
    """
    input_lens = jnp.round(input_lens * logits.shape[1]).astype(jnp.int32)
    target_lens = jnp.round(target_lens * targets.shape[1]).astype(jnp.int32)
    return rnnt_loss(logits, targets, input_lens, target_lens,
                     blank=blank_index, reduction=reduction,
                     use_pallas=use_pallas)
