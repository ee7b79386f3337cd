"""Fused joint+head+RNN-T loss: the (B, T, U+1, joint_dim) joint
activations and (B, T, U+1, V) logits never hit HBM.

Why: the transducer joint ``head(leaky_relu(enc[:,t] + dec[:,u]))``
materializes a (B, T, U+1, J) tensor — at the production bench config
(B=96, T=104, U=61, J=640) that is ~390M elements, several GB of HBM
traffic per step across forward + backward, and the single largest
memory consumer of the whole train step (it is what made B=192 slower
than B=96 on one v5e). The reference hits the same wall on GPUs: its
recipe's memory peak is exactly this tensor
(``/root/reference/train_librispeechmix_scratch.py:132-135``, joint of
(B,T,1,H)+(B,1,U,H)); it has no fused answer — this module is the
TPU-native one.

Design (``jax.custom_vjp`` with explicit recompute, chunked over T):

- forward: a ``lax.map`` over T-chunks computes only the two SMALL
  (B, T, U+1) lattices (blank / label log-probs) straight from
  ``enc_proj``/``dec_proj``/head weights; each chunk's joint lives only
  as a fusion-local transient. The lattices then go through the same
  solvers as the unfused path: the fused Pallas row-scan kernel on TPU
  (``ops.rnnt_loss_pallas``) or the XLA wavefront scans elsewhere.
- backward: a ``lax.scan`` over T-chunks recomputes each chunk's joint,
  converts the lattice occupancies (dlpb/dlpl) through the
  log-softmax + head + leaky-relu jacobians, and emits the small
  cotangents directly: denc (B,T,J), ddec (B,U+1,J), dW (J,V), db (V,).

Numerics match the unfused composition exactly at f32 (same gather,
same lattice solver, same jacobian as ``ops.rnnt_loss._rnnt_bwd``);
tests pin loss and all four gradients against the autodiff oracle.

Only the recipe-default joint is supported (``joint_mode: sum`` +
LeakyReLU, ``nnet/transducer/transducer_joint.py:14-95``); the concat
joint falls back to the unfused path in the recipe.
"""

import functools

import jax
import jax.numpy as jnp

from tsasr_tpu.ops.rnnt_loss import (
    _alpha_scan,
    _beta_scan,
    _gather_label_blank_logprobs,
    _lattice_grads,
)


def _pad_chunks(x, chunk):
    """(B, T, ...) -> (C, B, chunk, ...) zero-padded to a chunk multiple."""
    B, T = x.shape[:2]
    Tp = -(-T // chunk) * chunk
    if Tp != T:
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, Tp - T)
        x = jnp.pad(x, pad)
    x = x.reshape((B, Tp // chunk, chunk) + x.shape[2:])
    return jnp.moveaxis(x, 1, 0)


def _unpad_chunks(x, T):
    """(C, B, chunk, ...) -> (B, T, ...)."""
    x = jnp.moveaxis(x, 0, 1)
    B, C, chunk = x.shape[:3]
    return x.reshape((B, C * chunk) + x.shape[3:])[:, :T]


def _chunk_logprobs(enc_c, dec, w, b, slope):
    """One T-chunk of joint+head+log-softmax.

    enc_c (B, c, J), dec (B, U1, J) -> log-probs (B, c, U1, V) f32.
    The (B, c, U1, J) joint is a fusion-local transient.
    """
    pre = enc_c[:, :, None, :] + dec[:, None, :, :]
    joint = jax.nn.leaky_relu(pre, negative_slope=slope)
    logits = joint @ w.astype(joint.dtype) + b.astype(joint.dtype)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def _lattices(enc, dec, w, b, labels, blank, chunk, slope):
    """(B,T,J) x (B,U1,J) -> blank/label log-prob lattices (B,T,U1)."""
    T = enc.shape[1]
    encs = _pad_chunks(enc, chunk)

    def one(enc_c):
        lp = _chunk_logprobs(enc_c, dec, w, b, slope)
        return _gather_label_blank_logprobs(lp, labels, blank)

    lpb, lpl = jax.lax.map(one, encs)
    return _unpad_chunks(lpb, T), _unpad_chunks(lpl, T)


def _solve_lattice(lpb, lpl, t_lens, u_lens, use_pallas):
    """(loss (B,), dlpb, dlpl) via Pallas on TPU or XLA scans."""
    chosen = False
    if use_pallas != False:  # noqa: E712  ('auto' or True)
        from tsasr_tpu.ops import rnnt_loss_pallas as rp
        B, T, U1 = lpb.shape
        chosen = rp.pallas_applicable((B, T, U1, 1),
                                      force=use_pallas == True)  # noqa: E712
    if chosen:
        from tsasr_tpu.ops.rnnt_loss_pallas import _pallas_lattice
        return _pallas_lattice(lpb, lpl, t_lens.astype(jnp.int32),
                               u_lens.astype(jnp.int32))
    alpha = _alpha_scan(lpb, lpl)
    beta = _beta_scan(lpb, lpl, t_lens, u_lens)
    loss = -beta[:, 0, 0]
    dlpb, dlpl = _lattice_grads(lpb, lpl, alpha, beta, t_lens, u_lens,
                                loss)
    return loss, dlpb, dlpl


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused(enc, dec, w, b, labels, t_lens, u_lens, blank, chunk,
           use_pallas, slope):
    loss, _ = _fused_fwd(enc, dec, w, b, labels, t_lens, u_lens, blank,
                         chunk, use_pallas, slope)
    return loss


def _fused_fwd(enc, dec, w, b, labels, t_lens, u_lens, blank, chunk,
               use_pallas, slope):
    lpb, lpl = _lattices(enc, dec, w, b, labels, blank, chunk, slope)
    loss, dlpb, dlpl = _solve_lattice(lpb, lpl, t_lens, u_lens, use_pallas)
    return loss, (enc, dec, w, b, labels, dlpb, dlpl)


def _fused_bwd(blank, chunk, use_pallas, slope, residuals, g):
    enc, dec, w, b, labels, dlpb, dlpl = residuals
    T = enc.shape[1]
    U = labels.shape[1]
    V = w.shape[1]
    # The whole pipeline below is linear in (dlpb, dlpl); fold in the
    # upstream per-example cotangent first.
    dlpb = dlpb * g[:, None, None]
    dlpl = dlpl * g[:, None, None]

    encs = _pad_chunks(enc, chunk)
    dlpbs = _pad_chunks(dlpb, chunk)
    dlpls = _pad_chunks(dlpl, chunk)
    v_iota = jnp.arange(V)
    blank_onehot = (v_iota == blank).astype(jnp.float32)
    lab_onehot = (labels[:, None, :, None] == v_iota).astype(jnp.float32)

    acc_dtype = jnp.float32

    def body(carry, xs):
        ddec, dw, db = carry
        enc_c, glpb, glpl = xs
        pre = enc_c[:, :, None, :] + dec[:, None, :, :]
        joint = jax.nn.leaky_relu(pre, negative_slope=slope)
        logits = joint @ w.astype(joint.dtype) + b.astype(joint.dtype)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # log-softmax jacobian, identical to ops.rnnt_loss._rnnt_bwd:
        # dlogp[b,t,u,v] = glpb*(v==blank) + glpl*(labels[b,u]==v)
        dlogp = glpb[..., None] * blank_onehot
        dlogp = dlogp.at[:, :, :U, :].add(glpl[:, :, :U, None] * lab_onehot)
        row_sum = (glpb + glpl)[..., None]
        dlogits = dlogp - jnp.exp(lp) * row_sum          # (B, c, U1, V) f32
        # head jacobian
        dw = dw + jnp.einsum("bcuj,bcuv->jv", joint.astype(acc_dtype),
                             dlogits)
        db = db + jnp.sum(dlogits, axis=(0, 1, 2))
        djoint = dlogits @ w.astype(acc_dtype).T         # (B, c, U1, J)
        # leaky-relu jacobian
        dpre = jnp.where(pre > 0, djoint, slope * djoint)
        denc_c = jnp.sum(dpre, axis=2)                   # (B, c, J)
        ddec = ddec + jnp.sum(dpre, axis=1)              # (B, U1, J)
        return (ddec, dw, db), denc_c

    init = (jnp.zeros(dec.shape, acc_dtype),
            jnp.zeros(w.shape, acc_dtype),
            jnp.zeros(b.shape, acc_dtype))
    (ddec, dw, db), dencs = jax.lax.scan(body, init,
                                         (encs, dlpbs, dlpls))
    denc = _unpad_chunks(dencs, T)
    return (denc.astype(enc.dtype), ddec.astype(dec.dtype),
            dw.astype(w.dtype), db.astype(b.dtype), None, None, None)


_fused.defvjp(_fused_fwd, _fused_bwd)


def rnnt_loss_fused(enc, dec, head_w, head_b, labels, logit_lengths,
                    label_lengths, blank=0, reduction="none", chunk=8,
                    use_pallas="auto", negative_slope=0.01, mesh=None,
                    data_axis="data"):
    """RNN-T loss computed straight from projected encoder/decoder
    outputs — the joint and logits are never materialized in HBM.

    Semantically identical (at f32) to::

        logits = leaky_relu(enc[:, :, None] + dec[:, None]) @ head_w + head_b
        rnnt_loss(logits, labels, logit_lengths, label_lengths, blank)

    Arguments
    ---------
    enc : (B, T, J) projected encoder output (``encoder_proj``).
    dec : (B, U+1, J) projected prediction-network output
        (``decoder_proj``; row 0 is the blank/BOS row).
    head_w / head_b : (J, V) / (V,) ``transducer_head`` parameters.
    labels : (B, U) int32 targets (no blanks).
    logit_lengths / label_lengths : (B,) absolute lengths.
    chunk : T-chunk size; bounds the transient joint at
        B*chunk*(U+1)*J elements.
    use_pallas : lattice solver selection, as in ``rnnt_loss``.
    mesh / data_axis : with a multi-device mesh, runs per data shard
        under ``shard_map`` (head grads are psum-reduced).
    """
    enc = enc if enc.dtype in (jnp.bfloat16, jnp.float32) else \
        enc.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    t_lens = logit_lengths.astype(jnp.int32)
    u_lens = label_lengths.astype(jnp.int32)

    if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
        losses = _fused_sharded(enc, dec, head_w, head_b, labels, t_lens,
                                u_lens, blank, chunk, use_pallas,
                                negative_slope, mesh, data_axis)
    else:
        losses = _fused(enc, dec, head_w, head_b, labels, t_lens, u_lens,
                        blank, chunk, use_pallas, negative_slope)

    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "batchmean":
        return jnp.sum(losses) / losses.shape[0]
    if reduction == "sum":
        return jnp.sum(losses)
    if reduction == "none":
        return losses
    raise ValueError(f"Unknown reduction: {reduction}")


def _fused_sharded(enc, dec, w, b, labels, t_lens, u_lens, blank, chunk,
                   use_pallas, slope, mesh, data_axis):
    """Batch-sharded fused loss: per-example, so sharding is exact; the
    replicated head params' cotangents are psum-reduced by the
    ``shard_map`` transpose."""
    from jax.sharding import PartitionSpec as P

    def per_shard(e, d, wi, bi, lb, tl, ul):
        return _fused(e, d, wi, bi, lb, tl, ul, blank, chunk, use_pallas,
                      slope)

    spec = P(data_axis)
    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec, spec, P(), P(), spec, spec, spec),
        out_specs=spec, check_vma=False,
    )(enc, dec, w, b, labels, t_lens, u_lens)
