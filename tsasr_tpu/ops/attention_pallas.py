"""Fused Pallas TPU kernel for relative-position self-attention
(Transformer-XL style, the conformer's ``RelPosMHAXL``).

Why: at production shapes (B=96, T=104, H=4, Dh=64) the attention block
is almost entirely NON-matmul time — the (B, H, T, 2T-1) positional
scores, the rel-shift pad/reshape/slice relayouts, softmax, dropout and
the layout transposes between ``bthd``/``bhts`` put the XLA path at
~9% MFU while the FFNs around it run at 85% (reports/perf_r3.md 4b).
A (batch-block, head) tile of the whole problem fits in VMEM, so the
entire chain

    content scores + positional scores (shift-free, via a per-row
    variable lane-roll) -> masking -> f32 softmax -> dropout ->
    probs @ V

runs in ONE kernel with nothing but q/k/v/p and the (T, Dh) outputs
touching HBM. Each program processes a block of ``_BB`` batch elements
(batched MXU dots; one flattened (BB*T, 2T-1) matmul for the positional
scores) — one (batch, head) per program starves the MXU and pays
per-program DMA overhead instead. The backward kernel recomputes the
forward in-tile (flash-attention style — cheaper than storing
(B, H, T, T) residuals) and emits dq_u, dq_v, dk, dv directly; dp (the
shared positional-key table) is accumulated across the batch grid
dimension, which varies fastest so the accumulator block stays resident
in VMEM.

The rel-shift is implemented WITHOUT the Transformer-XL pad/reshape
trick: flattened row r (query i = r mod Tp) of the positional scores
needs a left shift by (T-1-i), done as a log-depth binary shifter of
circular lane-rolls (`pltpu.roll`) + per-row selects — O(log T) vector
ops, no relayouts. Dropout uses the in-kernel PRNG (`pltpu.prng_seed` /
`prng_random_bits`), reseeded identically in forward and backward so
the regenerated mask is bit-identical and never stored.

Numerics match the XLA path (`models/attention.py::RelPosMHAXL`): same
f32 softmax, same additive -1e9 masking, same 1/sqrt(embed_dim) scale
folded in by the caller; equivalence is pinned in
``tests/test_attention_pallas.py`` (interpret mode on CPU, rate=0) and
the compiled path is exercised by bench.py on TPU.

Reference semantics: ``vendor/speechbrain/speechbrain/nnet/attention.py:364-639``.
"""

import functools

import jax
import jax.numpy as jnp

NEG = -1e9
_LANE = 128
_BB = 8          # batch elements per program


def _round_up(x, m):
    return -(-x // m) * m


def _var_roll(x, shifts, left, nbits):
    """Per-row circular lane roll of ``x`` (R, P) by ``shifts`` (R, 1).

    Binary log-shifter: for each bit of the shift amount, roll the whole
    array by 2^bit and select the rolled rows. ``left=True`` rolls
    toward lower lane indices (out[j] = in[j + s]).
    """
    from jax.experimental.pallas import tpu as pltpu

    P = x.shape[1]
    for bit in range(nbits):
        amt = 1 << bit
        rolled = pltpu.roll(x, P - amt if left else amt, axis=1)
        sel = ((shifts >> bit) & 1) == 1              # (R, 1)
        x = jnp.where(sel, rolled, x)
    return x


def _row_shifts(T, Tp, R):
    """Shift (T-1-i) for flattened row r with query index i = r mod Tp."""
    r = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    return jnp.maximum(T - 1 - jax.lax.rem(r, Tp), 0)


def _bdot(a, b, contract, f32=jnp.float32):
    """Batched (leading-dim) dot: contracts a[contract[0]] with
    b[contract[1]], batching over dim 0 of both."""
    return jax.lax.dot_general(
        a, b, (((contract[0],), (contract[1],)), ((0,), (0,))),
        preferred_element_type=f32)


def _probs_in_tile(qu, qv, k, p, kp, am, scale, T, Tp, nbits):
    """Masked f32 softmax probs for a (BB, head) tile.

    qu/qv/k: (BB, Tp, Dp); p: (Pp, Dp); kp: (BB, Tp); am: (Tp, Tp).
    Returns probs (BB, Tp, Tp) f32.
    """
    BB = qu.shape[0]
    ac = _bdot(qu, k, (2, 2))                            # (BB, Tp, Tp)
    qv_flat = qv.reshape(BB * Tp, -1)
    # the variable roll must run in f32: Mosaic's rotate is 32-bit only
    # ("Rotate with non-32-bit data: not implemented")
    bdf = jax.lax.dot_general(qv_flat, p, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    bd = _var_roll(bdf, _row_shifts(T, Tp, BB * Tp), left=True,
                   nbits=nbits)[:, :Tp].reshape(BB, Tp, Tp)
    scores = ((ac + bd) * scale + am[None]
              + kp[:, None, :])                          # (BB, Tp, Tp)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dropout_mask(seed_ref, bg, h, rate, shape):
    """In-kernel bernoulli keep-mask, seeded per (batch-block, head).

    ``bg``/``h`` are passed explicitly because the forward grid is
    (Bg, H) but the backward grid is (H, Bg) — the reseed must produce
    the bit-identical mask in both.
    """
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic supports at most 2 seed values: fold (bg, h) into one
    pltpu.prng_seed(seed_ref[0], bg * 1024 + h)
    bits = pltpu.prng_random_bits(shape)
    thresh = jnp.uint32(int(rate * float(2 ** 32)) & 0xFFFFFFFF)
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _fwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, kp_ref,
                am_ref, out_ref, *, scale, rate, T, Tp, nbits):
    from jax.experimental import pallas as pl

    qu, qv, k, v = (r[:, 0] for r in (qu_ref, qv_ref, k_ref, v_ref))
    probs = _probs_in_tile(qu, qv, k, p_ref[0], kp_ref[...], am_ref[...],
                           scale, T, Tp, nbits)
    if rate > 0.0:
        keep = _dropout_mask(seed_ref, pl.program_id(0),
                             pl.program_id(1), rate, probs.shape)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - rate)), 0.0)
    out = _bdot(probs.astype(v.dtype), v, (2, 1))        # (BB, Tp, Dp)
    out_ref[:, 0] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, kp_ref,
                am_ref, do_ref, dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref,
                *, scale, rate, T, Tp, nbits):
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    qu, qv, k, v, do = (r[:, 0] for r in (qu_ref, qv_ref, k_ref, v_ref,
                                          do_ref))
    p = p_ref[0]
    BB = qu.shape[0]
    probs = _probs_in_tile(qu, qv, k, p, kp_ref[...], am_ref[...],
                           scale, T, Tp, nbits)

    if rate > 0.0:
        # backward grid is (H, Bg): program_id(0) is h, (1) is bg
        keep = _dropout_mask(seed_ref, pl.program_id(1),
                             pl.program_id(0), rate, probs.shape)
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, probs * inv, 0.0)
    else:
        pd = probs

    cdt = v.dtype  # compute dtype for the MXU matmuls (bf16 in prod)
    # dv[b,s,d] = sum_t pd[b,t,s] do[b,t,d]
    dv = _bdot(pd.astype(cdt), do.astype(cdt), (1, 1))
    # dpd[b,t,s] = sum_d do[b,t,d] v[b,s,d]
    dpd = _bdot(do.astype(cdt), v, (2, 2))
    dprobs = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
    # softmax jacobian (uses pre-dropout probs)
    row = jnp.sum(probs * dprobs, axis=-1, keepdims=True)
    dscores = probs * (dprobs - row) * scale             # (BB,Tp,Tp) f32

    ds = dscores.astype(cdt)
    # dqu[b,t,d] = sum_s ds[b,t,s] k[b,s,d]
    dqu_ref[:, 0] = _bdot(ds, k, (2, 1)).astype(dqu_ref.dtype)
    # dk[b,s,d] = sum_t ds[b,t,s] qu[b,t,d]
    dk_ref[:, 0] = _bdot(ds, qu, (1, 1)).astype(dk_ref.dtype)

    # positional branch: un-shift dscores back to (*, Pp) alignment
    Pp = p.shape[0]
    ds_flat = dscores.reshape(BB * Tp, Tp)               # f32 (see fwd)
    dbdf = jnp.pad(ds_flat, ((0, 0), (0, Pp - Tp)))
    dbdf = _var_roll(dbdf, _row_shifts(T, Tp, BB * Tp), left=False,
                     nbits=nbits).astype(cdt)            # (BB*Tp, Pp)
    dqv = jax.lax.dot_general(dbdf, p, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dqv_ref[:, 0] = dqv.reshape(BB, Tp, -1).astype(dqv_ref.dtype)
    qv_flat = qv.reshape(BB * Tp, -1)
    dp_blk = jax.lax.dot_general(dbdf, qv_flat.astype(cdt),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)  # (Pp, Dp)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dp_ref[0] = dp_blk.astype(dp_ref.dtype)

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        dp_ref[0] = dp_ref[0] + dp_blk.astype(dp_ref.dtype)


def _pad_all(qu, qv, k, v, p, kp_add, am_add, do=None):
    B, H, T, Dh = qu.shape
    P = p.shape[1]
    Tp = _round_up(T, _LANE)
    Dp = _round_up(Dh, _LANE)
    Pp = _round_up(P, _LANE)
    Bp = _round_up(B, _BB)

    def pad_qkv(x):
        return jnp.pad(x, ((0, Bp - B), (0, 0), (0, Tp - T),
                           (0, Dp - Dh)))

    qu, qv, k, v = (pad_qkv(x) for x in (qu, qv, k, v))
    p = jnp.pad(p, ((0, 0), (0, Pp - P), (0, Dp - Dh)))
    # padded key columns (and padded batch rows' columns) are masked
    # via the additive key mask
    kp_add = jnp.pad(kp_add, ((0, Bp - B), (0, Tp - T)),
                     constant_values=NEG)
    am_add = jnp.pad(am_add, ((0, Tp - T), (0, Tp - T)))
    if do is not None:
        do = pad_qkv(do)
    return qu, qv, k, v, p, kp_add, am_add, do, (B, Bp, T, Tp, Dh, Dp,
                                                 P, Pp)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "interpret"))
def _fused_fwd_call(qu, qv, k, v, p, kp_add, am_add, seed, scale, rate,
                    interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = qu.shape[1]
    qu, qv, k, v, p, kp_add, am_add, _, dims = _pad_all(
        qu, qv, k, v, p, kp_add, am_add)
    B, Bp, T, Tp, Dh, Dp, P, Pp = dims
    nbits = max(1, (T - 1).bit_length())

    kernel = functools.partial(_fwd_kernel, scale=scale, rate=rate,
                               T=T, Tp=Tp, nbits=nbits)
    qkv_spec = pl.BlockSpec((_BB, 1, Tp, Dp),
                            lambda bg, h, *_: (bg, h, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // _BB, H),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, qkv_spec,
                      pl.BlockSpec((1, Pp, Dp),
                                   lambda bg, h, *_: (h, 0, 0)),
                      pl.BlockSpec((_BB, Tp),
                                   lambda bg, h, *_: (bg, 0)),
                      pl.BlockSpec((Tp, Tp), lambda bg, h, *_: (0, 0))],
            out_specs=qkv_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, H, Tp, Dp), qu.dtype),
        interpret=interpret,
    )(seed, qu, qv, k, v, p, kp_add, am_add)
    return out[:B, :, :T, :Dh]


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "interpret"))
def _fused_bwd_call(qu, qv, k, v, p, kp_add, am_add, seed, do, scale,
                    rate, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = qu.shape[1]
    qu, qv, k, v, p, kp_add, am_add, do, dims = _pad_all(
        qu, qv, k, v, p, kp_add, am_add, do)
    B, Bp, T, Tp, Dh, Dp, P, Pp = dims
    nbits = max(1, (T - 1).bit_length())

    kernel = functools.partial(_bwd_kernel, scale=scale, rate=rate,
                               T=T, Tp=Tp, nbits=nbits)
    # grid (H, Bg): the last dim (bg) varies fastest, so the dp output
    # block (indexed by h only) stays resident in VMEM while all batch
    # blocks accumulate into it — revisited output blocks must be
    # consecutive grid steps.
    qkv_spec = pl.BlockSpec((_BB, 1, Tp, Dp),
                            lambda h, bg, *_: (bg, h, 0, 0))
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, Bp // _BB),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, qkv_spec,
                      pl.BlockSpec((1, Pp, Dp),
                                   lambda h, bg, *_: (h, 0, 0)),
                      pl.BlockSpec((_BB, Tp),
                                   lambda h, bg, *_: (bg, 0)),
                      pl.BlockSpec((Tp, Tp), lambda h, bg, *_: (0, 0)),
                      qkv_spec],
            out_specs=(qkv_spec, qkv_spec, qkv_spec, qkv_spec,
                       pl.BlockSpec((1, Pp, Dp),
                                    lambda h, bg, *_: (h, 0, 0))),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, H, Tp, Dp), qu.dtype),  # dqu
            jax.ShapeDtypeStruct((Bp, H, Tp, Dp), qu.dtype),  # dqv
            jax.ShapeDtypeStruct((Bp, H, Tp, Dp), qu.dtype),  # dk
            jax.ShapeDtypeStruct((Bp, H, Tp, Dp), qu.dtype),  # dv
            jax.ShapeDtypeStruct((H, Pp, Dp), jnp.float32),   # dp
        ),
        interpret=interpret,
    )(seed, qu, qv, k, v, p, kp_add, am_add, do)
    dqu, dqv, dk, dv, dp = outs
    sl = (slice(0, B), slice(None), slice(0, T), slice(0, Dh))
    return (dqu[sl], dqv[sl], dk[sl], dv[sl],
            dp[:, :P, :Dh].astype(p.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_relpos_attention(q_u, q_v, k, v, p, kp_add, am_add, seed_f,
                           scale, rate, interpret=False):
    """Fused rel-pos attention: softmax((q_u k^T + shift(q_v p^T)) *
    scale + masks) -> dropout -> @ v, in one Pallas kernel.

    Arguments
    ---------
    q_u, q_v, k, v : (B, H, T, Dh) — queries with the u/v positional
        biases already added, keys, values (``RelPosMHAXL`` layout
        transposed from (B, T, H, Dh)).
    p : (H, 2T-1, Dh) position-projected encoding table.
    kp_add : (B, T) f32 additive key mask (0 or -1e9).
    am_add : (T, T) f32 additive attention mask (0 or -1e9; encodes
        causality and att_context_size).
    seed_f : () f32 dropout seed (must hold an exact integer < 2^24;
        float so custom_vjp cotangent rules stay trivial). The backward
        pass reseeds the in-kernel PRNG identically, so the dropout
        mask is regenerated bit-for-bit, never stored.
    scale, rate : static python floats.

    Returns (B, H, T, Dh) attention output (pre out-projection).
    """
    return _fused_fwd_call(q_u, q_v, k, v, p, kp_add, am_add,
                           _seed_i32(seed_f), scale, rate, interpret)


def _seed_i32(seed_f):
    return seed_f.astype(jnp.int32).reshape((1,))


def _vjp_fwd(q_u, q_v, k, v, p, kp_add, am_add, seed_f, scale, rate,
             interpret):
    out = _fused_fwd_call(q_u, q_v, k, v, p, kp_add, am_add,
                          _seed_i32(seed_f), scale, rate, interpret)
    return out, (q_u, q_v, k, v, p, kp_add, am_add, seed_f)


def _vjp_bwd(scale, rate, interpret, res, g):
    q_u, q_v, k, v, p, kp_add, am_add, seed_f = res
    dqu, dqv, dk, dv, dp = _fused_bwd_call(
        q_u, q_v, k, v, p, kp_add, am_add, _seed_i32(seed_f),
        g.astype(q_u.dtype), scale, rate, interpret)
    return (dqu, dqv, dk, dv, dp, jnp.zeros_like(kp_add),
            jnp.zeros_like(am_add), jnp.zeros_like(seed_f))


fused_relpos_attention.defvjp(_vjp_fwd, _vjp_bwd)


def fused_attention_applicable(T, Dh):
    """VMEM sanity bound for one (batch-block, head) tile."""
    Tp = _round_up(T, _LANE)
    Pp = _round_up(2 * T - 1, _LANE)
    Dp = _round_up(Dh, _LANE)
    # scores/probs + bd_full f32 + padded operands, double-buffer slack
    bytes_needed = _BB * (3 * 4 * Tp * Tp + 4 * Tp * Pp
                          + 2 * 6 * Tp * Dp) + 4 * Pp * Dp
    return bytes_needed < 10 * 1024 * 1024


def relpos_attention_reference(q_u, q_v, k, v, p, kp_add, am_add, scale):
    """Pure-jnp oracle with identical semantics (no dropout), for tests.

    Same math as ``models/attention.py::RelPosMHAXL`` restated on the
    op-level (B, H, T, Dh) layout, using the rel-shift trick.
    """
    from tsasr_tpu.models.attention import _rel_shift

    T = q_u.shape[2]
    ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k)
    bd = jnp.einsum("bhtd,hsd->bhts", q_v, p)       # (B, H, T, 2T-1)
    bd = _rel_shift(bd, klen=T)
    scores = ((ac + bd) * scale + am_add[None, None]
              + kp_add[:, None, None, :])
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs.astype(v.dtype), v)
