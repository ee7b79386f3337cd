"""Pipeline parallelism: shard the encoder's LAYER axis across devices.

The reference scales only by data parallelism (``core.py:1464-1490``).
``parallel/mesh.py`` adds tensor parallelism ('model' axis) and
``parallel/seq_parallel.py`` sequence parallelism ('seq'); this module
adds the remaining classic axis: a ``'pipe'`` mesh axis holding a
contiguous block of Conformer layers per device, with activations
streamed stage-to-stage as a GPipe schedule — the per-layer FLOPs and
the *stacked working copy* of the layer parameters scale as
``num_layers / P`` per chip. (The canonical per-layer variables, their
gradients, and the optimizer state stay replicated unless the caller
also shards them over 'pipe'; what this module sharded-izes is compute
and the transient stacked tree built inside the differentiated
function.)

Design (TPU-first):

- The per-layer parameter subtrees (``layer_0 .. layer_{L-1}`` — by
  construction structurally identical) are stacked into one pytree with
  a leading layer dim, sharded ``P('pipe')``: each device materializes
  only its own ``L/P`` layers. The stacking happens *inside* the
  differentiated function, so gradients flow back to the canonical
  per-layer ``variables`` tree with no extra plumbing.
- Inside ``shard_map`` over ``('data', 'pipe')`` the local batch is
  split into ``n_micro`` microbatches and pushed through the classic
  GPipe loop of ``n_micro + P - 1`` ticks, written as one
  ``lax.scan``: each tick every device runs its stage (a ``lax.scan``
  over its local layers), then rotates its activation block to the
  right neighbor with a single ``lax.ppermute`` hop (ICI neighbor
  traffic — the steady state keeps all P stages busy; the (P-1)
  fill/drain ticks are the standard pipeline bubble).
- Stage 0 ingests microbatch ``t`` at tick ``t``; stage P-1 emits
  microbatch ``t-(P-1)``. Emissions are masked into an output buffer
  and combined with one masked ``psum`` after the loop, so every
  device returns the same (replicated-over-'pipe') activations.
- Bubble-tick "garbage" blocks are all-zero: LayerNorm/softmax on
  zeros are finite, real microbatches never mix with them (no
  cross-batch ops inside a layer), and their cotangents are zeroed by
  the emission mask — AD through ``scan`` + ``ppermute`` needs no
  extra code (``ppermute`` transposes to the reverse rotation).
- Dropout draws one base key per LAYER (sharded with the stage) folded
  with the microbatch id riding along in the circulating state, so
  masks are independent across layers and microbatches and
  reproducible from the step key.

Supported configs: any ``TSConformerEncoder`` whose ``num_layers`` is
divisible by the 'pipe' axis. Speaker injection at ``-1`` (before
layer 0) works in every mode; mid-stack injection works for the
parameterless elementwise modes (``prod``/``sum``) via a per-layer
flag applied inside the stage scan. Mid-stack ``cat`` /
``cross_attention`` (whose injection parameters are shared across
injection points) are rejected with a clear error — pipeline stages
cannot share a parameter bank without defeating the layer sharding.

Used by ``__graft_entry__.dryrun_multichip`` (dp x pp train step) and
pinned against the sequential encoder on the virtual CPU mesh
(``tests/test_pp_parallel.py``).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import flax.linen as nn

from tsasr_tpu.models.attention import CrossAttention, rel_pos_encoding
from tsasr_tpu.models.conformer import ConformerEncoderLayer
from tsasr_tpu.ops.dropout import Dropout
from tsasr_tpu.ops.masks import length_to_mask, lookahead_mask


def stack_layer_params(variables, num_layers):
    """Stack ``layer_0 .. layer_{num_layers-1}`` param subtrees into one
    pytree with a leading layer dim (differentiable — jnp.stack)."""
    layers = [variables["params"][f"layer_{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers)


def _check_config(encoder, pp, injection_after):
    if encoder.num_layers % pp != 0:
        raise ValueError(
            f"num_layers ({encoder.num_layers}) must be divisible by "
            f"the 'pipe' axis size ({pp})")
    mid = [i for i in injection_after if i >= 0]
    if mid and encoder.injection_mode in ("cat", "cross_attention"):
        raise ValueError(
            "pipeline parallelism supports mid-stack injection only for "
            "the elementwise modes ('prod'/'sum'); "
            f"injection_mode={encoder.injection_mode!r} shares its "
            f"injection parameters across points {mid} — inject at -1 "
            "instead or use the tensor/sequence-parallel paths")


def pp_encoder_apply(encoder, variables, feats, rel_lengths, mesh,
                     speaker_embs=None, speaker_embs_length=None,
                     deterministic=True, n_micro=None, rngs=None,
                     data_axis="data", pipe_axis="pipe"):
    """Run a ``TSConformerEncoder`` with its layers sharded over
    ``mesh``'s ``pipe_axis`` (GPipe microbatch schedule).

    feats : (B, T, F) or (B, T, F1, F2) global features. The per-data-
        shard batch must be divisible by ``n_micro``.
    rel_lengths : (B,) relative lengths in (0, 1] (or None).
    n_micro : microbatches per data shard; default = pipe axis size
        (the smallest count that keeps the steady state full).
    rngs : optional {'dropout': key}; folded per layer and microbatch.

    Returns (B, T, d_model) encoder output, replicated over 'pipe'.
    """
    if feats.ndim == 4:
        b, t, c1, c2 = feats.shape
        feats = feats.reshape(b, t, c1 * c2)
    B, T, _ = feats.shape
    pp = mesh.shape[pipe_axis]
    if n_micro is None:
        n_micro = pp
    injection_after = tuple(encoder.injection_after) \
        if isinstance(encoder.injection_after, (list, tuple)) \
        else (encoder.injection_after,)
    _check_config(encoder, pp, injection_after)
    L = encoder.num_layers
    dtype = encoder.dtype
    train = not deterministic
    base_key = (rngs or {}).get("dropout")
    if train and base_key is None:
        raise ValueError("training mode needs rngs={'dropout': key}")

    if rel_lengths is not None:
        abs_len = jnp.round(rel_lengths * T).astype(jnp.int32)
        kp_mask = ~length_to_mask(abs_len, T)
    else:
        kp_mask = jnp.zeros((B, T), dtype=bool)
    attn_mask = lookahead_mask(T) if encoder.causal else None
    pos_emb = rel_pos_encoding(T, encoder.d_model, dtype=dtype)

    # --- pre-pipeline (replicated-parameter) ops, applied via subtrees
    params = variables["params"]
    x = nn.Dense(encoder.d_model, dtype=dtype, parent=None).apply(
        {"params": params["input_proj"]}, feats)
    if train and encoder.dropout > 0:
        x = Dropout(encoder.dropout, bits=encoder.dropout_bits,
                    deterministic=False, parent=None).apply(
            {}, x, rngs={"dropout": jax.random.fold_in(base_key, L)})

    mode = encoder.injection_mode
    if -1 in injection_after and speaker_embs is not None:
        if mode == "prod":
            x = x * speaker_embs
        elif mode == "sum":
            x = x + speaker_embs
        elif mode == "cat":
            expanded = jnp.broadcast_to(
                speaker_embs,
                (x.shape[0], x.shape[1], speaker_embs.shape[-1]))
            x = nn.Dense(encoder.d_model, dtype=dtype, parent=None).apply(
                {"params": params["cat_proj"]},
                jnp.concatenate([x, expanded], axis=-1))
        elif mode == "cross_attention":
            kp = None
            if speaker_embs_length is not None:
                S_spk = speaker_embs.shape[1]
                alen = jnp.round(
                    speaker_embs_length * S_spk).astype(jnp.int32)
                kp = ~length_to_mask(alen, S_spk)
            attn = CrossAttention(
                embed_dim=encoder.d_model, num_heads=encoder.nhead,
                dropout=encoder.dropout, dropout_bits=encoder.dropout_bits,
                dtype=dtype, parent=None)
            a_rngs = {"dropout": jax.random.fold_in(base_key, L + 1)} \
                if train else None
            x = attn.apply({"params": params["speaker_attn"]}, x,
                           speaker_embs, key_padding_mask=kp,
                           deterministic=deterministic, rngs=a_rngs)

    # mid-stack elementwise injection rides the stage scan as a flag
    inj_inside = (mode in ("prod", "sum")
                  and speaker_embs is not None
                  and any(i >= 0 for i in injection_after))
    inj_flags = jnp.asarray(
        [i in injection_after for i in range(L)], dtype=bool)

    stacked = stack_layer_params(variables, L)
    # one base key per layer (riding the same 'pipe' sharding as the
    # layer params); eval mode still needs a placeholder for the scan xs
    layer_keys = jax.random.split(
        base_key if train else jax.random.PRNGKey(0), L)

    layer_mod = ConformerEncoderLayer(
        d_model=encoder.d_model, d_ffn=encoder.d_ffn, nhead=encoder.nhead,
        kernel_size=encoder.kernel_size, dropout=encoder.dropout,
        dropout_bits=encoder.dropout_bits, causal=encoder.causal,
        att_context_size=encoder.att_context_size,
        fused_attention=encoder.fused_attention,
        activation=encoder.activation, dtype=dtype, parent=None)

    spk_in = speaker_embs if inj_inside else None

    def f(stacked_loc, keys_loc, flags_loc, x_loc, kpm_loc, spk_loc):
        S = jax.lax.axis_size(pipe_axis)
        idx = jax.lax.axis_index(pipe_axis)
        Bl, T_, d = x_loc.shape
        if Bl % n_micro != 0:
            raise ValueError(
                f"per-shard batch ({Bl}) must be divisible by n_micro "
                f"({n_micro})")
        Bm = Bl // n_micro
        M = n_micro
        xm = x_loc.reshape(M, Bm, T_, d)
        kpm_m = kpm_loc.reshape(M, Bm, T_)
        spk_m = (spk_loc.reshape((M, Bm) + spk_loc.shape[1:])
                 if spk_loc is not None else None)

        def run_layer(carry_x, kpm_u8, mid, per_layer):
            p, key, flag = per_layer
            rngs_l = None
            if train:
                # mask independent per (layer, microbatch), reproducible
                # from the step key
                rngs_l = {"dropout": jax.random.fold_in(key, mid)}
            y, _ = layer_mod.apply(
                {"params": p}, carry_x, pos_emb,
                kpm_u8.astype(bool), attn_mask, deterministic,
                None, False, rngs=rngs_l)
            return y

        def stage(x_mb, kpm_u8, spk_mb, mid):
            body = run_layer
            if encoder.remat:
                # mirror TSConformerEncoder.__call__: 'dots' keeps matmul
                # outputs and recomputes the elementwise tail
                kwargs = {}
                if encoder.remat_policy == "dots":
                    kwargs["policy"] = jax.checkpoint_policies.dots_saveable
                body = jax.checkpoint(run_layer, static_argnums=(),
                                      **kwargs)
            def scan_body(carry_x, per_layer):
                y = body(carry_x, kpm_u8, mid, per_layer)
                if inj_inside:
                    flag = per_layer[2]
                    inj_y = y * spk_mb if mode == "prod" else y + spk_mb
                    y = jnp.where(flag, inj_y, y)
                return y, None
            x_out, _ = jax.lax.scan(
                scan_body, x_mb, (stacked_loc, keys_loc, flags_loc))
            return x_out

        shift = lambda a: jax.lax.ppermute(
            a, pipe_axis, [(i, (i + 1) % S) for i in range(S)])

        state0 = dict(
            x=jnp.zeros((Bm, T_, d), x_loc.dtype),
            kpm=jnp.zeros((Bm, T_), jnp.uint8),
            mid=jnp.zeros((1,), jnp.int32))
        if spk_m is not None:
            state0["spk"] = jnp.zeros(spk_m.shape[1:], spk_m.dtype)
        out0 = jnp.zeros((M, Bm, T_, d), x_loc.dtype)

        def tick(carry, t):
            state, out = carry
            feed_i = jnp.minimum(t, M - 1)
            ingest = (idx == 0) & (t < M)
            pick = lambda a: jax.lax.dynamic_index_in_dim(
                a, feed_i, 0, keepdims=False)
            x_in = jnp.where(ingest, pick(xm), state["x"])
            kpm_in = jnp.where(
                ingest, pick(kpm_m).astype(jnp.uint8), state["kpm"])
            mid_in = jnp.where(
                ingest, feed_i[None].astype(jnp.int32), state["mid"])
            spk_cur = None
            if spk_m is not None:
                spk_cur = jnp.where(ingest, pick(spk_m), state["spk"])
            y = stage(x_in, kpm_in, spk_cur, mid_in[0])
            ot = t - (S - 1)
            emit = (idx == S - 1) & (ot >= 0)
            oi = jnp.clip(ot, 0, M - 1)
            out = jnp.where(
                emit, jax.lax.dynamic_update_index_in_dim(out, y, oi, 0),
                out)
            nxt = dict(x=shift(y), kpm=shift(kpm_in), mid=shift(mid_in))
            if spk_m is not None:
                nxt["spk"] = shift(spk_cur)
            return (nxt, out), None

        (_, out), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(M + S - 1))
        out = jax.lax.psum(
            jnp.where(idx == S - 1, out, jnp.zeros_like(out)), pipe_axis)
        return out.reshape(Bl, T_, d)

    spec_b = P(data_axis)
    in_specs = (jax.tree_util.tree_map(lambda _: P(pipe_axis), stacked),
                P(pipe_axis), P(pipe_axis),
                spec_b, spec_b,
                spec_b if spk_in is not None else None)
    sharded = jax.shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=spec_b,
        check_vma=False)
    x = sharded(stacked, layer_keys, inj_flags, x, kp_mask, spk_in)

    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, parent=None).apply(
        {"params": params["norm"]}, x)
