"""Sequence parallelism: shard the encoder's TIME axis across devices.

The reference scales only by data parallelism (``core.py:1464-1490``);
its documented long-utterance ceiling is a single GPU's activation
memory (SURVEY hard-part 1). Here a third mesh axis ``'seq'`` shards the
Conformer encoder's frame dimension so the (B, T, d_ffn) activations —
the dominant HBM term for long-form audio — scale with the number of
chips: T frames over S devices is T/S frames per chip.

Design (TPU-first, halo exchange instead of all-gather):

- Applies to *causal banded* encoders (``causal=True`` and
  ``att_context_size > 0`` — the long-form/streaming configuration).
  Every operator then has a FINITE left receptive field per layer:
  ``att_context_size - 1`` frames for attention plus ``kernel_size - 1``
  for the depthwise conv; FFN/LayerNorm/injection are positionwise.
- Each device holds a contiguous block of frames. Before EVERY encoder
  layer, each device fetches the last ``halo`` frames of its LEFT
  neighbor's current activations with one ``lax.ppermute`` hop over the
  ``'seq'`` axis (ICI neighbor traffic, no all-gather), prepends them,
  runs the unmodified :class:`ConformerEncoderLayer` on the extended
  block, and drops the halo rows. With ``halo >= att_context_size +
  kernel_size - 2`` the kept rows are bit-exact equal to the unsharded
  computation (pinned by ``tests/test_seq_parallel.py``); the halo rows
  are recomputed scratch work, the price of avoiding a second hop.
- Device 0's halo arrives as ``ppermute`` zeros and is masked off via
  the global-position padding mask, which also encodes per-utterance
  lengths (positions ``< 0`` or ``>= abs_len`` are padding).
- The gradient path needs no extra code: ``ppermute`` transposes to the
  reverse permutation under AD, so backward halo traffic is the mirror
  image of forward.

The returned activations stay sharded ``P('data', 'seq')``; downstream
(joint/loss over (B, T/4, J)) is orders of magnitude smaller than the
intra-encoder activations, so the caller lets XLA re-gather it freely.

Used by ``__graft_entry__.dryrun_multichip`` (dp x sp x tp train step)
and testable on the virtual CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import flax.linen as nn

from tsasr_tpu.models.attention import rel_pos_encoding
from tsasr_tpu.models.conformer import (ConformerEncoderLayer,
                                        TSConformerEncoder)
from tsasr_tpu.ops.dropout import Dropout
from tsasr_tpu.ops.masks import lookahead_mask

xavier_normal = nn.initializers.xavier_normal


def required_halo(att_context_size, kernel_size):
    """Frames of left context one layer consumes: attention reaches
    ``att_context_size - 1`` keys back, the causal depthwise conv another
    ``kernel_size - 1``."""
    return att_context_size - 1 + kernel_size - 1


def _fetch_left_halo(x, halo, axis_name):
    """Last ``halo`` frames of the left neighbor's block (zeros on the
    first device — masked by the caller via global positions)."""
    n = jax.lax.axis_size(axis_name)
    tail = x[:, -halo:]
    perm = [(i, i + 1) for i in range(n - 1)]
    return jax.lax.ppermute(tail, axis_name, perm)


class SPConformerEncoder(TSConformerEncoder):
    """Shard-local twin of ``TSConformerEncoder``: same attributes, same
    parameter names (input_proj / layer_<i> / norm / cat_proj /
    speaker_attn — one variables pytree drives both), but ``__call__``
    processes ONE contiguous frame block and fetches a left halo from
    the neighbor shard before every layer. Only meaningful INSIDE
    ``shard_map`` over the ``'seq'`` mesh axis; use
    :func:`sp_encoder_apply` from the outside.
    """

    @nn.compact
    def __call__(self, src, abs_len, speaker_embs=None,
                 speaker_embs_length=None, deterministic=True,
                 halo=None, axis_name="seq"):
        """src: (B, T_local, F) frame block; abs_len: (B,) GLOBAL valid
        lengths. ``halo`` defaults to
        ``required_halo(att_context_size, kernel_size)`` — smaller
        values break exactness, larger waste compute; must be
        ``<= T_local`` (one neighbor hop)."""
        return _sp_forward(self, src, abs_len, speaker_embs,
                           speaker_embs_length, deterministic, halo,
                           axis_name)


def sp_twin(encoder):
    """The :class:`SPConformerEncoder` sharing ``encoder``'s config."""
    fields = {f.name: getattr(encoder, f.name)
              for f in dataclasses.fields(encoder)
              if f.name not in ("name", "parent")}
    # parent=None detaches the twin from any enclosing module context
    # (sp_encoder_apply may be called from inside a bound method, e.g.
    # TSTransducer.encode_seq_parallel)
    return SPConformerEncoder(**fields, parent=None)


def _sp_forward(self, src, abs_len, speaker_embs, speaker_embs_length,
                deterministic, halo, axis_name):
    if not (self.causal and self.att_context_size > 0):
        raise ValueError(
            "sequence parallelism needs a causal encoder with bounded "
            "attention context (causal=True, att_context_size > 0); "
            f"got causal={self.causal}, "
            f"att_context_size={self.att_context_size}. This is a "
            "documented scope decision (PARITY.md 'beyond parity': "
            "non-causal full attention would need per-layer all-gathered "
            "K/V — every activation over ICI every layer, which loses to "
            "data parallelism + remat at the flagship's sequence "
            "lengths). Use a causal banded config for the 'seq' axis, "
            "or dp/tp/pp for offline full-attention models.")
    if halo is None:
        halo = required_halo(self.att_context_size, self.kernel_size)
    if src.ndim == 4:
        b, t, c1, c2 = src.shape
        src = src.reshape(b, t, c1 * c2)
    B, T_loc, _ = src.shape
    if halo > T_loc:
        raise ValueError(
            f"halo ({halo}) exceeds the per-device block ({T_loc} "
            "frames): use fewer 'seq' shards or a smaller "
            "att_context_size")

    idx = jax.lax.axis_index(axis_name)
    offset = idx * T_loc                       # global frame of row 0
    T_ext = halo + T_loc
    # global positions of the extended block; <0 = before stream start
    pos = offset - halo + jnp.arange(T_ext)
    kp_mask_ext = (pos[None, :] < 0) | (pos[None, :] >= abs_len[:, None])
    attn_mask_ext = lookahead_mask(T_ext)
    pos_emb = rel_pos_encoding(T_ext, self.d_model, dtype=self.dtype)

    x = nn.Dense(self.d_model, kernel_init=xavier_normal(),
                 dtype=self.dtype, name="input_proj")(src)
    x = Dropout(self.dropout, bits=self.dropout_bits,
                deterministic=deterministic)(x)

    inject = self._make_injector(speaker_embs, speaker_embs_length)
    injection_after = tuple(self.injection_after) \
        if isinstance(self.injection_after, (list, tuple)) \
        else (self.injection_after,)
    if -1 in injection_after and speaker_embs is not None:
        x = inject(x, deterministic)

    layer_cls = ConformerEncoderLayer
    if self.remat:
        kwargs = {}
        if self.remat_policy == "dots":
            kwargs["policy"] = jax.checkpoint_policies.dots_saveable
        layer_cls = nn.remat(ConformerEncoderLayer,
                             static_argnums=(5, 6, 7), **kwargs)

    for i in range(self.num_layers):
        left = _fetch_left_halo(x, halo, axis_name)
        x_ext = jnp.concatenate([left, x], axis=1)
        layer = layer_cls(
            d_model=self.d_model, d_ffn=self.d_ffn, nhead=self.nhead,
            kernel_size=self.kernel_size, dropout=self.dropout,
            dropout_bits=self.dropout_bits, causal=self.causal,
            att_context_size=self.att_context_size,
            activation=self.activation,
            dtype=self.dtype, name=f"layer_{i}")
        # mask_conv_input=True: masked halo rows must equal the offline
        # zero left-pad at the depthwise conv's input (device 0's pos<0
        # rows are scratch — fully-masked attention queries)
        x_ext, _ = layer(x_ext, pos_emb, kp_mask_ext, attn_mask_ext,
                         deterministic, None, True)
        x = x_ext[:, halo:]
        if i in injection_after and speaker_embs is not None:
            x = inject(x, deterministic)

    return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


def sp_encoder_apply(encoder, variables, feats, rel_lengths, mesh,
                     speaker_embs=None, speaker_embs_length=None,
                     deterministic=True, halo=None, rngs=None,
                     data_axis="data", seq_axis="seq"):
    """Run a causal banded ``TSConformerEncoder`` with its time axis
    sharded over ``mesh``'s ``seq_axis``.

    feats : (B, T, F) or (B, T, F1, F2) global features (any input
        sharding; constrained to P(data, seq) here). T must divide the
        'seq' axis size.
    rel_lengths : (B,) relative lengths in (0, 1] (GLOBAL).
    rngs : optional {'dropout': key}; the key is folded per seq shard so
        time blocks draw independent masks.

    Returns (B, T, d_model) encoder output sharded P(data, seq).
    """
    if feats.ndim == 4:
        b, t, c1, c2 = feats.shape
        feats = feats.reshape(b, t, c1 * c2)
    B, T, F = feats.shape
    sp = mesh.shape[seq_axis]
    if T % sp != 0:
        raise ValueError(f"T ({T}) must divide the seq axis ({sp})")
    abs_len = jnp.round(rel_lengths * T).astype(jnp.int32)

    feats = jax.lax.with_sharding_constraint(
        feats, NamedSharding(mesh, P(data_axis, seq_axis, None)))

    spec_feats = P(data_axis, seq_axis, None)
    spec_b = P(data_axis)
    spec_spk = P(data_axis, None, None) if speaker_embs is not None else None
    spec_params = jax.tree_util.tree_map(lambda _: P(), variables)

    twin = sp_twin(encoder)

    def f(params, x_loc, abs_len_loc, spk):
        idx = jax.lax.axis_index(seq_axis)
        local_rngs = None
        if rngs is not None:
            local_rngs = {k: jax.random.fold_in(v, idx)
                          for k, v in rngs.items()}
        return twin.apply(
            params, x_loc, abs_len_loc, spk, speaker_embs_length,
            deterministic=deterministic, halo=halo, axis_name=seq_axis,
            rngs=local_rngs)

    in_specs = (spec_params, spec_feats, spec_b, spec_spk)
    sharded = jax.shard_map(
        f, mesh=mesh, in_specs=in_specs,
        out_specs=P(data_axis, seq_axis, None), check_vma=False)
    return sharded(variables, feats, abs_len, speaker_embs)
