"""JAX/flax WavLM + XVector speaker encoder (full-parity pretrained path).

The reference loads HF ``AutoModelForAudioXVector`` (WavLM-base-plus-sv)
as the frozen speaker encoder
(``/root/reference/train_librispeechmix_pretrained.py:45-63,557-562``).
This is a faithful JAX port of the HF ``WavLMForXVector`` architecture so
the ``pretrained`` variant runs entirely on device with no torch import:

- conv feature encoder (group-norm or layer-norm variants), GELU
- feature projection (LayerNorm -> Linear)
- weight-normed grouped positional conv embedding (SamePad trim)
- transformer encoder with WavLM's *gated relative position bias*
  attention (T5-style log buckets + a query-conditioned gate), post-norm
  and stable (pre-norm) layer variants
- XVector head: projector -> dilated TDNN stack -> statistics pooling
  (mask-aware, Bessel-corrected std) -> embedding Linear -> classifier

``convert_hf_xvector_state_dict`` maps an HF ``WavLMForXVector``
state_dict (numpy arrays) onto this module's params; weight-normed convs
are folded to their effective weights (the encoder is frozen, so the
reparameterization is irrelevant). Numerical parity vs the torch
implementation is pinned in ``tests/test_wavlm.py``.

All sizes are static; everything is jit-safe. The whole forward runs in
bf16/f32 matmuls on the MXU — padding is handled by key-padding masks
and mask-aware pooling instead of dynamic shapes.
"""

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    """The HF WavLMConfig fields this port consumes (same defaults as
    microsoft/wavlm-base-plus-sv)."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"        # "group" | "layer"
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    do_stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5
    use_weighted_layer_sum: bool = True
    tdnn_dim: Sequence[int] = (512, 512, 512, 512, 1500)
    tdnn_kernel: Sequence[int] = (5, 3, 3, 1, 1)
    tdnn_dilation: Sequence[int] = (1, 2, 3, 1, 1)
    xvector_output_dim: int = 512

    @classmethod
    def from_hf_dict(cls, d):
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: (tuple(v) if isinstance(v, list) else v)
                  for k, v in d.items() if k in fields}
        return cls(**kwargs)

    def feat_extract_output_length(self, input_length):
        for k, s in zip(self.conv_kernel, self.conv_stride):
            input_length = (input_length - k) // s + 1
        return input_length

    def tdnn_output_length(self, input_length):
        for k in self.tdnn_kernel:
            input_length = input_length - k + 1
        return input_length


class WavLMFeatureEncoder(nn.Module):
    """Raw waveform -> conv features (HF WavLMFeatureEncoder)."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = x[:, :, None]  # (B, L, 1), NWC
        for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel,
                                            cfg.conv_stride)):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=cfg.conv_bias, name=f"conv_{i}")(h)
            if cfg.feat_extract_norm == "group" and i == 0:
                # torch GroupNorm(C, C): per-channel norm over time
                h = nn.GroupNorm(num_groups=dim, epsilon=1e-5,
                                 name="group_norm")(h)
            elif cfg.feat_extract_norm == "layer":
                h = nn.LayerNorm(epsilon=1e-5, name=f"layer_norm_{i}")(h)
            h = jax.nn.gelu(h, approximate=False)
        return h  # (B, T, conv_dim[-1])


class WavLMPositionalConvEmbedding(nn.Module):
    config: WavLMConfig

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        out = nn.Conv(cfg.hidden_size, (k,), padding=[(k // 2, k // 2)],
                      feature_group_count=cfg.num_conv_pos_embedding_groups,
                      name="conv")(h)
        if k % 2 == 0:
            out = out[:, :-1]  # WavLMSamePadLayer
        return jax.nn.gelu(out, approximate=False)


def _relative_positions_bucket(relative_positions, num_buckets,
                               max_distance):
    """HF WavLMAttention._relative_positions_bucket, vectorized."""
    num_buckets = num_buckets // 2
    relative_buckets = (relative_positions > 0).astype(jnp.int32) \
        * num_buckets
    relative_positions = jnp.abs(relative_positions)
    max_exact = num_buckets // 2
    is_small = relative_positions < max_exact
    rel_large = jnp.log(relative_positions.astype(jnp.float32)
                        / max_exact + 1e-20)
    rel_large = rel_large / math.log(max_distance / max_exact)
    rel_large = rel_large * (num_buckets - max_exact)
    rel_large = (max_exact + rel_large).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, num_buckets - 1)
    return relative_buckets + jnp.where(is_small, relative_positions,
                                        rel_large)


class WavLMAttention(nn.Module):
    """WavLM self-attention with gated relative position bias."""

    config: WavLMConfig
    has_relative_position_bias: bool = False

    @nn.compact
    def __call__(self, h, key_mask=None, position_bias=None):
        cfg = self.config
        E, H = cfg.hidden_size, cfg.num_attention_heads
        D = E // H
        B, T, _ = h.shape

        if position_bias is None:
            if not self.has_relative_position_bias:
                raise ValueError("first layer must compute position_bias")
            rel_embed = self.param(
                "rel_attn_embed", nn.initializers.normal(0.02),
                (cfg.num_buckets, H))
            pos = jnp.arange(T)
            rel = pos[None, :] - pos[:, None]
            buckets = _relative_positions_bucket(
                rel, cfg.num_buckets, cfg.max_bucket_distance)
            position_bias = rel_embed[buckets]            # (T, T, H)
            position_bias = position_bias.transpose(2, 0, 1)  # (H, T, T)

        q = nn.Dense(E, name="q_proj")(h)
        k = nn.Dense(E, name="k_proj")(h)
        v = nn.Dense(E, name="v_proj")(h)

        # gate from the *raw* hidden states reshaped per head (HF quirk:
        # modeling_wavlm.py:167-179)
        gated = h.reshape(B, T, H, D).transpose(0, 2, 1, 3)  # (B,H,T,D)
        proj = nn.Dense(8, name="gru_rel_pos_linear")(gated)
        proj = proj.reshape(B, H, T, 2, 4).sum(-1)           # (B,H,T,2)
        gates = jax.nn.sigmoid(proj)
        gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]    # (B,H,T,1)
        const = self.param("gru_rel_pos_const",
                           nn.initializers.ones, (1, H, 1, 1))
        gate_out = gate_a * (gate_b * const - 1.0) + 2.0     # (B,H,T,1)
        gated_bias = gate_out * position_bias[None]          # (B,H,T,T)

        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(D)
        scores = scores + gated_bias
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :], scores,
                               jnp.finfo(scores.dtype).min)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)
        out = nn.Dense(E, name="out_proj")(out)
        return out, position_bias


class WavLMFeedForward(nn.Module):
    config: WavLMConfig

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        h = nn.Dense(cfg.intermediate_size, name="intermediate_dense")(h)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(cfg.hidden_size, name="output_dense")(h)


class WavLMEncoderLayer(nn.Module):
    """Post-norm layer (do_stable_layer_norm=False, the -sv models)."""

    config: WavLMConfig
    has_relative_position_bias: bool = False

    @nn.compact
    def __call__(self, h, key_mask=None, position_bias=None):
        cfg = self.config
        attn_out, position_bias = WavLMAttention(
            cfg, self.has_relative_position_bias, name="attention")(
                h, key_mask, position_bias)
        h = h + attn_out
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(h)
        h = h + WavLMFeedForward(cfg, name="feed_forward")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="final_layer_norm")(h)
        return h, position_bias


class WavLMEncoderLayerStableLayerNorm(nn.Module):
    """Pre-norm layer (do_stable_layer_norm=True, the -large models)."""

    config: WavLMConfig
    has_relative_position_bias: bool = False

    @nn.compact
    def __call__(self, h, key_mask=None, position_bias=None):
        cfg = self.config
        normed = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                              name="layer_norm")(h)
        attn_out, position_bias = WavLMAttention(
            cfg, self.has_relative_position_bias, name="attention")(
                normed, key_mask, position_bias)
        h = h + attn_out
        h = h + WavLMFeedForward(cfg, name="feed_forward")(
            nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="final_layer_norm")(h))
        return h, position_bias


class WavLMEncoder(nn.Module):
    config: WavLMConfig

    @nn.compact
    def __call__(self, h, key_mask=None):
        cfg = self.config
        if key_mask is not None:
            h = jnp.where(key_mask[:, :, None], h, 0.0)
        h = h + WavLMPositionalConvEmbedding(cfg, name="pos_conv_embed")(h)
        if not cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name="layer_norm")(h)
        layer_cls = (WavLMEncoderLayerStableLayerNorm
                     if cfg.do_stable_layer_norm else WavLMEncoderLayer)
        hidden_states = [h]
        position_bias = None
        for i in range(cfg.num_hidden_layers):
            h, position_bias = layer_cls(
                cfg, has_relative_position_bias=(i == 0),
                name=f"layers_{i}")(h, key_mask, position_bias)
            hidden_states.append(h)
        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name="layer_norm")(h)
            hidden_states[-1] = h
        return h, hidden_states


class WavLMModel(nn.Module):
    config: WavLMConfig

    @nn.compact
    def __call__(self, input_values, feat_mask=None):
        cfg = self.config
        feats = WavLMFeatureEncoder(cfg, name="feature_extractor")(
            input_values)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="fp_layer_norm")(feats)
        h = nn.Dense(cfg.hidden_size, name="fp_projection")(h)
        return WavLMEncoder(cfg, name="encoder")(h, feat_mask)


class WavLMForXVector(nn.Module):
    """HF WavLMForXVector parity port (modeling_wavlm.py:1554-1692).

    ``__call__(input_values, lengths=None)`` -> dict with
    ``embeddings`` (B, xvector_output_dim), ``logits``,
    ``last_hidden_state`` (B, T, hidden) and ``hidden_states`` (list,
    len num_layers+1) — the recipe consumes ``embeddings`` for prod/sum/
    cat injection and ``hidden_states[-1]`` for cross_attention
    (train_librispeechmix_pretrained.py:58-63).
    """

    config: WavLMConfig

    @nn.compact
    def __call__(self, input_values, lengths=None):
        cfg = self.config
        B, L = input_values.shape
        T = cfg.feat_extract_output_length(L)
        feat_mask = None
        feat_lengths = None
        if lengths is not None:
            feat_lengths = cfg.feat_extract_output_length(lengths)
            feat_mask = jnp.arange(T)[None, :] < feat_lengths[:, None]

        last, hidden_states = WavLMModel(cfg, name="wavlm")(
            input_values, feat_mask)

        if cfg.use_weighted_layer_sum:
            weights = self.param(
                "layer_weights",
                lambda _k, n: jnp.full((n,), 1.0 / n),
                cfg.num_hidden_layers + 1)
            norm_w = jax.nn.softmax(weights)
            h = sum(w * s for w, s in zip(norm_w, hidden_states))
        else:
            h = last

        h = nn.Dense(cfg.tdnn_dim[0], name="projector")(h)
        for i, (dim, k, dil) in enumerate(zip(
                cfg.tdnn_dim, cfg.tdnn_kernel, cfg.tdnn_dilation)):
            # HF stores the TDNN kernel as a Linear over (in*k); run it
            # as a dilated VALID conv (modeling_wavlm.py:1539-1543)
            h = nn.Conv(dim, (k,), padding="VALID", kernel_dilation=(dil,),
                        name=f"tdnn_{i}")(h)
            h = jax.nn.relu(h)

        if lengths is None:
            mean = h.mean(axis=1)
            var = h.var(axis=1, ddof=1)
        else:
            tdnn_len = cfg.tdnn_output_length(feat_lengths)  # (B,)
            t_mask = (jnp.arange(h.shape[1])[None, :]
                      < tdnn_len[:, None])[..., None]
            cnt = jnp.maximum(tdnn_len, 1).astype(h.dtype)[:, None]
            mean = jnp.sum(h * t_mask, axis=1) / cnt
            var = jnp.sum(jnp.square(h - mean[:, None]) * t_mask, axis=1) \
                / jnp.maximum(cnt - 1.0, 1.0)
        std = jnp.sqrt(var)
        stats = jnp.concatenate([mean, std], axis=-1)

        embeddings = nn.Dense(cfg.xvector_output_dim,
                              name="feature_extractor")(stats)
        logits = nn.Dense(cfg.xvector_output_dim, name="classifier")(
            embeddings)
        return {
            "embeddings": embeddings,
            "logits": logits,
            "last_hidden_state": last,
            "hidden_states": hidden_states,
        }


# ===================================================== weight conversion

def _t(w):
    return np.asarray(w).T


def _conv_w(w):
    # torch (out, in, k) -> flax (k, in, out)
    return np.asarray(w).transpose(2, 1, 0)


def _weight_norm_effective(g, v):
    """Fold torch weight_norm(dim=2): w = g * v / ||v||_(dims 0,1)."""
    v = np.asarray(v, np.float64)
    g = np.asarray(g, np.float64)
    norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    return (g * v / norm).astype(np.float32)


def convert_hf_xvector_state_dict(state_dict, config):
    """HF WavLMForXVector state_dict (name -> numpy array) -> flax params
    for :class:`WavLMForXVector`."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p = {}

    def put(path, value):
        node = p
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)

    # feature encoder
    for i in range(len(config.conv_dim)):
        base = f"wavlm.feature_extractor.conv_layers.{i}"
        put(f"wavlm/feature_extractor/conv_{i}/kernel",
            _conv_w(sd[f"{base}.conv.weight"]))
        if f"{base}.conv.bias" in sd:
            put(f"wavlm/feature_extractor/conv_{i}/bias",
                sd[f"{base}.conv.bias"])
        if config.feat_extract_norm == "group" and i == 0:
            put("wavlm/feature_extractor/group_norm/scale",
                sd[f"{base}.layer_norm.weight"])
            put("wavlm/feature_extractor/group_norm/bias",
                sd[f"{base}.layer_norm.bias"])
        elif config.feat_extract_norm == "layer":
            put(f"wavlm/feature_extractor/layer_norm_{i}/scale",
                sd[f"{base}.layer_norm.weight"])
            put(f"wavlm/feature_extractor/layer_norm_{i}/bias",
                sd[f"{base}.layer_norm.bias"])

    # feature projection
    put("wavlm/fp_layer_norm/scale",
        sd["wavlm.feature_projection.layer_norm.weight"])
    put("wavlm/fp_layer_norm/bias",
        sd["wavlm.feature_projection.layer_norm.bias"])
    put("wavlm/fp_projection/kernel",
        _t(sd["wavlm.feature_projection.projection.weight"]))
    put("wavlm/fp_projection/bias",
        sd["wavlm.feature_projection.projection.bias"])

    # positional conv (weight-normed)
    pc = "wavlm.encoder.pos_conv_embed.conv"
    if f"{pc}.parametrizations.weight.original0" in sd:
        g = sd[f"{pc}.parametrizations.weight.original0"]
        v = sd[f"{pc}.parametrizations.weight.original1"]
    else:
        g, v = sd[f"{pc}.weight_g"], sd[f"{pc}.weight_v"]
    put("wavlm/encoder/pos_conv_embed/conv/kernel",
        _conv_w(_weight_norm_effective(g, v)))
    put("wavlm/encoder/pos_conv_embed/conv/bias", sd[f"{pc}.bias"])

    put("wavlm/encoder/layer_norm/scale",
        sd["wavlm.encoder.layer_norm.weight"])
    put("wavlm/encoder/layer_norm/bias",
        sd["wavlm.encoder.layer_norm.bias"])

    for i in range(config.num_hidden_layers):
        src = f"wavlm.encoder.layers.{i}"
        dst = f"wavlm/encoder/layers_{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(f"{dst}/attention/{proj}/kernel",
                _t(sd[f"{src}.attention.{proj}.weight"]))
            put(f"{dst}/attention/{proj}/bias",
                sd[f"{src}.attention.{proj}.bias"])
        put(f"{dst}/attention/gru_rel_pos_linear/kernel",
            _t(sd[f"{src}.attention.gru_rel_pos_linear.weight"]))
        put(f"{dst}/attention/gru_rel_pos_linear/bias",
            sd[f"{src}.attention.gru_rel_pos_linear.bias"])
        put(f"{dst}/attention/gru_rel_pos_const",
            sd[f"{src}.attention.gru_rel_pos_const"])
        if i == 0:
            put(f"{dst}/attention/rel_attn_embed",
                sd[f"{src}.attention.rel_attn_embed.weight"])
        for norm in ("layer_norm", "final_layer_norm"):
            put(f"{dst}/{norm}/scale", sd[f"{src}.{norm}.weight"])
            put(f"{dst}/{norm}/bias", sd[f"{src}.{norm}.bias"])
        for dense in ("intermediate_dense", "output_dense"):
            put(f"{dst}/feed_forward/{dense}/kernel",
                _t(sd[f"{src}.feed_forward.{dense}.weight"]))
            put(f"{dst}/feed_forward/{dense}/bias",
                sd[f"{src}.feed_forward.{dense}.bias"])

    # xvector head
    if config.use_weighted_layer_sum:
        put("layer_weights", sd["layer_weights"])
    put("projector/kernel", _t(sd["projector.weight"]))
    put("projector/bias", sd["projector.bias"])
    for i, (k, dim) in enumerate(zip(config.tdnn_kernel, config.tdnn_dim)):
        in_dim = config.tdnn_dim[i - 1] if i > 0 else config.tdnn_dim[0]
        w = sd[f"tdnn.{i}.kernel.weight"]  # (out, in*k)
        w = w.reshape(dim, k, in_dim)      # HF: view(out, k, in)
        put(f"tdnn_{i}/kernel", w.transpose(1, 2, 0))  # (k, in, out)
        put(f"tdnn_{i}/bias", sd[f"tdnn.{i}.kernel.bias"])
    put("feature_extractor/kernel", _t(sd["feature_extractor.weight"]))
    put("feature_extractor/bias", sd["feature_extractor.bias"])
    put("classifier/kernel", _t(sd["classifier.weight"]))
    put("classifier/bias", sd["classifier.bias"])
    return {"params": p}


def load_pretrained_xvector(model_path):
    """Load an HF WavLMForXVector checkpoint directory -> (config,
    variables) for the flax module. Reads config.json +
    model.safetensors (preferred, no torch needed) or pytorch_model.bin.
    """
    import json
    import os

    with open(os.path.join(model_path, "config.json")) as f:
        config = WavLMConfig.from_hf_dict(json.load(f))
    st_path = os.path.join(model_path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file
        sd = load_file(st_path)
    else:
        import torch
        sd = {k: v.numpy() for k, v in
              torch.load(os.path.join(model_path, "pytorch_model.bin"),
                         map_location="cpu", weights_only=True).items()}
    return config, convert_hf_xvector_state_dict(sd, config)
