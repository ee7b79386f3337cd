"""Numerical parity of the JAX WavLM-XVector port vs HF torch.

Instantiates the actual ``transformers.WavLMForXVector`` with small
random-initialized configs, converts the state dict, and pins outputs
(embeddings, logits, frame-level hidden states) with and without
attention masks — the strongest offline proxy for pretrained-checkpoint
parity (no network egress for real weights in this environment).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tsasr_tpu.models.wavlm import (
    WavLMConfig,
    WavLMForXVector,
    convert_hf_xvector_state_dict,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _small_hf_config(**overrides):
    kwargs = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=48,
        conv_dim=[8, 8],
        conv_kernel=[4, 3],
        conv_stride=[2, 2],
        num_feat_extract_layers=2,
        conv_bias=False,
        feat_extract_norm="group",
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_buckets=20,
        max_bucket_distance=40,
        do_stable_layer_norm=False,
        use_weighted_layer_sum=True,
        tdnn_dim=[16, 16, 24],
        tdnn_kernel=[3, 3, 1],
        tdnn_dilation=[1, 2, 1],
        xvector_output_dim=12,
        mask_time_prob=0.0,
        mask_feature_prob=0.0,
        layerdrop=0.0,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
    )
    kwargs.update(overrides)
    return transformers.WavLMConfig(**kwargs)


def _build_pair(seed=0, **overrides):
    torch.manual_seed(seed)
    hf_cfg = _small_hf_config(**overrides)
    hf_model = transformers.WavLMForXVector(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    cfg = WavLMConfig.from_hf_dict(hf_cfg.to_dict())
    variables = convert_hf_xvector_state_dict(sd, cfg)
    return hf_model, WavLMForXVector(cfg), variables


@pytest.mark.parametrize("overrides", [
    {},  # base-plus-sv shape: group norm, post-norm, weighted layer sum
    {"do_stable_layer_norm": True, "feat_extract_norm": "layer",
     "conv_bias": True},
    {"use_weighted_layer_sum": False},
])
def test_xvector_parity_unmasked(overrides):
    hf_model, jx_model, variables = _build_pair(**overrides)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.1, size=(2, 640)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(input_values=torch.from_numpy(x),
                       output_hidden_states=True)
    out = jx_model.apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out["embeddings"]),
                               ref.embeddings.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               ref.logits.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][-1]),
        ref.hidden_states[-1].numpy(), atol=2e-5)
    assert len(out["hidden_states"]) == len(ref.hidden_states)


def test_xvector_parity_masked():
    hf_model, jx_model, variables = _build_pair(seed=3)
    rng = np.random.default_rng(2)
    B, L = 3, 700
    x = rng.normal(0, 0.1, size=(B, L)).astype(np.float32)
    lengths = np.array([700, 512, 300], np.int64)
    x[1, 512:] = 0.0
    x[2, 300:] = 0.0
    attn_mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.int64)

    with torch.no_grad():
        ref = hf_model(input_values=torch.from_numpy(x),
                       attention_mask=torch.from_numpy(attn_mask),
                       output_hidden_states=True)
    out = jx_model.apply(variables, jnp.asarray(x), jnp.asarray(lengths))

    np.testing.assert_allclose(np.asarray(out["embeddings"]),
                               ref.embeddings.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][-1]),
        ref.hidden_states[-1].numpy(), atol=2e-5)


def test_bucket_lengths_match_hf():
    hf_model, _, _ = _build_pair()
    cfg = WavLMConfig.from_hf_dict(hf_model.config.to_dict())
    for L in (320, 321, 400, 777):
        ref = int(hf_model._get_feat_extract_output_lengths(L))
        assert cfg.feat_extract_output_length(L) == ref
        ref_t = int(hf_model._get_tdnn_output_lengths(ref))
        assert cfg.tdnn_output_length(ref) == ref_t


def test_jax_speaker_encoder_embed_in_jit(tmp_path):
    """Recipe glue: JaxSpeakerEncoder loads a local HF checkpoint dir and
    embeds under jit (pooled and frame-level modes) — the fast cover for
    the gated end-to-end experiment."""
    import jax

    from tsasr_tpu.recipes.speaker_embeddings import JaxSpeakerEncoder

    ckpt = tmp_path / "wavlm_tiny"
    transformers.WavLMForXVector(_small_hf_config()).save_pretrained(
        str(ckpt))

    enc = JaxSpeakerEncoder(str(ckpt), embedding_dim=12)
    wav = jnp.zeros((2, 640))
    rel = jnp.asarray([1.0, 0.5])
    embs = jax.jit(enc.embed)(wav, rel)
    assert embs.shape == (2, 1, 12)

    frame_enc = JaxSpeakerEncoder(str(ckpt), frame_level=True,
                                  embedding_dim=8)
    frames = jax.jit(frame_enc.embed)(wav, rel)
    assert frames.ndim == 3 and frames.shape[-1] == 8

    with pytest.raises(FileNotFoundError):
        JaxSpeakerEncoder(str(tmp_path / "missing"))
