"""Generic SSL encoder lobe: loading base + xvector HF checkpoints,
frame-feature parity vs HF torch, freeze semantics.

Reference counterpart: lobes/models/huggingface_wav2vec.py (the
frame-feature SSL front-end capability).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tsasr_tpu.models.ssl import SSLEncoder, load_pretrained_base  # noqa


def small_cfg(**overrides):
    kwargs = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, conv_dim=[8, 8], conv_kernel=[4, 3],
        conv_stride=[2, 2], num_feat_extract_layers=2, conv_bias=False,
        feat_extract_norm="group", num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, num_buckets=20,
        max_bucket_distance=40, do_stable_layer_norm=False,
        use_weighted_layer_sum=False, tdnn_dim=[16, 16, 24],
        tdnn_kernel=[3, 3, 1], tdnn_dilation=[1, 2, 1],
        xvector_output_dim=12, mask_time_prob=0.0,
        mask_feature_prob=0.0, layerdrop=0.0, hidden_dropout=0.0,
        activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0)
    kwargs.update(overrides)
    return transformers.WavLMConfig(**kwargs)


class TestSSLEncoder:
    def test_base_checkpoint_frame_parity(self, tmp_path):
        """Base WavLMModel checkpoint -> SSLEncoder frame features match
        HF torch hidden states."""
        torch.manual_seed(0)
        hf = transformers.WavLMModel(small_cfg())
        ckpt = str(tmp_path / "base")
        hf.save_pretrained(ckpt)

        enc = SSLEncoder(source=ckpt)
        x = np.random.default_rng(0).normal(size=(2, 640)).astype(
            np.float32)
        got = np.asarray(enc(x))
        with torch.no_grad():
            ref = hf(input_values=torch.from_numpy(x)
                     ).last_hidden_state.numpy()
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_xvector_checkpoint_base_subtree(self, tmp_path):
        """XVector checkpoints load too (base subtree extracted)."""
        torch.manual_seed(1)
        hf = transformers.WavLMForXVector(small_cfg(
            use_weighted_layer_sum=True))
        ckpt = str(tmp_path / "xvec")
        hf.save_pretrained(ckpt)
        enc = SSLEncoder(source=ckpt)
        out = enc(np.zeros((1, 640), np.float32))
        assert out.shape[-1] == 32

    def test_output_norm_and_lengths(self, tmp_path):
        torch.manual_seed(2)
        hf = transformers.WavLMModel(small_cfg())
        ckpt = str(tmp_path / "base2")
        hf.save_pretrained(ckpt)
        enc = SSLEncoder(source=ckpt, output_norm=True)
        x = np.random.default_rng(1).normal(size=(2, 640)).astype(
            np.float32)
        out = np.asarray(enc(x, rel_lens=np.asarray([1.0, 0.5])))
        # per-frame normalized
        np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-4)
        np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-2)
        assert int(enc.output_lengths(640)) == out.shape[1]
