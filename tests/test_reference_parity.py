"""Direct numerical parity against the REFERENCE implementation.

These tests import the actual vendored SpeechBrain feature/module code
from /root/reference (read-only; torchaudio/hyperpyyaml/... stubbed — the
feature math itself is pure torch) and compare our JAX ops against it on
identical inputs. This is the ground truth for the WER-parity claims:
the frontend and module math must agree numerically.

Skipped automatically when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference/vendor/speechbrain"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def sb():
    """Import the reference speechbrain with unavailable deps stubbed."""

    def stub(name, attrs=()):
        mod = types.ModuleType(name)
        for attr in attrs:
            setattr(mod, attr, lambda *a, **k: None)
        sys.modules.setdefault(name, mod)
        return sys.modules[name]

    stub("torchaudio", ["load"])
    stub("torchaudio.functional")
    stub("torchaudio.transforms")
    stub("hyperpyyaml", ["load_hyperpyyaml", "resolve_references",
                         "dump_hyperpyyaml"])
    stub("sentencepiece", ["SentencePieceProcessor",
                           "SentencePieceTrainer"])
    ruamel = stub("ruamel")
    ruamel.yaml = stub("ruamel.yaml", ["YAML"])
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import speechbrain
    return speechbrain


@pytest.fixture(scope="module")
def torch():
    import torch
    torch.manual_seed(0)
    return torch


class TestFeatureParity:
    def test_stft(self, sb, torch, rng):
        from speechbrain.processing.features import STFT
        x = rng.normal(size=(2, 16000)).astype(np.float32)
        ref = STFT(sample_rate=16000, n_fft=512, win_length=32,
                   hop_length=10)(torch.from_numpy(x))
        from tsasr_tpu.ops.features import stft
        re, im = stft(jnp.asarray(x), sample_rate=16000, win_length=32.0,
                      hop_length=10.0, n_fft=512)
        np.testing.assert_allclose(np.asarray(re), ref[..., 0].numpy(),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(im), ref[..., 1].numpy(),
                                   atol=2e-2)

    def test_full_fbank(self, sb, torch, rng):
        from speechbrain.lobes.features import Fbank as RefFbank
        x = rng.normal(size=(2, 16000)).astype(np.float32)
        ref = RefFbank(sample_rate=16000, n_fft=512, n_mels=80,
                       win_length=32)(torch.from_numpy(x)).numpy()
        from tsasr_tpu.ops import Fbank
        ours = np.asarray(Fbank(sample_rate=16000, n_fft=512, n_mels=80,
                                win_length=32.0)(jnp.asarray(x)))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-2)

    def test_input_normalization_sentence(self, sb, torch, rng):
        from speechbrain.processing.features import (
            InputNormalization as RefNorm,
        )
        x = rng.normal(size=(3, 50, 80)).astype(np.float32) * 5 + 2
        lens = np.asarray([1.0, 0.7, 0.42], np.float32)
        ref = RefNorm(norm_type="sentence")(
            torch.from_numpy(x.copy()), torch.from_numpy(lens)).numpy()
        from tsasr_tpu.ops import input_normalization
        ours = np.asarray(input_normalization(jnp.asarray(x),
                                              jnp.asarray(lens)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_spectral_magnitude(self, sb, torch, rng):
        from speechbrain.processing.features import (
            spectral_magnitude as ref_mag,
        )
        stft_vals = rng.normal(size=(2, 10, 257, 2)).astype(np.float32)
        ref = ref_mag(torch.from_numpy(stft_vals)).numpy()
        from tsasr_tpu.ops.features import spectral_magnitude
        ours = np.asarray(spectral_magnitude(
            jnp.asarray(stft_vals[..., 0]), jnp.asarray(stft_vals[..., 1])))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestModuleParity:
    def test_one_hot_embedding(self, sb, torch):
        from speechbrain.nnet.embedding import Embedding as RefEmbedding
        ref_emb = RefEmbedding(num_embeddings=29, consider_as_one_hot=True,
                               blank_id=0)
        tokens = np.asarray([[0, 1, 5, 28], [3, 0, 2, 7]])
        ref = ref_emb(torch.from_numpy(tokens)).detach().numpy()
        from tsasr_tpu.models.transducer import OneHotEmbedding
        ours = np.asarray(OneHotEmbedding(num_embeddings=29, blank_id=0)(
            jnp.asarray(tokens)))
        np.testing.assert_allclose(ours, ref)

    def test_transducer_joint_sum(self, sb, torch, rng):
        from speechbrain.nnet.transducer.transducer_joint import (
            Transducer_joint,
        )
        enc = rng.normal(size=(2, 7, 1, 16)).astype(np.float32)
        dec = rng.normal(size=(2, 1, 5, 16)).astype(np.float32)
        ref = Transducer_joint(joint="sum")(
            torch.from_numpy(enc), torch.from_numpy(dec)).numpy()
        from tsasr_tpu.models.transducer import Joiner
        joiner = Joiner(mode="sum")
        params = joiner.init(jax.random.PRNGKey(0), jnp.asarray(enc),
                             jnp.asarray(dec))
        ours = np.asarray(joiner.apply(params, jnp.asarray(enc),
                                       jnp.asarray(dec)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_rel_pos_encoding(self, sb, torch, rng):
        from speechbrain.nnet.attention import RelPosEncXL
        x = torch.from_numpy(rng.normal(size=(1, 12, 32)).astype(
            np.float32))
        ref = RelPosEncXL(32)(x).numpy()
        from tsasr_tpu.models.attention import rel_pos_encoding
        ours = np.asarray(rel_pos_encoding(12, 32))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_noam_scheduler_values(self, sb):
        from speechbrain.nnet.schedulers import NoamScheduler as RefNoam

        class FakeOpt:
            param_groups = [{"lr": 1e-3}]

        ref = RefNoam(lr_initial=1e-3, n_warmup_steps=100)
        from tsasr_tpu.training.schedulers import NoamScheduler
        ours = NoamScheduler(lr_initial=1e-3, n_warmup_steps=100)
        opt = FakeOpt()
        for _ in range(250):
            _, ref_lr = ref(opt)
            _, our_lr = ours()
            np.testing.assert_allclose(our_lr, ref_lr, rtol=1e-9)

    def test_conv2d_same_padding_stride2_length(self, sb, torch, rng):
        """Frontend 'same' stride-2 output lengths must match the
        reference Conv2d padding arithmetic for odd/even inputs."""
        from speechbrain.nnet.CNN import Conv2d as RefConv2d
        for t_len in (39, 40, 41):
            x = torch.from_numpy(
                rng.normal(size=(1, t_len, 16, 3)).astype(np.float32))
            conv = RefConv2d(out_channels=4, kernel_size=(3, 3),
                             input_shape=x.shape, stride=(2, 2),
                             padding="same")
            ref_t = conv(x).shape[1]
            ours_t = -(-t_len // 2)
            assert ours_t == ref_t, t_len


class TestConformerLayerWeightParity:
    def test_layer_forward_matches_with_transferred_weights(self, sb,
                                                            torch, rng):
        """Port the weights of a REFERENCE ConformerEncoderLayer into our
        flax layer and compare forward outputs — proof the encoder
        computes the same function as the reference."""
        from speechbrain.lobes.models.transformer.Conformer import (
            ConformerEncoderLayer as RefLayer,
        )
        from speechbrain.nnet.attention import RelPosEncXL

        D, H, FFN, K, T, B = 32, 4, 64, 7, 10, 2
        ref = RefLayer(d_model=D, d_ffn=FFN, nhead=H, kernel_size=K,
                       activation=torch.nn.LeakyReLU, dropout=0.0)
        ref.eval()
        x_np = rng.normal(size=(B, T, D)).astype(np.float32)
        pos = RelPosEncXL(D)(torch.from_numpy(x_np))
        with torch.no_grad():
            ref_out, _ = ref(torch.from_numpy(x_np), pos_embs=pos)
        ref_out = ref_out.numpy()

        from tsasr_tpu.models.conformer import ConformerEncoderLayer
        ours = ConformerEncoderLayer(d_model=D, d_ffn=FFN, nhead=H,
                                     kernel_size=K, dropout=0.0,
                                     activation=jax.nn.leaky_relu)
        from tsasr_tpu.models.attention import rel_pos_encoding
        pe = rel_pos_encoding(T, D)
        params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_np), pe)

        def t(x):      # torch tensor -> numpy
            return x.detach().numpy()

        def lin(mod):  # torch Linear -> flax Dense
            return {"kernel": t(mod.weight).T, "bias": t(mod.bias)}

        def ln(mod):
            return {"scale": t(mod.weight), "bias": t(mod.bias)}

        sd = ref
        Dh = D // H
        new = {
            "LayerNorm_0": ln(sd.ffn_module1[0]),
            "ffn1": {"Dense_0": lin(sd.ffn_module1[1].ffn[0]),
                     "Dense_1": lin(sd.ffn_module1[1].ffn[3])},
            "norm_mha": ln(sd.norm1.norm),
            "mha": {
                "qkv_proj": {"kernel": t(sd.mha_layer.in_proj_weight).T},
                "pos_proj": {"kernel": t(sd.mha_layer.linear_pos.weight).T},
                "pos_bias_u": t(sd.mha_layer.pos_bias_u).reshape(H, Dh),
                "pos_bias_v": t(sd.mha_layer.pos_bias_v).reshape(H, Dh),
                "out_proj": lin(sd.mha_layer.out_proj),
            },
            "conv": {
                "LayerNorm_0": ln(sd.convolution_module.layer_norm),
                "pointwise_in": {
                    "kernel": t(sd.convolution_module.bottleneck[0]
                                .weight)[:, :, 0].T,
                    "bias": t(sd.convolution_module.bottleneck[0].bias)},
                "depthwise": {
                    "kernel": t(sd.convolution_module.conv.weight
                                ).transpose(2, 1, 0),
                    "bias": t(sd.convolution_module.conv.bias)},
                "LayerNorm_1": ln(sd.convolution_module.after_conv[0]),
                "pointwise_out": lin(sd.convolution_module.after_conv[2]),
            },
            "LayerNorm_1": ln(sd.ffn_module2[0]),
            "ffn2": {"Dense_0": lin(sd.ffn_module2[1].ffn[0]),
                     "Dense_1": lin(sd.ffn_module2[1].ffn[3])},
            "norm_out": ln(sd.norm2.norm),
        }
        new = jax.tree.map(jnp.asarray, new)
        import flax
        flat_template = flax.traverse_util.flatten_dict(params["params"])
        flat_new = flax.traverse_util.flatten_dict(new)
        assert set(flat_template) == set(flat_new), (
            sorted(flat_template), sorted(flat_new))
        for key, value in flat_new.items():
            assert flat_template[key].shape == value.shape, key

        our_out, _ = ours.apply({"params": new}, jnp.asarray(x_np), pe)
        np.testing.assert_allclose(np.asarray(our_out), ref_out,
                                   atol=2e-4)
