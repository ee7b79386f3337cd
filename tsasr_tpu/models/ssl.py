"""Generic SSL speech-encoder lobe (wav2vec2/WavLM-style).

Capability equivalent of the reference ``HuggingFaceWav2Vec2`` lobe
(``lobes/models/huggingface_wav2vec.py:1-569``) / ``fairseq_wav2vec``:
a frozen-or-finetunable transformer speech encoder producing frame
features from raw waveforms, usable as the front-end of any recipe.

Built on the in-repo flax WavLM port (``models/wavlm.py`` — the same
architecture family as wav2vec2: conv feature extractor + transformer
with relative position bias). Loads local HF checkpoint directories —
both base models and XVector heads (the base subtree is used). No hub
fetching: this environment has zero egress (PARITY.md out-of-scope
note).
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from tsasr_tpu.models.wavlm import (
    WavLMConfig,
    WavLMModel,
    convert_hf_xvector_state_dict,
)


def _load_state_dict(model_path):
    st_path = os.path.join(model_path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file
        return load_file(st_path)
    import torch
    bin_path = os.path.join(model_path, "pytorch_model.bin")
    return {k: v.numpy()
            for k, v in torch.load(bin_path, map_location="cpu",
                                   weights_only=True).items()}


def load_pretrained_base(model_path):
    """Local HF checkpoint dir -> (config, variables) for
    :class:`WavLMModel` (the frame-feature base encoder).

    Accepts both base checkpoints (keys like
    ``feature_extractor.conv_layers...``) and XVector/classifier
    checkpoints (keys prefixed ``wavlm.``); only the base subtree is
    converted.
    """
    with open(os.path.join(model_path, "config.json")) as f:
        config = WavLMConfig.from_hf_dict(json.load(f))
    sd = {k: np.asarray(v) for k, v in _load_state_dict(model_path).items()}
    # normalize to the "wavlm." prefix the converter expects
    if not any(k.startswith("wavlm.") for k in sd):
        for pref in ("wav2vec2.", "hubert.", "model."):
            if any(k.startswith(pref) for k in sd):
                sd = {("wavlm." + k[len(pref):] if k.startswith(pref)
                       else k): v for k, v in sd.items()}
                break
        else:
            sd = {"wavlm." + k: v for k, v in sd.items()}
    # satisfy the converter's head expectations with dummies, then keep
    # only the base subtree
    dummies = {
        "projector.weight": np.zeros((1, config.hidden_size)),
        "projector.bias": np.zeros((1,)),
        "feature_extractor.weight": np.zeros((1, 1)),
        "feature_extractor.bias": np.zeros((1,)),
        "classifier.weight": np.zeros((1, 1)),
        "classifier.bias": np.zeros((1,)),
    }
    for i, (k, dim) in enumerate(zip(config.tdnn_kernel,
                                     config.tdnn_dim)):
        in_dim = config.tdnn_dim[i - 1] if i > 0 else config.tdnn_dim[0]
        dummies[f"tdnn.{i}.kernel.weight"] = np.zeros((dim, in_dim * k))
        dummies[f"tdnn.{i}.kernel.bias"] = np.zeros((dim,))
    if config.use_weighted_layer_sum:
        dummies["layer_weights"] = np.zeros(
            (config.num_hidden_layers + 1,))
    for k, v in dummies.items():
        sd.setdefault(k, v)
    full = convert_hf_xvector_state_dict(sd, config)
    return config, {"params": full["params"]["wavlm"]}


class SSLEncoder:
    """Frozen (or finetunable) SSL front-end: wav (B, L) -> frame
    features (B, T, hidden)."""

    def __init__(self, source=None, config=None, variables=None,
                 freeze=True, output_norm=False):
        if source is not None:
            config, variables = load_pretrained_base(source)
        if config is None or variables is None:
            raise ValueError("pass source= or (config=, variables=)")
        self.config = config
        self.variables = variables
        self.freeze = freeze
        self.output_norm = output_norm
        self.model = WavLMModel(config)

        def forward(variables, wavs, feat_mask):
            h, _ = self.model.apply(variables, wavs,
                                    feat_mask=feat_mask)
            if self.output_norm:
                h = (h - jnp.mean(h, axis=-1, keepdims=True)) / \
                    (jnp.std(h, axis=-1, keepdims=True) + 1e-5)
            return h

        self._jitted = jax.jit(forward)

    def output_lengths(self, input_lengths):
        return self.config.feat_extract_output_length(
            np.asarray(input_lengths))

    def __call__(self, wavs, rel_lens=None):
        wavs = jnp.asarray(wavs, jnp.float32)
        if wavs.ndim == 1:
            wavs = wavs[None]
        feat_mask = None
        if rel_lens is not None:
            T = int(self.config.feat_extract_output_length(
                wavs.shape[1]))
            abs_len = np.round(np.asarray(rel_lens) *
                               wavs.shape[1]).astype(np.int64)
            out_len = np.asarray([int(
                self.config.feat_extract_output_length(int(n)))
                for n in abs_len])
            feat_mask = jnp.asarray(
                np.arange(T)[None, :] < out_len[:, None])
        out = self._jitted(
            self.variables if not self.freeze else
            jax.lax.stop_gradient(self.variables), wavs, feat_mask)
        return out
