"""YAML model-graph swaps via the component registry (verdict R10):
a YAML-only ``encoder_class``/``joiner_class`` override replaces a
structural piece of the single-jit ``TSTransducer`` — the reference
achieves the same with per-module ``!new:`` blocks
(``conformer-t_scratch.yaml:122-251``)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsasr_tpu.models.conformer import TSConformerEncoder
from tsasr_tpu.models.registry import available, register, resolve
from tsasr_tpu.models.transducer import Joiner

HPARAMS = os.path.join(os.path.dirname(__file__), "..", "hparams",
                       "LibriSpeechMix", "conformer-t_none.yaml")


@register("encoder", "test_marked_conformer")
class MarkedEncoder(TSConformerEncoder):
    """Registry-swappable encoder: same graph, distinct class."""


class MarkedJoiner(Joiner):
    """Dotted-path-swappable joiner."""


# Host the dotted-path target in a synthetic sys.modules entry:
# ``import tests.test_registry`` is NOT reliable inside the full suite
# (test_reference_parity puts /root/reference on sys.path, whose own
# ``tests`` package then shadows this repo's in sys.modules), and
# resolve()'s importlib.import_module consults sys.modules first, so
# this exercises the exact same dotted-path code path hermetically.
import sys
import types

_mod = types.ModuleType("tsasr_registry_test_mod")
_mod.MarkedJoiner = MarkedJoiner
sys.modules["tsasr_registry_test_mod"] = _mod
DOTTED_JOINER = "tsasr_registry_test_mod.MarkedJoiner"


def test_resolve_registry_name_and_dotted_path():
    assert resolve("encoder", "test_marked_conformer") is MarkedEncoder
    assert resolve("joiner", DOTTED_JOINER) is MarkedJoiner
    assert resolve("encoder", None) is None
    assert "test_marked_conformer" in available("encoder")


def test_unknown_name_lists_alternatives():
    with pytest.raises(ValueError, match="test_marked_conformer"):
        resolve("encoder", "nonexistent")


def test_yaml_override_swaps_encoder_class():
    """--encoder_class <name> through the real hparams file swaps the
    encoder inside TSTransducer; the model still initializes and runs."""
    from tsasr_tpu.utils.hparams import load_hyperpyyaml
    overrides = ("encoder_class: test_marked_conformer\n"
                 f"joiner_class: {DOTTED_JOINER}\n"
                 "encoder_num_layers: 1\nd_model: 32\nnhead: 4\n"
                 "d_ffn: 64\ndecoder_neurons: 16\njoint_dim: 32\n"
                 "vocab_size: 29\ndata_folder: /tmp\n"
                 "output_folder: /tmp/registry_test\n")
    with open(HPARAMS) as f:
        hparams = load_hyperpyyaml(f, overrides)
    model = hparams["model"]
    assert model.config.encoder_class == "test_marked_conformer"

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 20, 80)), jnp.float32)
    rel = jnp.ones((1,), jnp.float32)
    tokens = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, rel, tokens)
    logits, _ = model.apply(params, feats, rel, tokens)
    assert np.all(np.isfinite(np.asarray(logits)))

    bound = model.bind(params)
    assert type(bound.encoder).__name__ == "MarkedEncoder"
    assert type(bound.joiner).__name__ == "MarkedJoiner"
