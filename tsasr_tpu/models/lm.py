"""RNN language model for shallow fusion during transducer decoding.

The reference beam search fuses an optional RNN LM: on every non-blank
expansion the hypothesis score gains ``lm_weight * log p_lm(token)`` and
the LM state advances with the emitted token
(``vendor/speechbrain/speechbrain/decoders/transducer.py:311-314,386-409``;
LM architecture: ``lobes/models/RNNLM.py`` = Embedding -> LSTM -> DNN ->
output head). This is the JAX equivalent: one flax module usable both
for training (teacher-forced next-token logits, one scan) and decoding
(single ``step``), plus the ``make_lm_step_fn`` adapter both beam
searchers consume.
"""

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsasr_tpu.models.rnn import LSTM


@dataclass(frozen=True)
class RNNLMConfig:
    vocab_size: int = 29
    embedding_dim: int = 128
    hidden_size: int = 256
    num_layers: int = 2
    dnn_neurons: int = 256
    dropout: float = 0.15
    dtype: Any = jnp.float32


class RNNLM(nn.Module):
    """Embedding -> LSTM -> Dense -> output logits over the vocab."""

    config: RNNLMConfig = field(default_factory=RNNLMConfig)

    def setup(self):
        c = self.config
        self.embedding = nn.Embed(c.vocab_size, c.embedding_dim,
                                  dtype=c.dtype)
        self.rnn = LSTM(hidden_size=c.hidden_size,
                        in_features=c.embedding_dim,
                        num_layers=c.num_layers, dtype=c.dtype)
        self.dnn = nn.Dense(c.dnn_neurons, dtype=c.dtype, name="dnn")
        self.dropout = nn.Dropout(c.dropout)
        self.out = nn.Dense(c.vocab_size, dtype=c.dtype, name="out")

    def _head(self, h, deterministic):
        h = jax.nn.leaky_relu(self.dnn(h))
        h = self.dropout(h, deterministic=deterministic)
        return self.out(h)

    def __call__(self, tokens, deterministic=True):
        """Teacher-forced forward: (B, U) tokens -> (B, U, V) logits for
        the NEXT token at each position."""
        h, _ = self.rnn(self.embedding(tokens))
        return self._head(h, deterministic)

    def step(self, token, state):
        """One decode step: (B,) token -> ((B, V) log-probs, state)."""
        h, state = self.rnn.step(self.embedding(token), state)
        logits = self._head(h, True)
        return jax.nn.log_softmax(logits, axis=-1), state

    def initial_state(self, batch_size):
        return self.rnn.initial_state(batch_size, dtype=self.config.dtype)


def make_lm_step_fn(model, variables):
    """-> ``lm_step_fn(tokens (N,), state) -> (log_probs (N, V), state)``
    with ``state=None`` meaning the zero initial state (host beam calls
    it lazily per hypothesis; the batched beam passes real states)."""

    def lm_step_fn(tokens, state):
        arr = jnp.asarray(tokens, jnp.int32)
        scalar = arr.ndim == 0
        batch = arr[None] if scalar else arr
        if state is None:
            state = model.apply(variables, batch.shape[0],
                                method=model.initial_state)
        log_probs, state = model.apply(variables, batch, state,
                                       method=model.step)
        return (log_probs[0] if scalar else log_probs), state

    return lm_step_fn


def lm_initial_state(model, variables, batch_size):
    return model.apply(variables, batch_size, method=model.initial_state)


def load_lm_checkpoint(path):
    """Load a ``tools/train_lm.py`` msgpack checkpoint -> (RNNLM,
    variables). The single source of truth for the save format
    (config dict + params tree); both the recipe and the inference
    transcriber go through here."""
    import flax.serialization

    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if payload.get("config"):
        cfg = RNNLMConfig(**{
            k: float(v) if isinstance(v, float) else int(v)
            for k, v in payload["config"].items()})
    else:
        cfg = RNNLMConfig()
    model = RNNLM(cfg)
    variables = {"params": payload.get("params", payload)}
    return model, variables
