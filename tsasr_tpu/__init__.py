"""TS-ASR TPU: a TPU-native target-speaker ASR framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
``lucadellalib/ts-asr`` reference system (SpeechBrain-based Conformer
transducer for target-speaker ASR), redesigned TPU-first:

- ``tsasr_tpu.ops``       pure-JAX / Pallas compute ops (features, augment,
                          RNN-T loss, masks) — everything runs under ``jit``.
- ``tsasr_tpu.models``    flax.linen model zoo (Conformer encoder with
                          speaker-embedding injection, LSTM predictor,
                          transducer joint).
- ``tsasr_tpu.data``      host-side data layer (manifests, dynamic-item
                          datasets, bucketed batching, tokenizers, audio IO).
- ``tsasr_tpu.decoding``  on-device transducer greedy / beam search.
- ``tsasr_tpu.training``  Brain-style trainer, checkpointing, schedulers,
                          loggers, metrics plumbing.
- ``tsasr_tpu.parallel``  device mesh + sharding rules (DP required; TP axes
                          available).
- ``tsasr_tpu.utils``     hparams (HyperPyYAML-compatible subset), edit
                          distance / WER, logging, profiling.
"""

__version__ = "0.1.0"

from tsasr_tpu.utils.stage import Stage  # noqa: F401
